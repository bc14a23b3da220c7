"""SCD2 history tracking: turn a change log into validity intervals
(valid_from / valid_to / is_current per key version) — the warehouse
pattern the reference's raw-table upsert history implies but never
materializes (its tombstone archive, K8, is the degenerate form)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pipeline311_spark.plans.common import fmt_ts, fmt_ts_sql, table
from pipeline311_spark.plans.registry import register

_SCD2_SQL = f"""
SELECT user_id, event_id,
       {fmt_ts_sql('ts')} AS valid_from,
       coalesce({fmt_ts_sql('lead(ts) OVER w')}, '9999-12-31 00:00:00.000000') AS valid_to,
       CAST(lead(ts) OVER w IS NULL AS INTEGER) AS is_current
FROM events
WHERE user_id < 5 AND ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_scd2_rows(events):
    """The SCD2 kernel over an arbitrary (user_id, event_id, ts)
    change log — split out so the interval semantics are testable on
    hostile inputs (duplicate timestamps, single-row keys) without the
    table scan."""
    # event-TIME kernel: a NULL change-time has no interval position
    events = events.filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return events.select(
        "user_id",
        "event_id",
        fmt_ts("ts").alias("valid_from"),
        F.coalesce(fmt_ts(nxt), F.lit("9999-12-31 00:00:00.000000")).alias("valid_to"),
        nxt.isNull().cast("int").alias("is_current"),
    )


@register("q_scd2_intervals", _SCD2_SQL, covers=("K3", "K8", "O5", "T1"))
def q_scd2(spark, sf_dir):
    return q_scd2_rows(table(spark, sf_dir, "events").filter(F.col("user_id") < 5))
