"""Fifth batch: unpivot (stack), ranking window functions
(rank/dense_rank/percent_rank/ntile), lead/lag deltas."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pipeline311_spark.plans.common import fmt_ts, fmt_ts_sql, table
from pipeline311_spark.plans.registry import register

_UNPIVOT_SQL = """
SELECT c_custkey, metric, value FROM (
  SELECT c_custkey, c_acctbal AS balance, CAST(c_nationkey AS DOUBLE) AS nation
  FROM customer WHERE c_custkey <= 50)
UNPIVOT (value FOR metric IN (balance, nation))
"""


@register("q_unpivot", _UNPIVOT_SQL, covers=("P1", "A-class"))
def q_unpivot(spark, sf_dir):
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 50)
    wide = c.select(
        "c_custkey",
        F.col("c_acctbal").alias("balance"),
        F.col("c_nationkey").cast("double").alias("nation"),
    )
    return wide.unpivot("c_custkey", ["balance", "nation"], "metric", "value")


_RANKING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
       PERCENT_RANK() OVER w AS prnk,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile
FROM orders
WHERE o_custkey <= 20
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
"""


@register("q_ranking_functions", _RANKING_SQL, covers=("O5",))
def q_ranking(spark, sf_dir):
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 20)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


_LEADLAG_SQL = f"""
SELECT user_id, event_id,
       {fmt_ts_sql('ts')} AS ts_str,
       CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS DOUBLE) AS us_since_prev,
       lead(event_type) OVER w AS next_type
FROM events
WHERE user_id < 3 AND ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("q_lead_lag_deltas", _LEADLAG_SQL, covers=("O5", "T1"))
def q_leadlag(spark, sf_dir):
    # event-TIME operator: NULL timestamps are dropped (they have no
    # position in the order; engines also disagree on NULL placement)
    e = table(spark, sf_dir, "events").filter(
        (F.col("user_id") < 3) & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        fmt_ts("ts").alias("ts_str"),
        # nullable numeric -> double on both engines (first row per
        # partition is NULL; deterministic pandas dtype either way)
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)))
        .cast("double")
        .alias("us_since_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )
