"""As-of and range join queries over the events stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline311_spark.operators.temporal import asof_join, range_join_buckets
from pipeline311_spark.plans.common import fmt_ts, fmt_ts_sql, table
from pipeline311_spark.plans.registry import register

# For each error event: the user's most recent purchase at-or-before it.
_ASOF_SQL = f"""
WITH tagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'error' THEN 1 ELSE NULL END AS is_err,
         CASE WHEN event_type = 'purchase' THEN event_id ELSE NULL END AS p_id,
         CASE WHEN event_type = 'purchase' THEN ts ELSE NULL END AS p_ts,
         CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS side
  FROM events WHERE event_type IN ('error', 'purchase')),
carried AS (
  SELECT *,
         last_value(p_id IGNORE NULLS) OVER w AS asof_event_id,
         last_value(p_ts IGNORE NULLS) OVER w AS asof_ts
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side ROWS UNBOUNDED PRECEDING))
SELECT user_id, event_id, {fmt_ts_sql('ts')} AS ts_str,
       CAST(asof_event_id AS DOUBLE) AS asof_event_id, {fmt_ts_sql('asof_ts')} AS asof_ts_str
FROM carried WHERE is_err = 1
"""


@register("q_asof_join", _ASOF_SQL, covers=("O5", "T1", "J-class"))
def q_asof(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    out = asof_join(
        errors, purchases, key="user_id", left_ts="ts", right_ts="ts",
        right_cols=["event_id", "ts"],
    )
    return out.select(
        "user_id",
        "event_id",
        fmt_ts("ts").alias("ts_str"),
        # nullable numeric -> double on both engines (deterministic pandas dtype)
        F.col("asof_event_id").cast("double").alias("asof_event_id"),
        fmt_ts("asof_ts").alias("asof_ts_str"),
    )


# For each signup: clicks by the same user within the following hour.
_RANGE_SQL = """
SELECT s.user_id, s.event_id AS signup_id, COUNT(c.event_id) AS clicks_within_1h
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'signup') s
LEFT JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
  ON c.user_id = s.user_id AND c.ts >= s.ts AND c.ts < s.ts + INTERVAL 1 HOUR
GROUP BY s.user_id, s.event_id
"""


@register("q_range_join", _RANGE_SQL, covers=("J-class", "F2"))
def q_range(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    signups = (
        e.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("event_id").alias("signup_id"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
        )
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    joined = range_join_buckets(
        signups, clicks, key="user_id", right_ts="ts",
        left_start="start_ts", left_end="end_ts", bucket_seconds=3600,
    )
    counts = joined.groupBy("user_id", "signup_id").agg(
        F.count("click_id").alias("clicks_within_1h")
    )
    # left semantics: signups with zero clicks keep a 0 row
    return (
        signups.select("user_id", "signup_id")
        .join(counts, ["user_id", "signup_id"], "left")
        .withColumn("clicks_within_1h", F.coalesce("clicks_within_1h", F.lit(0)))
    )


# ---------------------------------------------------------------------------
# Trailing time-interval window: per user, count + exact sum of event
# values in the trailing hour (RANGE frame over epoch seconds).
#
# Scale: partitioned by user_id — one hash shuffle, frames evaluated
# with a sliding accumulator per partition; never a global sort.  The
# frame bound is integer epoch-seconds on BOTH engines (Spark's
# timestamp->long cast truncates to seconds; the oracle floors
# epoch()) so frame membership is bit-identical.
# ---------------------------------------------------------------------------

_TRAILING_SQL = """
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS n_trailing_1h,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
"""


@register("q_trailing_window_avg", _TRAILING_SQL, covers=("O5", "A-class", "T1"))
def q_trailing_window(spark, sf_dir):
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3599, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_trailing_1h"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("sum_trailing_1h"),
    )
