"""Event-stream product analytics: cohort retention and sliding-window
distinct actives (WAU) — the two classic "distinct users over time"
shapes a telemetry warehouse serves, built on the same events table the
watermark/streaming operators ingest.

Scale notes (100 TB):
* retention — two bounded aggregations (first-activity per user,
  distinct user-weeks) joined on user_id: the join keys on the user
  dimension, so the shuffle is |users| + |user-weeks|, never raw
  events; the final census is a tiny (cohort × week) grid.
* WAU — the naive form is a range join (each day joined to a 7-day
  span of activity); here each DISTINCT (day, user) row map-side
  explodes into the ≤ 7 window-ends it can serve (constant fan-out,
  before any exchange), then ONE countDistinct aggregation keyed on
  window_end — no range join, no per-day rescan.  The semi join back
  to active days only trims the report to days that exist.
Both outputs are exact integers + rendered date strings, so the
DuckDB twins hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline311_spark.plans.common import table
from pipeline311_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Cohort retention: users grouped by first-activity week; for each
# (cohort_week, weeks_since) the count of cohort members still active.
# ---------------------------------------------------------------------------

_RETENTION_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
cohort AS (
  SELECT user_id, min(wk) AS cw FROM uw GROUP BY user_id)
SELECT strftime(c.cw, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', c.cw, uw.wk) // 7 AS BIGINT) AS weeks_since,
       CAST(count(DISTINCT uw.user_id) AS BIGINT) AS n_active
FROM uw JOIN cohort c ON uw.user_id = c.user_id
GROUP BY 1, 2
"""


@register("q_retention_cohorts", _RETENTION_SQL, covers=("A-class",))
def q_retention_cohorts(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    uw = ev.select("user_id", F.date_trunc("week", "ts").alias("wk")).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("wk").alias("cw"))
    return (
        uw.join(cohort, "user_id")
        .groupBy(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            F.expr("datediff(wk, cw) div 7").cast("long").alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )


# ---------------------------------------------------------------------------
# WAU: for each ACTIVE day, the count of distinct users active in the
# 7-day window ending that day.
# ---------------------------------------------------------------------------

_WAU_SQL = """
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
spread AS (
  SELECT user_id, unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS window_end
  FROM du),
active_days AS (SELECT DISTINCT day FROM du)
SELECT strftime(s.window_end, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT s.user_id) AS BIGINT) AS wau
FROM spread s JOIN active_days a ON s.window_end = a.day
GROUP BY 1
"""


@register("q_wau_sliding_distinct", _WAU_SQL, covers=("A-class", "J4"))
def q_wau_sliding_distinct(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    du = ev.select(F.date_trunc("day", "ts").alias("day"), "user_id").distinct()
    spread = du.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.expr("day + interval 6 day"), F.expr("interval 1 day"))
        ).alias("window_end"),
    )
    active_days = du.select("day").distinct()
    return (
        spread.join(active_days, spread["window_end"] == active_days["day"], "left_semi")
        .groupBy(F.date_format("window_end", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )
