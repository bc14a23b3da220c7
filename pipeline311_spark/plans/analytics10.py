"""Tenth batch: histogram binning + conditional aggregates summary."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline311_spark.plans.common import dec, table
from pipeline311_spark.plans.registry import register

_HIST_SQL = """
SELECT event_type,
       CAST(least(floor(value / 20.0), 9) AS BIGINT) AS bin,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS bin_total
FROM events GROUP BY 1, 2
"""


@register("q_histogram_bins", _HIST_SQL, covers=("A-class",))
def q_hist(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    bin_ = F.least(F.floor(F.col("value") / 20.0), F.lit(9)).cast("long")
    return e.groupBy("event_type", bin_.alias("bin")).agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).cast("double").alias("bin_total"),
    )


# filtered/conditional aggregate battery in a single pass (FILTER
# clause vs when(): five summary stats per group, one scan)
_CONDAGG_SQL = """
SELECT event_type,
       COUNT(*) FILTER (WHERE value > 100) AS n_large,
       COUNT(*) FILTER (WHERE value <= 100) AS n_small,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE user_id % 2 = 0) AS DOUBLE) AS even_user_total,
       MAX(value) FILTER (WHERE user_id % 2 = 1) AS odd_user_max,
       COUNT(DISTINCT user_id) FILTER (WHERE value > 150) AS big_spenders
FROM events GROUP BY event_type
"""


@register("q_conditional_aggregates", _CONDAGG_SQL, covers=("A-class", "P10"))
def q_condagg(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    v = F.col("value")
    uid = F.col("user_id")
    return e.groupBy("event_type").agg(
        F.count(F.when(v > 100, 1)).alias("n_large"),
        F.count(F.when(v <= 100, 1)).alias("n_small"),
        F.sum(F.when(uid % 2 == 0, dec("value"))).cast("double").alias("even_user_total"),
        F.max(F.when(uid % 2 == 1, v)).alias("odd_user_max"),
        F.countDistinct(F.when(v > 150, uid)).alias("big_spenders"),
    )
