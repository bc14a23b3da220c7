"""Sixth batch: incremental rollup maintenance and a deterministic
KMV (k-minimum-values) distinct sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline311_spark.ext.hashing import MOD, portable_hash, portable_hash_sql
from pipeline311_spark.operators.rollup_maint import merge_rollup, rollup_delta
from pipeline311_spark.plans.common import dec, table
from pipeline311_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Incremental rollup: history rollup + delta partials == full rollup.
# The oracle computes the full GROUP BY; the Spark side maintains it
# incrementally (split at a mid-month boundary) — results must agree.
# ---------------------------------------------------------------------------

_ROLLUP_MAINT_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       MIN(value) AS min_v, MAX(value) AS max_v
FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
"""


@register("rollup_incremental_maintenance", _ROLLUP_MAINT_SQL, covers=("T1", "K4", "A-class"))
def q_rollup_maint(spark, sf_dir):
    # event-time rollup: NULL ts rows belong to no day partition (the
    # history/delta split below would silently drop them anyway —
    # make the convention explicit and oracle-mirrored)
    e = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    history = e.filter(F.col("ts") < "2024-01-15")
    delta = e.filter(F.col("ts") >= "2024-01-15")

    partials = {
        "n": F.count("*"),
        "sum_dec": F.sum(dec("value")),
        "min_v": F.min("value"),
        "max_v": F.max("value"),
    }
    dims = ["day", "event_type"]
    hist_rollup = rollup_delta(history.select(day, "event_type", "value"), dims, partials)
    delta_partials = rollup_delta(delta.select(day, "event_type", "value"), dims, partials)
    merged = merge_rollup(
        hist_rollup,
        delta_partials,
        dims,
        {
            "n": F.sum("n"),
            "sum_dec": F.sum("sum_dec"),
            "min_v": F.min("min_v"),
            "max_v": F.max("max_v"),
        },
    )
    return merged.select(
        "day", "event_type", "n", F.col("sum_dec").cast("double").alias("total"),
        "min_v", "max_v",
    )


# ---------------------------------------------------------------------------
# KMV distinct sketch: deterministic (portable-hash) k-minimum-values
# estimator — an oracle-checkable approximate-distinct, unlike HLL.
# estimate = (k-1) / max(k smallest normalized hashes)
# ---------------------------------------------------------------------------

_KMV_K = 64

_KMV_SQL = f"""
WITH h AS (
  SELECT DISTINCT {portable_hash_sql('text')} AS h FROM documents),
topk AS (
  SELECT h FROM h ORDER BY h LIMIT {_KMV_K}),
stats AS (
  SELECT COUNT(*) AS k_found, MAX(h) AS kth FROM topk)
SELECT (SELECT COUNT(*) FROM h) AS exact_distinct,
       CASE WHEN k_found < {_KMV_K} THEN CAST(k_found AS DOUBLE)
            ELSE ({_KMV_K} - 1) / (CAST(kth AS DOUBLE) / {MOD}) END AS kmv_estimate
FROM stats
"""


@register("sketch_kmv_distinct", _KMV_SQL, covers=("A6", "ext:dedup"))
def q_kmv(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    h = d.select(portable_hash("text").alias("h")).distinct()
    exact = h.count()
    topk = h.orderBy("h").limit(_KMV_K)
    row = topk.agg(F.count("*").alias("k_found"), F.max("h").alias("kth")).first()
    if row["k_found"] < _KMV_K:
        est = float(row["k_found"])
    else:
        est = (_KMV_K - 1) / (row["kth"] / MOD)
    return spark.createDataFrame(
        [(exact, est)], "exact_distinct long, kmv_estimate double"
    )
