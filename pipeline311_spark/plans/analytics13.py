"""LLM training-data curation ops, part 3: source-mixture rebalancing,
per-language quality-percentile gating, the k-means centroid-update
step, and 3-sigma metric-anomaly detection.

The first two answer "which rows make it into the training mix" — the
selection layer between dedup/scoring and sequence packing; the last
two are the iterative-ML and data-quality companions (sections below).

Scale notes (100 TB):
* rebalance — the per-source keep-fraction comes from a tiny counts
  aggregate (one row per source) broadcast back onto the corpus; row
  selection is a deterministic hash-bucket test, so the whole operator
  is one scan + one agg shuffle + a broadcast join.  Crucially the
  sample is stable under repartitioning (hash of the stable id, not
  ``sample()``), so reruns and incremental appends select consistent
  rows — see ext/sampling.py.
* quality gate — percent_rank needs a total order *within each
  language*, so the window partitions by lang (parallel across
  languages, one shuffle).  A single global percentile would serialize;
  for a global cut at 100 TB use approx quantile cutpoints instead
  (documented in SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pipeline311_spark.ext.sampling import hash_bucket, hash_bucket_sql
from pipeline311_spark.ext.textstats import quality_score
from pipeline311_spark.plans.common import emb_table, table
from pipeline311_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Source-mixture rebalancing: downsample every source shard to the size
# of the smallest one (uniform target mixture), deterministically.
# ---------------------------------------------------------------------------

_BUCKETS = 10_000

_REBALANCE_SQL = f"""
WITH counts AS (
  SELECT source, count(*) AS n_total FROM documents GROUP BY source
),
lim AS (
  SELECT source, n_total,
         (CAST({_BUCKETS} AS BIGINT) * (SELECT min(n_total) FROM counts)) // n_total AS bucket_limit
  FROM counts
)
SELECT d.source, lim.n_total,
       CAST(lim.bucket_limit AS BIGINT) AS bucket_limit,
       CAST(sum(CASE WHEN {hash_bucket_sql('doc_id', _BUCKETS)} < lim.bucket_limit
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents d JOIN lim ON d.source = lim.source
GROUP BY 1, 2, 3
"""


@register("sample_rebalance_sources", _REBALANCE_SQL, covers=("ext:text", "A-class", "J4"))
def sample_rebalance(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_total"))
    min_n = counts.agg(F.min("n_total").alias("min_n"))
    # integer bucket math (exact on both engines — no float division)
    limits = (
        counts.crossJoin(F.broadcast(min_n))
        .withColumn(
            "bucket_limit",
            F.expr(f"({_BUCKETS}L * min_n) div n_total").cast("bigint"),
        )
        .drop("min_n")
    )
    kept = F.when(hash_bucket("doc_id", _BUCKETS) < F.col("bucket_limit"), 1).otherwise(0)
    return (
        d.join(F.broadcast(limits), "source")
        .groupBy("source", "n_total", "bucket_limit")
        .agg(F.sum(kept).cast("bigint").alias("n_kept"))
    )


# ---------------------------------------------------------------------------
# Quality-percentile gate: drop the bottom decile of docs per language,
# ranked by composite quality score (deterministic doc_id tiebreak).
# ---------------------------------------------------------------------------

# percent_rank over an exact (score, doc_id) order — identical IEEE
# arithmetic on both engines, so the cut is bit-reproducible.
_GATE_SQL = """
WITH scored AS (
  SELECT lang, doc_id, quality_score,
         percent_rank() OVER (PARTITION BY lang ORDER BY quality_score, doc_id) AS pr
  FROM (
    SELECT lang, doc_id,
           {qs}
           AS quality_score
    FROM (SELECT lang, doc_id,
                 {feat}
          FROM documents) f)
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_kept, min(quality_score) AS min_kept_score
FROM scored WHERE pr >= 0.1 GROUP BY lang
"""


def _gate_sql() -> str:
    from pipeline311_spark.plans.extensions import (
        _quality_feat_cols_sql,
        _quality_score_sql,
    )

    return _GATE_SQL.format(
        feat=_quality_feat_cols_sql(),
        qs=_quality_score_sql(),
    )


@register("text_quality_percentile_gate", _gate_sql(), covers=("ext:text", "O5"))
def quality_gate(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("quality_score", "doc_id")
    scored = d.select(
        "lang", "doc_id", quality_score("text").alias("quality_score")
    ).withColumn("pr", F.percent_rank().over(w))
    return (
        scored.filter(F.col("pr") >= 0.1)
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.min("quality_score").alias("min_kept_score"),
        )
    )


# ---------------------------------------------------------------------------
# k-means UPDATE step: recompute centroids as the element-wise mean of
# each cluster's assigned vectors (pairs with q_kmeans_assign — one
# full Lloyd iteration when composed).
#
# Scale: assignment is the broadcast cross-join from q_kmeans_assign;
# the mean is posexplode → (cluster, dim) hash aggregate — k*dim output
# rows regardless of corpus size, with map-side partial aggregation
# doing almost all the work.  No driver-side collect at any point.
# ---------------------------------------------------------------------------

_SQDIST_Q = (
    "list_reduce(list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) * (p[1] - p[2])), "
    "(x, y) -> x + y)"
)

_KMEANS_UPDATE_SQL = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
cent AS (SELECT label AS c_label, v AS cv
         FROM (SELECT label, v, ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id) AS rn
               FROM e WHERE label IS NOT NULL) t WHERE rn = 1),
scored AS (SELECT e.vec_id, e.v, cent.c_label, {_SQDIST_Q.format(a='e.v', b='cent.cv')} AS sqdist
           FROM e CROSS JOIN cent),
assigned AS (SELECT vec_id, v, c_label
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sqdist, c_label) AS rn
                   FROM scored) t WHERE rn = 1),
dims AS (SELECT c_label, vec_id, u.i AS pos, v[u.i] AS val
         FROM assigned, unnest(generate_series(1, len(v))) AS u(i))
SELECT CAST(c_label AS BIGINT) AS centroid_label,
       CAST(count(DISTINCT pos) AS BIGINT) AS dim,
       CAST(CAST(sum(CAST(round(val, 6) AS DECIMAL(18,6))) AS DOUBLE)
            / count(DISTINCT vec_id) AS DOUBLE) AS centroid_sum
FROM dims GROUP BY c_label
"""


@register("q_kmeans_update", _KMEANS_UPDATE_SQL, covers=("ext:similarity", "A-class", "O5"))
def q_kmeans_update(spark, sf_dir):
    from pipeline311_spark.ext.similarity import as_double
    from pipeline311_spark.plans.analytics11 import _sqdist

    e = emb_table(spark, sf_dir).withColumn("v", as_double("embedding"))
    first = Window.partitionBy("label").orderBy("vec_id")
    cent = (
        e.filter(F.col("label").isNotNull()).withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .select(F.col("label").alias("c_label"), F.col("v").alias("cv"))
    )
    scored = e.select("vec_id", "v").crossJoin(F.broadcast(cent)).withColumn(
        "sqdist", _sqdist(F.col("v"), F.col("cv"))
    )
    nearest = Window.partitionBy("vec_id").orderBy("sqdist", "c_label")
    assigned = (
        scored.withColumn("rn", F.row_number().over(nearest))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "c_label")
    )
    dims = assigned.select("c_label", "vec_id", F.posexplode("v").alias("pos", "val"))
    # Summarize the new centroid per cluster: decimal-exact element sum,
    # then ONE double division per cluster.  (A per-dim mean + re-round
    # formulation drifted at sf0.1: Spark and DuckDB round doubles
    # differently at a boundary digit, so every extra double round is a
    # hash-mismatch hazard.  Σ_pos(Σ_vec val / n) == (Σ_pos Σ_vec val)/n
    # exactly, so folding the division to the end changes nothing
    # semantically and makes the only double op a division of
    # bit-identical operands — unique IEEE result on both engines.)
    return dims.groupBy(F.col("c_label").cast("long").alias("centroid_label")).agg(
        F.countDistinct("pos").cast("long").alias("dim"),
        (
            F.sum(F.round("val", 6).cast("decimal(18,6)")).cast("double")
            / F.countDistinct("vec_id")
        ).cast("double").alias("centroid_sum"),
    )


# ---------------------------------------------------------------------------
# Metric-anomaly detection: 3-sigma outliers per event_type.
#
# Scale: per-type stats are a tiny aggregate (one row per type)
# broadcast back onto the stream — NOT a window partitioned by
# event_type, which would shuffle the full fact table onto a handful
# of hot type-partitions.  Sums are decimal-exact so mean/std (and
# therefore the outlier cut) are bit-identical across engines.
# ---------------------------------------------------------------------------

_OUTLIER_SQL = """
WITH stats AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
         CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
  FROM events GROUP BY event_type),
st AS (
  SELECT event_type, s / n AS mean,
         sqrt(greatest(s2 / n - (s / n) * (s / n), 0)) AS std
  FROM stats)
SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_outliers,
       min(e.value) AS min_outlier, max(e.value) AS max_outlier
FROM events e JOIN st ON e.event_type = st.event_type
WHERE abs(e.value - st.mean) > 3 * st.std
GROUP BY e.event_type
"""


@register("q_event_value_outliers", _OUTLIER_SQL, covers=("A-class", "J4", "ext:text"))
def q_event_outliers(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    d2 = F.col("value").cast("decimal(18,2)")
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(d2).cast("double").alias("s"),
        F.sum(d2 * d2).cast("double").alias("s2"),
    )
    st = stats.select(
        "event_type",
        (F.col("s") / F.col("n")).alias("mean"),
        F.sqrt(
            F.greatest(
                F.col("s2") / F.col("n")
                - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n")),
                F.lit(0.0),
            )
        ).alias("std"),
    )
    return (
        ev.join(F.broadcast(st), "event_type")
        .filter(F.abs(F.col("value") - F.col("mean")) > 3 * F.col("std"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_outliers"),
            F.min("value").alias("min_outlier"),
            F.max("value").alias("max_outlier"),
        )
    )


# ---------------------------------------------------------------------------
# Iterative k-means: TWO full Lloyd rounds (assign -> update -> assign)
# chained as one plan, oracle-matched end-to-end.  The unrolled-CTE
# oracle mirrors each round exactly; the output is the round-2
# assignment census (integers — immune to the double-rounding hazards
# the update query documents).
# ---------------------------------------------------------------------------

_KMEANS_FIT_SQL = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
cent0 AS (SELECT label AS c_id, v AS cv
          FROM (SELECT label, v, ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id) AS rn
                FROM e WHERE label IS NOT NULL) t WHERE rn = 1),
a0 AS (SELECT vec_id, v, c_id
       FROM (SELECT e.vec_id, e.v, cent0.c_id,
                    ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                       ORDER BY {_SQDIST_Q.format(a='e.v', b='cent0.cv')}, cent0.c_id) AS rn
             FROM e CROSS JOIN cent0) t WHERE rn = 1),
d0 AS (SELECT c_id, u.i AS pos, v[u.i] AS val
       FROM a0, unnest(generate_series(1, len(v))) AS u(i)),
c1d AS (SELECT c_id, pos,
               CAST(sum(CAST(round(val, 6) AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS cval
        FROM d0 GROUP BY c_id, pos),
cent1 AS (SELECT c_id, list(cval ORDER BY pos) AS cv FROM c1d GROUP BY c_id),
a1 AS (SELECT vec_id, c_id
       FROM (SELECT e.vec_id, cent1.c_id,
                    ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                       ORDER BY {_SQDIST_Q.format(a='e.v', b='cent1.cv')}, cent1.c_id) AS rn
             FROM e CROSS JOIN cent1) t WHERE rn = 1)
SELECT CAST(c_id AS BIGINT) AS centroid_label,
       CAST(count(*) AS BIGINT) AS n_assigned,
       CAST(min(vec_id) AS BIGINT) AS min_vec,
       CAST(max(vec_id) AS BIGINT) AS max_vec
FROM a1 GROUP BY c_id
"""


@register("q_kmeans_fit2", _KMEANS_FIT_SQL, covers=("ext:similarity", "A-class", "O5"))
def q_kmeans_fit2(spark, sf_dir):
    """Two Lloyd rounds end-to-end (ext/similarity.kmeans_iterate):
    round-2 assignments depend on round-1's recomputed centroids, so a
    hash match here certifies the whole iterative chain — broadcast
    assignment scans, decimal-exact centroid math, deterministic tie
    breaks — not just one step."""
    from pipeline311_spark.ext.similarity import as_double, kmeans_iterate

    e = emb_table(spark, sf_dir)
    first = Window.partitionBy("label").orderBy("vec_id")
    cents = (
        e.filter(F.col("label").isNotNull())
        .withColumn("v", as_double("embedding"))
        .withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .select(F.col("label").alias("centroid_id"), F.col("v").alias("cv"))
    )
    assigned = kmeans_iterate(e, cents, "vec_id", "embedding", rounds=2)
    return assigned.groupBy(F.col("centroid_id").cast("long").alias("centroid_label")).agg(
        F.count("*").cast("long").alias("n_assigned"),
        F.min("vec_id").cast("long").alias("min_vec"),
        F.max("vec_id").cast("long").alias("max_vec"),
    )
