"""LLM training-data curation ops, part 3 (r5): Bloom-gated benchmark
decontamination and dup-cluster-safe train/test splitting.

Both extend the ext:text/ext:dedup family beyond the reference (whose
text handling stops at truncation/sanitization, ``common.py:112-224``)
with the two guarantees a pretraining pipeline actually publishes:
"no eval gram appears in training data" and "no near-duplicate pair
straddles a split".

Scale notes (100 TB):
* Bloom decontamination — the exact-join formulation
  (``text_contamination_13gram``) broadcasts the full distinct eval
  gram set; at real benchmark-suite scale that set is GBs of strings.
  Here it is compressed to an ``auto_m_bits``-sized bit array (~10
  bits/gram, MBs) probed MAP-SIDE on the training gram stream, so the
  corpus grams never shuffle and never meet a join; only Bloom
  maybe-hits (true hits + ~1% false positives) reach the exact verify
  join that makes the output EXACT — same rows as the plain formulation
  (and the same DuckDB oracle), by construction.
* Cluster-safe split — assignment hashes the dup-CLUSTER id (the
  member's own id for unclustered docs), so every near-dup clique lands
  in one split: the leakage ``dedup_cross_split_leakage`` measures is
  zero by construction.  The cluster table is members-only (tiny
  relative to the corpus) and broadcasts; the corpus takes one scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline311_spark.ext.dedup import ngram_jaccard_pairs
from pipeline311_spark.ext.graph import dup_clusters
from pipeline311_spark.ext.sampling import hash_bucket, hash_bucket_sql
from pipeline311_spark.operators.bloom import auto_m_bits, bloom_build, bloom_might_contain
from pipeline311_spark.plans.analytics3 import _REACH_PREFIX
from pipeline311_spark.plans.analytics12 import _CONTAM_SQL, _EVAL_SRC, _grams
from pipeline311_spark.plans.common import table
from pipeline311_spark.plans.extensions import (
    _JACCARD_MAX_DF,
    _JACCARD_N,
    _JACCARD_THRESHOLD,
)
from pipeline311_spark.plans.registry import register


# ---------------------------------------------------------------------------
# Bloom-gated contamination: identical output to the exact join (the
# oracle IS the exact formulation), different physics.
# ---------------------------------------------------------------------------


@register("text_contamination_bloom", _CONTAM_SQL, covers=("ext:text", "ext:dedup", "J3", "J4"))
def text_contamination_bloom(spark, sf_dir):
    """Benchmark decontamination with a Bloom pre-gate: eval grams →
    auto-sized bit array (broadcast, MBs at benchmark-suite scale) →
    map-side probe of the training gram stream → exact verify join of
    the surviving maybe-hits.  False positives are removed by the
    verify join and false negatives are impossible, so the output is
    row-identical to ``text_contamination_13gram``."""
    from pipeline311_spark.ext.cache import persist_tracked
    from pipeline311_spark.ext.hashing import ensure_parallelism

    d = ensure_parallelism(table(spark, sf_dir, "documents"))
    grams = _grams(d)
    # tiny distinct eval set, persisted once: feeds the cardinality
    # sizing, the filter build, and the exact verify join
    eval_grams = persist_tracked(
        grams.filter(F.col("source") == _EVAL_SRC).select("g").distinct()
    )
    m_bits = auto_m_bits(eval_grams, "g")
    bloom = bloom_build(eval_grams, "g", m_bits)
    train = grams.filter(F.col("source") != _EVAL_SRC)
    maybe = (
        bloom_might_contain(train, "g", bloom, m_bits)
        .filter(F.col("__maybe"))
        .drop("__maybe")
    )
    return (
        maybe.join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id", "source")
        .agg(F.count_distinct("g").cast("bigint").alias("n_contaminated_grams"))
    )


# ---------------------------------------------------------------------------
# Dup-cluster-safe split: near-dup cliques never straddle splits.
# ---------------------------------------------------------------------------

_KEY = "COALESCE(c.cluster, d.doc_id)"

_SPLIT_CLUSTER_SQL = f"""{_REACH_PREFIX},
clusters AS (SELECT node, MIN(r) AS cluster FROM reach GROUP BY node)
SELECT CASE WHEN {hash_bucket_sql(_KEY)} < 80 THEN 'train'
            WHEN {hash_bucket_sql(_KEY)} < 90 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT {_KEY}) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN c.node IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clustered
FROM documents d LEFT JOIN clusters c ON d.doc_id = c.node
GROUP BY 1
"""


@register("sample_split_cluster_safe", _SPLIT_CLUSTER_SQL, covers=("ext:text", "ext:dedup"))
def q_split_cluster_safe(spark, sf_dir):
    """Train/val/test assignment hashed on the dup-cluster id (n-gram
    Jaccard pairs → connected components; unclustered docs hash their
    own id): a plain per-doc hash split leaks near-duplicates across
    the boundary — this one cannot, by construction."""
    d = table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        d, "doc_id", "text", n=_JACCARD_N, threshold=_JACCARD_THRESHOLD, max_df=_JACCARD_MAX_DF
    ).select("doc_a", "doc_b")
    clusters = dup_clusters(pairs).select(F.col("doc_id").alias("__cd"), "cluster")
    joined = d.select("doc_id").join(
        F.broadcast(clusters), F.col("doc_id") == F.col("__cd"), "left"
    )
    key = F.coalesce(F.col("cluster"), F.col("doc_id"))
    b = hash_bucket(key)
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    return (
        joined.select(split.alias("split"), key.alias("__k"), F.col("__cd").isNotNull().alias("__m"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("__k").alias("n_groups"),
            F.sum(F.col("__m").cast("int")).cast("bigint").alias("n_clustered"),
        )
    )
