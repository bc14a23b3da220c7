"""LLM training-data curation ops, part 4: the two *weighted* sampling
rules every mixture recipe needs on top of the uniform hash-bucket
family (analytics13's rebalance = "flatten to the smallest source"):

* **α=0.5 temperature mixing** — sample source *s* at ``sqrt(n_min /
  n_s)`` so kept sizes grow ∝ sqrt(n_s): the standard multilingual /
  multi-source flattening rule (big sources damped, small sources kept
  whole) used by virtually every multilingual LM data recipe.
* **weight-proportional Bernoulli** — keep each doc independently with
  probability ``w / max_w`` for a per-doc integer weight (quality
  score, token count): the "sample good documents more" step.

Both draws are *exact integer math* on a salted portable md5 hash of
the stable id (see ext/sampling.py): no floats, no sqrt, no division —
the squared/cross-multiplied comparison forms are evaluated in
decimal(38,0) on Spark and HUGEINT in the DuckDB oracle, so the kept
row SET is bit-identical across engines, reruns, and repartitionings.
The outputs certify that row set, not just its size: ``id_checksum``
sums the kept doc_ids, so a single membership flip fails the oracle.

Scale (100 TB): each op is one corpus scan + a tiny per-source counts
aggregate (or a single max scalar) broadcast back — the keep predicate
is a codegen'd per-row expression; no window over the corpus, no
second shuffle.  Selection is stable under incremental appends: a doc
keeps/loses membership based only on its own id and the (slowly
moving) source counts, never on scan order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline311_spark.ext.sampling import (
    temperature_keep,
    temperature_keep_sql,
    weight_bernoulli_keep,
    weight_bernoulli_keep_sql,
)
from pipeline311_spark.plans.common import table
from pipeline311_spark.plans.registry import register

# ---------------------------------------------------------------------------
# α=0.5 temperature source mixing
# ---------------------------------------------------------------------------

_TEMP_KEEP = temperature_keep_sql("d.doc_id", "lim.n_total", "lim.n_min")

_TEMPERATURE_SQL = f"""
WITH counts AS (
  SELECT source, count(*) AS n_total FROM documents GROUP BY source
),
lim AS (
  SELECT source, n_total, (SELECT min(n_total) FROM counts) AS n_min FROM counts
)
SELECT d.source, lim.n_total,
       CAST(sum(CASE WHEN {_TEMP_KEEP} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(coalesce(sum(CASE WHEN {_TEMP_KEEP} THEN d.doc_id END), 0) AS BIGINT) AS id_checksum
FROM documents d JOIN lim ON d.source = lim.source
GROUP BY 1, 2
"""


@register("sample_temperature_mixture", _TEMPERATURE_SQL, covers=("ext:text", "A-class"))
def sample_temperature_mixture(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_total"))
    n_min = counts.agg(F.min("n_total").alias("n_min"))
    lim = counts.crossJoin(F.broadcast(n_min))
    keep = temperature_keep("doc_id", "n_total", "n_min")
    return (
        d.join(F.broadcast(lim), "source")
        .groupBy("source", "n_total")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.coalesce(F.sum(F.when(keep, F.col("doc_id"))), F.lit(0))
            .cast("bigint")
            .alias("id_checksum"),
        )
    )


# ---------------------------------------------------------------------------
# Weight-proportional Bernoulli sampling (weight = n_chars here; any
# non-negative integer quality/token weight works the same)
# ---------------------------------------------------------------------------

_BERN_KEEP = weight_bernoulli_keep_sql("d.doc_id", "d.n_chars", "mx.max_w")

_BERNOULLI_SQL = f"""
WITH mx AS (SELECT max(n_chars) AS max_w FROM documents)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN {_BERN_KEEP} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(coalesce(sum(CASE WHEN {_BERN_KEEP} THEN d.doc_id END), 0) AS BIGINT) AS id_checksum,
       CAST(coalesce(sum(CASE WHEN {_BERN_KEEP} THEN d.n_chars END), 0) AS BIGINT) AS kept_chars
FROM documents d CROSS JOIN mx
GROUP BY 1
"""


_BUDGET_TOKENS = 1500

from pipeline311_spark.plans.extensions import _ntok_sql

# guarded token count (''/whitespace -> 0) — the ONE shared convention
_BUDGET_NTOK = _ntok_sql("text")

_BUDGET_SQL = f"""
WITH t AS (
  SELECT source, doc_id, {_BUDGET_NTOK} AS n_tok,
         {{hk}} AS hk
  FROM documents),
c AS (
  SELECT source, doc_id, n_tok,
         sum(n_tok) OVER (PARTITION BY source ORDER BY hk, doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM t)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs_kept,
       CAST(sum(n_tok) AS BIGINT) AS tokens_kept,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM c WHERE cum <= {_BUDGET_TOKENS}
GROUP BY source
"""


def _budget_sql() -> str:
    from pipeline311_spark.ext.hashing import portable_hash_sql

    return _BUDGET_SQL.format(hk=portable_hash_sql("CAST(doc_id AS VARCHAR)"))


@register("sample_token_budget_fill", _budget_sql(), covers=("ext:text", "A-class"))
def sample_token_budget_fill(spark, sf_dir):
    """Quota fill: take documents per source in a deterministic uniform
    order (portable hash of the stable id, id tiebreak) until the
    per-source token budget is exhausted — "fill a 1B-token mixture
    slice from each source", the last selection step before sequence
    packing.  A doc is kept iff its INCLUSIVE running token sum fits
    the budget, so the kept set is a fixed prefix of a deterministic
    permutation: stable across reruns, repartitionings, engines, and
    incremental appends (appended docs land at their hash position and
    can only displace docs behind them, exactly like a re-run).

    Scale: the running sum needs a per-source total order — one shuffle
    partitioned by source, sort bounded by the largest single source.
    For a source too large to sort in one partition, use the two-phase
    decomposition (ext/sampling.token_budget_fill_two_phase, oracle-
    gated as ``sample_budget_fill_scalable`` with this query's exact
    SQL): hash-range buckets + per-bucket prefix sums via a broadcast
    cumulative offset table — the surrogate-id trick
    (operators/merge.py) — with budget-exceeding buckets dropped
    before their per-doc window ever runs."""
    from pyspark.sql import Window

    from pipeline311_spark.ext.hashing import portable_hash
    from pipeline311_spark.ext.textstats import token_count

    d = table(spark, sf_dir, "documents")
    t = d.select(
        "source",
        "doc_id",
        token_count("text").alias("n_tok"),
        portable_hash(F.col("doc_id").cast("string")).alias("hk"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("hk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tok").over(w))
    return (
        c.filter(F.col("cum") <= _BUDGET_TOKENS)
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs_kept"),
            F.sum("n_tok").cast("bigint").alias("tokens_kept"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
    )


@register("sample_budget_fill_scalable", _budget_sql(), covers=("ext:text", "A-class"))
def sample_budget_fill_scalable(spark, sf_dir):
    """The SAME quota-fill semantics under the SAME DuckDB oracle, via
    the two-phase decomposition that survives a source larger than a
    partition (ext/sampling.token_budget_fill_two_phase): range-bucket
    by hash key, per-bucket token totals, broadcast exclusive offsets,
    nb-way-parallel within-bucket running sums.  Two oracle-gated
    plans for one spec pins the exactness of the decomposition at
    every scale factor, not just under the property test."""
    from pipeline311_spark.ext.sampling import token_budget_fill_two_phase
    from pipeline311_spark.ext.textstats import token_count

    d = table(spark, sf_dir, "documents")
    t = d.select("source", "doc_id", token_count("text").alias("n_tok"))
    kept = token_budget_fill_two_phase(
        t, "source", "doc_id", "n_tok", _BUDGET_TOKENS, n_buckets=8
    )
    return kept.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs_kept"),
        F.sum("n_tok").cast("bigint").alias("tokens_kept"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
    )


@register("sample_weight_bernoulli", _BERNOULLI_SQL, covers=("ext:text", "A-class"))
def sample_weight_bernoulli(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    mx = d.agg(F.max("n_chars").alias("max_w"))
    keep = weight_bernoulli_keep("doc_id", "n_chars", "max_w")
    return (
        d.crossJoin(F.broadcast(mx))
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_total"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.coalesce(F.sum(F.when(keep, F.col("doc_id"))), F.lit(0))
            .cast("bigint")
            .alias("id_checksum"),
            F.coalesce(F.sum(F.when(keep, F.col("n_chars"))), F.lit(0))
            .cast("bigint")
            .alias("kept_chars"),
        )
    )
