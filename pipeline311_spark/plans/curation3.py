"""Round-7 curation additions: classic BM25 retrieval scoring and the
deterministic shuffle → balanced-shard export step of a training-data
pipeline.

* ``text_bm25_topk`` — Okapi BM25 (k1=1.2, b=0.75) top-k documents for
  a fixed set of query term-sets, the lexical-retrieval complement to
  the dense ``retrieval_end_to_end`` flow (reference analogue: the
  engine's text operators feed curation the same way tf-idf does —
  plans/analytics2.py; BM25 is the production lexical ranker).

  Scale shape (r8): exactly TWO corpus passes — one map-side aggregate
  for the corpus stats (n_docs, avgdl) and one token explode that is
  filtered to the query vocabulary BEFORE the aggregation, so the only
  shuffle carries matched tokens (|matches| ≈ docs × query terms hit
  rate, never the corpus token stream).  Per-doc length rides the
  exploded rows, so scoring needs no third corpus scan, and the
  aggregated ``hits`` table is persisted so the df/idf derivation and
  the scoring join read it once (VERDICT r7 — Spark did not reuse the
  exchange, so the explode subtree genuinely ran per consumer; a
  window over (query_id, term) would avoid the persist but stragglers
  on high-df terms).  Per-term
  contributions are folded in sorted term
  order (both engines), so the floating sum is order-identical; the
  emitted columns are the RANKS and integer stats only — the ln-based
  score itself stays engine-internal, because DuckDB's ``ln`` and the
  JVM's ``Math.log`` may differ by 1 ulp and a value landing on a
  rounding boundary would flip the hashed value (ADVICE r7).

* ``export_hash_shards`` — the terminal export of a curated corpus
  into N balanced shards with a DETERMINISTIC pseudo-random order
  (portable 60-bit hash of the doc id as both the shard assigner and
  the within-shard sort key).  Re-running the export on the same
  corpus yields byte-identical shard membership and order — the
  property data-loader pipelines need for resumable/reproducible
  training.  The query writes real parquet (partitionBy(shard), one
  sorted file per shard), reads it back, and reports per-shard
  stats; the oracle computes the same assignment declaratively, so
  the write+read round trip is verified, not just executed
  (pattern: k3_merge_partitioned / k5 roundtrip, plans/sinks_q.py).

  Scale shape: ONE hash-partition exchange on the shard key with
  in-task sort (sortWithinPartitions — no global ordering barrier),
  then a file-per-shard write; at 100 TB shard count scales with the
  corpus and every stage stays embarrassingly parallel.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

from pipeline311_spark.ext.hashing import portable_hash64, portable_hash64_sql
from pipeline311_spark.ext.textstats import token_count, tokens
from pipeline311_spark.plans.common import materialize, table
from pipeline311_spark.plans.registry import register

# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10
# (query_id, term) — fixed lexical queries over the synthetic vocab
_BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (0, "spark"),
    (0, "merge"),
    (0, "vector"),
    (1, "customer"),
    (1, "join"),
)


def _bm25_sql(corpus_pred: str = "", corpus_sql: str | None = None) -> str:
    """``corpus_pred`` (e.g. ``" AND doc_id % 9 != 4"``) restricts the
    indexed corpus — the delete-maintenance twins are the FULL build
    over corpus-minus-deleted (round 10).  ``corpus_sql`` REPLACES the
    corpus source outright (must select ``doc_id, text``) — the
    update-maintenance twins (round 11) re-derive from the post-update
    corpus: original docs minus the changed ones, plus their new-id
    revised editions."""
    from pipeline311_spark.plans.extensions import _ntok_sql, _tok_array_sql

    corpus = corpus_sql or "SELECT doc_id, text FROM documents"
    qvals = ", ".join(f"({qid}, '{t}')" for qid, t in _BM25_QUERIES)
    return f"""
WITH q(query_id, term) AS (VALUES {qvals}),
corpus AS ({corpus}),
dl AS (
  SELECT doc_id, CAST({_ntok_sql()} AS BIGINT) AS dl FROM corpus
  WHERE text IS NOT NULL{corpus_pred}),
stats AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
hits AS (
  SELECT query_id, term, doc_id, COUNT(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(list_transform({_tok_array_sql()}, t -> lower(t))) AS tok
        FROM corpus WHERE text IS NOT NULL{corpus_pred}) x
  JOIN q ON x.tok = q.term
  GROUP BY query_id, term, doc_id),
df_t AS (
  SELECT query_id, term, COUNT(*)::BIGINT AS df FROM hits GROUP BY query_id, term),
contrib AS (
  SELECT h.query_id, h.doc_id, h.term, h.tf, dl.dl,
         ln(1.0 + ((SELECT n_docs FROM stats) - df.df + 0.5) / (df.df + 0.5))
         * (h.tf * {_BM25_K1 + 1.0})
         / (h.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / (SELECT avgdl FROM stats)))
         AS c
  FROM hits h JOIN df_t df ON h.query_id = df.query_id AND h.term = df.term
  JOIN dl ON h.doc_id = dl.doc_id),
scored AS (
  SELECT query_id, doc_id,
         list_reduce(list_prepend(0.0, list_transform(
             list_sort(list({{'term': term, 'c': c}})), s -> s.c)), (a, x) -> a + x) AS score,
         SUM(tf)::BIGINT AS tf_sum, MIN(dl)::BIGINT AS dl
  FROM contrib GROUP BY query_id, doc_id)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rn AS BIGINT) AS rank,
       doc_id, tf_sum, dl
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY round(score, 6) DESC, doc_id) AS rn
      FROM scored) t
WHERE rn <= {_BM25_TOPK}
"""


def bm25_scored_frame(spark, sf_dir):
    """BM25 top-k WITH the double score column (engine-internal form —
    the registry query drops the score before hashing, ADVICE r7).

    Query-local path: the corpus is tokenized per run but filtered to
    the query VOCABULARY before any shuffle — right for one-shot
    queries.  The serving path builds the stored index instead
    (ext/retrieval.py; text_bm25_from_store) and shares this scoring
    kernel (:func:`pipeline311_spark.ext.retrieval.bm25_score_topk`)."""
    from pipeline311_spark.ext.retrieval import bm25_score_topk

    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    from pipeline311_spark.ext.hashing import meta_df

    q = F.broadcast(
        meta_df(spark, list(_BM25_QUERIES), "query_id long, term string")
    )
    # corpus pass 1: map-side partial aggregate, one stats row back
    stats = d.select(token_count("text").cast("long").alias("dl")).agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    # corpus pass 2 (the last): token explode with the per-doc length
    # riding each row, filtered to the query vocabulary BEFORE the
    # groupBy — the shuffle carries matched tokens only, never the
    # corpus stream, and scoring needs no separate doc-length join
    toks = (
        d.select("doc_id", tokens("text").alias("tk"))
        .select(
            "doc_id",
            F.size("tk").cast("long").alias("dl"),
            F.explode("tk").alias("tok"),
        )
        .select("doc_id", "dl", F.lower("tok").alias("tok"))
    )
    from pipeline311_spark.ext.cache import persist_tracked

    # persisted: df/idf AND scoring read hits, and without the persist
    # the scan→explode→vocab-join→groupBy subtree executes once per
    # consumer (VERDICT r7; Spark did NOT reuse the exchange — r7
    # PLANS.md showed reused=0 here).  A window over (query_id, term)
    # would avoid the persist but is a straggler by construction: the
    # partition for a high-df query term holds one row per MATCHING
    # DOC, corpus-scale for a stopword-like term.  The persist costs a
    # constant extra stage wave locally (~0.5 s at sf0.1) and saves a
    # corpus scan at any scale.
    hits = persist_tracked(
        toks.join(q, toks["tok"] == q["term"])
        .groupBy("query_id", "term", "doc_id", "dl")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    # the df table is ≤ |queries × terms| rows: map-side-combined
    # groupBy (no skew — partials are per-task tiny), broadcast back
    df_t = hits.groupBy("query_id", "term").agg(F.count("*").cast("long").alias("df"))
    # shared scoring kernel (sorted-term fold, round(score,6) ranking,
    # doc-id tiebreak) — one definition for this path and the stored-
    # index path, so the oracle gates both identically
    return bm25_score_topk(
        hits.select("query_id", "term", "doc_id", "tf", "dl"),
        df_t,
        stats,
        k=_BM25_TOPK,
        k1=_BM25_K1,
        b=_BM25_B,
    )


@register("text_bm25_topk", _bm25_sql(),
          covers=("ext:text", "ext:similarity", "ext:retrieval", "O4"))
def q_bm25_topk(spark, sf_dir):
    # ranks + integer stats only: the ln-based double score is dropped
    # before the oracle hash (DuckDB ln vs JVM Math.log can differ by
    # 1 ulp at a rounding boundary — ADVICE r7); ordering still uses it
    return bm25_scored_frame(spark, sf_dir).select(
        "query_id", "rank", "doc_id", "tf_sum", "dl"
    )


# ---------------------------------------------------------------------------
# Deterministic shuffle → balanced shard export
# ---------------------------------------------------------------------------

_N_SHARDS = 8
_OKEY_MOD = 1_000_003  # checksum modulus: sum fits a long at any corpus size


def _shards_sql() -> str:
    h_shard = portable_hash64_sql("concat('shard:', CAST(doc_id AS VARCHAR))")
    h_order = portable_hash64_sql("concat('order:', CAST(doc_id AS VARCHAR))")
    return f"""
WITH a AS (
  SELECT doc_id,
         ({h_shard}) % {_N_SHARDS} AS shard,
         ({h_order}) AS okey,
         CAST({{ntok}} AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL)
SELECT shard, COUNT(*)::BIGINT AS n_docs,
       SUM(n_tokens)::BIGINT AS sum_tokens,
       MIN(okey)::BIGINT AS min_okey, MAX(okey)::BIGINT AS max_okey,
       SUM(okey % {_OKEY_MOD})::BIGINT AS okey_checksum
FROM a GROUP BY shard ORDER BY shard
"""


def _shards_sql_filled() -> str:
    from pipeline311_spark.plans.extensions import _ntok_sql

    return _shards_sql().replace("{ntok}", _ntok_sql())


def export_hash_shards_frame(spark, sf_dir):
    """The pre-export frame: deterministic shard + order key per doc."""
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return d.select(
        "doc_id",
        F.pmod(
            portable_hash64(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
            F.lit(_N_SHARDS),
        ).alias("shard"),
        portable_hash64(
            F.concat(F.lit("order:"), F.col("doc_id").cast("string"))
        ).alias("okey"),
        token_count("text").cast("long").alias("n_tokens"),
    )


def write_hash_shards(frame, out_dir: str) -> None:
    """ONE exchange on the shard key, in-task sort by (shard, okey) —
    no global ordering barrier — then a sorted file per shard dir."""
    (
        frame.repartition(_N_SHARDS, "shard")
        .sortWithinPartitions("shard", "okey")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )


@register(
    "export_hash_shards", _shards_sql_filled(), covers=("ext:export", "K2", "T3")
)
def q_export_hash_shards(spark, sf_dir):
    out = os.path.join(tempfile.gettempdir(), f"p311_shards_{uuid.uuid4().hex[:12]}")
    try:
        frame = export_hash_shards_frame(spark, sf_dir)
        write_hash_shards(frame, out)
        # explicit schema on read-back (review r7): an EMPTY corpus
        # writes only _SUCCESS, and schema inference over zero part
        # files raises UNABLE_TO_INFER_SCHEMA — the registry-wide
        # empty-table gate exercises exactly that
        back = spark.read.schema(frame.schema).parquet(out)
        return (
            back.groupBy(F.col("shard").cast("bigint").alias("shard"))
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("n_tokens").cast("long").alias("sum_tokens"),
                F.min("okey").cast("long").alias("min_okey"),
                F.max("okey").cast("long").alias("max_okey"),
                F.sum(F.col("okey") % _OKEY_MOD).cast("long").alias("okey_checksum"),
            )
            .orderBy("shard")
            .transform(materialize)  # materialize before the cleanup below
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------------------------------
# Flagship composition: the full RefinedWeb-style curation pipeline as
# ONE declarative plan — language filter → quality gate → exact dedup →
# 13-gram benchmark decontamination → deterministic 80% sample →
# token-budget sequence packing → balanced shard assignment.  Every
# stage is an operator that is ALSO verified standalone
# (text_quality_scores, dedup_exact_groups, text_contamination_13gram,
# sample_deterministic_20pct, text_pack_sequences, export_hash_shards);
# this query proves they COMPOSE into the production flow under the
# same oracle gate.
#
# Scale shape: filters and gram generation are scan-side; the plan's
# exchanges are (1) the dedup fingerprint window, (2) the
# decontamination anti join (eval grams broadcast into a map-side
# join; the hit-id side is AQE-sized, not force-broadcast — its
# cardinality is the corpus's contamination density), and (3) the per-
# source packing window (the two-phase bucket decomposition in
# plans/curation2.py is the documented alternative when one source
# outgrows a partition).  Sampling and shard assignment are pure row
# math.  A 100 TB corpus flows scan → filter → one hash window → anti
# join → one range-ish window → map-side shard tag.
# ---------------------------------------------------------------------------

_FP_LANGS = ("en", "de", "fr")
_FP_MIN_QS = 0.5
_FP_EVAL_SRC = "src0"
_FP_GRAM_N = 13
_FP_SAMPLE_PCT = 80
_FP_BUDGET = 1000
_FP_SHARDS = 8


def _full_pipeline_sql() -> str:
    from pipeline311_spark.ext.sampling import hash_bucket_sql
    from pipeline311_spark.plans.extensions import (
        _norm_sql,
        _quality_feat_cols_sql,
        _quality_score_sql,
    )

    langs = ", ".join(f"'{lg}'" for lg in _FP_LANGS)
    n1 = _FP_GRAM_N - 1
    h_shard = portable_hash64_sql("concat('shard:', CAST(doc_id AS VARCHAR))")
    return f"""
WITH base AS (
  SELECT doc_id, source, lang, text FROM documents
  WHERE lang IN ({langs}) AND source <> '{_FP_EVAL_SRC}'),
feat AS (
  SELECT doc_id, source, text,
         {_quality_feat_cols_sql()}
  FROM base),
scored AS (
  SELECT doc_id, source, text,
         {_quality_score_sql()}
         AS qs
  FROM feat),
kept AS (SELECT doc_id, source, text FROM scored WHERE qs >= {_FP_MIN_QS}),
dedup AS (
  SELECT doc_id, source, text FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5({_norm_sql('text')}) ORDER BY doc_id) AS rn
    FROM kept) t
  WHERE rn = 1),
eval_grams AS (
  SELECT DISTINCT array_to_string(t[i:i+{n1}], ' ') AS g
  FROM (SELECT string_split(text, ' ') AS t FROM documents
        WHERE source = '{_FP_EVAL_SRC}' AND text IS NOT NULL) x,
       unnest(generate_series(1, len(t) - {n1})) AS u(i)),
train_grams AS (
  SELECT doc_id, array_to_string(t[i:i+{n1}], ' ') AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM dedup) x,
       unnest(generate_series(1, len(t) - {n1})) AS u(i)),
contaminated AS (SELECT DISTINCT doc_id FROM train_grams JOIN eval_grams USING (g)),
clean AS (
  SELECT d.* FROM dedup d
  WHERE NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = d.doc_id)),
sampled AS (SELECT * FROM clean WHERE {hash_bucket_sql('doc_id')} < {_FP_SAMPLE_PCT}),
tok AS (SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM sampled),
packed AS (
  SELECT doc_id, source, n_tok,
         CAST(floor((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tok) / {_FP_BUDGET}) AS BIGINT) AS pack_id
  FROM tok)
SELECT doc_id, source, n_tok, pack_id,
       CAST(({h_shard}) % {_FP_SHARDS} AS BIGINT) AS shard
FROM packed
"""


def _full_pipeline_frame(spark, sf_dir, two_phase_packing: bool):
    """The flagship plan with the packing stage selectable:

    * ``two_phase_packing=False`` — per-source running-sum window (one
      shuffle partitioned by source; sort bounded by the largest single
      source).  Right while every source fits a task.
    * ``True`` — the exact bucket decomposition
      (ext/sampling.running_sum_two_phase): id-range buckets +
      broadcast offsets, n_buckets-way parallel windows.  The
      dominant-source escape hatch — at production scale switch when
      the largest source's post-sample row count outgrows what one
      task can sort (the same trigger curation2.py documents for the
      budget fill).  Both paths are gated by ONE oracle."""
    from pyspark.sql.window import Window

    from pipeline311_spark.ext.dedup import exact_dedup
    from pipeline311_spark.ext.sampling import hash_bucket
    from pipeline311_spark.ext.textstats import quality_score
    from pipeline311_spark.plans.analytics12 import _grams

    d = table(spark, sf_dir, "documents")
    base = d.filter(
        F.col("lang").isin(*_FP_LANGS) & (F.col("source") != _FP_EVAL_SRC)
    )
    kept = base.filter(quality_score("text") >= _FP_MIN_QS)
    deduped = exact_dedup(kept, "doc_id", "text")
    # decontamination: eval grams broadcast into a map-side join over
    # the (scan-side) training gram stream — that side is bounded by
    # the eval set.  The contaminated-id side is NOT bounded (its size
    # is the contamination density of the corpus), so the anti join
    # carries no broadcast hint: AQE sizes it at runtime instead of a
    # forced driver-collect that a pathologically contaminated corpus
    # could OOM (VERDICT r7)
    eval_grams = F.broadcast(
        _grams(d.filter(F.col("source") == _FP_EVAL_SRC)).select("g").distinct()
    )
    hits = _grams(deduped).join(eval_grams, "g").select("doc_id")
    clean = deduped.join(hits, "doc_id", "left_anti")
    sampled = clean.filter(hash_bucket("doc_id", 100) < _FP_SAMPLE_PCT)
    tok = sampled.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    if two_phase_packing:
        from pipeline311_spark.ext.sampling import running_sum_two_phase

        packed = running_sum_two_phase(
            tok, "source", "doc_id", "n_tok", out_col="__cum", n_buckets=8
        ).withColumn(
            "pack_id",
            F.floor((F.col("__cum") - F.col("n_tok")) / _FP_BUDGET).cast("bigint"),
        ).drop("__cum")
    else:
        w = (
            Window.partitionBy("source")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        packed = tok.withColumn(
            "pack_id",
            F.floor(
                (F.sum("n_tok").over(w) - F.col("n_tok")) / _FP_BUDGET
            ).cast("bigint"),
        )
    return packed.select(
        "doc_id",
        "source",
        "n_tok",
        "pack_id",
        F.pmod(
            portable_hash64(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
            F.lit(_FP_SHARDS),
        ).cast("bigint").alias("shard"),
    )


@register(
    "curation_full_pipeline",
    _full_pipeline_sql(),
    covers=("ext:text", "ext:dedup", "ext:sampling", "ext:export", "F1", "O5", "J4"),
)
def q_curation_full_pipeline(spark, sf_dir):
    return _full_pipeline_frame(spark, sf_dir, two_phase_packing=False)


@register(
    "curation_pipeline_pack2phase",
    _full_pipeline_sql(),
    covers=("ext:text", "ext:dedup", "ext:sampling", "ext:export", "O5"),
)
def q_curation_pipeline_pack2phase(spark, sf_dir):
    """The SAME flagship semantics under the SAME oracle, with the
    packing stage on the two-phase bucket decomposition — two
    oracle-gated plans for one spec pins the decomposition's exactness
    at every scale factor (the sample_budget_fill_scalable pattern)."""
    return _full_pipeline_frame(spark, sf_dir, two_phase_packing=True)


# ---------------------------------------------------------------------------
# Stored gram table, ARRAY form — the r7-preferred per-corpus-version
# artifact: one row per doc (doc, garr) instead of one row per gram.
# Smaller on disk, and a reload feeds BOTH the signature aggregation
# (map-side explode) and the exact-Jaccard verify (arrays semi-joined
# directly) with ZERO set-rebuild aggregation — the exploded (doc, g)
# store (dedup_minhash_from_store) must pay a collect_set exchange to
# get its verify sets back.  Same oracle as dedup_minhash_lsh: the
# storage hop must be invisible in the result.
# ---------------------------------------------------------------------------


def _minhash_from_array_store_sql() -> str:
    from pipeline311_spark.plans.extensions import _minhash_pairs_sql

    return _minhash_pairs_sql()


@register(
    "dedup_minhash_from_array_store",
    _minhash_from_array_store_sql(),
    covers=("ext:dedup", "ext:export", "K2"),
)
def q_minhash_from_array_store(spark, sf_dir):
    from pipeline311_spark.ext.dedup import _row_gram_arrays, minhash_pairs_from_grams
    from pipeline311_spark.plans.extensions import (
        _MH_BANDS,
        _MH_K,
        _MH_N,
        _MH_SEED,
        _MH_THRESHOLD,
    )

    d = table(spark, sf_dir, "documents")
    out = os.path.join(
        tempfile.gettempdir(),
        f"p311_garr_{os.path.basename(sf_dir)}_{uuid.uuid4().hex[:12]}",
    )
    try:
        frame = _row_gram_arrays(d, "doc_id", "text", _MH_N)
        frame.write.mode("overwrite").parquet(out)
        stored = spark.read.schema(frame.schema).parquet(out)
        return minhash_pairs_from_grams(
            stored.select("doc", F.explode("garr").alias("g")),
            k=_MH_K,
            bands=_MH_BANDS,
            threshold=_MH_THRESHOLD,
            seed=_MH_SEED,
            persist=False,
            gram_arrays=stored,
        ).transform(materialize)  # materialize before the cleanup
    finally:
        shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
# dense (cosine top-k) rankers — the standard production pattern for
# combining keyword and embedding search.  RRF(d) = Σ 1/(C + rank_s(d))
# over the rankers that returned d (C = 60, the conventional constant).
# The fusion math is RATIONAL (integer ranks, one double division per
# term, one fixed-order addition) — no transcendentals, so the score
# itself is bit-identical across engines and rides the oracle hash,
# unlike BM25's ln-based score which is rank-compared via rounding.
#
# Scale shape: both rankers are already bounded top-k per query, so the
# fusion operates on ≤ 2·k·|queries| rows — a full-outer join of two
# tiny frames plus a per-query window.  At 100 TB the cost lives in the
# rankers (each already scale-shaped); fusion is free.
#
# Query-id alignment: BM25 term-set ids {0, 1} pair with query vectors
# vec_id {0, 1} (the testdata convention retrieval_end_to_end
# established: embedding vec_id aligns with documents doc_id).
# ---------------------------------------------------------------------------

_RRF_C = 60
_RRF_QUERIES = 2  # fuses BM25 query ids {0,1} with query vectors {0,1}


def _hybrid_rrf_sql() -> str:
    # the dense ranker is the stored residual-IVF-PQ index's ADC top-k
    # since round 10 (VERDICT r9 item 3) — the twin reuses the ONE
    # parameterized ivfpq derivation (quantizer seeds, residual encode,
    # probe cells, per-cell LUT ranking) at this query's fan-out
    from pipeline311_spark.plans.ann_store_q import _ivfpq_sql

    return f"""
WITH lex AS (
  SELECT query_id, doc_id, rank AS lex_rank FROM ({_bm25_sql()}) b
  WHERE query_id < {_RRF_QUERIES}),
dense AS (
  SELECT query_id, neighbor_id AS doc_id, rank AS dense_rank
  FROM ({_ivfpq_sql(n_q=_RRF_QUERIES, k=_BM25_TOPK)}) iv),
fused AS (
  SELECT COALESCE(l.query_id, d.query_id) AS query_id,
         COALESCE(l.doc_id, d.doc_id) AS doc_id,
         l.lex_rank, d.dense_rank
  FROM lex l FULL OUTER JOIN dense d
    ON l.query_id = d.query_id AND l.doc_id = d.doc_id),
rrf AS (
  SELECT f.query_id, f.doc_id,
         -- absent-ranker rank renders as 0, not NULL: a NULL in an
         -- integer output column floats the whole column on the
         -- pandas/oracle side ('1.0' vs '1' — driver-strict canon).
         -- Source columns are qualified (f.) so the rrf expression can
         -- never bind to the COALESCE'd aliases of this same SELECT —
         -- an absent ranker must contribute 0, not 1/(C+0) (ADVICE r7)
         CAST(COALESCE(f.lex_rank, 0) AS BIGINT) AS lex_rank,
         CAST(COALESCE(f.dense_rank, 0) AS BIGINT) AS dense_rank,
         COALESCE((1.0::DOUBLE) / ({_RRF_C} + f.lex_rank), 0.0::DOUBLE)
         + COALESCE((1.0::DOUBLE) / ({_RRF_C} + f.dense_rank), 0.0::DOUBLE) AS rrf
  FROM fused f)
SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id, rrf, lex_rank, dense_rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf DESC, doc_id) AS rn
      FROM rrf) t
WHERE rn <= {_BM25_TOPK}
"""


@register(
    "retrieval_hybrid_rrf",
    _hybrid_rrf_sql(),
    # ext:hybrid-serve: both rankers artifact-served since r10 — its
    # own tag so the set-cover pin keeps this changed family in the
    # driver's sampled head (the VERDICT r9 nit-2 convention)
    covers=(
        "ext:similarity", "ext:text", "ext:retrieval", "ext:hybrid-serve",
        "O4", "J-class",
    ),
)
def q_retrieval_hybrid_rrf(spark, sf_dir):
    """Hybrid fusion with the lexical side served from the STORED BM25
    index (VERDICT r8 item 3: this query used to rank lexically via the
    query-local q_bm25_topk while only retrieval_rrf_recency read the
    store) — the serve plan touches postings + corpus-stats artifacts,
    never the corpus text (plan-shape asserted in
    tests/test_retrieval_store.py over :func:`hybrid_rrf_frame`)."""
    import os
    import shutil
    import tempfile
    import uuid

    out = os.path.join(tempfile.gettempdir(), f"p311_bm25h_{uuid.uuid4().hex[:12]}")
    try:
        return hybrid_rrf_frame(spark, sf_dir, out).transform(
            materialize
        )  # materialize before the store cleanup
    finally:
        shutil.rmtree(out, ignore_errors=True)


def hybrid_rrf_build(spark, sf_dir, out):
    """BUILD phase: write the BM25 artifacts under ``out`` and the
    residual-IVF-PQ store under ``out/ann``.  Split from the serve
    phase (VERDICT r10 item 4) so bench.py can time the amortizable
    per-corpus-version index build separately from the serving cost —
    the r10 hybrid headline was ~80% this build.  Returns the read-back
    BM25 index triple."""
    import os

    from pipeline311_spark.ext.ann_store import ann_index_build
    from pipeline311_spark.plans.ann_store_q import _ANN_CELLS
    from pipeline311_spark.plans.common import emb_table
    from pipeline311_spark.plans.curation4 import _PQ_K

    # function-local import: retrieval2 imports this module at top level
    from pipeline311_spark.ext.artifact import run_jobs
    from pipeline311_spark.plans.retrieval2 import _stored_index

    # the two stores are fully independent (disjoint dirs, different
    # source tables) — build them concurrently (guide §2.6, round 11)
    got: dict = {}

    def _bm25() -> None:
        got["index"] = _stored_index(spark, sf_dir, out)

    run_jobs(
        _bm25,
        lambda: ann_index_build(
            spark, emb_table(spark, sf_dir), os.path.join(out, "ann"),
            n_cells=_ANN_CELLS, pq_k=_PQ_K,
        ),
    )
    return got["index"]


def hybrid_rrf_serve(spark, sf_dir, out, index):
    """SERVE phase: lexical ranks from the stored BM25 triple, dense
    ranks from the stored residual-IVF-PQ index, fused — the plan
    touches neither corpus text nor corpus floats beyond the bounded
    query-vector collect (plan-asserted in
    tests/test_retrieval_store.py)."""
    import os

    from pipeline311_spark.ext.ann_store import ann_adc_topk_from_store
    from pipeline311_spark.ext.retrieval import bm25_topk, rrf_fuse
    from pipeline311_spark.plans.ann_store_q import _ANN_NPROBE
    from pipeline311_spark.plans.common import emb_table
    from pipeline311_spark.plans.retrieval2 import _query_frame

    lex = (
        bm25_topk(index, _query_frame(spark), k=_BM25_TOPK)
        .filter(F.col("query_id") < _RRF_QUERIES)
        .select("query_id", "doc_id", "rank")
    )
    e = emb_table(spark, sf_dir)
    qvecs = {
        r["vec_id"]: [float(x) for x in r["v"]]
        for r in e.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        .filter(F.col("vec_id") < _RRF_QUERIES)
        .collect()
    }
    dense = ann_adc_topk_from_store(
        spark, os.path.join(out, "ann"), qvecs, k=_BM25_TOPK, nprobe=_ANN_NPROBE
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    # rrf_fuse sums the per-ranker 1/(C+r) terms in FIXED ranker order
    # (lex, dense) — the same expression order as the oracle twin, so
    # the fused double is bit-identical; absent-ranker rank renders 0
    # (NULLs float integer columns on the pandas side)
    return rrf_fuse([("lex", lex), ("dense", dense)], k=_BM25_TOPK, c=_RRF_C)


def hybrid_rrf_frame(spark, sf_dir, out):
    """The fused frame pre-checkpoint: lexical ranks served from the
    BM25 store written under ``out``, dense ranks served from the
    stored residual-IVF-PQ ANN index under ``out/ann`` (VERDICT r9
    item 3 — both rankers read per-corpus-version artifacts).  Split
    out so the plan-shape test can inspect the REAL serve plan, and
    further split into build/serve halves so bench.py can time the
    phases separately (VERDICT r10 item 4)."""
    return hybrid_rrf_serve(
        spark, sf_dir, out, hybrid_rrf_build(spark, sf_dir, out)
    )
