"""LLM training-data curation ops, part 2: benchmark-contamination
detection (13-gram overlap) and token-budget sequence packing.

Both are core large-scale pretraining-pipeline operations the reference
has no analog for (its text handling stops at truncation/sanitization,
``common.py:112-224``); they extend the ext:text/ext:dedup family.

Scale notes (100 TB):
* contamination — the eval-set gram dictionary is tiny relative to the
  training corpus (benchmarks are MBs, corpora are TBs), so it is
  broadcast; the training side is a pure map-side explode (scan →
  generate → project) probed against the broadcast build, and the only
  shuffle is the final per-doc aggregate.  No N^2 anything.
* packing — the running token total is a window partitioned by source
  shard, so each shard packs independently and in parallel; there is
  exactly one hash-partition exchange on ``source``.  A global (single
  partition) running sum would serialize at 100 TB — never do that.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pipeline311_spark.plans.common import table
from pipeline311_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Benchmark-contamination detection: which training docs share any
# 13-gram with the held-out eval slice (source = 'src0')?
# ---------------------------------------------------------------------------

_N = 13
_EVAL_SRC = "src0"

_CONTAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, source, array_to_string(t[i:i+{_N - 1}], ' ') AS g
  FROM toks, unnest(generate_series(1, len(t) - {_N - 1})) AS u(i)
),
eval_grams AS (SELECT DISTINCT g FROM grams WHERE source = '{_EVAL_SRC}')
SELECT gr.doc_id, gr.source, CAST(count(DISTINCT gr.g) AS BIGINT) AS n_contaminated_grams
FROM grams gr JOIN eval_grams e USING (g)
WHERE gr.source <> '{_EVAL_SRC}'
GROUP BY gr.doc_id, gr.source
"""


def _grams(df):
    """13-grams per doc: map-side only (split → transform → explode).

    Deliberately NOT deduplicated here — the consumer either broadcasts
    a ``.distinct()`` of the tiny eval side or counts distinct in its
    own aggregate, so a pre-join shuffle of the full training gram
    stream would be pure waste at scale.
    """
    t = F.split(F.col("text"), " ")
    return (
        df.select("doc_id", "source", t.alias("t"))
        .filter(F.size("t") >= _N)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (_N - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, _N)),
                )
            ).alias("g"),
        )
    )


@register("text_contamination_13gram", _CONTAM_SQL, covers=("ext:text", "ext:dedup", "J4"))
def text_contamination(spark, sf_dir):
    from pipeline311_spark.ext.hashing import ensure_parallelism

    # spread compact doc rows BEFORE the 13-gram explode: a one-file
    # scan otherwise runs the explode+join single-task (at scale file
    # splits provide this and the repartition no-ops)
    d = ensure_parallelism(table(spark, sf_dir, "documents"))
    grams = _grams(d)
    eval_grams = F.broadcast(
        grams.filter(F.col("source") == _EVAL_SRC).select("g").distinct()
    )
    return (
        grams.filter(F.col("source") != _EVAL_SRC)
        .join(eval_grams, "g")
        .groupBy("doc_id", "source")
        .agg(F.count_distinct("g").cast("bigint").alias("n_contaminated_grams"))
    )


# ---------------------------------------------------------------------------
# Token-budget sequence packing: assign docs to fixed-budget context
# packs, greedy in doc_id order within each source shard.
# ---------------------------------------------------------------------------

_BUDGET = 1000

_PACK_SQL = f"""
WITH tok AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok FROM documents
),
packed AS (
  SELECT source, n_tok,
         CAST(floor((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tok) / {_BUDGET}) AS BIGINT) AS pack_id
  FROM tok
)
SELECT source, pack_id, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS pack_tokens
FROM packed GROUP BY source, pack_id
"""


@register("text_pack_sequences", _PACK_SQL, covers=("ext:text", "O5", "A-class"))
def text_pack_sequences(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = d.select("doc_id", "source", F.size(F.split("text", " ")).alias("n_tok"))
    packed = tok.withColumn(
        "pack_id",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / _BUDGET).cast("bigint"),
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("pack_tokens"),
    )


# ---------------------------------------------------------------------------
# Cross-document repeated-span removal (r9, VERDICT r8 item 2): the
# substring-level exact-dedup operator — drop every token inside an
# n-gram that occurs in >= min_df distinct docs.  The contamination
# machinery above generalized from eval-grams to corpus-grams; see
# ext/dedup.cross_doc_span_removal for the scale shape.
# ---------------------------------------------------------------------------

_SPAN_N = 13
_SPAN_MIN_DF = 2

_CROSS_SPAN_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE text IS NOT NULL
),
grams AS (
  SELECT doc_id, i, array_to_string(t[i:i+{_SPAN_N - 1}], ' ') AS g
  FROM d, unnest(generate_series(1, len(t) - {_SPAN_N - 1})) AS u(i)
),
boiler AS (
  SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= {_SPAN_MIN_DF}
),
covered AS (
  SELECT DISTINCT doc_id, p FROM (
    SELECT gr.doc_id, unnest(generate_series(gr.i, gr.i + {_SPAN_N - 1})) AS p
    FROM grams gr JOIN boiler USING (g)) c
),
toks AS (
  SELECT doc_id, i AS p, t[i] AS tok
  FROM d, unnest(generate_series(1, len(t))) AS u(i)
),
kept AS (
  SELECT tk.doc_id, tk.p, tk.tok
  FROM toks tk LEFT JOIN covered c ON c.doc_id = tk.doc_id AND c.p = tk.p
  WHERE c.doc_id IS NULL
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY p) AS cleaned
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tokens,
       CAST(len(d.t) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(a.cleaned, '') AS cleaned
FROM d LEFT JOIN agg a USING (doc_id)
"""


@register(
    "dedup_cross_doc_spans",
    _CROSS_SPAN_SQL,
    covers=("ext:dedup", "ext:text", "P4", "J3"),
)
def q_cross_doc_spans(spark, sf_dir):
    from pipeline311_spark.ext.dedup import cross_doc_span_removal

    d = table(spark, sf_dir, "documents")
    return cross_doc_span_removal(d, "doc_id", "text", n=_SPAN_N, min_df=_SPAN_MIN_DF)
