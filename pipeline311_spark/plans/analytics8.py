"""Eighth batch: deterministic sampling / train-test split and int8
embedding quantization."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline311_spark.ext.quantize import quantized_cosine_error
from pipeline311_spark.ext.hashing import portable_hash_sql
from pipeline311_spark.ext.sampling import (
    cap_per_key,
    deterministic_sample,
    hash_bucket_sql,
    train_test_split,
)
from pipeline311_spark.plans.common import emb_table, table
from pipeline311_spark.plans.registry import register

_SAMPLE_SQL = f"""
SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS min_doc
FROM documents
WHERE {hash_bucket_sql('doc_id')} < 20
GROUP BY lang
"""


@register("sample_deterministic_20pct", _SAMPLE_SQL, covers=("ext:text", "F1"))
def q_sample(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    s = deterministic_sample(d, "doc_id", pct=20)
    return s.groupBy("lang").agg(
        F.count("*").alias("n_sampled"), F.min("doc_id").alias("min_doc")
    )


_SPLIT_SQL = f"""
SELECT CASE WHEN {hash_bucket_sql('doc_id')} < 80 THEN 'train'
            WHEN {hash_bucket_sql('doc_id')} < 90 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1
"""


@register("sample_train_test_split", _SPLIT_SQL, covers=("ext:text",))
def q_split(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    s = train_test_split(d, "doc_id")
    return s.groupBy("split").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


_CAP_N = 15

_CAP_SQL = f"""
SELECT doc_id, source, keep_rank
FROM (SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {portable_hash_sql('CAST(doc_id AS VARCHAR)')}, doc_id
             ) AS keep_rank
      FROM documents)
WHERE keep_rank <= {_CAP_N}
"""


@register("sample_cap_per_source", _CAP_SQL, covers=("ext:text", "O5"))
def q_cap_per_source(spark, sf_dir):
    """Per-source document cap — the anti-hot-domain quota (reference
    has no analogue; training-data curation north star).  WindowGroupLimit
    pre-trims map-side, so hot sources never ship their full row count."""
    d = table(spark, sf_dir, "documents")
    capped = cap_per_key(d, "source", "doc_id", cap=_CAP_N)
    return capped.select("doc_id", "source", F.col("keep_rank").cast("long").alias("keep_rank"))


_DOT_Q = "list_reduce(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]), (x, y) -> x + y)"
_NORM_Q = "sqrt(list_reduce(list_transform({a}, x -> x * x), (x, y) -> x + y))"

_QUANT_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
q AS (
  SELECT vec_id, v,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
              THEN list_max(list_transform(v, x -> abs(x))) / 127.0
              ELSE 1.0 END AS scale
  FROM e),
d AS (
  SELECT vec_id, v, scale,
         list_transform(v, x -> CAST(round(x / scale, 0) AS INTEGER) * scale) AS deq
  FROM q)
SELECT vec_id,
       {_DOT_Q.format(a='v', b='deq')} / ({_NORM_Q.format(a='v')} * {_NORM_Q.format(a='deq')}) AS cos_full_vs_dequant,
       scale,
       CAST(len(v) AS INTEGER) AS dim
FROM d
"""


@register("emb_quantize_int8", _QUANT_SQL,
          covers=("ext:similarity", "ext:quantize", "ext:multimodal"))
def q_quantize(spark, sf_dir):
    e = emb_table(spark, sf_dir)
    return quantized_cosine_error(e, "vec_id", "embedding")
