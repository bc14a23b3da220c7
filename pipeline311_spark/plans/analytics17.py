"""Sorted-neighborhood dedup (Hernández & Stolfo's classic
record-linkage blocking method) — the third candidate-generation
family next to MinHash-LSH (hash buckets) and SimHash (bit bands):
sort records by a normalized blocking key, slide a fixed window, and
verify only pairs that fall within the window.

Shape here is the scalable *blocked* variant: records partition by the
key's leading character (block), the window slides within each block
(``lead`` over a block-partitioned sort — parallel across blocks, no
global single-partition sort), and candidate pairs are verified with
exact token-set Jaccard.  Pairs whose keys differ in the first
character are deliberately out of reach — the classic blocking recall
tradeoff, mitigated in practice by multi-pass SNM with different keys
(run the query again with another key expression).

Scale: one range-ish shuffle on (block) + per-block sort bounded by
block size; the window fan-out is the constant ``_SNM_W - 1`` leads
per row, so candidate volume is ≤ (w−1)·n regardless of dup density —
the property that makes SNM attractive when hash-family bucket caps
would drop recall.  Cross-engine determinism: ASCII/BMP key ordering
agrees between Spark (UTF-16 code units) and DuckDB (UTF-8 bytes),
ties break on doc_id, and the Jaccard is integer set math with one
final double division.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pipeline311_spark.ext.textstats import normalize_text, tokens
from pipeline311_spark.plans.common import table
from pipeline311_spark.plans.extensions import _norm_sql
from pipeline311_spark.plans.registry import register

_SNM_W = 4  # window size: each record pairs with the next w-1 in key order
_SNM_THRESHOLD = 0.3
_SNM_KEYLEN = 60


def _snm_sql() -> str:
    arms = "\n  UNION ALL ".join(
        f"SELECT doc_id AS doc_a, tk AS tk_a, "
        f"lead(doc_id, {i}) OVER w{i} AS doc_b, lead(tk, {i}) OVER w{i} AS tk_b "
        f"FROM keyed WINDOW w{i} AS (PARTITION BY block ORDER BY nk, doc_id)"
        for i in range(1, _SNM_W)
    )
    return f"""
WITH norm AS (
  SELECT doc_id, {_norm_sql('text')} AS nt FROM documents),
keyed AS (
  SELECT doc_id, substring(nt, 1, {_SNM_KEYLEN}) AS nk,
         substring(nt, 1, 1) AS block,
         list_distinct(string_split(nt, ' ')) AS tk
  FROM norm WHERE nt <> ''),
cand AS (
  {arms}),
scored AS (
  SELECT doc_a, doc_b,
         len(list_filter(tk_a, t -> list_contains(tk_b, t))) AS inter,
         len(tk_a) AS sz_a, len(tk_b) AS sz_b
  FROM cand WHERE doc_b IS NOT NULL)
SELECT CAST(least(doc_a, doc_b) AS BIGINT) AS doc_a,
       CAST(greatest(doc_a, doc_b) AS BIGINT) AS doc_b,
       CAST(inter AS DOUBLE) / (sz_a + sz_b - inter) AS jaccard
FROM scored
WHERE CAST(inter AS DOUBLE) / (sz_a + sz_b - inter) >= {_SNM_THRESHOLD}
"""


def _snm_multipass_sql() -> str:
    def arms(key_expr: str, tag: str) -> str:
        return "\n  UNION ALL ".join(
            f"SELECT doc_id AS doc_a, "
            f"lead(doc_id, {i}) OVER {tag}{i} AS doc_b "
            f"FROM keyed WINDOW {tag}{i} AS (PARTITION BY substring({key_expr}, 1, 1) "
            f"ORDER BY {key_expr}, doc_id)"
            for i in range(1, _SNM_W)
        )

    return f"""
WITH norm AS (
  SELECT doc_id, {_norm_sql('text')} AS nt FROM documents),
keyed AS (
  SELECT doc_id, substring(nt, 1, {_SNM_KEYLEN}) AS nk,
         substring(reverse(nt), 1, {_SNM_KEYLEN}) AS rk,
         list_distinct(string_split(nt, ' ')) AS tk
  FROM norm WHERE nt <> ''),
cand AS (
  SELECT DISTINCT least(doc_a, doc_b) AS doc_a, greatest(doc_a, doc_b) AS doc_b
  FROM (
    {arms('nk', 'f')}
  UNION ALL {arms('rk', 'r')}
  ) t WHERE doc_b IS NOT NULL),
scored AS (
  SELECT c.doc_a, c.doc_b,
         len(list_filter(a.tk, t -> list_contains(b.tk, t))) AS inter,
         len(a.tk) AS sz_a, len(b.tk) AS sz_b
  FROM cand c JOIN keyed a ON a.doc_id = c.doc_a JOIN keyed b ON b.doc_id = c.doc_b)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       CAST(inter AS DOUBLE) / (sz_a + sz_b - inter) AS jaccard
FROM scored
WHERE CAST(inter AS DOUBLE) / (sz_a + sz_b - inter) >= {_SNM_THRESHOLD}
"""


@register("dedup_snm_multipass", _snm_multipass_sql(), covers=("ext:dedup", "O5"))
def dedup_snm_multipass(spark, sf_dir):
    """Multi-pass sorted neighborhood — the standard recall mitigation
    the single-pass docstring prescribes, as checked code: pass 1 keys
    on the normalized prefix, pass 2 on the REVERSED text (catches
    near-dups that differ at the start), candidate pairs are unioned
    and deduped BEFORE the one exact-Jaccard verify.

    Scale: two block-partitioned window passes over the same keyed
    scan + one pair-level distinct (bounded by (w−1)·n·passes) + two
    narrow joins back to the token sets — still no hash-bucket caps
    anywhere, the SNM recall/cost signature."""
    d = table(spark, sf_dir, "documents")
    nt = normalize_text("text")
    keyed = (
        d.select(
            "doc_id",
            F.substring(nt, 1, _SNM_KEYLEN).alias("nk"),
            F.substring(F.reverse(nt), 1, _SNM_KEYLEN).alias("rk"),
            F.array_distinct(tokens(nt)).alias("tk"),
        )
        .filter(F.size("tk") > 0)
    )

    def pass_pairs(key_col: str):
        w = Window.partitionBy(F.substring(F.col(key_col), 1, 1)).orderBy(
            key_col, "doc_id"
        )
        return [
            keyed.select(
                F.col("doc_id").alias("doc_a"),
                F.lead("doc_id", i).over(w).alias("doc_b"),
            )
            for i in range(1, _SNM_W)
        ]

    arms = pass_pairs("nk") + pass_pairs("rk")
    cand = arms[0]
    for a in arms[1:]:
        cand = cand.unionByName(a)
    cand = (
        cand.filter(F.col("doc_b").isNotNull())
        .select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
        )
        .distinct()
    )
    a = keyed.select(F.col("doc_id").alias("doc_a"), F.col("tk").alias("tk_a"))
    b = keyed.select(F.col("doc_id").alias("doc_b"), F.col("tk").alias("tk_b"))
    scored = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("tk_a", "tk_b")).alias("inter"),
            F.size("tk_a").alias("sz_a"),
            F.size("tk_b").alias("sz_b"),
        )
    )
    jac = F.col("inter").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("inter")
    )
    return scored.filter(jac >= _SNM_THRESHOLD).select(
        F.col("doc_a").cast("long"), F.col("doc_b").cast("long"), jac.alias("jaccard")
    )


@register("dedup_sorted_neighborhood", _snm_sql(), covers=("ext:dedup", "O5"))
def dedup_sorted_neighborhood(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    nt = normalize_text("text")
    keyed = (
        d.select(
            "doc_id",
            F.substring(nt, 1, _SNM_KEYLEN).alias("nk"),
            F.substring(nt, 1, 1).alias("block"),
            F.array_distinct(tokens(nt)).alias("tk"),
        )
        .filter(F.size("tk") > 0)
    )
    w = Window.partitionBy("block").orderBy("nk", "doc_id")
    arms = [
        keyed.select(
            F.col("doc_id").alias("doc_a"),
            F.col("tk").alias("tk_a"),
            F.lead("doc_id", i).over(w).alias("doc_b"),
            F.lead("tk", i).over(w).alias("tk_b"),
        )
        for i in range(1, _SNM_W)
    ]
    cand = arms[0]
    for a in arms[1:]:
        cand = cand.unionByName(a)
    scored = cand.filter(F.col("doc_b").isNotNull()).select(
        "doc_a",
        "doc_b",
        F.size(F.array_intersect("tk_a", "tk_b")).alias("inter"),
        F.size("tk_a").alias("sz_a"),
        F.size("tk_b").alias("sz_b"),
    )
    jac = F.col("inter").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("inter")
    )
    return scored.filter(jac >= _SNM_THRESHOLD).select(
        F.least("doc_a", "doc_b").cast("long").alias("doc_a"),
        F.greatest("doc_a", "doc_b").cast("long").alias("doc_b"),
        jac.alias("jaccard"),
    )
