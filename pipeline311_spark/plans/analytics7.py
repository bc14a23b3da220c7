"""Seventh batch: repeated-span detection (cross-doc duplicate text),
PII redaction, and decimal-exact correlation."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline311_spark.ext.dedup import _shingle_table
from pipeline311_spark.plans.common import dec, table
from pipeline311_spark.plans.extensions import _shingle_cte
from pipeline311_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Repeated text spans: word 12-grams occurring in more than one doc —
# the cheap first pass of substring-level dedup (dup span report).
# ---------------------------------------------------------------------------

_SPAN_N = 12

_SPANS_SQL = f"""
WITH {_shingle_cte(_SPAN_N)}
SELECT shingle AS span, COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS first_doc
FROM sh GROUP BY shingle HAVING COUNT(DISTINCT doc_id) > 1
"""


@register("dedup_repeated_spans", _SPANS_SQL, covers=("ext:dedup", "ext:text"))
def q_repeated_spans(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    sh = _shingle_table(d, "doc_id", "text", _SPAN_N)
    return (
        sh.groupBy(F.col("shingle").alias("span"))
        .agg(F.countDistinct("doc").alias("n_docs"), F.min("doc").alias("first_doc"))
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# Within-doc repetition metrics (Gopher-filter family): top-token /
# top-bigram fraction, duplicate-trigram fraction.
# ---------------------------------------------------------------------------

_REP_SQL = """
WITH norm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt FROM documents),
toks AS (SELECT doc_id, CASE WHEN nt = '' THEN [] ELSE string_split(nt, ' ') END AS tk FROM norm),
ns AS (SELECT unnest([1, 2, 3]) AS n),
g AS (
  SELECT doc_id, n, unnest(
    CASE WHEN len(tk) >= n
         THEN list_transform(range(1, len(tk) - n + 2),
                             i -> array_to_string(list_slice(tk, i, i + n - 1), ' '))
         ELSE [] END) AS g
  FROM toks CROSS JOIN ns),
counts AS (SELECT doc_id, n, g, COUNT(*) AS c FROM g GROUP BY 1, 2, 3),
per_n AS (
  SELECT doc_id, n, SUM(c) AS total, MAX(c) AS mx,
         COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS dup
  FROM counts GROUP BY 1, 2)
SELECT doc_id,
       CAST(MAX(CASE WHEN n = 1 THEN total END) AS BIGINT) AS n_tokens,
       MAX(CASE WHEN n = 1 THEN mx / total END) AS top_token_frac,
       MAX(CASE WHEN n = 2 THEN mx / total END) AS top_bigram_frac,
       MAX(CASE WHEN n = 3 THEN dup / total END) AS dup_trigram_frac
FROM per_n GROUP BY doc_id
"""


@register("text_repetition_scores", _REP_SQL, covers=("ext:text", "ext:dedup"))
def q_repetition_scores(spark, sf_dir):
    """Gopher-style within-doc repetition signals (Rae et al. 2021
    §A1.1 adapted to newline-free docs): high top-gram fractions flag
    keyword-stuffed / looping text for the quality gate."""
    from pipeline311_spark.ext.textstats import repetition_metrics

    d = table(spark, sf_dir, "documents")
    return repetition_metrics(d, "doc_id", "text")


# ---------------------------------------------------------------------------
# PII redaction: emails / US-phone-shaped tokens scrubbed with RE2-safe
# patterns (no lookaround).  Dirty values are injected deterministically
# so the redaction paths actually fire.
# ---------------------------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"

_PII_SQL = f"""
WITH dirty AS (
  -- || (not concat) so a NULL text stays NULL, matching Spark's concat
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text || ' contact: user' || CAST(doc_id AS VARCHAR) || '@example.com'
              WHEN doc_id % 3 = 1 THEN text || ' call 215-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE text END AS text
  FROM documents)
SELECT doc_id,
       length(text) - length(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'), '{_PHONE_RE}', '[PHONE]', 'g')) AS redacted_delta,
       CAST(regexp_matches(text, '{_EMAIL_RE}') AS INTEGER) AS has_email,
       CAST(regexp_matches(text, '{_PHONE_RE}') AS INTEGER) AS has_phone,
       substring(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'), '{_PHONE_RE}', '[PHONE]', 'g'), -40) AS tail_redacted
FROM dirty
"""


@register("text_pii_redaction", _PII_SQL, covers=("ext:text", "P3", "P13"))
def q_pii(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    dirty = d.select(
        "doc_id",
        F.when(
            did % 3 == 0,
            F.concat(F.col("text"), F.lit(" contact: user"), did.cast("string"), F.lit("@example.com")),
        )
        .when(
            did % 3 == 1,
            F.concat(
                F.col("text"),
                F.lit(" call 215-555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    return dirty.select(
        "doc_id",
        (F.length("text") - F.length(redacted)).alias("redacted_delta"),
        F.regexp("text", F.lit(_EMAIL_RE)).cast("int").alias("has_email"),
        F.regexp("text", F.lit(_PHONE_RE)).cast("int").alias("has_phone"),
        F.substring(redacted, -40, 40).alias("tail_redacted"),
    )


# ---------------------------------------------------------------------------
# Decimal-exact Pearson correlation: all sums exact (value has 2
# decimals, k is integer), final formula deterministic IEEE — unlike
# the builtin corr() whose double accumulation is order-dependent.
# ---------------------------------------------------------------------------

_CORR_SQL = """
WITH x AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) AS cx,
         CAST(nullif(regexp_extract(props, '"k": ([0-9]+)', 1), '') AS HUGEINT) AS k
  FROM events
  WHERE value IS NOT NULL AND nullif(regexp_extract(props, '"k": ([0-9]+)', 1), '') IS NOT NULL),
s AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(cx) AS sx, SUM(k) AS sy,
         SUM(cx * cx) AS sxx, SUM(k * k) AS syy, SUM(cx * k) AS sxy
  FROM x GROUP BY event_type)
SELECT event_type, n,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0) AS pearson_r
FROM s
"""


@register("q_exact_pearson", _CORR_SQL, covers=("A-class",))
def q_pearson(spark, sf_dir):
    return q_pearson_rows(table(spark, sf_dir, "events"))


def q_pearson_rows(e):
    """Decimal-exact Pearson kernel over an arbitrary
    (event_type, value, props) table — split out so the sums-then-one-
    float-formula recipe is testable against exact Python arithmetic."""
    # Pearson is scale-invariant, so x rides as integer CENTS: every
    # sum/product/radicand below is EXACT integer arithmetic in
    # decimal(38,0) (DuckDB: HUGEINT — both exact, so both engines
    # cast the SAME integers to double and the final float formula is
    # bit-identical; mixed decimal-width pipelines drifted 1 ulp at
    # sf0.1).  Cauchy-Schwarz then guarantees n*sxx - sx^2 >= 0
    # EXACTLY — sqrt can never see a rounding-negative radicand (NaN),
    # and a zero-variance group is exactly 0 -> divisor 0 ->
    # try_divide -> NULL.  The previous plain `/` CRASHED the whole
    # query under Spark 4 ANSI (DIVIDE_BY_ZERO) on constant groups —
    # found by the Python ground-truth property test; the production
    # events never have constant groups, so the oracle gate alone
    # could not surface it.
    cx = (dec("value") * 100).cast("decimal(38,0)")
    # pairwise deletion: rows missing either variable are excluded, and
    # the non-matching-regexp '' is nullif'd before the ANSI cast (a
    # malformed-props row previously CRASHED the query — hostile gate)
    k = F.nullif(F.regexp_extract("props", r'"k": ([0-9]+)', 1), F.lit("")).cast(
        "decimal(38,0)"
    )
    x = e.select("event_type", cx.alias("cx"), k.alias("k")).filter(
        F.col("cx").isNotNull() & F.col("k").isNotNull()
    )
    s = x.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cx").alias("sx"),
        F.sum("k").alias("sy"),
        F.sum(F.col("cx") * F.col("cx")).alias("sxx"),
        F.sum(F.col("k") * F.col("k")).alias("syy"),
        F.sum(F.col("cx") * F.col("k")).alias("sxy"),
    )
    n = F.col("n")
    r = F.try_divide(
        (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double"),
        F.sqrt((n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
        * F.sqrt((n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")),
    )
    return s.select("event_type", "n", r.alias("pearson_r"))
