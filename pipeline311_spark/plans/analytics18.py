"""Declarative data-quality expectations as a registry query: the
dbt-tests / Great-Expectations pattern over the documents table — a
rule LIST compiled into ONE aggregation pass (see ext/expectations.py)
whose per-rule verdicts are exact-integer threshold tests, so the
DuckDB twin hash-matches verdict-for-verdict.

Scale: however many rules run, the cost is one corpus scan + one
map-side-combinable aggregate (plus one COUNT DISTINCT per unique
rule, which shares the same shuffle); the report is rule-count rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline311_spark.ext.expectations import (
    accepted_values,
    evaluate_expectations,
    in_range,
    matches,
    not_null,
    unique,
)
from pipeline311_spark.plans.common import table
from pipeline311_spark.plans.registry import register

_LANGS = ("en", "es", "de", "fr", "zh")

_RULES_SQL = """
WITH s AS (
  SELECT
    count(*) AS n_rows,
    coalesce(sum(CASE WHEN text IS NOT NULL THEN 1 ELSE 0 END), 0) AS ok_text,
    coalesce(sum(CASE WHEN doc_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS ok_id,
    count(DISTINCT doc_id) AS uniq_id,
    count(doc_id) AS n_id,
    coalesce(sum(CASE WHEN n_chars BETWEEN 0 AND 100000 THEN 1 ELSE 0 END), 0) AS ok_chars,
    coalesce(sum(CASE WHEN lang IN ('en', 'es', 'de', 'fr', 'zh') THEN 1 ELSE 0 END), 0) AS ok_lang,
    coalesce(sum(CASE WHEN regexp_matches(source, '^[a-z][a-z0-9_]*\\z') THEN 1 ELSE 0 END), 0) AS ok_src
  FROM documents),
rules AS (
  SELECT 'not_null:text' AS rule, ok_text AS n_ok, n_rows AS n_total, 9 AS num, 10 AS den FROM s
  UNION ALL SELECT 'not_null:doc_id', ok_id, n_rows, 1, 1 FROM s
  UNION ALL SELECT 'unique:doc_id', uniq_id, n_id, 1, 1 FROM s
  UNION ALL SELECT 'in_range:n_chars', ok_chars, n_rows, 1, 1 FROM s
  UNION ALL SELECT 'accepted:lang', ok_lang, n_rows, 19, 20 FROM s
  UNION ALL SELECT 'matches:source', ok_src, n_rows, 1, 1 FROM s)
SELECT rule,
       CAST(n_ok AS BIGINT) AS n_ok,
       CAST(n_total AS BIGINT) AS n_total,
       CAST(CASE WHEN n_ok * den >= num * n_total THEN 1 ELSE 0 END AS INTEGER) AS passed
FROM rules
"""


@register("audit_expectations", _RULES_SQL, covers=("A-class", "A6", "S6"))
def audit_expectations(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    rules = [
        not_null("text", 9, 10),
        not_null("doc_id", 1, 1),
        unique("doc_id"),
        in_range("n_chars", 0, 100000),
        accepted_values("lang", _LANGS, 19, 20),
        matches("source", r"^[a-z][a-z0-9_]*\z"),
    ]
    return evaluate_expectations(d, rules)
