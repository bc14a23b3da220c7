"""Declarative data-quality expectations, evaluated in ONE pass.

The dbt-tests / Great-Expectations shape re-expressed Spark-first: a
rule list compiles to conditional-count aggregates inside a single
``agg`` — one scan, one map-side-combinable aggregation, regardless of
how many rules run — and the one-row result unpivots to a per-rule
report.  No rule-per-query rescans, no driver-side row loops.

Pass thresholds are exact rationals: a rule passes iff
``n_ok * den >= num * n_total`` — pure integer math, so the verdict is
bit-identical across engines (a float ``ratio >= 0.95`` comparison
would be an ulp hazard at the boundary).

Rule kinds:
* predicate rules (``not_null``, ``in_range``, ``matches``,
  ``accepted_values``, arbitrary ``where``) — per-row boolean counted
  with SUM(CASE);
* ``unique`` — COUNT(DISTINCT col) vs COUNT rows with the column
  present (NULLs don't participate in uniqueness, SQL semantics).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One rule: ``name``, an ``ok`` per-row predicate (None for
    ``unique_col`` rules), and the minimum passing ratio num/den."""

    name: str
    ok: Column | None = None
    unique_col: str | None = None
    num: int = 1
    den: int = 1


def not_null(col: str, num: int = 1, den: int = 1) -> Expectation:
    return Expectation(f"not_null:{col}", F.col(col).isNotNull(), None, num, den)


def in_range(col: str, lo, hi, num: int = 1, den: int = 1) -> Expectation:
    return Expectation(
        f"in_range:{col}", F.col(col).between(F.lit(lo), F.lit(hi)), None, num, den
    )


def matches(col: str, pattern: str, num: int = 1, den: int = 1) -> Expectation:
    r"""Anchor hazard: Java regex ``$`` matches BEFORE a final trailing
    newline while RE2 (DuckDB) treats it as strict end-of-string — a
    value like ``'web\n'`` passes ``...$`` on Spark and fails it on
    the oracle.  Use ``\z`` (strict end in BOTH dialects) to anchor
    cross-engine rules."""
    return Expectation(
        f"matches:{col}", F.regexp(F.col(col), F.lit(pattern)), None, num, den
    )


def accepted_values(col: str, values: tuple, num: int = 1, den: int = 1) -> Expectation:
    return Expectation(
        f"accepted:{col}", F.col(col).isin(list(values)), None, num, den
    )


def unique(col: str) -> Expectation:
    return Expectation(f"unique:{col}", None, col)


def evaluate_expectations(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """One-pass rule report: (rule, n_ok, n_total, passed) rows.

    NULL predicate results count as failures (SQL three-valued logic
    collapsed deliberately: an expectation you cannot prove holds does
    not hold).  ``passed`` is the exact-integer threshold test."""
    if not rules:
        raise ValueError("evaluate_expectations needs at least one rule")
    aggs = []
    for i, r in enumerate(rules):
        if r.unique_col is not None:
            aggs.append(F.countDistinct(r.unique_col).alias(f"ok_{i}"))
            aggs.append(
                F.count(r.unique_col).alias(f"tot_{i}")  # COUNT(col): non-NULL rows
            )
        else:
            aggs.append(
                F.coalesce(F.sum(F.when(r.ok, 1).otherwise(0)), F.lit(0)).alias(f"ok_{i}")
            )
            aggs.append(F.count("*").alias(f"tot_{i}"))
    one = df.agg(*aggs)
    report = F.array(
        *[
            F.struct(
                F.lit(r.name).alias("rule"),
                F.col(f"ok_{i}").cast("long").alias("n_ok"),
                F.col(f"tot_{i}").cast("long").alias("n_total"),
                (
                    F.col(f"ok_{i}") * F.lit(r.den) >= F.lit(r.num) * F.col(f"tot_{i}")
                )
                .cast("int")
                .alias("passed"),
            )
            for i, r in enumerate(rules)
        ]
    )
    return one.select(F.explode(report).alias("r")).select(
        "r.rule", "r.n_ok", "r.n_total", "r.passed"
    )
