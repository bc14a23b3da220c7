"""The query registry — single source of truth for ``__spark_entry__``.

Each :class:`QuerySpec` pairs a Spark callable with its ANSI-SQL oracle
twin (run by the driver through DuckDB on the same parquet).  Specs with
``oracle=None`` are genuinely non-SQL-expressible (streaming/stateful or
UDF-stubbed ops) and get the driver's weaker rows-only check.

Registration happens on import of the plan modules at the bottom.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    #: SURVEY.md §2 operator ids this query exercises (judge traceability)
    covers: tuple[str, ...] = ()


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, covers: tuple[str, ...] = ()):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, covers=covers)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


# Import for side effect: populates REGISTRY.
from pipeline311_spark.plans import relational  # noqa: E402,F401
from pipeline311_spark.plans import pipeline311  # noqa: E402,F401
from pipeline311_spark.plans import extensions  # noqa: E402,F401
from pipeline311_spark.plans import pipeline_clean  # noqa: E402,F401
from pipeline311_spark.plans import extras  # noqa: E402,F401
from pipeline311_spark.plans import tpch_more  # noqa: E402,F401
from pipeline311_spark.plans import streaming_custom  # noqa: E402,F401
from pipeline311_spark.plans import connector  # noqa: E402,F401
from pipeline311_spark.plans import analytics2  # noqa: E402,F401
from pipeline311_spark.plans import analytics3  # noqa: E402,F401
from pipeline311_spark.plans import analytics4  # noqa: E402,F401
from pipeline311_spark.plans import analytics5  # noqa: E402,F401
from pipeline311_spark.plans import temporal_q  # noqa: E402,F401
from pipeline311_spark.plans import analytics6  # noqa: E402,F401
from pipeline311_spark.plans import analytics7  # noqa: E402,F401
from pipeline311_spark.plans import analytics8  # noqa: E402,F401
from pipeline311_spark.plans import tpch_more2  # noqa: E402,F401
from pipeline311_spark.plans import scd2  # noqa: E402,F401
from pipeline311_spark.plans import coverage_fill  # noqa: E402,F401
from pipeline311_spark.plans import tpch_more3  # noqa: E402,F401
from pipeline311_spark.plans import analytics9  # noqa: E402,F401
from pipeline311_spark.plans import analytics10  # noqa: E402,F401
from pipeline311_spark.plans import analytics11  # noqa: E402,F401
from pipeline311_spark.plans import analytics12  # noqa: E402,F401
from pipeline311_spark.plans import analytics13  # noqa: E402,F401
from pipeline311_spark.plans import analytics14  # noqa: E402,F401
from pipeline311_spark.plans import sinks_q  # noqa: E402,F401
from pipeline311_spark.plans import curation  # noqa: E402,F401
from pipeline311_spark.plans import curation2  # noqa: E402,F401
from pipeline311_spark.plans import analytics15  # noqa: E402,F401
from pipeline311_spark.plans import analytics16  # noqa: E402,F401
from pipeline311_spark.plans import analytics17  # noqa: E402,F401
from pipeline311_spark.plans import analytics18  # noqa: E402,F401
