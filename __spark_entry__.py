"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Everything delegates to the ``pipeline311_spark`` package; the query
registry (pipeline311_spark/plans/) is the single source of truth —
each entry pairs the Spark callable with its DuckDB oracle twin.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pipeline311_spark import plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by nation/region
    (scan → filter → 5-way join → groupBy agg), SURVEY §7.2."""
    return plans.REGISTRY["q05_nation_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    return plans.oracle_sql()
