"""User-facing convenience API: open the warehouse, run SQL or named
queries — what a user of the reference switches to (README usage).

    from pipeline311_spark.api import Warehouse
    wh = Warehouse(spark, "/root/testdata/sf0.01")
    wh.sql("SELECT count(*) FROM lineitem").show()
    wh.query("q05_nation_revenue").show()
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pipeline311_spark.session import prep_session
from pipeline311_spark.sources.readers import TESTDATA_TABLES, load_table


class Warehouse:
    def __init__(self, spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES):
        self.spark = prep_session(spark)
        self.sf_dir = sf_dir
        for name in tables:
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)

    def sql(self, query: str) -> DataFrame:
        """Arbitrary SQL over the registered tables — Catalyst plans it
        exactly like the DataFrame API paths."""
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def query(self, name: str) -> DataFrame:
        """Run a registry query by name."""
        from pipeline311_spark.plans import REGISTRY

        return REGISTRY[name].fn(self.spark, self.sf_dir)

    def queries(self) -> list[str]:
        from pipeline311_spark.plans import REGISTRY

        return sorted(REGISTRY)
