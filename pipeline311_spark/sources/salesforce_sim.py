"""A Salesforce-style DSv2 connector via the Python Data Source API
(SURVEY §2.1-S1, §7.3 step 10).

The reference extracts from a REST source with *hand-written* pushdown:
the SOQL string embeds the projection and WHERE clause and the client
pages through results (``query_all_iter``, sync-db2.py:49-50; query
text config.py:103-145).  This connector shows the engine-native
equivalent: a ``DataSource`` that

* **pages**: one :class:`InputPartition` per fixed-size page, so Spark
  parallelizes the paginated scan instead of looping single-threaded;
* **pushes filters**: ``pushFilters`` accepts equality/range/IsNotNull
  predicates, which are applied at the source (here: a pyarrow
  predicate on the backing parquet, standing in for the remote API's
  WHERE clause); unsupported filters are returned to Spark to apply
  post-scan — exactly DSv2 semantics;
* **prunes columns** at the source: Spark 4 passes the pruned schema
  to ``partitions()``/``read()`` only for Arrow-batch readers, so the
  reader honors an explicit ``columns`` option (the 37-column SOQL
  projection analog) and otherwise reads the declared schema.

A real Salesforce client would replace ``_read_page``'s pyarrow call
with a paginated REST request built from the same pushed filters; the
plan shape (partitioned, filtered at source) is identical.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql import types as T


@dataclass
class _Page(InputPartition):
    start: int
    end: int


def _attr(f: Filter) -> str:
    # ColumnPath tuple -> name (flat schemas only)
    return f.attribute[0]


class CaseSourceReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sf_cases source requires a 'path' option")
        self.page_size = int(options.get("pagesize", 10_000))
        cols = options.get("columns")
        self.columns = cols.split(",") if cols else [f.name for f in schema.fields]
        self.pushed: list[Filter] = []

    # -- pushdown ----------------------------------------------------------
    def pushFilters(self, filters):  # noqa: N802 (API name)
        supported = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, IsNotNull)
        for f in filters:
            if isinstance(f, supported):
                self.pushed.append(f)
            else:
                yield f  # unsupported -> Spark evaluates it post-scan

    def _arrow_filter(self):
        import pyarrow.compute as pc

        expr = None
        ops = {
            EqualTo: lambda c, v: pc.field(c) == v,
            GreaterThan: lambda c, v: pc.field(c) > v,
            GreaterThanOrEqual: lambda c, v: pc.field(c) >= v,
            LessThan: lambda c, v: pc.field(c) < v,
            LessThanOrEqual: lambda c, v: pc.field(c) <= v,
        }
        for f in self.pushed:
            if isinstance(f, IsNotNull):
                e = ~pc.field(_attr(f)).is_null()
            else:
                e = ops[type(f)](_attr(f), f.value)
            expr = e if expr is None else expr & e
        return expr

    # -- pagination --------------------------------------------------------
    def partitions(self):
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).metadata.num_rows
        return [_Page(s, min(s + self.page_size, n)) for s in range(0, n, self.page_size)] or [
            _Page(0, 0)
        ]

    # -- scan --------------------------------------------------------------
    def read(self, partition: _Page):
        import pyarrow.parquet as pq

        table = pq.read_table(self.path, columns=self.columns)
        page = table.slice(partition.start, partition.end - partition.start)
        flt = self._arrow_filter()
        if flt is not None:
            page = page.filter(flt)
        for batch in page.to_batches():
            for row in zip(*[batch.column(i).to_pylist() for i in range(batch.num_columns)]):
                yield row


class CaseSource(DataSource):
    """``spark.read.format("sf_cases").schema(...).option("path", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "sf_cases"

    def schema(self):
        raise NotImplementedError("pass an explicit schema (engine never infers; SURVEY §1.2)")

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return CaseSourceReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(CaseSource)
