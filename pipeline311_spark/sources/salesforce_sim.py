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

The HTTP side itself is a SEAM, not a hand-wave:
``sources/rest_transport.py`` provides the SOQL builder (from the
same pushed ``Filter`` objects), ``query_all_iter``-style cursor
pagination, the reference's retry ladder (Retry(total=10,
backoff_factor=3), 540 s timeout — delete-removed-tickets.py:24-25),
and a real stdlib ``UrllibTransport`` — all contract-tested through a
recording fake transport (tests/test_rest_transport.py).  A production
deployment swaps this reader's pyarrow page read for
``fetch_all(UrllibTransport(...), ...)``; the plan shape
(partitioned, filtered at source) is identical.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
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


def _part_files(path: str) -> list[str]:
    """The backing store as an ordered list of parquet files: a single
    file, or a Spark-style directory of part files (sorted by name —
    Spark's own deterministic part numbering, so row positions form a
    stable global cursor across the directory)."""
    import os

    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        if not parts:
            raise FileNotFoundError(f"no parquet part files under {path}")
        return parts
    return [path]


def _store_num_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(p).metadata.num_rows for p in _part_files(path))


def _read_rows(path: str, columns: list[str], start: int, end: int):
    """Rows [start, end) of the backing parquet as an Arrow table,
    reading ONLY the row groups that intersect the range (a page task
    must not pay for the whole file — at a 1 GB store with 200-row
    pages, full-file reads would amplify I/O by the page count).
    Row positions run across part files in sorted-name order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    parts = _part_files(path)
    pieces = []
    rg_start = 0
    first_pf = None
    for part in parts:
        pf = pq.ParquetFile(part)
        if first_pf is None:
            first_pf = pf
        for rg in range(pf.metadata.num_row_groups):
            rg_rows = pf.metadata.row_group(rg).num_rows
            rg_end = rg_start + rg_rows
            if rg_end > start and rg_start < end:  # intersects [start, end)
                t = pf.read_row_group(rg, columns=columns)
                lo = max(start - rg_start, 0)
                hi = min(end - rg_start, rg_rows)
                pieces.append(t.slice(lo, hi - lo))
            rg_start = rg_end
            if rg_start >= end:
                break
        if rg_start >= end:
            break
    if not pieces:
        pf = first_pf
        return pf.schema_arrow.empty_table() if columns is None else pa.table(
            {c: pa.array([], pf.schema_arrow.field(c).type) for c in columns}
        )
    return pa.concat_tables(pieces)


def _iter_rows(table):
    for batch in table.to_batches():
        for row in zip(*[batch.column(i).to_pylist() for i in range(batch.num_columns)]):
            yield row


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
            # nested column paths are NOT claimed: _attr takes the
            # first segment only, so accepting ('a','b') would filter
            # on the wrong column — return it for Spark to evaluate
            if isinstance(f, supported) and len(f.attribute) == 1:
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
        n = _store_num_rows(self.path)
        return [_Page(s, min(s + self.page_size, n)) for s in range(0, n, self.page_size)] or [
            _Page(0, 0)
        ]

    # -- scan --------------------------------------------------------------
    def read(self, partition: _Page):
        page = _read_rows(self.path, self.columns, partition.start, partition.end)
        flt = self._arrow_filter()
        if flt is not None:
            page = page.filter(flt)
        yield from _iter_rows(page)


class CaseSourceStreamReader(DataSourceStreamReader):
    """Streaming half of the connector: the reference's watermark
    polling loop (sync-db2.py:49-50 — repeated SOQL ``WHERE updated >
    watermark`` queries driven by a driver-side loop) re-expressed as a
    DSv2 micro-batch stream.

    * **Offsets** are row positions in the append-ordered backing store
      (the stand-in for the remote API's monotonically increasing
      updated-timestamp cursor): ``initialOffset`` = 0,
      ``latestOffset`` advances by at most ``maxrowspertrigger`` rows
      per micro-batch, so ingestion is rate-limited exactly like the
      reference's page-size-bounded polling.
    * **partitions(start, end)** plans one :class:`_Page` per
      ``pagesize`` rows inside the batch's offset range — each
      micro-batch's extract runs PARALLEL on executors (the driver only
      plans offsets; rows never pass through it, unlike
      ``SimpleDataSourceStreamReader``).
    * **Exactly-once**: offsets are deterministic row ranges, so a
      restarted query re-reads the same rows for an uncommitted batch —
      Spark's checkpointed offset log provides the dedup.

    A real client would resolve ``latestOffset`` with a cheap COUNT /
    max-updated probe against the API and ``read`` with a paginated
    range request.
    """

    def __init__(self, schema: T.StructType, options):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sf_cases stream requires a 'path' option")
        self.page_size = int(options.get("pagesize", 10_000))
        # Unbounded by default: ``availableNow`` consults latestOffset
        # ONCE, so a bounded default would leave rows unread in a
        # drain-and-stop run.  Set maxrowspertrigger only with a
        # continuous trigger (the polling-loop mode).
        self.max_per_trigger = int(options.get("maxrowspertrigger", 0)) or None
        cols = options.get("columns")
        self.columns = cols.split(",") if cols else [f.name for f in schema.fields]
        self._last = 0  # driver-side cursor (monotonic; synced in partitions())

    def _total(self) -> int:
        return _store_num_rows(self.path)

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        n = self._total()
        if self.max_per_trigger is None:
            self._last = n
        else:
            self._last = min(self._last + self.max_per_trigger, n)
        return {"pos": self._last}

    def partitions(self, start: dict, end: dict):
        s0, e0 = start["pos"], end["pos"]
        # Checkpoint restore can outrun the fresh cursor: sync with BOTH
        # ends so latestOffset never plans behind anything the engine
        # has already shown us (start = committed offset on restart).
        self._last = max(self._last, s0, e0)
        if e0 <= s0:  # regressed/empty range: emit nothing
            return [_Page(s0, s0)]
        return [_Page(s, min(s + self.page_size, e0)) for s in range(s0, e0, self.page_size)]

    def read(self, partition: _Page):
        yield from _iter_rows(
            _read_rows(self.path, self.columns, partition.start, partition.end)
        )

    def commit(self, end: dict) -> None:
        # Positions in an immutable store: nothing to release, but keep
        # the cursor monotonic w.r.t. everything the engine committed.
        self._last = max(self._last, end["pos"])


class CaseSource(DataSource):
    """``spark.read.format("sf_cases").schema(...).option("path", ...)``
    or ``spark.readStream.format("sf_cases")`` for the incremental
    polling loop (see :class:`CaseSourceStreamReader`)."""

    @classmethod
    def name(cls) -> str:
        return "sf_cases"

    def schema(self):
        raise NotImplementedError("pass an explicit schema (engine never infers; SURVEY §1.2)")

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return CaseSourceReader(schema, self.options)

    def streamReader(self, schema: T.StructType) -> DataSourceStreamReader:
        return CaseSourceStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(CaseSource)
