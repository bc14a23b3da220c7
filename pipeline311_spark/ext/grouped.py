"""Batched per-key processing: ``apply_per_key_sorted`` gives
applyInPandas semantics (your Python fn sees one complete group at a
time, rows sorted) at mapInPandas cost.

``groupBy().applyInPandas`` pays one Arrow round-trip per GROUP — with
millions of small groups (per-user histories) the per-group overhead
dominates.  Here we ``repartition(key).sortWithinPartitions(key, ...)``
once, then stream Arrow batches per partition, carrying the trailing
(possibly split) group between batches, and run the group fn in plain
pandas.  Measured ~4x faster at 1500 groups / 100k rows; the gap grows
with group count.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def apply_per_key_sorted(
    df: DataFrame,
    key: str,
    sort_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: T.StructType | str,
) -> DataFrame:
    """Apply ``fn`` to each key's complete, sorted group.

    ``fn`` receives a pandas DataFrame holding ALL rows of one key,
    sorted by ``sort_cols``, and returns a pandas DataFrame matching
    ``schema``.  One shuffle (on ``key``), then a single Arrow stream
    per partition.
    """
    # Explicit partition count: an expression-only repartition(key) is
    # AQE-coalescible, and a small shuffle ahead of an EXPENSIVE
    # per-row stage (the Arrow/pandas pipe here) gets coalesced to ~1
    # partition, serializing the Python work.  A fixed count pins the
    # parallelism — AQE coalesces on the SHUFFLE's byte size, which is
    # tiny here, not on the cost of the stage that reads it (the same
    # trap as coalescing ahead of the MinHash gram explode).
    n = df.sparkSession.sparkContext.defaultParallelism
    # NULLS LAST within each sort column — the kernel's documented
    # contract.  Spark's bare ascending sort is NULLS FIRST, but both
    # pandas (sort_values) and SQL engines like DuckDB default to NULLS
    # LAST, so a group fn ported from either would silently see NULL
    # rows at the other end of the sequence (hostile-gate class).
    from pyspark.sql import functions as F

    order = [F.col(c).asc_nulls_last() for c in sort_cols]
    rep = df.repartition(n, key).sortWithinPartitions(key, *order)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None

        def emit(groups: pd.DataFrame) -> pd.DataFrame:
            # dropna=False: Spark's groupBy keys NULL like any value —
            # the default pandas behavior silently DROPS NaN-key rows
            # (and crashed concat([]) when a batch was all-NULL-key)
            outs = [
                fn(g)
                for _, g in groups.groupby(key, sort=False, dropna=False)
            ]
            return pd.concat(outs, ignore_index=True)

        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last = pdf[key].iloc[-1]
            # NaN-safe tail detection: NaN == NaN is False, which would
            # split a NULL-key group across Arrow batches
            tail_mask = pdf[key].isna() if pd.isna(last) else pdf[key] == last
            carry = pdf[tail_mask]
            done = pdf[~tail_mask]
            if len(done):
                yield emit(done)
        if carry is not None and len(carry):
            yield emit(carry)

    return rep.mapInPandas(run, schema)
