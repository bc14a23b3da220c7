"""Incremental rollup maintenance (continuous aggregate / hypertable
rollup pattern): keep a dimensional aggregate table fresh by merging
the delta's partial aggregates instead of rescanning history.

Works for any decomposable aggregates (count/sum/min/max — avg as
sum+count).  One shuffle over the delta + one merge shuffle over
(rollup ∪ delta-partials), both keyed by the dims.  At 100 TB the
rollup table is tiny relative to raw; this is the standard
materialized-view maintenance loop the reference approximates with
its viewer MERGE (sync-db2-viewer.py:14-17 "Only insert what we
need").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def rollup_delta(delta: DataFrame, dims: list[str], partial_aggs: dict[str, Column]) -> DataFrame:
    """Aggregate the new raw rows to the rollup grain."""
    return delta.groupBy(*dims).agg(*[c.alias(n) for n, c in partial_aggs.items()])


def merge_rollup(
    rollup: DataFrame, delta_partials: DataFrame, dims: list[str], merge_aggs: dict[str, Column]
) -> DataFrame:
    """Merge existing rollup rows with delta partials (union + re-agg:
    decomposable aggregates compose exactly)."""
    return (
        rollup.unionByName(delta_partials)
        .groupBy(*dims)
        .agg(*[c.alias(n) for n, c in merge_aggs.items()])
    )
