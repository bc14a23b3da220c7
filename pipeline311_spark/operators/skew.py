"""Skew-resistant aggregation (SURVEY §7.5.6: the 100 TB mandate).

A groupBy on a low-cardinality or power-law key sends every row for a
hot key to one reducer.  ``salted_agg`` is the classic two-phase fix:
salt the key into N subkeys (deterministic: pmod of a hash of a
spread column, NOT a random number — results stay reproducible),
partially aggregate per (key, salt), then merge partials per key.
Correct for any commutative/associative aggregate set.

AQE's skew-join handling covers joins; this covers aggregations, where
AQE cannot split a single hot group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    salt_on: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation.

    ``partial_aggs``: name -> aggregate over raw rows (phase 1, keyed by
    (key, salt)).  ``merge_aggs``: name -> aggregate over the phase-1
    partials (phase 2, keyed by key); reference phase-1 outputs by name.
    ``salt_on``: any high-cardinality column; its hash spreads the hot
    key across ``buckets`` reducers.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(buckets)).alias("__salt")
    partial = df.groupBy(F.col(key), salt).agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return partial.groupBy(key).agg(*[c.alias(name) for name, c in merge_aggs.items()])
