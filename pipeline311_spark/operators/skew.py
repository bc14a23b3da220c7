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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_on: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: spread a hot join key across ``buckets``
    reducers by salting the big side (deterministic pmod-of-hash of
    ``salt_on``, a big-side column unique-ish per row) and replicating
    the small side once per salt value.  Join on (key, salt) — every
    big row matches exactly one replica, so the result is row-for-row
    identical to the plain join while no single reducer ever sees more
    than ~1/buckets of a hot key's rows.

    Use when AQE's skew-join splitting can't help: it splits oversized
    *partitions* of a sort-merge join, but a single hot KEY inside one
    partition (e.g. a null-heavy or default-value key) still lands on
    one task without salting.  Cost: small side is materialized
    ``buckets`` times — keep buckets modest and the small side small.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(buckets))
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(buckets - 1).cast("long")))
    )
    return b.join(s, [key, "__salt"], how).drop("__salt")
