"""Z-order (Morton) data layout for scan pruning at scale.

At 100 TB, a filter on a column the files aren't sorted by reads every
file.  Writing the table clustered by a Z-order key over the two (or
three) most-filtered dimensions makes parquet row-group min/max stats
selective on BOTH columns at once — the standard lakehouse layout move
(Delta/Iceberg ``OPTIMIZE ZORDER BY``), reproduced here for plain
parquet with nothing but Column arithmetic and a range-partitioned,
sorted write.

The key is a pure codegen'd expression (bit interleave of the
bucketized dimensions), so computing it adds no Python/UDF cost to the
write path, and the DuckDB oracle reproduces it bit-for-bit
(plans/extras.py layout_zorder_stats).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton code: interleave the low ``bits`` of two non-negative
    ints — bit i of x lands at position 2i, bit i of y at 2i+1.
    Callers bucketize/clamp the dimensions to [0, 2^bits) first
    (:func:`bucketize`)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def bucketize(col: Column, lo: Column | int, hi: Column | int, buckets: int) -> Column:
    """Map a value in [lo, hi] to an integer bucket in [0, buckets);
    out-of-range values clamp to the edge buckets (layout must not
    drop rows)."""
    lo_c = F.lit(lo) if isinstance(lo, int) else lo
    hi_c = F.lit(hi) if isinstance(hi, int) else hi
    span = (hi_c - lo_c).cast("double")
    raw = F.floor(((col.cast("double") - lo_c) / span) * buckets).cast("long")
    return F.greatest(F.lit(0).cast("long"), F.least(F.lit(buckets - 1).cast("long"), raw))


def write_zordered(
    df: DataFrame,
    path: str,
    zkey: Column,
    num_files: int | None = None,
) -> None:
    """Write ``df`` clustered by ``zkey``: range-partition on the key
    (each output file owns a contiguous Z-range → a contiguous region
    of the (x, y) space) and sort within partitions so row-group stats
    are tight inside each file too.  One shuffle — the same cost as any
    repartition write — bought once per table version, repaid on every
    filtered scan."""
    clustered = df.withColumn("__z", zkey)
    part = (
        clustered.repartitionByRange(num_files, "__z")
        if num_files
        else clustered.repartitionByRange("__z")
    )
    part.sortWithinPartitions("__z").drop("__z").write.mode("overwrite").parquet(path)
