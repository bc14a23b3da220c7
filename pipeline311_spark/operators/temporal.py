"""Temporal joins Spark lacks natively: as-of join and range join
(called out in the north star as custom-operator targets).

Both are built as compositions of existing DataFrame ops — the
preferred path (no UDFs, fully codegen'd, shuffle-planned by
Catalyst):

* **as-of**: union both sides tagged, one window sorted by (key, time)
  carrying the last right-side row forward (``last(..., ignorenulls)``).
  One shuffle on the key; no per-row probing, no range explosion.
  This is the classic scalable formulation — cost is a sort within
  key partitions, exactly what a dedicated as-of operator would do.
* **range**: bucket both sides by a time grain, explode the interval
  side over the buckets it spans, equi-join on (key, bucket), then
  apply the exact range predicate.  Turns an inequality join (which
  Spark would execute as a broadcast-nested-loop) into an equi-join
  whose fan-out is bounded by interval/bucket ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the most recent right row of the same
    key with ``right_ts <= left_ts`` (NULLs if none).  Exact ties: the
    right row at the same instant IS visible (at-or-before).

    Tie/order determinism: events at identical timestamps order by the
    side tag (right first, so it is visible to a same-instant left row).
    """
    lt = left.withColumn("__t", F.col(left_ts)).withColumn("__side", F.lit(1))
    rt = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("__t"),
            *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
        )
        .withColumn("__side", F.lit(0))
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"__carry_{c}")
            for c in right_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1)
    for c in right_cols:
        out = out.drop(f"{prefix}{c}").withColumnRenamed(f"__carry_{c}", f"{prefix}{c}")
    return out.drop("__t", "__side")


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_ts: str,
    left_start: str,
    left_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join right rows whose ``right_ts`` falls in the left row's
    [left_start, left_end) interval, same key.  Bucketed equi-join plus
    exact predicate — no nested-loop."""
    b = F.lit(bucket_seconds)
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_seconds(F.col(left_start)) / b),
                F.floor((F.unix_seconds(F.col(left_end)) - 1) / b),
            )
        ),
    )
    rb = right.withColumn("__bucket", F.floor(F.unix_seconds(F.col(right_ts)) / b))
    joined = lb.join(rb, [key, "__bucket"]).filter(
        (F.col(right_ts) >= F.col(left_start)) & (F.col(right_ts) < F.col(left_end))
    )
    return joined.drop("__bucket")
