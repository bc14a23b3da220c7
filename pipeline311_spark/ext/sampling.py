"""Deterministic sampling & split assignment (training-data pipeline).

``sample()``/``randomSplit()`` are seed-dependent but *partitioning*-
dependent too — rerunning on a repartitioned 100 TB corpus yields a
different sample.  Hash-based assignment is the production answer:
bucket = hash(stable_id) mod N, sample/split by bucket range.  Fully
deterministic across runs, partitionings, and engines (md5-based portable hash →
the DuckDB oracle reproduces the exact same rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pipeline311_spark.ext.hashing import portable_hash, portable_hash_sql


def hash_bucket(col: Column | str, buckets: int = 100) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return portable_hash(c.cast("string")) % F.lit(buckets)


def hash_bucket_sql(expr: str, buckets: int = 100) -> str:
    return f"({portable_hash_sql(f'CAST({expr} AS VARCHAR)')}) % {buckets}"


def deterministic_sample(df: DataFrame, id_col: str, pct: int, buckets: int = 100) -> DataFrame:
    """Keep ~pct% of rows, stable under reruns/repartitioning."""
    return df.filter(hash_bucket(id_col, buckets) < pct)


def cap_per_key(
    df: DataFrame, key_col: str, id_col: str, cap: int, rank_col: str = "keep_rank"
) -> DataFrame:
    """Keep at most ``cap`` rows per ``key_col`` (the per-domain /
    per-source document cap every web-scale curation pipeline applies
    so one hot domain can't dominate the training mixture).

    Priority is ``row_number`` ordered by the portable hash of the
    stable id (id itself as tiebreak) — a deterministic uniform
    subsample of each key's rows, stable across reruns, repartitioning,
    and engines, unlike "first N seen" which depends on scan order.

    Scale: the ``rank <= cap`` filter on a ``row_number`` window is
    rewritten by Spark into WindowGroupLimit — each map task pre-trims
    to its local top-``cap`` per key BEFORE the exchange, so a
    pathological hot key ships at most ``cap × n_partitions`` rows, not
    its full row count, and the post-shuffle per-key sort is bounded.
    """
    w = Window.partitionBy(key_col).orderBy(
        portable_hash(F.col(id_col).cast("string")), F.col(id_col)
    )
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= cap)


def train_test_split(
    df: DataFrame, id_col: str, train_pct: int = 80, val_pct: int = 10, buckets: int = 100
) -> DataFrame:
    """Add a ``split`` column: train / val / test by hash range."""
    b = hash_bucket(id_col, buckets)
    split = (
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return df.withColumn("split", split)
