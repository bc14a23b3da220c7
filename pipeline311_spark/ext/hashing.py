"""Portable deterministic hashing used by dedup / similarity.

``poly_hash`` is a character-fold polynomial hash built from Spark
builtins (``transform`` + ``aggregate`` higher-order functions — fully
codegen'd, no Python).  It is engine-portable: the DuckDB oracle
reproduces it with ``list_reduce``/``list_transform``, so LSH buckets
and MinHash signatures hash-match across engines.  (Spark's native
``xxhash64`` is faster but not reproducible outside Spark; swap it in
via ``fast=True`` when oracle parity is not needed.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007
BASE = 31


def ensure_parallelism(df, min_parts: int | None = None):
    """Repartition a DataFrame whose scan produced too few partitions
    (a single small parquet file → one task → one core does all the
    shingling).  At 100 TB the scan's file splits provide parallelism
    and this is a no-op; locally it unlocks all cores for the
    explode-heavy dedup/similarity operators."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def poly_hash(col: Column | str, fast: bool = False) -> Column:
    """Deterministic 64-bit-safe string hash in [0, MOD)."""
    c = F.col(col) if isinstance(col, str) else col
    if fast:
        return F.pmod(F.xxhash64(c), F.lit(MOD))
    chars = F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        chars, F.lit(0).cast("long"), lambda acc, ch: (acc * BASE + ch) % MOD
    )


def poly_hash_sql(expr: str) -> str:
    """DuckDB twin of :func:`poly_hash` over a SQL string expression."""
    return (
        "list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({expr}, ''), ch -> ascii(ch)::BIGINT)), "
        f"(acc, ch) -> (acc * {BASE} + ch) % {MOD})"
    )


def affine(h: Column, a: int, b: int) -> Column:
    """One universal-hash family member ``(a*h + b) mod MOD`` — the
    MinHash permutation."""
    return (h * F.lit(a) + F.lit(b)) % F.lit(MOD)


def affine_sql(expr: str, a: int, b: int) -> str:
    return f"(({expr}) * {a} + {b}) % {MOD}"


def hash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs via a fixed LCG — no RNG state, same
    on every run and in generated oracle SQL."""
    params = []
    x = seed
    for _ in range(k):
        x = (1103515245 * x + 12345) % (1 << 31)
        a = (x % (MOD - 1)) + 1
        x = (1103515245 * x + 12345) % (1 << 31)
        b = x % MOD
        params.append((a, b))
    return params
