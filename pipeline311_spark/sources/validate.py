"""Runtime schema & data validation operators.

The reference enforces correctness with runtime asserts (SURVEY §5):
header whitelist (sync-db2-ago.py:441-459), field-set equality vs the
AGO layer (:487-502), duplicate-key guard (delete-removed-tickets.py:117),
point-lookup cardinality (sync-db2-ago.py:598-614).  These become
engine operators that work on any DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SchemaMismatch(AssertionError):
    pass


def validate_columns(df: DataFrame, expected: list[str], ignore: set[str] | None = None) -> None:
    """Header-whitelist assert (sync-db2-ago.py:441-459): raise on any
    unexpected column; report both directions."""
    ignore = ignore or set()
    have = [c for c in df.columns if c not in ignore]
    unexpected = sorted(set(have) - set(expected))
    missing = sorted(set(expected) - set(have))
    if unexpected or missing:
        raise SchemaMismatch(f"unexpected columns: {unexpected}; missing columns: {missing}")


def validate_schema(df: DataFrame, expected: T.StructType, check_types: bool = True) -> None:
    """Full StructType validation (SURVEY §1.2): set-compare names, then
    types for the intersection."""
    validate_columns(df, [f.name for f in expected.fields])
    if check_types:
        want = {f.name: f.dataType for f in expected.fields}
        got = {f.name: f.dataType for f in df.schema.fields}
        diffs = {n: (str(got[n]), str(want[n])) for n in want if got[n] != want[n]}
        if diffs:
            raise SchemaMismatch(f"type mismatches (got, want): {diffs}")


def assert_field_set_equality(a: DataFrame, b: DataFrame, exclude: set[str] | None = None) -> None:
    """Field-set equality with diff printout in the error
    (sync-db2-ago.py:487-502; ``objectid`` excluded there)."""
    exclude = exclude or set()
    sa = set(a.columns) - exclude
    sb = set(b.columns) - exclude
    if sa != sb:
        raise SchemaMismatch(f"only in left: {sorted(sa - sb)}; only in right: {sorted(sb - sa)}")


def dup_guard(df: DataFrame, key: str) -> None:
    """A6 (delete-removed-tickets.py:117 ``assert len(set(chunk)) ==
    len(chunk)``), distributed: one aggregate pass, no collect."""
    row = df.agg(
        F.count(key).alias("n"), F.countDistinct(key).alias("d")
    ).first()
    if row["n"] != row["d"]:
        raise AssertionError(f"duplicate keys in '{key}': {row['n']} rows, {row['d']} distinct")


def assert_single_row_per_key(df: DataFrame, key: str) -> None:
    """S5 cardinality assert (sync-db2-ago.py:598-614 expects exactly one
    row per pk) as a single groupBy instead of N point lookups."""
    bad = df.groupBy(key).count().filter(F.col("count") > 1).limit(1).collect()
    if bad:
        raise AssertionError(f"key {bad[0][key]!r} has {bad[0]['count']} rows; expected 1")
