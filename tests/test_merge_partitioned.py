"""Partition-pruned incremental MERGE (operators/merge.py:
merge_incremental_partitioned).

The scale property under test: merging a batch that touches a subset
of partitions must (a) produce exact MERGE semantics and (b) leave the
files of untouched partitions byte-for-byte alone — no full-target
rewrite (reference ``sync-db2.py:78-88`` rewrites everything; at 100 TB
only the pruned rewrite survives).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pipeline311_spark.operators.merge import merge_incremental_partitioned


def _files_by_partition(path):
    out = {}
    for d in os.listdir(path):
        if d.startswith("bucket="):
            full = os.path.join(path, d)
            out[d] = sorted(
                (f, os.path.getmtime(os.path.join(full, f)))
                for f in os.listdir(full)
                if not f.startswith(("_", "."))
            )
    return out


def test_merge_rewrites_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "warehouse")
    base = spark.range(100).select(
        F.col("id").alias("key"),
        (F.col("id") * 2).cast("double").alias("val"),
        F.lit(1).alias("version"),
        F.pmod("id", F.lit(4)).alias("bucket"),
    )
    base.write.partitionBy("bucket").parquet(path)
    before = _files_by_partition(path)
    assert set(before) == {f"bucket={i}" for i in range(4)}

    # touch only bucket 0 (keys ≡ 0 mod 4): update key 0, insert key 400
    updates = spark.createDataFrame(
        [(0, 999.0, 2, 0), (400, 123.0, 1, 0)], "key long, val double, version int, bucket int"
    )
    merge_incremental_partitioned(spark, path, updates, "key", "version", "bucket")

    after = _files_by_partition(path)
    for b in ("bucket=1", "bucket=2", "bucket=3"):
        assert after[b] == before[b], f"untouched partition {b} was rewritten"
    assert after["bucket=0"] != before["bucket=0"]

    back = spark.read.parquet(path)
    assert back.count() == 101  # 100 originals + 1 insert
    assert back.filter("key = 0").select("val").first()[0] == 999.0  # update won
    assert back.filter("key = 400").count() == 1  # new key inserted
    assert back.filter("key = 1").select("val").first()[0] == 2.0  # untouched row intact


def test_merge_new_partition_value_created(spark, tmp_path):
    path = str(tmp_path / "warehouse")
    spark.range(10).select(
        F.col("id").alias("key"), F.lit(1).alias("version"), F.pmod("id", F.lit(2)).alias("bucket")
    ).write.partitionBy("bucket").parquet(path)
    updates = spark.createDataFrame([(50, 1, 7)], "key long, version int, bucket int")
    merge_incremental_partitioned(spark, path, updates, "key", "version", "bucket")
    back = spark.read.parquet(path)
    assert back.count() == 11
    assert back.filter("bucket = 7").count() == 1


def test_pruned_read_reaches_partition_filters(spark, tmp_path):
    path = str(tmp_path / "warehouse")
    spark.range(100).select(
        F.col("id").alias("key"), F.pmod("id", F.lit(4)).alias("bucket")
    ).write.partitionBy("bucket").parquet(path)
    pruned = spark.read.parquet(path).filter(F.col("bucket").isin([0, 2]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert pruned.count() == 50


def test_column_dropping_batch_raises_not_narrows(spark, tmp_path):
    """r4 nit: merge_incremental_partitioned trusted updates.schema for
    the pruned warehouse read — a batch that silently lost a column
    would narrow the warehouse on write-back.  It must raise instead."""
    import pytest

    from pipeline311_spark.sources.validate import SchemaMismatch

    path = str(tmp_path / "wh_guard")
    base = spark.createDataFrame(
        [(1, 1, "a", 0), (2, 1, "b", 1)], "key long, version long, payload string, bucket int"
    )
    base.write.partitionBy("bucket").parquet(path)
    narrowed = spark.createDataFrame([(1, 2, 0)], "key long, version long, bucket int")
    with pytest.raises(SchemaMismatch, match="payload"):
        merge_incremental_partitioned(spark, path, narrowed, "key", "version", "bucket")
    # warehouse untouched: payload survives
    assert spark.read.parquet(path).columns.__contains__("payload")


def test_merge_handles_null_and_special_partition_values(spark, tmp_path):
    """The review/hostile scenarios: a key moving OUT of the NULL
    partition must not strand a stale copy; a batch writing INTO the
    NULL partition must not wipe that partition's other keys; a
    partition value needing Hive path escaping ('US:east') must still
    be droppable when emptied."""
    path = str(tmp_path / "wh_null")
    base = spark.createDataFrame(
        [(1, 1.0, 1, None), (2, 2.0, 1, "US:east"), (3, 3.0, 1, None)],
        "key long, val double, version int, pc string",
    )
    base.write.partitionBy("pc").parquet(path)

    # key 1 moves NULL -> 'a' on a TIE version (update must win);
    # key 2 updates in place in the escaped partition
    u1 = spark.createDataFrame(
        [(1, 10.0, 1, "a"), (2, 20.0, 2, "US:east")],
        "key long, val double, version int, pc string",
    )
    merge_incremental_partitioned(spark, path, u1, "key", "version", "pc")
    got = {r["key"]: (r["val"], r["pc"]) for r in spark.read.parquet(path).collect()}
    assert got == {1: (10.0, "a"), 2: (20.0, "US:east"), 3: (3.0, None)}

    # a new key lands in the NULL partition: key 3 must survive there
    u2 = spark.createDataFrame(
        [(4, 4.0, 1, None)], "key long, val double, version int, pc string"
    )
    merge_incremental_partitioned(spark, path, u2, "key", "version", "pc")
    got = {r["key"]: (r["val"], r["pc"]) for r in spark.read.parquet(path).collect()}
    assert got[3] == (3.0, None) and got[4] == (4.0, None)

    # empty out the escaped partition: key 2 moves away; the
    # 'pc=US%3Aeast' directory must actually disappear
    u3 = spark.createDataFrame(
        [(2, 30.0, 3, "b")], "key long, val double, version int, pc string"
    )
    merge_incremental_partitioned(spark, path, u3, "key", "version", "pc")
    got = {r["key"]: (r["val"], r["pc"]) for r in spark.read.parquet(path).collect()}
    assert got == {1: (10.0, "a"), 2: (30.0, "b"), 3: (3.0, None), 4: (4.0, None)}
    assert not os.path.isdir(os.path.join(path, "pc=US%3Aeast"))


def test_boolean_partition_emptied_dir_uses_spark_rendering(spark, tmp_path):
    """ADVICE r5: emptied-partition dir names must come from Spark's own
    value rendering, not Python str() — boolean True writes 'pc=true'
    while str(True) is 'True', so the delete silently missed the dir
    and left superseded rows resurrectable."""
    path = str(tmp_path / "wh_bool")
    base = spark.createDataFrame(
        [(1, 1.0, 1, True), (2, 2.0, 1, False)],
        "key long, val double, version int, pc boolean",
    )
    base.write.partitionBy("pc").parquet(path)
    assert os.path.isdir(os.path.join(path, "pc=true"))

    # key 1 moves out of the True partition, emptying it
    u = spark.createDataFrame(
        [(1, 10.0, 2, False)], "key long, val double, version int, pc boolean"
    )
    merge_incremental_partitioned(spark, path, u, "key", "version", "pc")
    # explicit schema on read-back: partition-dir inference has no
    # boolean type and would surface pc as the string 'false'
    got = {
        r["key"]: (r["val"], r["pc"])
        for r in spark.read.schema(base.schema).parquet(path).collect()
    }
    assert got == {1: (10.0, False), 2: (2.0, False)}
    assert not os.path.isdir(os.path.join(path, "pc=true")), (
        "emptied boolean partition dir survived — stale copy resurrectable"
    )


def test_narrowing_guard_propagates_non_empty_warehouse_errors(spark, tmp_path):
    """ADVICE r5: the narrowing guard may swallow ONLY the absent/empty-
    warehouse AnalysisException classes; a corrupt warehouse read must
    propagate instead of silently disabling the guard for the batch."""
    import pytest

    from pipeline311_spark.operators.merge import guard_no_warehouse_narrowing

    updates = spark.createDataFrame([(1, 1.0)], "key long, val double")

    # absent path: swallowed (nothing to narrow)
    guard_no_warehouse_narrowing(spark, str(tmp_path / "does_not_exist"), updates)

    # corrupt footer: must raise, not return
    bad = tmp_path / "wh_corrupt"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"PAR1 this is not a parquet file")
    with pytest.raises(Exception):
        guard_no_warehouse_narrowing(spark, str(bad), updates)


def test_nan_partition_value_not_deleted_after_rewrite(spark):
    """Review r6: Python NaN != NaN, so two separately collected NaN
    partition values compared unequal, the freshly rewritten pc=NaN
    directory landed in `emptied`, and its surviving rows were deleted.
    Partition identity now goes through Spark's string rendering."""
    import math
    import tempfile
    import uuid

    path = os.path.join(tempfile.gettempdir(), f"wh_nan_{uuid.uuid4().hex[:10]}")
    base = spark.createDataFrame(
        [(1, 1.0, 1, float("nan")), (2, 2.0, 1, 0.5)],
        "key long, val double, version int, pc double",
    )
    base.write.partitionBy("pc").parquet(path)

    # update key 1 IN the NaN partition (it survives there) and add key 3
    u = spark.createDataFrame(
        [(1, 10.0, 2, float("nan")), (3, 3.0, 1, float("nan"))],
        "key long, val double, version int, pc double",
    )
    merge_incremental_partitioned(spark, path, u, "key", "version", "pc")
    got = {
        r["key"]: (r["val"], r["pc"])
        for r in spark.read.schema(base.schema).parquet(path).collect()
    }
    assert got[1][0] == 10.0 and math.isnan(got[1][1])
    assert got[3][0] == 3.0 and math.isnan(got[3][1])
    assert got[2] == (2.0, 0.5)
    assert os.path.isdir(os.path.join(path, "pc=NaN"))

    # and a key MOVING OUT of NaN empties + deletes the dir when no rows survive
    path2 = os.path.join(tempfile.gettempdir(), f"wh_nan2_{uuid.uuid4().hex[:10]}")
    spark.createDataFrame(
        [(1, 1.0, 1, float("nan")), (2, 2.0, 1, 0.5)],
        "key long, val double, version int, pc double",
    ).write.partitionBy("pc").parquet(path2)
    mv = spark.createDataFrame(
        [(1, 5.0, 2, 0.5)], "key long, val double, version int, pc double"
    )
    merge_incremental_partitioned(spark, path2, mv, "key", "version", "pc")
    got2 = {
        r["key"]: (r["val"], r["pc"])
        for r in spark.read.schema(base.schema).parquet(path2).collect()
    }
    assert got2 == {1: (5.0, 0.5), 2: (2.0, 0.5)}
    assert not os.path.isdir(os.path.join(path2, "pc=NaN"))


def test_empty_string_partition_value_folds_into_default_partition(spark):
    """ADVICE r6 (medium): Spark's writer maps '' to the SAME
    __HIVE_DEFAULT_PARTITION__ directory as NULL, but the identity layer
    treated '' as a distinct rendering — the pruning predicate
    isin(['']) never read the default partition's rows, so a batch
    carrying pc='' dynamically overwrote __HIVE_DEFAULT_PARTITION__ and
    deleted every other key that lived there; the emptied-dir delete
    likewise targeted the nonexistent 'pc=' path.  '' now folds into
    the NULL identity end to end."""
    import tempfile
    import uuid

    path = os.path.join(tempfile.gettempdir(), f"wh_es_{uuid.uuid4().hex[:10]}")
    # keys 1 and 2 both live in the default partition: 1 via '', 2 via
    # NULL (the writer puts them in the same dir)
    base = spark.createDataFrame(
        [(1, 1.0, 1, ""), (2, 2.0, 1, None), (3, 3.0, 1, "kept")],
        "key long, val double, version int, pc string",
    )
    base.write.partitionBy("pc").parquet(path)
    assert os.path.isdir(os.path.join(path, "pc=__HIVE_DEFAULT_PARTITION__"))
    assert not os.path.isdir(os.path.join(path, "pc="))

    # a batch carrying pc='' updates key 1 only — key 2 (same physical
    # partition) must survive, and pc=kept must be untouched
    u = spark.createDataFrame(
        [(1, 10.0, 2, "")], "key long, val double, version int, pc string"
    )
    merge_incremental_partitioned(spark, path, u, "key", "version", "pc")
    got = {
        r["key"]: (r["val"], r["pc"])
        for r in spark.read.schema(base.schema).parquet(path).collect()
    }
    # read-back canonicalizes both '' and NULL to NULL (Spark semantics)
    assert got == {1: (10.0, None), 2: (2.0, None), 3: (3.0, "kept")}

    # and a key MOVING OUT of '' empties + deletes the DEFAULT dir
    # (not a bogus 'pc=' path) when no rows survive there
    path2 = os.path.join(tempfile.gettempdir(), f"wh_es2_{uuid.uuid4().hex[:10]}")
    spark.createDataFrame(
        [(1, 1.0, 1, ""), (2, 2.0, 1, "kept")],
        "key long, val double, version int, pc string",
    ).write.partitionBy("pc").parquet(path2)
    mv = spark.createDataFrame(
        [(1, 5.0, 2, "kept")], "key long, val double, version int, pc string"
    )
    merge_incremental_partitioned(spark, path2, mv, "key", "version", "pc")
    got2 = {
        r["key"]: (r["val"], r["pc"])
        for r in spark.read.schema(base.schema).parquet(path2).collect()
    }
    assert got2 == {1: (5.0, "kept"), 2: (2.0, "kept")}
    assert not os.path.isdir(os.path.join(path2, "pc=__HIVE_DEFAULT_PARTITION__"))


def test_hive_sentinel_literal_partition_value_folds_into_default(spark):
    """Review r7: the literal string '__HIVE_DEFAULT_PARTITION__' ALSO
    writes into the NULL sentinel directory (and reads back as NULL) —
    it must fold into the same identity as NULL/'' or a batch carrying
    it overwrites the default partition and deletes its other keys."""
    import tempfile
    import uuid

    path = os.path.join(tempfile.gettempdir(), f"wh_sen_{uuid.uuid4().hex[:10]}")
    base = spark.createDataFrame(
        [(1, 1.0, 1, "__HIVE_DEFAULT_PARTITION__"), (2, 2.0, 1, None), (3, 3.0, 1, "kept")],
        "key long, val double, version int, pc string",
    )
    base.write.partitionBy("pc").parquet(path)

    u = spark.createDataFrame(
        [(1, 10.0, 2, "__HIVE_DEFAULT_PARTITION__")],
        "key long, val double, version int, pc string",
    )
    merge_incremental_partitioned(spark, path, u, "key", "version", "pc")
    got = {
        r["key"]: (r["val"], r["pc"])
        for r in spark.read.schema(base.schema).parquet(path).collect()
    }
    assert got == {1: (10.0, None), 2: (2.0, None), 3: (3.0, "kept")}
