"""Z-order layout (operators/layout.py): Morton-key math and the
actual clustering effect — range-partitioned z-ordered files must be
narrow in BOTH dimensions at once (the property single-column sorting
cannot give, and the reason the layout makes parquet min/max stats
selective for two filter columns simultaneously)."""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import functions as F

from pipeline311_spark.operators.layout import bucketize, write_zordered, zorder_key


def test_zorder_key_known_values(spark):
    rows = [(0, 0), (1, 0), (0, 1), (1, 1), (3, 3), (255, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key(F.col("x"), F.col("y"), bits=8).alias("z")).collect()
    }
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1  # x bit 0 -> position 0
    assert got[(0, 1)] == 2  # y bit 0 -> position 1
    assert got[(1, 1)] == 3
    assert got[(3, 3)] == 15
    assert got[(255, 255)] == 65535


def test_bucketize_clamps(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (49.9,), (100.0,), (250.0,)], "v double")
    got = [r["b"] for r in df.select(bucketize(F.col("v"), 0, 100, 10).alias("b")).collect()]
    assert got == [0, 0, 4, 9, 9]


def test_zordered_files_narrow_in_both_dims(spark, sf_dir):
    o = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .select(
            (F.col("o_custkey") % 256).cast("long").alias("x"),
            (F.dayofyear("o_orderdate") % 256).cast("long").alias("y"),
        )
    )
    out = os.path.join(tempfile.gettempdir(), f"p311_zorder_{uuid.uuid4().hex[:12]}")
    write_zordered(o, out, zorder_key(F.col("x"), F.col("y"), bits=8), num_files=8)

    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("x") - F.min("x")).alias("xr"),
            (F.max("y") - F.min("y")).alias("yr"),
        )
        .collect()
    )
    assert len(per_file) >= 4
    avg_xr = sum(r["xr"] for r in per_file) / len(per_file)
    avg_yr = sum(r["yr"] for r in per_file) / len(per_file)
    # global range is ~255 in each dim; z-clustered files must cover a
    # strictly narrower window in BOTH dims simultaneously
    assert avg_xr < 200 and avg_yr < 200, (avg_xr, avg_yr)
    # and meaningfully narrower in at least one on average
    assert min(avg_xr, avg_yr) < 140, (avg_xr, avg_yr)


def test_lsh_partitioned_corpus_prunes_probe_reads(spark, sf_dir):
    """The ANN scale layout: corpus written partitionBy(bucket) must
    give partition-PRUNED probe reads — a literal bucket predicate
    lands in the scan's PartitionFilters (directory pruning), never a
    post-scan filter over all files.  Also guards the 'b' prefix:
    bit-string partition values survive read-back verbatim."""
    import io
    from contextlib import redirect_stdout

    from pipeline311_spark.ext.similarity import lsh_bucket

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = (
        lsh_bucket(e, "vec_id", "embedding", n_planes=4, seed=7, dim=64)
        .withColumn("pkey", F.concat(F.lit("b"), F.col("bucket")))
        .drop("bucket")
    )
    out = os.path.join(tempfile.gettempdir(), f"p311_annprune_{uuid.uuid4().hex[:12]}")
    cb.write.mode("overwrite").partitionBy("pkey").parquet(out)
    back = spark.read.parquet(out)

    # partition values survive verbatim (leading zeros intact)
    vals = {r["pkey"] for r in back.select("pkey").distinct().collect()}
    assert vals == {("b" + r["bucket"]) for r in
                    lsh_bucket(e, "vec_id", "embedding", n_planes=4, seed=7, dim=64)
                    .select("bucket").distinct().collect()}
    assert all(len(v) == 5 and v.startswith("b") for v in vals)

    probe = back.filter(F.col("pkey") == sorted(vals)[0])
    buf = io.StringIO()
    with redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [isnotnull(pkey" in plan
    # the predicate must NOT degrade to a data Filter node after the scan
    assert "Filter (" not in plan


def test_ivf_partitioned_cells_prune_probe_reads(spark, sf_dir):
    """Same contract for the IVF store layout: cell assignment written
    partitionBy(cell) must give partition-pruned probe reads."""
    import io
    from contextlib import redirect_stdout

    from pipeline311_spark.ext.similarity import ivf_assign

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("embedding").isNotNull()
    )
    cells = (
        ivf_assign(e, e.filter(F.col("vec_id") < 8))
        .withColumn("pkey", F.concat(F.lit("c"), F.col("centroid_id").cast("string")))
        .drop("centroid_id")
    )
    out = os.path.join(tempfile.gettempdir(), f"p311_ivfprune_{uuid.uuid4().hex[:12]}")
    cells.write.mode("overwrite").partitionBy("pkey").parquet(out)
    back = spark.read.parquet(out)
    probe = back.filter(F.col("pkey") == "c0")
    buf = io.StringIO()
    with redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [isnotnull(pkey" in plan
    assert "Filter (" not in plan


def test_compact_parquet_dir_reduces_files_preserving_content(spark, tmp_path):
    import os

    from pipeline311_spark.operators.layout import compact_parquet_dir

    out = str(tmp_path / "frag")
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    df.repartition(40).write.mode("overwrite").parquet(out)
    n_before = sum(1 for f in os.listdir(out) if f.endswith(".parquet"))
    assert n_before >= 40

    n_after = compact_parquet_dir(spark, out, target_file_bytes=256 * 1024 * 1024)
    assert n_after < n_before and n_after >= 1
    listed = sum(1 for f in os.listdir(out) if f.endswith(".parquet"))
    assert listed == n_after
    # content identity, and the staging dir is gone
    back = spark.read.parquet(out)
    assert back.count() == 10_000
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0
    assert not os.path.exists(out + ".compact.tmp")
    assert not os.path.exists(out + ".compact.old")


def test_compact_parquet_dir_recovers_crashed_swap(spark, tmp_path):
    import os

    from pipeline311_spark.operators.layout import compact_parquet_dir

    out = str(tmp_path / "crashed")
    df = spark.range(0, 1_000).select(F.col("id"), (F.col("id") % 3).alias("k"))
    df.repartition(8).write.mode("overwrite").parquet(out)
    # simulate a crash between the two swap renames: the only live copy
    # of the table sits in .compact.old and the table dir is gone
    os.rename(out, out + ".compact.old")
    assert not os.path.exists(out)

    n_after = compact_parquet_dir(spark, out, target_file_bytes=256 * 1024 * 1024)
    assert n_after >= 1
    back = spark.read.parquet(out)
    assert back.count() == 1_000
    assert back.exceptAll(df).count() == 0
    assert not os.path.exists(out + ".compact.old")
