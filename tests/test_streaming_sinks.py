"""Tests for the incremental runner (T1), batched sink writer (K5-K7
retry envelope), and the structured-streaming merge path."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from pipeline311_spark.sinks.writers import batched_foreach_writer, write_parquet
from pipeline311_spark.streaming.incremental import IncrementalRunner


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_incremental_runner_two_syncs(spark, tmp_path):
    tgt = str(tmp_path / "target")
    src_rows = [
        (1, "v1", ts("2024-01-01T00:00:00")),
        (2, "v1", ts("2024-01-02T00:00:00")),
    ]
    source = {"df": spark.createDataFrame(src_rows, "pk long, val string, updated_datetime timestamp")}
    write_parquet(source["df"].limit(0), tgt)

    runner = IncrementalRunner(
        read_target=lambda: spark.read.parquet(tgt),
        read_source_since=lambda w: source["df"],
        write_target=lambda df: df.count(),  # materialize; targets differ per sync below
        key="pk",
        watermark_col="updated_datetime",
    )
    merged = runner.run_once()
    assert merged.count() == 2

    # second sync with one newer row and one stale row
    source["df"] = spark.createDataFrame(
        [
            (2, "v2", ts("2024-01-05T00:00:00")),
            (1, "stale", ts("2023-12-01T00:00:00")),
        ],
        "pk long, val string, updated_datetime timestamp",
    )
    runner.read_target = lambda: merged
    out = {r["pk"]: r["val"] for r in runner.run_once().collect()}
    assert out == {1: "v1", 2: "v2"}


def test_batched_writer_batches_and_retries(spark, tmp_path):
    log = str(tmp_path / "sent.log")
    df = spark.range(0, 103).coalesce(1)

    fail_marker = str(tmp_path / "failed_once")

    def send(rows):
        # fail the first call once to exercise the retry ladder
        if not os.path.exists(fail_marker):
            open(fail_marker, "w").close()
            raise RuntimeError("transient")
        with open(log, "a") as f:
            f.write(f"{len(rows)}\n")

    batched_foreach_writer(df, send, batch_size=50, max_tries=3, backoff_s=0.01)
    sizes = [int(line) for line in open(log)]
    assert sorted(sizes, reverse=True) == [50, 50, 3]


def test_batched_writer_raises_after_max_tries(spark):
    def always_fail(rows):
        raise RuntimeError("down")

    with pytest.raises(Exception):
        batched_foreach_writer(spark.range(5), always_fail, batch_size=2, max_tries=2, backoff_s=0.0)


def test_stream_merge_foreachbatch(spark, tmp_path):
    from pipeline311_spark.operators.merge import upsert
    from pipeline311_spark.streaming.incremental import stream_merge

    src_dir = str(tmp_path / "stream_src")
    out_dir = str(tmp_path / "serve")
    events = spark.createDataFrame(
        [
            (1, "a", ts("2024-01-01T00:00:00")),
            (1, "b", ts("2024-01-02T00:00:00")),
            (2, "c", ts("2024-01-01T12:00:00")),
        ],
        "pk long, val string, updated_datetime timestamp",
    )
    events.write.parquet(src_dir)
    write_parquet(events.limit(0), out_dir)

    stream = spark.readStream.schema(events.schema).parquet(src_dir)

    def apply_batch(batch_df, batch_id):
        current = spark.read.parquet(out_dir)
        merged = upsert(current, batch_df, "pk", "updated_datetime")
        merged.write.mode("overwrite").parquet(out_dir + ".tmp")
        spark.read.parquet(out_dir + ".tmp").write.mode("overwrite").parquet(out_dir)

    q = stream_merge(
        stream, "pk", "updated_datetime", apply_batch,
        checkpoint=str(tmp_path / "ckpt"), trigger_once=True,
    )
    q.awaitTermination(120)
    final = {r["pk"]: r["val"] for r in spark.read.parquet(out_dir).collect()}
    assert final == {1: "b", 2: "c"}


def test_batched_writer_throttle_pauses_between_batches(spark, tmp_path):
    import time as _time

    log = str(tmp_path / "stamps.log")

    def send(rows):
        with open(log, "a") as f:
            f.write(f"{_time.monotonic()}\n")

    df = spark.range(0, 6).coalesce(1)
    batched_foreach_writer(df, send, batch_size=2, throttle_s=0.2)
    stamps = [float(line) for line in open(log)]
    assert len(stamps) == 3
    # T6: a politeness pause separates consecutive successful batches
    assert all(b - a >= 0.18 for a, b in zip(stamps, stamps[1:]))
