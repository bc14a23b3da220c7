"""applyInPandasWithState: state must genuinely persist across
micro-batches (streaming/stateful.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline311_spark.streaming.stateful import running_totals_stream


def test_state_carries_across_micro_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # two chunk files: user 1 appears in both, user 2 only in the first
    spark.createDataFrame(
        [(1, 100), (1, 200), (2, 50)], "user_id long, cents long"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(1, 300)], "user_id long, cents long"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("user_id long, cents long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def sink(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out)

    q = (
        running_totals_stream(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {
        (r["user_id"], r["batch_id"]): (r["n_events"], r["total_cents"])
        for r in spark.read.parquet(out).collect()
    }
    batches = sorted({b for _, b in rows})
    assert len(batches) == 2, f"expected 2 micro-batches, saw {batches}"
    b0, b1 = batches
    # user 1: cumulative state grew across the batch boundary
    assert rows[(1, b0)] == (2, 300)
    assert rows[(1, b1)] == (3, 600)
    # user 2: emitted only in its batch; state kept (no timeout) but not re-emitted
    assert rows[(2, b0)] == (1, 50)
    assert (2, b1) not in rows
