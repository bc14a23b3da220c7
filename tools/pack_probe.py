"""Dominant-source packing probe (r8): measure, at scale on local[N],
the flagship pipeline's two packing strategies on a corpus where ONE
source holds ~90% of all rows — the exact skew that breaks the
single-window form (its per-source sort runs in one task, so the hot
source serializes the stage and, at real scale, spills or OOMs).

* ``window``     — sum() OVER (PARTITION BY source ORDER BY id):
                   one partition carries the dominant source.
* ``two_phase``  — ext/sampling.running_sum_two_phase: id-range
                   buckets + broadcast offsets; the hot source's sort
                   parallelizes n_buckets ways.

Both must produce the IDENTICAL pack assignment (checksummed), the
same guarantee the shared DuckDB oracle pins for the flagship pair
(curation_full_pipeline / curation_pipeline_pack2phase).

Prints one JSON line; paste the numbers into SCALE.md.

Usage: python tools/pack_probe.py [n_rows_millions (default 20)]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGET = 1000


def main() -> None:
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from pipeline311_spark.ext.sampling import running_sum_two_phase

    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    n_rows = int(n_m * 1_000_000)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pack_probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 90% of rows land on source 'hot', the rest spread over 100 tails;
    # token counts vary 1..40 deterministically
    tok = spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("s"), (F.col("id") % 100).cast("string")))
        .alias("source"),
        (F.col("id") * 37 % 40 + 1).alias("n_tok"),
    )

    def checksum(df):
        # order-insensitive fingerprint of the (doc, pack) assignment
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("doc_id", "pack_id") % 1_000_003).alias("chk"),
        ).collect()[0]

    def pack_window():
        w = (
            Window.partitionBy("source")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return tok.withColumn(
            "pack_id",
            F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / BUDGET).cast("bigint"),
        )

    def pack_two_phase():
        return running_sum_two_phase(
            tok, "source", "doc_id", "n_tok", out_col="__cum", n_buckets=cpus
        ).withColumn(
            "pack_id",
            F.floor((F.col("__cum") - F.col("n_tok")) / BUDGET).cast("bigint"),
        )

    # warmup (codegen + range materialization)
    tok.limit(100_000).agg(F.count(F.lit(1))).collect()

    results: dict[str, float] = {}
    sums: dict[str, tuple] = {}
    for tag, fn in (("window", pack_window), ("two_phase", pack_two_phase)):
        t0 = time.time()
        row = checksum(fn())
        results[tag] = round(time.time() - t0, 3)
        sums[tag] = (row["n"], row["chk"])
    assert sums["window"] == sums["two_phase"], f"assignments diverge: {sums}"
    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "hot_share": 0.9,
                "n": sums["window"][0],
                "secs": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
