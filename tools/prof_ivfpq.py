"""Phase profiler for the stored IVF-PQ family (round-11 optimization).

Breaks sim_ivfpq_from_store into its real sub-phases and times each —
the verify-skill rule: at sf0.1 everything is overhead-bound, so find
WHICH jobs/stage-waves cost the wall before touching any code.

Usage::

    python tools/prof_ivfpq.py [sf_dir] [repeats]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("prof_ivfpq")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from pipeline311_spark.ext.ann_store import (
        ann_adc_topk_from_store,
        ann_index_build,
        ann_quantizer_build,
        _encode_write,
        _load_quantizer,
        _vec_frame,
    )
    from pipeline311_spark.plans.ann_store_q import (
        _ANN_CELLS,
        _ANN_K,
        _ANN_NPROBE,
        _query_vecs,
    )
    from pipeline311_spark.plans.common import emb_table
    from pipeline311_spark.plans.curation4 import _PQ_K

    def phase(label, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"  {label:35s} {dt:7.3f}s")
        return out, dt

    # warm-up: one full query run
    print("warm-up run ...")
    t0 = time.perf_counter()
    out = os.path.join(tempfile.gettempdir(), f"prof_ivfpq_{uuid.uuid4().hex[:8]}")
    e = emb_table(spark, sf_dir)
    ann_index_build(spark, e, out, n_cells=_ANN_CELLS, pq_k=_PQ_K)
    ann_adc_topk_from_store(
        spark, out, _query_vecs(e), k=_ANN_K, nprobe=_ANN_NPROBE
    ).count()
    shutil.rmtree(out, ignore_errors=True)
    print(f"  warm total: {time.perf_counter()-t0:.3f}s")

    for r in range(repeats):
        print(f"--- repeat {r} ---")
        out = os.path.join(
            tempfile.gettempdir(), f"prof_ivfpq_{uuid.uuid4().hex[:8]}"
        )
        try:
            e, _ = phase("emb_table (construct)", lambda: emb_table(spark, sf_dir))
            v, _ = phase("_vec_frame (construct)", lambda: _vec_frame(e, "vec_id", "embedding"))
            (cents_cbook, _) = phase(
                "quantizer_build (seed collect+2 writes)",
                lambda: ann_quantizer_build(spark, v, out, _ANN_CELLS, _PQ_K),
            )
            cents, cbook = cents_cbook
            phase(
                "encode+write codes (assign+pq+write)",
                lambda: _encode_write(spark, v, out, cents, cbook, 4, 16, mode="overwrite"),
            )
            qv, _ = phase("_query_vecs (filter collect)", lambda: _query_vecs(e))
            df_serve_holder = {}

            def build_serve():
                df_serve_holder["df"] = ann_adc_topk_from_store(
                    spark, out, qv, k=_ANN_K, nprobe=_ANN_NPROBE
                )

            phase("serve plan construct", build_serve)
            phase("serve execute (count)", lambda: df_serve_holder["df"].count())
            phase("serve execute again", lambda: df_serve_holder["df"].count())
        finally:
            shutil.rmtree(out, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
