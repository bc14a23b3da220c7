"""Phase profiler: per registry query, split CONSTRUCTION (the driver-side
``spec.fn`` call that builds the plan, including any artifact writes the
query performs while constructing) from the final ACTION (``.count()``),
best-of-N each.  The bench times both together; this tells us which side
to optimize (guide §1: measure first).

Usage::

    python tools/prof_phase.py [sf_dir] [query ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from pipeline311_spark.plans import REGISTRY

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
names = sys.argv[2:] or [
    "dedup_minhash_from_array_store",
    "dedup_minhash_incremental",
    "sim_ivfpq_trained_audit",
    "stream_minhash_maintain",
    "text_bm25_delete_maintain",
    "stream_ann_index_maintain",
    "stream_bm25_delete_maintain",
    "dedup_minhash_surviving",
    "stream_bm25_index_maintain",
    "retrieval_hybrid_rrf",
    "dedup_minhash_delete_maintain",
    "dedup_minhash_incr_store",
    "dedup_minhash_lsh",
]
for warm in ("q05_nation_revenue", "dedup_minhash_lsh"):
    REGISTRY[warm].fn(spark, sf).count()

for name in names:
    spec = REGISTRY.get(name)
    if spec is None:
        print(f"{name}: not in REGISTRY")
        continue
    best_c = best_a = best_t = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        df = spec.fn(spark, sf)
        t1 = time.time()
        df.count()
        t2 = time.time()
        best_c = min(best_c, t1 - t0)
        best_a = min(best_a, t2 - t1)
        best_t = min(best_t, t2 - t0)
    print(
        f"{name:34s} total={best_t:6.2f}s construct={best_c:6.2f}s "
        f"action={best_a:6.2f}s"
    )
spark.stop()
