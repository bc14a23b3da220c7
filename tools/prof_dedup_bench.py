import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from pipeline311_spark.plans import REGISTRY

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
names = sys.argv[2:] or [
    "dedup_minhash_lsh",
    "dedup_simhash_signatures",
    "dedup_exact_groups",
    "sim_lsh_ann_topk",
    "text_lang_id",
]
REGISTRY["q05_nation_revenue"].fn(spark, sf).count()  # warm
for name in names:
    best = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        REGISTRY[name].fn(spark, sf).count()
        best = min(best, time.time() - t0)
    print(name, "%.2fs" % best)
spark.stop()
