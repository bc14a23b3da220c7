"""Stage-level profile of dedup_minhash_lsh at sf0.1 (local tool)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from pipeline311_spark.ext.dedup import (
    _gram_hash_table,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
)
from pipeline311_spark.plans.common import table

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
d = table(spark, sf, "documents")

def t(label, fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn()
        best = min(best, time.time() - t0)
    print(f"{label:30s} {best:6.2f}s  rows={n}")

# warm
minhash_dedup_pairs(d, "doc_id", "text", k=16, bands=4, n=5, threshold=0.2).count()

t("gram_hash_table", lambda: _gram_hash_table(d, "doc_id", "text", 5).count())
t("signatures", lambda: minhash_signatures(d, "doc_id", "text", k=16, n=5).count())


def cand():
    sig = minhash_signatures(d, "doc_id", "text", k=16, n=5)
    return lsh_candidate_pairs(sig, 16, 4).count()

t("signatures+candidates", cand)
t("full", lambda: minhash_dedup_pairs(d, "doc_id", "text", k=16, bands=4, n=5, threshold=0.2).count())
spark.stop()
