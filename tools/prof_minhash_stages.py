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

# tail attribution (r7): where the full-pipeline time past the
# candidates goes — sigg (gram arrays + signature agg + group window),
# cand materialization, verify, expansion/ident/union.  Single pass,
# cumulative milestones.
from pipeline311_spark.ext.cache import persist_tracked
from pipeline311_spark.ext.dedup import (
    IDENT_MAX_GROUP,
    _expand_cross,
    _ident_member_pairs,
    _jaccard_verify,
    _minhash_aggs,
    _row_gram_arrays,
    _stat_aggs,
    _with_groups,
)

spark.catalog.clearCache()
k, bands, n, threshold = 16, 4, 5, 0.2
t0 = time.time()
arrays = persist_tracked(_row_gram_arrays(d, "doc_id", "text", n))
gh = arrays.select("doc", F.explode("garr").alias("g"))
sigg = persist_tracked(
    _with_groups(gh.groupBy("doc").agg(*_minhash_aggs(k, 42), *_stat_aggs()))
)
sigg.count(); t1 = time.time()
reps = sigg.filter(F.col("doc") == F.col("rep"))
cand = persist_tracked(
    lsh_candidate_pairs(reps, k, bands, max_bucket=200, distinct_pairs=False, carry=("gn",))
)
cand.count(); t2 = time.time()
cand_docs = cand.select(F.col("doc_a").alias("doc")).union(
    cand.select(F.col("doc_b").alias("doc"))
)
doc_sets = arrays.join(F.broadcast(cand_docs), "doc", "left_semi").select(
    "doc", F.col("garr").alias("sset")
)
cross = _jaccard_verify(cand.distinct(), doc_sets, threshold).localCheckpoint(eager=True)
t3 = time.time()
final = _expand_cross(cross, sigg, ["jaccard"], gn_cols=("gn_a", "gn_b")).unionByName(
    _ident_member_pairs(sigg, IDENT_MAX_GROUP, group_key=("sz", "fp1", "fp2")).withColumn(
        "jaccard", F.lit(1.0)
    )
)
final.count(); t4 = time.time()
print(f"tail: sigg={t1-t0:5.2f}s cand={t2-t1:5.2f}s verify={t3-t2:5.2f}s expand+ident={t4-t3:5.2f}s")
spark.stop()
