import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from pipeline311_spark.ext.dedup import _shingle_table
from pipeline311_spark.ext.hashing import BASE, MOD, poly_hash
from pipeline311_spark.ext.textstats import normalize_text, tokens

d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").repartition(32)
d.persist().count()
N = 5

# current: string shingles + char-fold hash per shingle
t0 = time.time()
cur = _shingle_table(d, "doc_id", "text", N).withColumn("h", poly_hash("shingle"))
cur.agg(F.sum("h")).collect()
t_cur_cold = time.time() - t0
t0 = time.time()
cur.agg(F.sum("h")).collect()
print("string-shingle hash: cold %.1fs warm %.1fs" % (t_cur_cold, time.time() - t0))


# candidate: token hashes once, gram hash = fold over token-hash window
def poly(s):
    chars = F.transform(F.split(s, ""), lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(chars, F.lit(0).cast("long"), lambda acc, ch: (acc * BASE + ch) % MOD)


toks = tokens(normalize_text("text"))
th = F.transform(toks, poly)
idx = F.sequence(F.lit(0), F.size(th) - N)
grams = F.transform(
    idx,
    lambda i: F.aggregate(
        F.slice(th, i + 1, N), F.lit(0).cast("long"), lambda acc, h: (acc * 131 + h) % MOD
    ),
)
gh = d.select(
    F.col("doc_id").alias("doc"),
    F.explode(
        F.array_distinct(F.when(F.size(toks) >= N, grams).otherwise(F.array().cast("array<long>")))
    ).alias("h"),
)
t0 = time.time()
gh.agg(F.sum("h")).collect()
t_gh_cold = time.time() - t0
t0 = time.time()
gh.agg(F.sum("h")).collect()
print("token-gram hash:     cold %.1fs warm %.1fs" % (t_gh_cold, time.time() - t0))
spark.stop()
