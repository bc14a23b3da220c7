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
from pipeline311_spark.ext.dedup import (
    _shingle_table,
    lsh_candidate_pairs,
)
from pipeline311_spark.ext.hashing import affine, hash_params, poly_hash

d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
d.count()

t0 = time.time()
sh = _shingle_table(d, "doc_id", "text", 5).persist()
sh.count()
print("shingle+persist:", "%.1fs" % (time.time() - t0))

params = hash_params(16, 42)
t0 = time.time()
hashed = sh.withColumn("h", poly_hash("shingle"))
sig = hashed.groupBy("doc").agg(
    *[F.min(affine(F.col("h"), a, b)).alias(f"mh{i}") for i, (a, b) in enumerate(params)]
).persist()
sig.count()
print("signatures:", "%.1fs" % (time.time() - t0))

t0 = time.time()
cand = lsh_candidate_pairs(sig, 16, 4).persist()
print("candidates:", cand.count(), "%.1fs" % (time.time() - t0))

t0 = time.time()
sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
a, b = sh.alias("a"), sh.alias("b")
inter = (
    cand.join(a, cand.doc_a == F.col("a.doc"))
    .join(b, (cand.doc_b == F.col("b.doc")) & (F.col("a.shingle") == F.col("b.shingle")))
    .groupBy("doc_a", "doc_b")
    .agg(F.count("*").alias("inter"))
)
res = (
    inter.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
    .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
    .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
    .filter(F.col("jaccard") >= 0.2)
)
print("verify:", res.count(), "%.1fs" % (time.time() - t0))
spark.stop()
