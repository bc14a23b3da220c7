import sys, time, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from pipeline311_spark.ext.dedup import _shingle_table, minhash_signatures, lsh_candidate_pairs
from pipeline311_spark.ext.hashing import poly_hash

d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
t0 = time.time(); sh = _shingle_table(d, "doc_id", "text", 5); n = sh.count(); print("shingles:", n, "%.1fs" % (time.time() - t0))
t0 = time.time(); sh.withColumn("h", poly_hash("shingle")).agg(F.sum("h")).collect(); print("polyhash:", "%.1fs" % (time.time() - t0))
t0 = time.time(); sig = minhash_signatures(d, "doc_id", "text", 16, 5); sig.count(); print("signatures:", "%.1fs" % (time.time() - t0))
t0 = time.time(); cand = lsh_candidate_pairs(sig, 16, 4); print("candidates:", cand.count(), "%.1fs" % (time.time() - t0))
spark.stop()
