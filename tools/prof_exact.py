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
from pipeline311_spark.ext.dedup import exact_dup_groups
from pipeline311_spark.ext.textstats import fingerprint

d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
d.count()  # warm

t0 = time.time()
key = fingerprint(F.substring("text", 1, 80))
n = exact_dup_groups(d, "doc_id", "text", key=key).count()
print("exact_dup_groups:", n, "%.2fs" % (time.time() - t0))

t0 = time.time()
n = (
    d.repartition(32)
    .select("doc_id", key.alias("fp"))
    .groupBy("fp")
    .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper_id"))
    .filter("n_docs > 1")
    .count()
)
print("inline version:", n, "%.2fs" % (time.time() - t0))

t0 = time.time()
x = d.rdd.getNumPartitions()
print("rdd.getNumPartitions:", x, "%.2fs" % (time.time() - t0))
spark.stop()
