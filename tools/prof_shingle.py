import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, Window, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from pipeline311_spark.ext.dedup import _shingle_table
from pipeline311_spark.ext.textstats import normalize_text

d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").repartition(32)
d.persist().count()

t0 = time.time()
n = _shingle_table(d, "doc_id", "text", 5).count()
print("current array impl:", n, "%.1fs" % (time.time() - t0))

t0 = time.time()
toks = d.select(
    F.col("doc_id").alias("doc"),
    F.posexplode(F.split(normalize_text("text"), " ")).alias("pos", "tok"),
)
w = Window.partitionBy("doc").orderBy("pos")
grams = toks.select(
    "doc",
    F.concat_ws(
        " ",
        "tok",
        F.lead("tok", 1).over(w),
        F.lead("tok", 2).over(w),
        F.lead("tok", 3).over(w),
        F.lead("tok", 4).over(w),
    ).alias("shingle"),
    F.lead("tok", 4).over(w).alias("last"),
).filter(F.col("last").isNotNull()).drop("last").distinct()
n2 = grams.count()
print("window impl:", n2, "%.1fs" % (time.time() - t0))

# repeat both warm
t0 = time.time(); _shingle_table(d, "doc_id", "text", 5).count(); print("array warm: %.1fs" % (time.time() - t0))
t0 = time.time(); grams.count(); print("window warm: %.1fs" % (time.time() - t0))
spark.stop()
