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
from pipeline311_spark.plans import REGISTRY
from pipeline311_spark.sources.readers import load_table

sf = "/root/testdata/sf0.1"
e = load_table(spark, sf, "events")
print("users:", e.select("user_id").distinct().count(), "rows:", e.count())

# warm python workers
e.select(F.pandas_udf(lambda s: s, "long")(F.col("user_id"))).count() if False else None
for _ in range(3):
    t0 = time.time()
    REGISTRY["custom_apply_in_pandas"].fn(spark, sf).count()
    print("applyInPandas: %.2fs" % (time.time() - t0))
spark.stop()
