"""Per-Spark-job breakdown of one registry query: runs the query once
warm, then re-runs it with a job-start/end listener attached and prints
each job's wall seconds + description, plus the dead time between jobs
(driver-side plan construction / py4j overhead — guide §1.1/§7.3).

Usage::

    python tools/prof_jobs.py <query> [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from pipeline311_spark.plans import REGISTRY

name = sys.argv[1]
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

for warm in ("q05_nation_revenue", name):
    REGISTRY[warm].fn(spark, sf).count()

# Listener via the Scala gateway: record (jobId, submitTime, completionTime).
jvm = spark.sparkContext._jvm
sc = spark.sparkContext._jsc.sc()

events: list[tuple[str, int, float, str]] = []

from py4j.java_gateway import java_import

java_import(jvm, "org.apache.spark.scheduler.*")


class PyListener:
    def onJobStart(self, jobStart):
        props = jobStart.properties()
        desc = props.getProperty("spark.job.description") or ""
        events.append(("start", jobStart.jobId(), time.time(), desc))

    def onJobEnd(self, jobEnd):
        events.append(("end", jobEnd.jobId(), time.time(), ""))

    class Java:
        implements = ["org.apache.spark.scheduler.SparkListenerInterface"]


# SparkListenerInterface has many methods; use the simpler route: poll
# the AppStatusStore after the run instead of a live listener.
spark.catalog.clearCache()
store = spark.sparkContext._jsc.sc().statusStore()


def _jobs_list():
    seq = store.jobsList(None)
    return [seq.apply(i) for i in range(seq.size())]


before_ids = {j.jobId() for j in _jobs_list()}

t0 = time.time()
df = REGISTRY[name].fn(spark, sf)
t1 = time.time()
df.count()
t2 = time.time()

jobs = []
for j in _jobs_list():
    if j.jobId() in before_ids:
        continue
    sub = j.submissionTime().get().getTime() / 1000.0
    comp = j.completionTime().get().getTime() / 1000.0 if j.completionTime().isDefined() else sub
    desc = j.description().get() if j.description().isDefined() else j.name()
    jobs.append((sub, comp, j.jobId(), str(desc)[:100]))

jobs.sort()
print(f"\n{name}: construct={t1-t0:.2f}s action={t2-t1:.2f}s total={t2-t0:.2f}s")
print(f"{len(jobs)} spark jobs during the run:")
prev_end = t0
gap_total = 0.0
job_total = 0.0
for sub, comp, jid, desc in jobs:
    gap = sub - prev_end
    gap_total += max(0.0, gap)
    job_total += comp - sub
    print(f"  job {jid:4d}  +{sub-t0:7.2f}s  dur={comp-sub:6.2f}s  gap_before={gap:6.2f}s  {desc}")
    prev_end = max(prev_end, comp)
tail_gap = t2 - prev_end
print(f"sum(job durations)={job_total:.2f}s  sum(gaps between jobs)={gap_total:.2f}s  tail_gap={tail_gap:.2f}s")
spark.stop()
