"""SparkSession factory.

The reference pipeline is single-threaded Python with an 8 GB RAM gate
(full-update-from-sf.sh:7-13); the engine replaces that with a properly
configured Spark session: AQE on (runtime partition coalescing, broadcast
selection, skew-join splitting), Arrow transfer on for the few pandas
UDFs, and shuffle partitions sized to the machine instead of the 200
default.

Timezone: the reference mixes UTC and US/Eastern (SURVEY §7.5.1).  The
engine stores instants and pins the *session* timezone explicitly;
conversion to US/Eastern wall time happens at the edges via
``from_utc_timestamp`` / ``date_format`` (functions/timeparse.py), never
implicitly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

PIPELINE_TZ = "America/New_York"  # reference: common.py:193-197, sync-db2.py:166


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "pipeline311_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    session_tz: str = "UTC",
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession tuned for this engine.

    On a real cluster, ``master``/memory come from spark-submit; every
    setting here is also safe cluster-side.  ``spark.sql.shuffle.partitions``
    is a floor — AQE coalesces down from it at runtime, so on a
    1000-executor cluster you would raise it (e.g. 2-3x total cores) and
    let AQE shrink small stages.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", session_tz)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def prep_session(spark: SparkSession, session_tz: str = "UTC") -> SparkSession:
    """Idempotently pin runtime-settable confs on a session we did not
    create (the driver harness owns the session passed to
    ``__spark_entry__``).  Session timezone must be UTC so tz-naive
    parquet timestamps round-trip identically to the DuckDB oracle;
    shuffle partitions sized to the machine instead of the 200 default
    (AQE coalesces below that at runtime).
    """
    spark.conf.set("spark.sql.session.timeZone", session_tz)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", str(max(default_parallelism(), 8)))
    # Conf ownership for the nanos-encoded parquet generation lives HERE
    # (not scattered in readers): TIMESTAMP(NANOS) columns read as long
    # and every scan path maps them back to TimestampType via
    # sources.readers.normalize_event_time, so no plan — batch or
    # streaming — ever sees the physical encoding.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
