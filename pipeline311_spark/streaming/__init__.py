from pipeline311_spark.streaming.incremental import IncrementalRunner  # noqa: F401
