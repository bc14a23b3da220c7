from pipeline311_spark.pipelines.philly311 import (  # noqa: F401
    sync_raw,
    publish_enterprise,
    viewer_merge,
    reconcile,
    publish_features,
)
