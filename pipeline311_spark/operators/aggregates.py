"""Aggregate operators A1-A7 (SURVEY §2.6).

The reference's aggregates are all watermark/count probes; the engine
additionally exposes the full groupBy/rollup/cube surface through the
query registry (plans/relational.py) since Spark provides it natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def max_watermark(df: DataFrame, col: str = "updated_datetime"):
    """A1/A2: MAX watermark (sync-db2.py:57-60; sync-db2-ago.py:518-527).
    Returns a Python scalar (one tiny job — the only sanctioned
    driver-side value in the incremental loop)."""
    return df.agg(F.max(col).alias("w")).first()["w"]


def coalesced_max_watermark(df: DataFrame, col: str = "updated_datetime", default="1970-01-01"):
    """A3: ``COALESCE(MAX(c), epoch)`` (sync-db2-viewer.py:53-54)."""
    row = df.agg(
        F.coalesce(F.max(col), F.lit(default).cast("timestamp")).alias("w")
    ).first()
    return row["w"]


def count_matched(dest: DataFrame, staged: DataFrame, key: str) -> int:
    """A5: matched-rows count (config.py:50-55 semi-join count)."""
    return dest.join(staged.select(key).distinct(), key, "left_semi").count()
