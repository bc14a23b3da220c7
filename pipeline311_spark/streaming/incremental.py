"""Watermark-driven incremental execution (SURVEY T1; §1.4).

The reference approximates a stream with scheduled batch + watermark
("get all records updated since then", README.md:21).  The engine
offers both forms:

* :class:`IncrementalRunner` — the faithful batch equivalent: read the
  destination watermark, pull newer source rows, MERGE, write.  Late
  data is handled naturally because the watermark is the *destination*
  max while the pull is by *source* modify time.
* :func:`stream_merge` — the idiomatic upgrade: Structured Streaming
  ``readStream -> withWatermark -> foreachBatch(merge)``, for when the
  source is a real stream (file/kafka).  Each micro-batch applies the
  same window-dedup MERGE kernel, so the two paths share semantics.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline311_spark.operators.merge import upsert


class IncrementalRunner:
    """T1 as a reusable driver: ``run_once`` = one scheduled sync."""

    def __init__(
        self,
        read_target: Callable[[], DataFrame],
        read_source_since: Callable[[object | None], DataFrame],
        write_target: Callable[[DataFrame], None],
        key: str,
        watermark_col: str = "updated_datetime",
        inclusive: bool = False,
    ):
        self.read_target = read_target
        self.read_source_since = read_source_since
        self.write_target = write_target
        self.key = key
        self.watermark_col = watermark_col
        self.inclusive = inclusive

    def current_watermark(self, target: DataFrame):
        return target.agg(F.max(self.watermark_col)).first()[0]

    def run_once(self) -> DataFrame:
        target = self.read_target()
        w = self.current_watermark(target)
        source = self.read_source_since(w)
        if w is not None:
            c = F.col(self.watermark_col)
            source = source.filter(c >= F.lit(w) if self.inclusive else c > F.lit(w))
        merged = upsert(target, source, self.key, self.watermark_col)
        self.write_target(merged)
        return merged


def stream_merge(
    stream_df: DataFrame,
    key: str,
    watermark_col: str,
    apply_batch: Callable[[DataFrame, int], None],
    delay: str = "10 minutes",
    checkpoint: str | None = None,
    trigger_once: bool = True,
):
    """Structured Streaming twin of the incremental loop.  The caller's
    ``apply_batch`` typically wraps :func:`pipeline311_spark.operators
    .merge.upsert` against the serving table."""
    writer = (
        stream_df.withWatermark(watermark_col, delay)
        .writeStream.foreachBatch(apply_batch)
        .outputMode("update")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
