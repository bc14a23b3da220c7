"""Shared machinery for batch-id-partitioned APPEND-ONLY artifact logs.

Two stored-index families maintain on-disk artifacts from streaming
micro-batches — the BM25 triple (ext/retrieval.py) and, since r9, the
MinHash gram table (ext/dedup.py).  Both follow one contract:

* **append**: every micro-batch writes its delta rows dynamically
  overwriting ONLY its own ``batch_id=<n>`` partition — so replayed
  batches (crash-recovery's at-least-once delivery) are idempotent.
* **read** (:func:`read_log`): explicit schema (a log no batch ever
  wrote has no files to infer from → empty frame), and a loud refusal
  when the directory is mid-compaction-swap — in that window the only
  live copy sits in ``.compact.old`` and serving an empty frame would
  be silent data loss.
* **compact** (:func:`recover_swap` + :func:`compact_swap`): fold the
  accreted per-batch partitions into a single ``batch_id = -1`` base
  (real micro-batch ids are >= 0, so even a FRESH checkpoint restarting
  at 0 can never overwrite the base).  Swap mechanics: write staging →
  rename live to ``.old`` → rename staging to live → remove ``.old``
  (LOCAL-FS by design; an object-store deployment swaps via the table
  format's OPTIMIZE).  A crash between the two renames is recovered by
  the next :func:`recover_swap`; a crash AFTER the live rename but
  before cleanup leaves a stale non-empty ``.old`` which the next
  :func:`compact_swap` drops (live is authoritative — ADVICE r8).
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_log(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Log-dir read with explicit schema; absent dir folds to an empty
    frame UNLESS it is mid-compaction-swap, which fails loudly."""
    if not os.path.isdir(path):
        if os.path.isdir(path + ".compact.old"):
            raise RuntimeError(
                f"{path} is mid-compaction-swap (found {path}.compact.old); "
                "re-run the artifact's compaction to recover before serving"
            )
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(path)


def recover_swap(path: str) -> None:
    """Finish a compaction swap that crashed between its two renames:
    the only live copy is the ``.old`` dir — restore it."""
    old = path + ".compact.old"
    if os.path.isdir(old) and not os.path.isdir(path):
        os.rename(old, path)


def compact_swap(path: str, write_staging: Callable[[str], None]) -> None:
    """Atomically-enough replace ``path`` with freshly written content:
    ``write_staging(staging_dir)`` materializes the new content (it may
    READ the live ``path`` — the write completes before any rename),
    then the two-rename swap installs it.  Crash windows are covered by
    :func:`recover_swap` (between renames) and the stale-``.old`` drop
    below (after the live rename, before cleanup)."""
    old, staging = path + ".compact.old", path + ".compact.tmp"
    write_staging(staging)
    if os.path.isdir(path):
        # stale .old from a crash after a previous swap's live rename:
        # live is authoritative, renaming onto a non-empty dir raises
        # (ADVICE r8)
        shutil.rmtree(old, ignore_errors=True)
        os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old, ignore_errors=True)
