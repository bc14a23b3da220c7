"""Backfill / partitioned reprocessing (SURVEY T2/S10).

The reference backfills with bash loops spawning one process per
year/month/day (full-refresh.sh:7-23, update-by-months-sf.sh:4-31) and
hand-computes UTC half-open windows incl. the December rollover
(sync-db2.py:106-135).  The engine replaces the loops with one
partition-pruned filter: on date-partitioned storage Catalyst prunes
partitions; the grain is a parameter, not 17 shell invocations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_bounds(year: int, month: int | None = None, day: int | None = None):
    """Half-open [start, end) bounds for a year/month/day grain —
    the sync-db2.py:106-135 window computation (incl. rollover) done
    with datelib instead of manual arithmetic."""
    import datetime as dt

    if day is not None and month is not None:
        start = dt.datetime(year, month, day)
        end = start + dt.timedelta(days=1)
    elif month is not None:
        start = dt.datetime(year, month, 1)
        end = dt.datetime(year + 1, 1, 1) if month == 12 else dt.datetime(year, month + 1, 1)
    else:
        start, end = dt.datetime(year, 1, 1), dt.datetime(year + 1, 1, 1)
    return start, end


def partition_window_filter(
    df: DataFrame, col: str, year: int, month: int | None = None, day: int | None = None
) -> DataFrame:
    """T2: one grain of a backfill as a prunable predicate."""
    start, end = window_bounds(year, month, day)
    c = F.col(col)
    return df.filter((c >= F.lit(start)) & (c < F.lit(end)))
