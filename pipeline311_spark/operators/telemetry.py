"""Pipeline telemetry — the engine-native replacement for the
reference's print-every-50k-rows progress loop (SURVEY §2.8 T5;
``sync-db2.py:64-67``, ``delete-removed-tickets.py:120-125``).

A driver-side counter over a materialized list cannot exist in a
distributed plan, and an accumulator-in-UDF would drag rows through
Python.  Spark's named observations (``DataFrame.observe``) are the
idiomatic form: metric expressions evaluated inside the existing
codegen pipeline as rows stream through, collected once per action —
zero extra passes, zero Python in the hot path, and they surface in
the Spark UI / QueryExecutionListener like any metric.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame, name: str = "progress", extra: dict[str, Column] | None = None
) -> tuple[DataFrame, Observation]:
    """Attach row/throughput telemetry to a plan.

    Returns ``(df, observation)``; after any action on ``df``,
    ``observation.get`` holds the metrics.  Default metrics are the
    reference's progress signals (rows seen); pass ``extra`` columns
    (e.g. ``F.sum(F.length('text'))``) for bytes-style counters.
    """
    obs = Observation(name)
    metrics = {"n_rows": F.count(F.lit(1))}
    if extra:
        metrics.update(extra)
    out = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return out, obs
