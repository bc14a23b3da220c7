"""Custom stateful streaming operator (``applyInPandasWithState``).

The reference's incremental loop keeps one scalar of implicit state (the
destination watermark, SURVEY §1.4/T1).  This module is the general
form: arbitrary per-key state carried across micro-batches by the state
store, with the update logic in an Arrow-batched pandas function.

Determinism note: the running total is kept in integer cents (the
caller pre-rounds ``value*100`` to a long), so cross-batch accumulation
is exact integer arithmetic — the final state is independent of batch
boundaries and matches a plain GROUP BY on the full input, which is
what makes the operator oracle-checkable.

At scale: state lives in the executor state store partitioned by the
grouping key (RocksDB-backed on a real cluster); each micro-batch
shuffles only that batch's rows.  Nothing accumulates on the driver.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_cents long"
STATE_SCHEMA = "n long, cents long"


def _update_running_totals(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(pdf["cents"].sum())
    state.update((n, cents))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_cents": [cents]})


def running_totals_stream(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, total-cents) over a stream of
    ``(user_id long, cents long)`` rows; every batch emits the updated
    cumulative state for the users present in that batch."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
