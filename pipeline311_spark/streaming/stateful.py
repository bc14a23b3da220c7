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


EXPIRING_OUTPUT_SCHEMA = "user_id long, n_events long, total_cents long, final boolean"


def expiring_totals_stream(events_stream: DataFrame, gap_ms: int = 30 * 60 * 1000) -> DataFrame:
    """Per-user totals with EVENT-TIME state eviction — the property
    that keeps custom state viable on an unbounded stream: a key whose
    watermark-relative session gap has passed emits one FINAL row and
    its state is REMOVED from the store (state bounded by active keys,
    not stream history).  Input: ``(user_id long, cents long,
    ts timestamp)`` with a watermark already set on ``ts``.

    Progress rows (``final=false``) stream per batch; the terminal
    ``final=true`` row fires from the timeout branch when the watermark
    passes last-seen + gap — the applyInPandasWithState analogue of
    session_window eviction (tests/test_stateful_streaming.py)."""

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            n, cents = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_cents": [cents], "final": [True]}
            )
            return
        n, cents = state.get if state.exists else (0, 0)
        last_ms = 0
        for pdf in pdfs:
            n += len(pdf)
            cents += int(pdf["cents"].sum())
            last_ms = max(last_ms, int(pdf["ts"].max().value // 1_000_000))
        state.update((n, cents))
        state.setTimeoutTimestamp(last_ms + gap_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [cents], "final": [False]}
        )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=EXPIRING_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
