"""Unit tests for as-of and range joins (operators/temporal.py)."""

from __future__ import annotations

import datetime as dt

from pipeline311_spark.operators.temporal import asof_join, range_join_buckets


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_join_semantics(spark):
    quotes = spark.createDataFrame(
        [(1, ts(9), 100.0), (1, ts(11), 110.0), (2, ts(10), 200.0)],
        "sym long, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            (1, ts(8)),   # before any quote -> NULL
            (1, ts(9)),   # same instant -> sees 100
            (1, ts(10)),  # between -> 100
            (1, ts(12)),  # after both -> 110
            (2, ts(12)),  # -> 200
        ],
        "sym long, ts timestamp",
    )
    out = asof_join(trades, quotes, "sym", "ts", "ts", ["px"])
    got = {(r["sym"], r["ts"]): r["asof_px"] for r in out.collect()}
    assert got == {
        (1, ts(8)): None,
        (1, ts(9)): 100.0,
        (1, ts(10)): 100.0,
        (1, ts(12)): 110.0,
        (2, ts(12)): 200.0,
    }


def test_range_join_buckets(spark):
    sessions = spark.createDataFrame(
        [(1, 100, ts(9), ts(10)), (1, 101, ts(12), ts(12, 30))],
        "uid long, sid long, start_ts timestamp, end_ts timestamp",
    )
    hits = spark.createDataFrame(
        [
            (1, 1, ts(9, 30)),   # in session 100
            (1, 2, ts(10)),      # boundary: end exclusive -> out
            (1, 3, ts(12, 29)),  # in session 101
            (1, 4, ts(13)),      # out
            (2, 5, ts(9, 30)),   # other key
        ],
        "uid long, hid long, ts timestamp",
    )
    out = range_join_buckets(
        sessions, hits, key="uid", right_ts="ts",
        left_start="start_ts", left_end="end_ts", bucket_seconds=600,
    )
    got = {(r["sid"], r["hid"]) for r in out.collect()}
    assert got == {(100, 1), (101, 3)}
