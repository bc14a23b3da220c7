"""Property-based tests (hypothesis): the vectorized cleaning kernel
must agree with a direct Python re-implementation of the reference
semantics (common.py:112-224) on arbitrary dirty input, and the MERGE
kernel must hold its algebraic properties on random tables."""

from __future__ import annotations

import re
import unicodedata

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pipeline311_spark.functions.cleaning import (
    district_number,
    parent_id,
    private_flag,
    text_field_guard,
)
from pipeline311_spark.functions.text import nfkd_ascii, strip_edge_chars
from pipeline311_spark.operators.merge import upsert

# --- Python oracles: literal transcriptions of the reference semantics ---


def py_district(v):
    try:
        match = re.findall(r"\d+", v)
        out = int(match[0]) if match else None
    except Exception:
        return None
    if out and out > 100:
        return None
    return out


def py_parent(v):
    try:
        return int(v) if v != 0 and v != "0" else None
    except Exception:
        return None


def py_private(v):
    return 0 if v in [False, "false"] else 1


def py_guard(v):
    return (v or "")[:2000]


def py_clean(v):
    if v is None:
        return None
    s = v.strip("<>'")
    return unicodedata.normalize("NFKD", s).encode("ascii", "ignore").decode()


dirty_strings = st.one_of(
    st.none(),
    st.text(max_size=30),
    st.text(alphabet="0123456789-PPD.district<>'é🚧 ", max_size=30),
    st.sampled_from(["0", "false", "true", "911", "22nd", "1e3", "12.5", " 7 ", "<x>"]),
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(dirty_strings, min_size=1, max_size=40))
def test_scalar_kernels_match_reference_python(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = df.select(
        district_number("v").alias("d"),
        parent_id("v").alias("p"),
        private_flag("v").alias("f"),
        text_field_guard("v").alias("g"),
        nfkd_ascii(strip_edge_chars(F.col("v"))).alias("c"),
    ).collect()
    for v, row in zip(values, got):
        assert row["d"] == py_district(v), (v, row["d"], py_district(v))
        # int() parses python-specific forms like '1_0'; try_cast is the
        # declared engine behavior — compare where python accepts plain ints
        if v is None or not re.fullmatch(r"\s*[+-]?\d+\s*", v or ""):
            assert row["p"] == py_parent(v) or py_parent(v) is None
        else:
            # int() and try_cast both tolerate surrounding whitespace, so
            # the raw value goes straight through (the '0'-vs-'00' raw
            # string check is part of the semantics under test)
            assert row["p"] == py_parent(v)
        assert row["f"] == py_private(v)
        assert row["g"] == py_guard(v)
        assert row["c"] == py_clean(v)


keys = st.integers(min_value=0, max_value=8)
versions = st.integers(min_value=0, max_value=5)
tables = st.lists(st.tuples(keys, versions), min_size=0, max_size=15)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(tables, tables)
def test_upsert_algebra(spark, t_rows, u_rows):
    import datetime as dt

    def mk(rows, tag):
        data = [
            (k, f"{tag}{i}", dt.datetime(2024, 1, 1 + ver)) for i, (k, ver) in enumerate(rows)
        ]
        df = spark.createDataFrame(data, "pk long, val string, updated_datetime timestamp")
        # upsert requires unique keys per side (tables, not logs)
        from pipeline311_spark.operators.merge import latest_per_key

        return latest_per_key(df, "pk", "updated_datetime", tiebreak="val")

    target, updates = mk(t_rows, "t"), mk(u_rows, "u")
    merged = upsert(target, updates, "pk", "updated_datetime")
    out = {r["pk"]: (r["val"], r["updated_datetime"]) for r in merged.collect()}

    t = {r["pk"]: (r["val"], r["updated_datetime"]) for r in target.collect()}
    u = {r["pk"]: (r["val"], r["updated_datetime"]) for r in updates.collect()}

    # key set is the union
    assert set(out) == set(t) | set(u)
    for k, (val, ts) in out.items():
        if k in t and k in u:
            # newer version wins; exact tie -> update wins
            expect = u[k] if u[k][1] >= t[k][1] else t[k]
            assert (val, ts) == expect
        else:
            assert (val, ts) == (t.get(k) or u.get(k))

    # idempotence: re-applying the same updates changes nothing
    again = upsert(merged, updates, "pk", "updated_datetime")
    assert {r["pk"]: (r["val"], r["updated_datetime"]) for r in again.collect()} == out


# --- incremental MinHash contract on random corpora ---

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=3, max_size=12).map(" ".join),
        min_size=2,
        max_size=10,
    )
)
def test_minhash_incremental_contract_random(spark, docs):
    """For ANY corpus split into existing/new halves, the incremental
    run must equal the full run filtered to pairs with a new member."""
    from pipeline311_spark.ext.dedup import minhash_dedup_pairs, minhash_incremental_pairs

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(k=8, bands=4, n=3, threshold=0.3)
    full = minhash_dedup_pairs(df, "doc_id", "text", **kw).collect()
    inc = minhash_incremental_pairs(
        df.filter("doc_id % 2 = 0"), df.filter("doc_id % 2 = 1"), "doc_id", "text", **kw
    ).collect()
    want = sorted(tuple(r) for r in full if r["doc_a"] % 2 == 1 or r["doc_b"] % 2 == 1)
    assert sorted(tuple(r) for r in inc) == want
