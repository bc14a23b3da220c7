"""operators/bloom.py: Bloom-gated reconciliation semantics + shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline311_spark.operators.bloom import (
    anti_join_bloom,
    bloom_build,
    bloom_might_contain,
)


def test_bloom_no_false_negatives_and_low_fp(spark):
    dest = spark.range(0, 9999, 3).select(F.col("id").alias("k"))
    bloom = bloom_build(dest, "k")
    # every member MUST hit (Bloom's defining guarantee)
    members = bloom_might_contain(dest, "k", bloom)
    assert members.filter(~F.col("__maybe")).count() == 0
    # non-members: fp rate near theory ((1-e^{-kn/m})^k ~ 6e-4 here)
    nonmem = spark.range(100_000, 150_000).select(F.col("id").alias("k"))
    fp = bloom_might_contain(nonmem, "k", bloom).filter("__maybe").count()
    assert fp / 50_000 < 0.005, f"fp rate {fp / 50_000} way above theory"


def test_anti_join_bloom_equals_plain_anti_join(spark):
    src = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("payload"))
    dest = spark.range(0, 10_000, 3).select(F.col("id").alias("k"))
    got = anti_join_bloom(src, dest, "k")
    want = src.join(dest, "k", "left_anti")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_anti_join_bloom_keeps_null_keys(spark):
    # anti-join semantics: a NULL key never matches dest, so the row
    # survives — the bloom gate must route it with the definite-missing
    # rows, not drop it (NULL hashes to NULL → __maybe is NULL)
    src = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    dest = spark.createDataFrame([("a",)], "k string")
    got = sorted(r["k"] or "" for r in anti_join_bloom(src, dest, "k").collect())
    want = sorted(r["k"] or "" for r in src.join(dest, "k", "left_anti").collect())
    assert got == want == ["", "b"]
    # NULL keys in DEST must not break the build (they set no bits) and
    # must not match anything
    dest_with_null = spark.createDataFrame([("a",), (None,)], "k string")
    got2 = sorted(r["k"] or "" for r in anti_join_bloom(src, dest_with_null, "k").collect())
    assert got2 == ["", "b"]


def test_bloom_probe_is_map_side(spark):
    # r6: the probe is a SCALAR SUBQUERY constant + Column math — the
    # probe side must carry NO join and NO exchange at all (the filter
    # BUILD aggregates inside the subquery; its exchanges move
    # m/64-long rows, not the probe side).  The old broadcast-crossJoin
    # shape copied the words array into every probed row — per-row cost
    # grew with m_bits (20x at the auto_m_bits cap).
    dest = spark.range(100).select(F.col("id").alias("k"))
    bloom = bloom_build(dest, "k")
    probed = bloom_might_contain(spark.range(1000).select(F.col("id").alias("k")), "k", bloom)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    probe_side = plan.split("Subquery")[0]
    assert "Exchange hashpartitioning" not in probe_side
    assert "Exchange rangepartitioning" not in probe_side
    assert "Join" not in probe_side  # no join of any kind on the probe
    assert "scalar-subquery" in plan or "Subquery" in plan


def test_bloom_anti_join_property(spark):
    """Property: on random (string!) key sets — mixed types, unicode,
    collision-prone short keys — the bloom-gated anti-join equals the
    plain anti-join exactly.  Few hypothesis examples, each a real
    Spark job; the point is weird keys, not volume."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    keys = st.lists(st.text(min_size=0, max_size=8), min_size=1, max_size=40, unique=True)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(src_keys=keys, dest_keys=keys)
    def run(src_keys, dest_keys):
        src = spark.createDataFrame([(k,) for k in src_keys], "k string")
        dest = spark.createDataFrame([(k,) for k in dest_keys], "k string")
        got = sorted(r["k"] for r in anti_join_bloom(src, dest, "k", m_bits=256, k=3).collect())
        want = sorted(set(src_keys) - set(dest_keys))
        assert got == want

    run()


def test_auto_m_bits_scales_with_dest_cardinality(spark):
    """ADVICE r4: the fixed 2^16 default saturated past ~15k keys.
    auto_m_bits must grow with dest (~10 bits/key, floor 2^16, 64-bit
    aligned) so the fp rate stays in the few-% regime."""
    from pipeline311_spark.operators.bloom import auto_m_bits

    small = spark.range(100).select(F.col("id").cast("string").alias("k"))
    big = spark.range(50_000).select(F.col("id").cast("string").alias("k"))
    m_small = auto_m_bits(small, "k")
    m_big = auto_m_bits(big, "k")
    assert m_small == 1 << 16  # floor
    assert m_big >= 10 * 45_000  # ~10 bits/key (approx_count_distinct slack)
    assert m_big % 64 == 0


def test_anti_join_bloom_autosized_stays_exact_past_old_saturation(spark):
    """At 30k dest keys the old fixed filter was fully saturated; the
    auto-sized filter must still produce the exact anti-join result."""
    from pipeline311_spark.operators.bloom import anti_join_bloom

    dest = spark.range(30_000).select(F.col("id").alias("k"))
    source = spark.range(29_000, 31_000).select(F.col("id").alias("k"))
    got = sorted(r["k"] for r in anti_join_bloom(source, dest, "k").collect())
    assert got == list(range(30_000, 31_000))


def test_bloom_probe_failure_does_not_leak_temp_view(spark):
    """ADVICE r6: if analysis throws (bad key column), the uuid-named
    temp view must still be dropped — no catalog residue."""
    import pytest

    from pipeline311_spark.operators.bloom import bloom_build, bloom_might_contain

    df = spark.createDataFrame([(1,), (2,)], "k long")
    bloom = bloom_build(df, "k", m_bits=1 << 10)
    before = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    with pytest.raises(Exception):
        bloom_might_contain(df, "no_such_column", bloom, m_bits=1 << 10)
    after = {t.name for t in spark.catalog.listTables() if t.isTemporary}
    assert after == before, f"leaked temp views: {after - before}"
