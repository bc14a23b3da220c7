"""Bloom-gated reconciliation: the at-scale form of the reference's
IN-list deletion check (delete-removed-tickets.py:114 sends 1000-id
SOQL IN-lists; at 100 TB the key list itself is the bottleneck).

A Bloom filter of the destination keys is built with ONE aggregation
(map-side ORs collapse to ``m/64`` longs per partition before the
exchange; the filter is a few KB regardless of table size), broadcast,
and probed map-side on the source scan:

* probe says **no** → the key is definitely absent (Bloom filters have
  no false negatives) — a confirmed deletion with zero join work;
* probe says **maybe** → false-positive candidates only (a tunable few
  % of the source) proceed to the exact anti-join.

The union of the two is EXACTLY the plain anti-join result — which is
why the oracle twin for the gated query is the plain anti-join SQL.

Everything is deterministic integer math over the shared portable
hash family (ext/hashing.py) — no UDFs, no RNG, engine-portable.
"""

from __future__ import annotations


from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipeline311_spark.ext.hashing import affine, hash_params, portable_hash64, jvm_memo


@jvm_memo(maxsize=1)
def _bit_masks() -> Column:
    """array<long> of the 64 single-bit masks (bit 63 is the sign bit —
    its mask is LONG_MIN).  ``element_at(_bit_masks(), bit+1)`` shifts
    by a COLUMN, which ``F.shiftleft`` (literal-only shift) cannot."""
    return F.array(*[
        F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long") for b in range(64)
    ])


def _positions(key: Column, m_bits: int, k: int, seed: int) -> Column:
    """Array of k bit positions in [0, m_bits) for a key — the shared
    affine family over the portable 60-bit hash (keys are hashed
    through their string rendering so any key type works and the
    DuckDB-side hash twin stays applicable)."""
    from pipeline311_spark.ext.hashing import MOD

    # reduce to < MOD first so affine's multiply stays inside a long
    # (same pre-reduction the MinHash signature path relies on)
    h = portable_hash64(key.cast("string")) % MOD
    return F.array(*[affine(h, a, b) % m_bits for a, b in hash_params(k, seed)])


def bloom_build(
    df: DataFrame, key: str, m_bits: int = 1 << 16, k: int = 5, seed: int = 7
) -> DataFrame:
    """ONE-row DataFrame ``{words: array<long>}`` — the m_bits-wide
    filter as m_bits/64 longs.  One shuffle of at most
    ``partitions × m_bits/64`` pre-aggregated rows (``bit_or`` combines
    map-side), then a map assembly; independent of table size."""
    n_words = (m_bits + 63) // 64
    # NULL keys set no bits: they can never equi-match, and a NULL
    # position would otherwise become a NULL map key downstream
    pos = df.filter(F.col(key).isNotNull()).select(
        F.explode(_positions(F.col(key), m_bits, k, seed)).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / 64).cast("int").alias("word"),
            F.element_at(_bit_masks(), (F.col("p") % 64).cast("int") + 1).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    # Dense assembly via union-with-zeros + sort: O(n_words log n_words).
    # The previous shape probed a sparse MAP per slot — but Spark maps
    # are unsorted arrays with LINEAR element_at, making the assembly
    # O(n_words²): ~4 s at 2^20 bits, minutes at the 2^26 cap (found by
    # the r6 fp-rate probe; the small oracle corpora never hit it).
    zeros = df.sparkSession.range(n_words).select(
        F.col("id").cast("int").alias("word"), F.lit(0).cast("long").alias("bits")
    )
    dense = words.unionByName(zeros).groupBy("word").agg(F.bit_or("bits").alias("bits"))
    return dense.groupBy().agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("word", "bits"))), lambda s: s["bits"]
        ).alias("words")
    )


def bloom_might_contain(
    df: DataFrame, key: str, bloom: DataFrame, m_bits: int = 1 << 16, k: int = 5, seed: int = 7
) -> DataFrame:
    """Adds ``__maybe``: true iff all k bits for the key are set.

    The filter rides a SCALAR SUBQUERY: Spark evaluates the one-row
    words array once and treats it as a plan constant — no join at
    all, the probe is pure map-side Column math on the scan.  The
    previous broadcast-crossJoin shape materialized the m_bits/8-byte
    array into every probed row, so per-row cost grew with the filter
    size — measured 32.5 s vs 1.6 s per 400k rows at the 2^26-bit
    ``auto_m_bits`` cap (found by the r6 fp-rate probe; small oracle
    corpora never noticed).  The k probes are unrolled Columns, so the
    hot path has no interpreted higher-order function either.

    Subqueries can't nest inside lambdas (UNSUPPORTED_SUBQUERY_
    EXPRESSION_CATEGORY.HIGHER_ORDER_FUNCTION), which is also why the
    positions are unrolled rather than ``forall``-folded."""
    import uuid
    from functools import reduce

    from pipeline311_spark.ext.hashing import MOD

    view = f"__bloom_words_{uuid.uuid4().hex[:12]}"
    bloom.createOrReplaceTempView(view)
    # everything from here through the forced analysis sits under the
    # finally (ADVICE r6): `withColumn` itself analyzes eagerly, so a
    # bad key column throws BEFORE any explicit .schema touch and
    # would otherwise leak the uuid view into the session catalog.
    # Downstream consumers MUST build on the returned DataFrame
    # object: the scalar subquery is bound into its analyzed plan —
    # re-deriving the query from SQL text after the drop would fail
    # to resolve the view.
    try:
        w = F.expr(f"(SELECT words FROM {view})")
        h = portable_hash64(F.col(key).cast("string")) % MOD
        conds = []
        for a, b in hash_params(k, seed):
            p = affine(h, a, b) % m_bits
            conds.append(
                (
                    F.element_at(w, (p / 64).cast("int") + 1)
                    .bitwiseAND(F.element_at(_bit_masks(), (p % 64).cast("int") + 1))
                )
                != 0
            )
        hit = reduce(lambda x, y: x & y, conds)
        # NULL key → NULL hash; short-circuit to false (semantically a
        # NULL key is never "in" the filter)
        hit = F.when(F.col(key).isNull(), F.lit(False)).otherwise(hit)
        out = df.withColumn("__maybe", hit)
        # force analysis so the view's plan is bound into the DataFrame
        # before the registration disappears
        out.schema
    finally:
        df.sparkSession.catalog.dropTempView(view)
    return out


def auto_m_bits(
    dest: DataFrame,
    key: str,
    bits_per_key: int = 10,
    floor: int = 1 << 16,
    cap: int = 1 << 26,
) -> int:
    """Size the filter from the DESTINATION cardinality (ADVICE r4: a
    fixed 2^16-bit filter saturates past ~15k keys at k=5 — fp rate →
    1 and the gate degrades to the plain anti-join plus probe
    overhead).  ~10 bits/key keeps fp ≈ 1% at k=5; one cheap
    ``approx_count_distinct`` over the dest keys pays for it.  ``cap``
    bounds the broadcast at 8 MiB (2^26 bits) — past ~6.7M keys the fp
    rate degrades gracefully instead of the filter growing unbounded;
    at that point the right tool is the plain shuffled anti-join."""
    n = dest.agg(F.approx_count_distinct(key).alias("n")).first()["n"] or 1
    m = min(max(floor, bits_per_key * n), cap)
    return ((m + 63) // 64) * 64


def anti_join_bloom(
    source: DataFrame,
    dest: DataFrame,
    key: str,
    m_bits: int | None = None,
    k: int = 5,
    seed: int = 7,
) -> DataFrame:
    """Source rows whose key is NOT in dest — bit-identical to a plain
    left-anti join, but only Bloom false positives (plus true members)
    ever reach the join: definite-missing rows short-circuit map-side,
    so the join's probe side shrinks from |source| to
    |members| + fp_rate·|source|.

    ``m_bits=None`` (default) sizes the filter from the dest
    cardinality (:func:`auto_m_bits`); pass an explicit width only
    when the cardinality is known a priori."""
    if m_bits is None:
        m_bits = auto_m_bits(dest, key)
    bloom = bloom_build(dest.select(key), key, m_bits, k, seed)
    probed = bloom_might_contain(source, key, bloom, m_bits, k, seed)
    # NULL keys hash to NULL → __maybe is NULL; a NULL key never equi-
    # matches dest, so anti-join semantics KEEP it — route it with the
    # definite-missing rows (coalesce false), not into limbo.
    maybe = F.coalesce(F.col("__maybe"), F.lit(False))
    definite = probed.filter(~maybe).drop("__maybe")
    maybes = probed.filter(maybe).drop("__maybe")
    return definite.unionByName(maybes.join(dest.select(key), key, "left_anti"))
