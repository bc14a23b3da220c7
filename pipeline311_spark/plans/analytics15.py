"""Mergeable-sketch family, part 2: HyperLogLog cardinality and
Count-Min heavy-hitter frequency — the two sketches every 100 TB
profiling pass runs, joining analytics6's KMV distinct estimator.

Why sketches matter at scale: exact COUNT(DISTINCT) and exact global
top-k both shuffle the full key population; a sketch is a tiny
fixed-size partial aggregate (256 registers / a 4×1024 counter grid)
that map-side-combines perfectly and merges across partitions, days,
and incremental batches (register-wise max / counter-wise sum).  Both
queries here produce the FULL sketch state plus the derived estimate,
next to the exact answer for error inspection.

Oracle-checkability (novel for HLL, usually "unlike HLL" territory):
every sketch ingredient is exact cross-engine integer math on the
portable md5 hash — register index = top 8 bits, rank = 53 − bit
length of the low 52 bits (``bin()`` + ``length()``, identical on both
engines — no log2 float hazard), and the harmonic denominator is kept
as the INTEGER ``Σ 2^(53−M_i)`` (≤ 2^61, exact in BIGINT) rather than
a float sum of ``2^−M``.  The only double op is one final division of
bit-identical operands → the estimate matches bit-for-bit.  Count-Min
is integers end to end (affine universal hashes mod 1024, counter
sums, min over rows).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline311_spark.ext.hashing import (
    MOD,
    affine,
    affine_sql,
    hash_params,
    portable_hash,
    portable_hash64,
    portable_hash64_sql,
    portable_hash_sql,
)
from pipeline311_spark.ext.textstats import normalize_text, tokens
from pipeline311_spark.plans.common import table
from pipeline311_spark.plans.extensions import _norm_sql
from pipeline311_spark.plans.registry import register

# ---------------------------------------------------------------------------
# HyperLogLog (p=8, m=256 registers) over document texts
# ---------------------------------------------------------------------------

_HLL_P = 8
_HLL_M = 1 << _HLL_P  # 256
_HLL_WBITS = 60 - _HLL_P  # 52 low bits feed the rank
_HLL_WMASK = (1 << _HLL_WBITS) - 1
_HLL_RMAX = _HLL_WBITS + 1  # rank when the low word is all zeros
_HLL_SCALE = 1 << _HLL_RMAX  # 2^53 — integer-scales the harmonic sum
# alpha_m * m^2 * 2^53 — one Python double constant; repr() round-trips
# to the identical double through both engines' literal parsers.
_HLL_NUM = 0.7213 / (1 + 1.079 / _HLL_M) * _HLL_M * _HLL_M * _HLL_SCALE

_HLL_SQL = f"""
WITH h AS (
  SELECT {portable_hash64_sql('text')} AS h FROM documents WHERE text IS NOT NULL),
r AS (
  SELECT (h >> {_HLL_WBITS}) AS idx,
         CASE WHEN (h & {_HLL_WMASK}) = 0 THEN {_HLL_RMAX}
              ELSE {_HLL_RMAX} - length(bin(h & {_HLL_WMASK})) END AS rank
  FROM h),
regs AS (SELECT idx, max(rank) AS m FROM r GROUP BY idx),
s AS (
  SELECT count(*) AS n_regs,
         coalesce(sum(CAST(power(2, {_HLL_RMAX} - m) AS BIGINT)), 0) AS zs,
         coalesce(sum(idx * m), 0) AS rc
  FROM regs)
SELECT CAST((SELECT count(DISTINCT text) FROM documents) AS BIGINT) AS exact_distinct,
       CAST(n_regs AS BIGINT) AS n_nonzero_registers,
       CAST({_HLL_M} - n_regs AS BIGINT) AS v_zero,
       CAST(rc AS BIGINT) AS reg_checksum,
       {_HLL_NUM!r} / CAST(CAST(zs + ({_HLL_M} - n_regs) * {_HLL_SCALE} AS BIGINT) AS DOUBLE)
         AS hll_estimate
FROM s
"""


def _hll_rank_rows(d, text_col: str = "text", *extra_cols: str):
    """(idx, rank) rows per non-null text — the sketch's map side."""
    h = portable_hash64(F.col(text_col))
    w = h.bitwiseAND(F.lit(_HLL_WMASK))
    return d.filter(F.col(text_col).isNotNull()).select(
        *extra_cols,
        F.shiftright(h, _HLL_WBITS).alias("idx"),
        F.when(w == 0, F.lit(_HLL_RMAX))
        .otherwise(F.lit(_HLL_RMAX) - F.length(F.bin(w)))
        .alias("rank"),
    )


def _hll_state(regs):
    """One-row (n_regs, zs, rc) summary of an (idx, m) register table."""
    return regs.agg(
        F.count("*").alias("n_regs"),
        F.coalesce(
            F.sum(F.expr(f"CAST(power(2, {_HLL_RMAX} - m) AS BIGINT)")), F.lit(0)
        ).alias("zs"),
        F.coalesce(F.sum(F.col("idx") * F.col("m")), F.lit(0)).alias("rc"),
    )


def _hll_estimate_col():
    """Estimate from (n_regs, zs) — ONE double division, bit-identical."""
    v_zero = F.lit(_HLL_M) - F.col("n_regs")
    z_scaled = (F.col("zs") + v_zero * F.lit(_HLL_SCALE)).cast("long")
    return F.lit(_HLL_NUM) / z_scaled.cast("double")


@register("sketch_hll_distinct", _HLL_SQL, covers=("A6", "ext:dedup"))
def sketch_hll_distinct(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    regs = _hll_rank_rows(d).groupBy("idx").agg(F.max("rank").alias("m"))
    s = _hll_state(regs)
    exact = d.agg(F.countDistinct("text").alias("exact_distinct"))
    return exact.crossJoin(F.broadcast(s)).select(
        F.col("exact_distinct").cast("long"),
        F.col("n_regs").cast("long").alias("n_nonzero_registers"),
        (F.lit(_HLL_M) - F.col("n_regs")).cast("long").alias("v_zero"),
        F.col("rc").cast("long").alias("reg_checksum"),
        _hll_estimate_col().alias("hll_estimate"),
    )


# ---------------------------------------------------------------------------
# HLL mergeability, proven executably: sketch two disjoint halves of the
# corpus independently, merge the register tables (union + register-wise
# max — the sketch's merge operator), and emit the merged state next to
# the single-pass state.  The two rows carry identical registers,
# checksums, and estimates — max is associative, and this query makes
# that claim a hash-checked output instead of a docstring.  This is the
# shape incremental profiling runs at 100 TB: per-day register tables
# (256 rows each) merged into a running cardinality without rescanning
# history.
# ---------------------------------------------------------------------------

_HLL_MERGE_SQL = f"""
WITH h AS (
  SELECT doc_id % 2 AS half, {portable_hash64_sql('text')} AS h
  FROM documents WHERE text IS NOT NULL),
r AS (
  SELECT half, (h >> {_HLL_WBITS}) AS idx,
         CASE WHEN (h & {_HLL_WMASK}) = 0 THEN {_HLL_RMAX}
              ELSE {_HLL_RMAX} - length(bin(h & {_HLL_WMASK})) END AS rank
  FROM h),
halves AS (SELECT half, idx, max(rank) AS m FROM r GROUP BY half, idx),
merged AS (SELECT idx, max(m) AS m FROM halves GROUP BY idx),
single AS (SELECT idx, max(rank) AS m FROM r GROUP BY idx),
states AS (
  SELECT 'merged' AS variant, count(*) AS n_regs,
         coalesce(sum(CAST(power(2, {_HLL_RMAX} - m) AS BIGINT)), 0) AS zs,
         coalesce(sum(idx * m), 0) AS rc
  FROM merged
  UNION ALL
  SELECT 'single_pass', count(*),
         coalesce(sum(CAST(power(2, {_HLL_RMAX} - m) AS BIGINT)), 0),
         coalesce(sum(idx * m), 0)
  FROM single)
SELECT variant,
       CAST(n_regs AS BIGINT) AS n_nonzero_registers,
       CAST(rc AS BIGINT) AS reg_checksum,
       {_HLL_NUM!r} / CAST(CAST(zs + ({_HLL_M} - n_regs) * {_HLL_SCALE} AS BIGINT) AS DOUBLE)
         AS hll_estimate
FROM states
"""


@register("sketch_hll_merge", _HLL_MERGE_SQL, covers=("A6", "ext:dedup"))
def sketch_hll_merge(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    rows = _hll_rank_rows(d.withColumn("half", F.col("doc_id") % 2), "text", "half")
    half_regs = rows.groupBy("half", "idx").agg(F.max("rank").alias("m"))
    merged = half_regs.groupBy("idx").agg(F.max("m").alias("m"))
    single = rows.groupBy("idx").agg(F.max("rank").alias("m"))

    def state(regs, variant):
        return _hll_state(regs).select(
            F.lit(variant).alias("variant"),
            F.col("n_regs").cast("long").alias("n_nonzero_registers"),
            F.col("rc").cast("long").alias("reg_checksum"),
            _hll_estimate_col().alias("hll_estimate"),
        )

    return state(merged, "merged").unionByName(state(single, "single_pass"))


# ---------------------------------------------------------------------------
# Count-Min sketch (d=4 rows × w=1024 counters) + heavy-hitter probe
# ---------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 1024
_CMS_PARAMS = hash_params(_CMS_D, seed=7)
_CMS_TOPK = 10


def _cms_cols(term: str | F.Column):
    """The d counter columns for a term — affine universal hashes mod w."""
    h = portable_hash(term)
    return [F.pmod(affine(h, a, b), F.lit(_CMS_W)) for a, b in _CMS_PARAMS]


def _cms_sql() -> str:
    tok = (
        f"SELECT unnest(CASE WHEN nt = '' THEN [] ELSE string_split(nt, ' ') END) AS term "
        f"FROM (SELECT {_norm_sql('text')} AS nt FROM documents)"
    )
    hashes = [
        f"(({affine_sql(portable_hash_sql('term'), a, b)}) % {_CMS_W})"
        for a, b in _CMS_PARAMS
    ]
    pair_arms = "\n  UNION ALL ".join(
        f"SELECT term, freq, {j} AS j, {hx} AS col FROM tc" for j, hx in enumerate(hashes)
    )
    return f"""
WITH tok AS ({tok}),
tc AS (SELECT term, count(*) AS freq FROM tok GROUP BY term),
pairs AS (
  {pair_arms}),
counters AS (SELECT j, col, sum(freq) AS c FROM pairs GROUP BY j, col),
top AS (SELECT term, freq FROM tc ORDER BY freq DESC, term LIMIT {_CMS_TOPK})
SELECT t.term, CAST(t.freq AS BIGINT) AS true_count, CAST(min(c.c) AS BIGINT) AS cms_estimate
FROM top t JOIN pairs p ON t.term = p.term
JOIN counters c ON p.j = c.j AND p.col = c.col
GROUP BY 1, 2
"""


def _cms_term_counts(d, text_col: str = "text"):
    """Exact (term, freq) counts — the one corpus-proportional shuffle."""
    tok = d.select(F.explode(tokens(normalize_text(text_col))).alias("term"))
    return tok.groupBy("term").agg(F.count("*").alias("freq"))


def cms_grid_from_counts(tc):
    """(j, col, c) Count-Min grid from a (term, freq) counts table."""
    pairs = tc.select(
        "freq", F.posexplode(F.array(*_cms_cols(F.col("term")))).alias("j", "col")
    )
    return pairs.groupBy("j", "col").agg(F.sum("freq").alias("c"))


def cms_counter_grid(d, text_col: str = "text"):
    """The (j, col, c) Count-Min grid for a document set — ≤ d×w rows.
    Mergeable: grids of disjoint corpus slices SUM counter-wise into
    the whole-corpus grid (asserted engine-side in tests)."""
    return cms_grid_from_counts(_cms_term_counts(d, text_col))


@register("sketch_countmin_heavy", _cms_sql(), covers=("A-class", "ext:text"))
def sketch_countmin_heavy(spark, sf_dir):
    """Build the 4×1024 Count-Min grid from exact per-term counts (one
    token shuffle — the grid update is a map of the counts table, so
    corpus size only pays the same groupBy any wordcount pays), then
    probe the true top-10 terms: estimate = min over the 4 rows.

    Scale: the counter grid is ≤ 4096 rows regardless of corpus size —
    it IS the mergeable sketch (counter-wise sum across batches); the
    probe side broadcasts it.  Overcount = collisions only, never
    undercount — the classic CMS guarantee, visible in the output as
    cms_estimate ≥ true_count."""
    d = table(spark, sf_dir, "documents")
    tc = _cms_term_counts(d)
    counters = cms_grid_from_counts(tc)
    top = tc.orderBy(F.desc("freq"), "term").limit(_CMS_TOPK)
    probe = top.select(
        "term", "freq", F.posexplode(F.array(*_cms_cols(F.col("term")))).alias("j", "col")
    )
    return (
        probe.join(F.broadcast(counters), ["j", "col"])
        .groupBy("term", "freq")
        .agg(F.min("c").cast("long").alias("cms_estimate"))
        .select(
            "term",
            F.col("freq").cast("long").alias("true_count"),
            "cms_estimate",
        )
    )
