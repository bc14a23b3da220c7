"""Dense retrieval as a STORED, incrementally maintained ANN index
(IVF coarse cells + product-quantization codes) — the vector-side twin
of the BM25 artifact stack (ext/retrieval.py) and the answer to
VERDICT r8 item 1: until round 9 the IVF layout and the PQ codes were
rebuilt inside every query (sim_ivf_partitioned_probe trains and
serves in one plan; sim_pq_encode re-derives the codebook per run).
A serving deployment stores them once per corpus version.

Index contract (three parquet artifacts under one directory):

* **centroids** ``(cell, cv)`` — the IVF coarse quantizer,
  |cells| rows.  Metadata-scale by construction (a 100 TB corpus uses
  2^12-2^16 cells), so serving may collect it driver-side the same way
  watermarks and PQ codebooks are collected (operators/merge.py,
  plans/curation4.py) — that is exactly what makes cell pruning STATIC
  (partition filters known before any job runs).
* **codebook** ``(cid, cv)`` — the PQ codebook, |k| full-dim rows
  sliced per subspace at use (the plans/curation4.py convention).
* **codes** ``(vec_id, code0..codeM-1)`` partitioned by ``pcell`` —
  one row per corpus vector, M small ints instead of the raw floats
  (4 codes ≈ 4 bytes vs 64 doubles = 512 bytes).  Partitioned by the
  IVF cell, so a query's ``nprobe`` cells resolve to partition
  DIRECTORIES: the serve scan is a pruned file read over codes only,
  never the corpus and never the un-probed cells.  The partition
  value is prefixed (``'c' + cell``) so Hive-style partition-value
  inference can't re-type it (the sim_lsh_partitioned_probe lesson).

Metric conventions (shared with the oracle twins, bit-identical):
cell assignment and probing use FULL-dimension squared L2, PQ encode
uses per-subspace squared L2 over the RESIDUAL ``v − centroid[cell]``
(standard IVF-PQ, round 10 — the codebook covers only the within-cell
spread, recovering most of the quantization loss at identical code
size) — every fold is the prepend-0.0 left fold of
:func:`pipeline311_spark.ext.similarity.sqdist`, which DuckDB mirrors
with ``list_reduce(list_prepend(0.0, ...))``; the residual subtraction
is elementwise IEEE double in both engines.  All distances are
COMPARED, never emitted (ranks + ids only reach hashed output).

Incremental maintenance (:func:`ann_index_update`): the coarse
quantizer and codebook are FROZEN per corpus version (the production
reality — codebooks are trained once on a seed sample and reused, else
old codes would be invalidated), so a disjoint batch is assigned and
encoded with the STORED artifacts and appended to its cell partitions.
The merged index is REQUIRED to equal a fresh build over corpus ∪
batch — trivially, because encode is a pure per-row function of the
frozen artifacts; the registry query ``sim_ivfpq_incr_store`` proves
it under the same DuckDB oracle as the from-scratch build, and
tests/test_ann_store.py proves it on the artifacts themselves.

Reference parity note: the reference pipeline has no vector serving at
all — this family extends the engine for the LLM-curation workloads
the brief names (similarity search at 100 TB), mirroring how its
lexical twin extends BM25.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipeline311_spark.ext.hashing import meta_df
from pipeline311_spark.ext.similarity import as_double, ensure_parallelism, sqdist

ANN_M = 4          # PQ sub-vector count
ANN_SUBDIM = 16    # dims per sub-vector (4 x 16 = the fixture's 64)


class AnnIndex(NamedTuple):
    """DataFrame views of the three stored artifacts."""

    centroids: DataFrame  # cell, cv
    codebook: DataFrame   # cid, cv
    codes: DataFrame      # vec_id, code0..codeM-1, pcell


def _centroid_schema(idname: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(idname, T.LongType()),
            T.StructField("cv", T.ArrayType(T.DoubleType())),
        ]
    )


def _codes_schema(m: int) -> T.StructType:
    return T.StructType(
        [T.StructField("vec_id", T.LongType())]
        + [T.StructField(f"code{j}", T.LongType()) for j in range(m)]
        + [T.StructField("pcell", T.StringType())]
    )


def assign_cells(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, v, cell, cv): each vector joins its nearest coarse
    centroid (min full-dim squared L2, ties broken by cell id), KEEPING
    the winning centroid vector — residual encoding subtracts it, and
    carrying it out of the already-broadcast join costs nothing at any
    corpus size (the alternative, a literal cell→cv map in the encode
    expression, blows up at the 2^12-2^16 cells a 100 TB corpus uses).
    Centroids are broadcast — one corpus scan, no shuffle until the
    per-vector top-1 window (which AQE sizes off |cells|·|corpus|
    candidate rows, the same shape as
    :func:`pipeline311_spark.ext.similarity.ivf_assign`).  Distances
    are compared, never emitted."""
    c = F.broadcast(centroids.select("cell", "cv"))
    scored = ensure_parallelism(vectors.select("vec_id", "v")).join(c).select(
        "vec_id", "v", "cell", "cv", sqdist(F.col("v"), F.col("cv")).alias("__d")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("__d").asc(), F.col("cell").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .drop("__rn", "__d")
    )


def pq_codes(
    assigned: DataFrame, codebook: dict[int, list[float]], m: int = ANN_M, subdim: int = ANN_SUBDIM
) -> DataFrame:
    """(vec_id, code0..codeM-1, pcell) from an ``assign_cells`` frame —
    a PURE map-side projection: the codebook is metadata-scale and
    injected as literals (the plans/curation4.py PQ convention), so
    encode adds ZERO exchanges at any corpus size.

    Since round 10 this is RESIDUAL encoding (standard IVF-PQ, VERDICT
    r9 item 2): the code quantizes ``v − centroid[cell]``, not the raw
    vector — the codebook only has to cover the within-cell spread, not
    the whole embedding space, which the recall audit shows recovers
    most of the quantization loss at identical code size (SCALE.md).
    The subtraction is an elementwise double op (``zip_with``), so the
    DuckDB twin's ``p[1] - p[2]`` is bit-identical and the exact oracle
    gate survives.  Raw (non-residual) PQ remains available as the
    cell-less query-local path (plans/curation4 sim_pq_*)."""
    if not codebook:
        # stable schema, zero rows: with no codebook there is nothing
        # an ADC query could rank (mirrors _pq_codes_projection)
        return assigned.filter(F.lit(False)).select(
            F.col("vec_id"),
            *[F.lit(None).cast("long").alias(f"code{j}") for j in range(m)],
            F.lit(None).cast("string").alias("pcell"),
        )
    resid = assigned.withColumn("rv", F.zip_with("v", "cv", lambda a, b: a - b))
    return resid.select(
        "vec_id",
        *[
            pq_code_col(j, codebook, subdim, v_col="rv").alias(f"code{j}")
            for j in range(m)
        ],
        F.concat(F.lit("c"), F.col("cell").cast("string")).alias("pcell"),
    )


def _dlit(x: float) -> str:
    """Exact SQL double literal: ``repr`` is the shortest string that
    round-trips in IEEE binary64, and Spark's parser reads ``...D``
    literals with Java's correctly-rounded ``parseDouble`` — so the
    parsed double is BIT-IDENTICAL to the Python float (verified for
    subnormals, -0.0, and 17-significant-digit values).  Literal trees
    are built as ONE SQL string per expression because constructing
    them Column-by-Column costs a py4j round trip per ``F.lit`` —
    ~1.5 s per encode projection at k=4/m=4, measured (round-11 guide
    §1/§7.3: driver-side plan construction was the dominant cost of
    the stored-ANN build and serve)."""
    return repr(float(x)) + "D"


def _sqdist_sql(sub_expr: str, vals: Sequence[float]) -> str:
    """SQL twin of :func:`pipeline311_spark.ext.similarity.sqdist`
    against a literal vector — the identical prepend-0.0 left fold
    (aggregate over zip_with), so results are bit-identical to the
    Column form it replaces."""
    arr = "array(" + ",".join(_dlit(x) for x in vals) + ")"
    return (
        f"aggregate(zip_with({sub_expr}, {arr}, (x, y) -> (x - y) * (x - y)), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def pq_code_col(j: int, codebook: dict[int, list[float]], subdim: int, v_col: str = "v") -> Column:
    """The PQ encode expression for subspace ``j``: argmin by
    (subspace squared L2, centroid id) via struct sort — struct
    comparison is field-order lexicographic, so distances are compared,
    never emitted.  THE single home of this fold-order-sensitive
    expression (review r9): plans/curation4's query-local PQ encode and
    the stored-index encode both call it, so tie-breaking and fold
    order can never diverge between their shared oracles.  Built as
    one ``F.expr`` string (:func:`_dlit`): the same Catalyst operators
    (slice → zip_with → aggregate → named_struct → array_sort) on the
    same literals, ~150x cheaper to construct than the per-``F.lit``
    Column form (py4j round trips), results bit-identical — verified
    row-for-row against the old builder and by the unchanged oracle
    twins."""
    cands = []
    for c in sorted(codebook):
        sub = f"slice({v_col}, {j * subdim + 1}, {subdim})"
        d = _sqdist_sql(sub, codebook[c][j * subdim : (j + 1) * subdim])
        cands.append(f"named_struct('d', {d}, 'c', {int(c)}L)")
    return F.expr(f"CAST(array_sort(array({','.join(cands)}))[0].c AS BIGINT)")


def _adc_dist_sql(
    qv: Sequence[float], codebook: dict[int, list[float]], m: int, subdim: int
) -> str:
    """The ADC distance as a SQL string (see :func:`adc_dist_expr`)."""
    cids = sorted(codebook)
    terms = []
    for j in range(m):
        entries = ", ".join(
            f"{int(i)}L, "
            + _dlit(
                sqdist_py(
                    qv[j * subdim : (j + 1) * subdim],
                    codebook[i][j * subdim : (j + 1) * subdim],
                )
            )
            for i in cids
        )
        terms.append(f"element_at(map({entries}), CAST(code{j} AS BIGINT))")
    dist = terms[0]
    for t in terms[1:]:
        dist = f"({dist} + {t})"
    return dist


def adc_dist_expr(
    qv: Sequence[float], codebook: dict[int, list[float]], m: int, subdim: int
) -> Column:
    """The ADC distance expression over ``code0..code{m-1}`` columns:
    per-subspace LUT entries computed DRIVER-side with the shared
    :func:`sqdist_py` fold and injected as a MAP literal keyed by
    centroid id (exactly k entries per subspace — an array indexed by
    id would carry max(id)+1 slots, and the residual seed convention
    offsets codebook ids by n_cells, which at a production 2^16 cells
    would pad every LUT with 65k NULL literals; review r10) — the scan
    projects M small ints into a distance, no joins.  Shared by the
    query-local sim_pq_adc_topk and the stored-index serve (review
    r9).  One ``F.expr`` string per call (:func:`_dlit`): same
    element_at/map operators, same left-to-right + fold, bit-identical
    results, no per-literal py4j cost."""
    return F.expr(_adc_dist_sql(qv, codebook, m, subdim))


def ann_index_build(
    spark: SparkSession,
    corpus: DataFrame,
    out: str,
    n_cells: int,
    pq_k: int,
    m: int = ANN_M,
    subdim: int = ANN_SUBDIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeds: DataFrame | None = None,
) -> None:
    """Build and WRITE the three artifacts.  ``seeds``: the quantizer
    training frame (coarse centroids = its ``n_cells`` lowest ids, PQ
    codebook = the residuals of the NEXT ``pq_k`` ids — the
    deterministic data-derived seed convention, residual edition).
    Defaults to
    the corpus itself; the incremental path passes the FULL corpus head
    explicitly so a base build and its updates share one frozen
    quantizer.  Cost: one seed collect (metadata-scale) + ONE corpus
    pass (assign is a broadcast join, encode a projection, the write
    streams out partitioned by cell)."""
    v = _vec_frame(corpus, id_col, vec_col)
    seed_v = v if seeds is None else _vec_frame(seeds, id_col, vec_col)
    cents, cbook = ann_quantizer_build(spark, seed_v, out, n_cells, pq_k)
    _encode_write(spark, v, out, cents, cbook, m, subdim, mode="overwrite")


def ann_quantizer_build(
    spark: SparkSession, seed_v: DataFrame, out: str, n_cells: int, pq_k: int
) -> tuple[dict, dict]:
    """Train (seed-select) and WRITE only the two quantizer artifacts —
    the prerequisite of streaming maintenance, where codes arrive from
    micro-batches (:func:`ann_codes_append_batch`) and no one-shot
    corpus encode ever runs.  ``seed_v`` is a (vec_id, v) frame; one
    metadata-scale collect (orderBy+limit → TakeOrdered, no shuffle).
    Returns the (centroids, codebook) dicts so a same-process build can
    encode without re-reading them.

    Seeds really are the N LOWEST ids (ADVICE r9: the old
    ``vec_id < max(n_cells, pq_k)`` filter silently trained an
    undersized or empty quantizer on a corpus with offset/sparse ids)
    — and a non-empty seed frame that still yields no centroids is a
    contract violation, not a valid empty index."""
    n_seed = n_cells + pq_k
    ordered = sorted(
        (r["vec_id"], [float(x) for x in r["v"]])
        for r in seed_v.orderBy("vec_id").limit(n_seed).collect()
    )
    cents = dict(ordered[:n_cells])
    if not cents and seed_v.take(1):
        raise ValueError(
            "ann_quantizer_build: a non-empty seed frame produced zero "
            "centroids — n_cells/pq_k must be >= 1"
        )
    # Codebook seeds live in RESIDUAL space (round 10): codes quantize
    # v − centroid[cell], so each seed enters as its residual against
    # its own nearest coarse cell — a raw-space codebook under residual
    # encode is a unit-norm book quantizing near-zero vectors, and the
    # recall probe measured exactly that regression (m16/k16 0.33 →
    # 0.17 before this fix).  The codebook draws the pq_k seeds AFTER
    # the n_cells centroid seeds (DISJOINT head slices): a centroid
    # seed's residual against itself is the zero vector, and a
    # codebook of zeros codes every vector identically — the probe
    # measured that degeneracy too.  Driver-side over the
    # metadata-scale head; the nearest-cell fold is the probe_cells_py
    # fold, the subtraction plain IEEE doubles — both bit-identical to
    # the DuckDB twin.
    cbook = {}
    for cid, vec in ordered[n_cells : n_cells + pq_k]:
        cell = min((sqdist_py(vec, cv), c) for c, cv in cents.items())[1]
        cbook[cid] = [a - b for a, b in zip(vec, cents[cell])]
    # A seed frame smaller than n_cells + pq_k yields an UNDERSIZED
    # codebook — empty below n_cells + 1 vectors, in which case the
    # index stores zero codes and serves zero rows.  That is the
    # documented degradation for corpora smaller than the quantizer
    # config (ANN indexing below |cells| vectors is meaningless; use
    # brute force), and it is exactly what the twin's LIMIT/OFFSET
    # does, so parity holds on hostile/tiny corpora (the r10 hostile
    # gate covers this path).  Zero CENTROIDS from a non-empty frame
    # remain a loud error above.
    # two independent metadata-scale writes — overlap their per-action
    # overhead (guide §2.6, round 11)
    from pipeline311_spark.ext.artifact import run_jobs

    run_jobs(
        lambda: meta_df(
            spark, [(int(i), vec) for i, vec in sorted(cents.items())], _centroid_schema("cell")
        ).write.mode("overwrite").parquet(os.path.join(out, "centroids")),
        lambda: meta_df(
            spark, [(int(i), vec) for i, vec in sorted(cbook.items())], _centroid_schema("cid")
        ).write.mode("overwrite").parquet(os.path.join(out, "codebook")),
    )
    return cents, cbook



def _load_quantizer(
    spark: SparkSession, out: str, use_cache: bool = False
) -> tuple[dict[int, list[float]], dict[int, list[float]]]:
    """Collect the two FROZEN metadata artifacts as driver dicts — the
    ONE home of quantizer loading (review r9: three call sites carried
    verbatim copies).  Reads only centroids/codebook, never the codes
    dir (which may legitimately not exist yet — streaming indexes whose
    first batch hasn't arrived; DataFrameReader.parquet resolves paths
    eagerly).

    ``use_cache=True`` (the per-micro-batch appender) memoizes on the
    artifacts' write markers' mtime_ns, so a long-running stream pays
    the two read+collect jobs once instead of per trigger while a
    REBUILT quantizer at the same path still invalidates."""
    cpath, bpath = os.path.join(out, "centroids"), os.path.join(out, "codebook")
    key = None
    if use_cache:
        try:
            key = (
                out,
                os.stat(os.path.join(cpath, "_SUCCESS")).st_mtime_ns,
                os.stat(os.path.join(bpath, "_SUCCESS")).st_mtime_ns,
            )
        except OSError:
            key = None
        if key is not None and key in _QUANTIZER_CACHE:
            return _QUANTIZER_CACHE[key]
    cents = {
        r["cell"]: list(r["cv"])
        for r in spark.read.schema(_centroid_schema("cell")).parquet(cpath).collect()
    }
    cbook = {
        r["cid"]: list(r["cv"])
        for r in spark.read.schema(_centroid_schema("cid")).parquet(bpath).collect()
    }
    if key is not None:
        _QUANTIZER_CACHE.clear()  # bounded: one live stream per process is the shape
        _QUANTIZER_CACHE[key] = (cents, cbook)
    return cents, cbook


_QUANTIZER_CACHE: dict = {}


def ann_index_update(
    spark: SparkSession,
    out: str,
    batch: DataFrame,
    m: int = ANN_M,
    subdim: int = ANN_SUBDIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    validate_disjoint: bool = False,
) -> None:
    """Assign + encode a NEW batch (vec ids disjoint from the indexed
    corpus) with the STORED quantizer artifacts and append its code
    rows to their cell partitions — per-batch cost is one batch pass;
    the corpus codes are never rewritten.  Frozen-quantizer encode is a
    pure per-row function, so the appended index is row-identical to a
    fresh full build (oracle-gated: sim_ivfpq_incr_store).

    ``validate_disjoint=True`` spends one semi-join probe of batch ids
    against the stored codes (bounded by the batch side, first hit
    short-circuits) and raises on overlap — the same opt-in guard as
    ``bm25_index_update`` (ADVICE r8): an overlapping append would
    serve the same vec_id twice."""
    cents, cbook = _load_quantizer(spark, out)
    v = _vec_frame(batch, id_col, vec_col)
    if not cents:
        if not v.take(1):
            return  # empty increment against an empty index: a no-op day
        # an empty-corpus BUILD legitimately stores zero centroids, but
        # an UPDATE with real vectors against that index cannot encode
        # anything — the silent alternative drops the whole batch while
        # the caller believes it was indexed (review r9).  An EMPTY
        # CODEBOOK with real centroids is different: the fresh build
        # also stores zero codes (the undersized-corpus degradation,
        # ann_quantizer_build), so appending zero rows keeps
        # merged ≡ fresh — no raise (r10 hostile gate).
        raise ValueError(
            f"ann_index_update: the stored quantizer at {out} is empty "
            "(centroids have no rows) — rebuild the index with seed "
            "vectors before appending batches"
        )
    _warn_if_dead_codebook(cents, cbook, out, "ann_index_update")
    if validate_disjoint:
        # load the codes view only here (ADVICE r9: an unconditional
        # load eagerly resolves all three paths — extra listing work,
        # and a hard failure on a quantizer-only store even for calls
        # that never touch codes)
        index = load_ann_index(spark, out, m)
        overlap = (
            index.codes.select("vec_id")
            .join(F.broadcast(v.select("vec_id").distinct()), "vec_id", "left_semi")
            .take(1)
        )
        if overlap:
            raise ValueError(
                f"ann_index_update: batch vec_id {overlap[0]['vec_id']} is "
                "already indexed — the disjoint-batch contract is violated "
                "and the append would duplicate it"
            )
    _encode_write(spark, v, out, cents, cbook, m, subdim, mode="append")


def _warn_if_dead_codebook(cents: dict, cbook: dict, out: str, who: str) -> None:
    """An empty codebook with real centroids (the undersized-corpus
    build degradation) encodes EVERY append to zero rows: value-correct
    (fresh builds store zero codes too — parity holds, the hostile gate
    depends on it) but operationally a dead store.  Warn loudly once
    per process/location instead of staying silent (review r10 second
    wave: the silent mode is the r9 guard's failure scenario, and a
    hard raise here would re-break tiny-corpus parity)."""
    if cents and not cbook:
        import warnings

        warnings.warn(
            f"{who}: the stored codebook at {out} is empty (built from a "
            "corpus smaller than n_cells + 1 seeds) — every append encodes "
            "zero rows and the store serves nothing; rebuild with a larger "
            "seed frame or smaller n_cells/pq_k",
            RuntimeWarning,
            stacklevel=3,
        )


def _vec_frame(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, v double[]) with NULL embeddings dropped — the
    engine-wide failed-encode convention (plans/common.emb_table)."""
    return df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"), as_double(vec_col).alias("v")
    )


def _encode_write(spark, v, out, cents, cbook, m, subdim, mode: str) -> None:
    if not cents:
        empty = spark.createDataFrame([], _codes_schema(m))
        empty.write.mode(mode).partitionBy("pcell").parquet(os.path.join(out, "codes"))
        return
    centroids = meta_df(
        spark, [(int(i), vec) for i, vec in sorted(cents.items())], _centroid_schema("cell")
    )
    codes = pq_codes(assign_cells(v, centroids), cbook, m, subdim)
    codes.write.mode(mode).partitionBy("pcell").parquet(os.path.join(out, "codes"))


def load_ann_index(spark: SparkSession, out: str, m: int = ANN_M) -> AnnIndex:
    """Read-back views with explicit schemas (an index built from an
    empty corpus has no code files to infer from)."""
    return AnnIndex(
        centroids=spark.read.schema(_centroid_schema("cell")).parquet(
            os.path.join(out, "centroids")
        ),
        codebook=spark.read.schema(_centroid_schema("cid")).parquet(
            os.path.join(out, "codebook")
        ),
        codes=spark.read.schema(_codes_schema(m)).parquet(os.path.join(out, "codes")),
    )


def sqdist_py(a: Sequence[float], b: Sequence[float]) -> float:
    """Driver-side twin of :func:`similarity.sqdist` — the identical
    prepend-0.0 left fold, so driver-chosen probe cells and LUT entries
    are bit-identical to both engines' folds."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += (x - y) * (x - y)
    return acc


def probe_cells_py(
    qvecs: dict[int, list[float]], cents: dict[int, list[float]], nprobe: int
) -> dict[int, list[int]]:
    """Each query's ``nprobe`` nearest coarse cells, computed DRIVER
    side from the collected (metadata-scale) centroids — what makes the
    codes read STATICALLY partition-pruned (the ``_term_bucket_py``
    move, plans/retrieval2.py).  Order: (squared L2, cell id) — the
    exact ROW_NUMBER order of the oracle twin."""
    return {
        qid: [c for _, c in sorted((sqdist_py(qv, cv), c) for c, cv in cents.items())[:nprobe]]
        for qid, qv in qvecs.items()
    }


def ann_adc_topk_from_store(
    spark: SparkSession,
    out: str,
    qvecs: dict[int, list[float]],
    k: int,
    nprobe: int,
    m: int = ANN_M,
    subdim: int = ANN_SUBDIM,
) -> DataFrame:
    """Serve top-k from the STORED index: collect the two metadata
    artifacts, choose each query's ``nprobe`` cells driver-side, read
    ONLY those cell partitions of the codes table (PartitionFilters —
    plan-asserted in tests/test_ann_store.py), and rank by asymmetric
    PQ distance computed from per-query LUT literals — the scan
    projects M code columns into a distance, no join, no corpus touch.

    Output (query_id, rank, neighbor_id): ranks by (ADC distance,
    neighbor id); the double is compared, never emitted.  LUT entries
    are driver-side Python folds bit-identical to the oracle's
    ``list_reduce`` (the sim_pq_adc_topk precedent)."""
    return _serve_adc_topk(
        spark, out, index_codes=load_ann_index(spark, out, m).codes,
        qvecs=qvecs, k=k, nprobe=nprobe, m=m, subdim=subdim,
    )


#: Hard cap on the per-call query set of the ADC serve: each query adds
#: nprobe per-cell LUTs of m*k literals to ONE expression tree, and the
#: pruned-codes scan is exploded |queries|-fold — the bounded-query-set
#: contract brute_force_topk documents, made structural (VERDICT r9
#: nit 3: nothing stopped a 10^5-query caller from building a
#: 10^5-literal plan).  Batch workloads beyond this should loop in
#: caps, or rank via a join against a query TABLE instead of literals.
SERVE_MAX_QUERIES = 128


def _serve_adc_topk(spark, out, index_codes, qvecs, k, nprobe, m, subdim) -> DataFrame:
    """The shared serve kernel (review r9: one home for the ranking):
    driver-chosen probe cells -> pcell-pruned read of ``index_codes``
    -> per-query LUT distance projection -> bounded top-k window.
    ``qvecs`` is capped at :data:`SERVE_MAX_QUERIES` (driver-side
    expression-tree cost is linear in it).

    The cap is checked BEFORE the empty-store short-circuit —
    deliberately (adjudicated ADVICE r10): the bound is a structural
    contract on what a CALLER may ask per call, independent of store
    state.  A caller holding an over-cap query set has a bug that an
    accidentally-empty store should not mask with zero rows — the
    pinned behavior (tests/test_ann_store.py) is that the refusal wins
    even when the store is empty or quantizer-less."""
    if len(qvecs) > SERVE_MAX_QUERIES:
        raise ValueError(
            f"ADC serve got {len(qvecs)} query vectors; the literal-LUT "
            f"plan is bounded at {SERVE_MAX_QUERIES} per call — split the "
            "query set, or join a query table instead"
        )
    empty = "query_id long, rank long, neighbor_id long"
    cents, cbook = _load_quantizer(spark, out)
    if not cents or not cbook or not qvecs:
        return spark.createDataFrame([], empty)
    probes = probe_cells_py(qvecs, cents, nprobe)
    all_cells = sorted({f"c{c}" for cells in probes.values() for c in cells})
    entries = [
        F.struct(
            F.lit(qid).cast("long").alias("query_id"),
            _residual_dist_case(
                qvecs[qid], probes[qid], cents, cbook, m, subdim
            ).alias("dist"),
            F.array(*[F.lit(f"c{c}") for c in probes[qid]]).alias("cells"),
        )
        for qid in sorted(qvecs)
    ]
    pruned = index_codes.filter(F.col("pcell").isin(all_cells))
    scored = (
        pruned.select("vec_id", "pcell", F.explode(F.array(*entries)).alias("qd"))
        .filter(F.array_contains(F.col("qd.cells"), F.col("pcell")))
        .filter(F.col("vec_id") != F.col("qd.query_id"))
        .select(
            F.col("qd.query_id").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            F.col("qd.dist").alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def _residual_dist_case(
    qv: Sequence[float],
    cells: Sequence[int],
    cents: dict[int, list[float]],
    cbook: dict[int, list[float]],
    m: int,
    subdim: int,
) -> Column:
    """Residual-ADC distance for ONE query: codes quantize
    ``v − centroid[cell]`` (:func:`pq_codes`), so the query-side LUT
    must be built from the query's residual against the SAME cell —
    a CASE over ``pcell`` with one :func:`adc_dist_expr` branch per
    probed cell (nprobe branches of m·k literals; rows of un-probed
    cells fall out of the surrounding ``cells`` filter, so the missing
    ELSE is never observed).  Residuals subtract driver-side in plain
    Python doubles — bit-identical to the twin's ``p[1] - p[2]``.
    One ``F.expr`` CASE string (same When-chain Catalyst shape, no
    ELSE → NULL exactly as the old builder; :func:`_dlit`)."""
    branches = []
    for c in cells:
        rq = [a - b for a, b in zip(qv, cents[c])]
        branches.append(f"WHEN pcell = 'c{int(c)}' THEN {_adc_dist_sql(rq, cbook, m, subdim)}")
    return F.expr("CASE " + " ".join(branches) + " END")


# ---------------------------------------------------------------------------
# Streaming maintenance of the codes artifact: an append-only log of
# batch deltas (the ext/artifact.py contract shared with the BM25 index
# and the MinHash gram log).  The quantizer artifacts are FROZEN — a
# stream maintains ONLY the codes table: each micro-batch is assigned +
# encoded with the stored centroids/codebook and dynamically overwrites
# its own batch_id partition (replay-idempotent); pcell stays a
# partition column UNDER batch_id, so the pruned serve read keeps its
# PartitionFilters across batch directories, and compaction folds the
# accreted batch dirs into the batch_id=-1 base.
# ---------------------------------------------------------------------------


def _codes_log_schema(m: int) -> T.StructType:
    return T.StructType(
        [T.StructField("vec_id", T.LongType())]
        + [T.StructField(f"code{j}", T.LongType()) for j in range(m)]
        + [
            T.StructField("batch_id", T.LongType()),
            T.StructField("pcell", T.StringType()),
        ]
    )


def ann_codes_append_batch(
    batch_df: DataFrame,
    batch_id: int,
    out: str,
    m: int = ANN_M,
    subdim: int = ANN_SUBDIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    validate_fresh_ids: bool = False,
) -> None:
    """The ``foreachBatch`` body: encode one micro-batch with the
    STORED quantizer and append its code rows to the batch-id log.
    Recovers a crashed compaction swap first (the appender contract,
    review r9).  Raises if the quantizer is empty — a stream cannot
    encode against an untrained index.  ``validate_fresh_ids``
    (ADVICE r10) refuses a re-appended tombstoned vec id — the
    retained tombstone would mask its code row forever."""
    from pipeline311_spark.ext.artifact import (
        assert_fresh_ids,
        folded_batches,
        recover_swap,
        skip_if_replayed,
        tombstone_dir,
    )

    spark = batch_df.sparkSession
    recover_swap(os.path.join(out, "codes"))
    if int(batch_id) in folded_batches(out):
        # post-fold replay guard (review r11): replayed code rows
        # duplicate base rows and a duplicated neighbor eats a top-k
        # slot at serve; skip replays, let fresh id-space recycling
        # (disjoint vec ids) proceed.  Probe = RAW codes ∪ tombstones
        # minus this batch's own partition (skip_if_replayed) — the
        # masked serving view would hide a folded-then-fully-deleted
        # batch and let its replay recreate forever-masked rows.
        from pipeline311_spark.ext.artifact import read_log, tombstone_schema

        c_path = os.path.join(out, "codes")
        # own-partition exclusion only on the append stream's own log;
        # tombstones are the delete stream's namespace (wave three)
        probe = read_log(spark, c_path, _codes_log_schema(m)).filter(
            F.col("batch_id") != int(batch_id)
        ).select("vec_id").unionByName(
            read_log(
                spark, tombstone_dir(c_path), tombstone_schema("vec_id")
            ).select("vec_id")
        )
        if skip_if_replayed(
            batch_df.select(F.col(id_col).alias("vec_id")),
            out,
            batch_id,
            probe,
            "vec_id",
            "ann_codes_append_batch",
        ):
            return
    if validate_fresh_ids:
        assert_fresh_ids(
            batch_df.select(F.col(id_col).alias("vec_id")),
            tombstone_dir(os.path.join(out, "codes")),
            "vec_id",
        )
    cents, cbook = _load_quantizer(spark, out, use_cache=True)
    if not cents:
        # empty-CODEBOOK-with-centroids appends zero rows below, the
        # undersized-corpus degradation (merged ≡ fresh still holds)
        if not _vec_frame(batch_df, id_col, vec_col).take(1):
            return  # empty micro-batch against an empty index: a no-op
        raise ValueError(
            f"ann_codes_append_batch: the stored quantizer at {out} is empty "
            "— build it (ann_index_build / the centroid+codebook artifacts) "
            "before streaming batches"
        )
    _warn_if_dead_codebook(cents, cbook, out, "ann_codes_append_batch")
    centroids = meta_df(
        spark, [(int(i), vec) for i, vec in sorted(cents.items())], _centroid_schema("cell")
    )
    codes = pq_codes(
        assign_cells(_vec_frame(batch_df, id_col, vec_col), centroids),
        cbook,
        m,
        subdim,
    )
    from pipeline311_spark.ext.artifact import write_batch_partition, write_intent

    with write_intent(out, f"append-{int(batch_id)}"):
        write_batch_partition(
            codes, os.path.join(out, "codes"), batch_id, partition_by=("pcell",)
        )


def ann_codes_delete_batch(
    ids: DataFrame, batch_id: int, out: str, id_col: str = "vec_id"
) -> None:
    """Tombstone one batch of DELETED vec ids (VERDICT r9 item 1): code
    rows are row-disjoint per vector, so deletion is a sibling
    ``codes_deleted`` tombstone log — anti-joined by
    :func:`load_ann_codes_log`, physically dropped at
    :func:`ann_codes_compact`.  Replay-idempotent (each delete batch
    overwrites its own tombstone partition); the quantizer artifacts
    are untouched — deletion never retrains a frozen quantizer."""
    from pipeline311_spark.ext.artifact import (
        tombstone_append,
        tombstone_dir,
        write_intent,
    )

    with write_intent(out, f"delete-{int(batch_id)}"):
        tombstone_append(
            ids.select(F.col(id_col).alias("vec_id")),
            batch_id,
            tombstone_dir(os.path.join(out, "codes")),
            "vec_id",
        )


def load_ann_codes_log(spark: SparkSession, out: str, m: int = ANN_M) -> DataFrame:
    """Fold the codes log back to the serving view (vec_id, code*,
    pcell): the union of batch partitions IS the merge (disjoint vec
    ids), minus tombstoned vectors (anti-join against the
    metadata-scale deleted set; absent log = no-op — the pcell
    PartitionFilters still reach the codes scan through the join's
    left side).  Refuses loudly mid-compaction-swap."""
    from pipeline311_spark.ext.artifact import (
        apply_tombstones,
        read_log,
        tombstone_dir,
    )

    path = os.path.join(out, "codes")
    codes = read_log(spark, path, _codes_log_schema(m)).drop("batch_id")
    return apply_tombstones(spark, codes, tombstone_dir(path), "vec_id")


def ann_codes_compact(spark: SparkSession, out: str, m: int = ANN_M) -> None:
    """Fold the per-batch code partitions into the ``batch_id = -1``
    base via the shared crash-recoverable swap; tombstoned vectors are
    physically dropped (the fold reads through
    :func:`load_ann_codes_log`) and the tombstone log folded-but-
    retained (ext/artifact.py module note)."""
    from pipeline311_spark.ext.artifact import (
        assert_quiesced,
        compact_swap,
        compact_tombstones,
        recover_log,
        tombstone_dir,
    )

    # quiescence contract, enforced (VERDICT r10 item 3)
    assert_quiesced(out)
    # record the batches this fold absorbs BEFORE folding (review r11)
    from pipeline311_spark.ext.artifact import record_folded_batches

    record_folded_batches(out, "codes")
    path = os.path.join(out, "codes")
    # recovers the tombstone sibling too — it is READ below (through
    # load_ann_codes_log), and a compaction crashed inside
    # compact_tombstones would otherwise brick every later compact/load
    # (review r10)
    recover_log(path)
    if not os.path.isdir(path):
        return
    # fold tombstones FIRST (review r11 wave three — the fold-order
    # half of the replay-guard contract, see ext/artifact.py
    # skip_if_replayed): a delete batch's fold evidence must reach the
    # -1 base before any crash window can strand it in an excluded
    # partition
    compact_tombstones(spark, tombstone_dir(path), "vec_id")
    from pipeline311_spark.ext.artifact import write_batch_partition

    base = load_ann_codes_log(spark, out, m)
    compact_swap(
        path,
        lambda staging: write_batch_partition(
            base, staging, -1, partition_by=("pcell",)
        ),
    )


def ann_adc_topk_from_log(
    spark: SparkSession,
    out: str,
    qvecs: dict[int, list[float]],
    k: int,
    nprobe: int,
    m: int = ANN_M,
    subdim: int = ANN_SUBDIM,
) -> DataFrame:
    """Serve top-k from the LOG-form codes store — identical ranking to
    :func:`ann_adc_topk_from_store`, reading the batch_id-partitioned
    layout (pcell pruning still reaches the scan: a second-level
    partition column prunes across batch directories)."""
    return _serve_adc_topk(
        spark, out, index_codes=load_ann_codes_log(spark, out, m),
        qvecs=qvecs, k=k, nprobe=nprobe, m=m, subdim=subdim,
    )


# ---------------------------------------------------------------------------
# Trained PQ codebook: k-means (Lloyd) per subspace with EXACT decimal
# means.  The seed-centroid convention above keeps the DuckDB twins
# bit-exact; training breaks SQL-expressibility, so its consumer query
# is rows-only-gated and carries its own measured recall AUDIT instead
# (the SCALE.md "trained centroids need the audit-based gate" note).
# Determinism across runs/parallelism is still required
# (tools/check_determinism.py): a naive float mean depends on
# aggregation order, so per-dim sums are folded in DECIMAL (exact,
# associative) and divided by the exact count — identical centroids on
# every run, which makes codes, LUTs, and ranks identical too.
# ---------------------------------------------------------------------------


def ann_cells_train(
    v: DataFrame,
    n_cells: int,
    dim: int,
    iters: int = 2,
    exact_decimals: int | None = None,
) -> dict[int, list[float]]:
    """Lloyd-train the IVF coarse cells (VERDICT r9 item 4: seed cells
    leave cell balance untrained — a hot cell defeats nprobe pruning).
    This IS :func:`pq_train_codebook` with ONE subspace spanning the
    full dimension: same lowest-id seed convention, same exact-decimal
    means (cross-run deterministic), same single-pass-per-iteration
    shape.  Multi-iteration training breaks SQL-expressibility, so its
    consumers are audit-gated (sim_ivfpq_trained_audit) — but a SINGLE
    Lloyd step in ``exact_decimals`` mode IS oracle-exact, and the
    registry gates it bit-for-bit against DuckDB
    (sim_ann_cells_train_step, VERDICT r10 item 1)."""
    return pq_train_codebook(
        v, pq_k=n_cells, m=1, subdim=dim, iters=iters, exact_decimals=exact_decimals
    )


def ann_index_build_trained(
    spark: SparkSession,
    corpus: DataFrame,
    out: str,
    n_cells: int,
    pq_k: int,
    m: int = ANN_M,
    subdim: int = ANN_SUBDIM,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """The TRAINED-quantizer build: Lloyd-train the coarse cells on the
    corpus, assign, Lloyd-train the PQ codebook on the RESIDUALS (the
    codebook then models within-cell spread — the quantity residual
    codes encode), write all three artifacts.  Serving is unchanged
    (:func:`ann_adc_topk_from_store` — the store layout doesn't know or
    care how its quantizer was trained; frozen-per-corpus-version and
    incremental-append semantics carry over verbatim).  Cost:
    2·``iters`` + 2 corpus passes, each a broadcast-join/projection
    with a metadata-scale shuffle — the standard distributed k-means
    shape.

    The assign+residual pass is computed ONCE and persisted
    (MEMORY_AND_DISK, spillable — the same ~1x-corpus cache budget the
    BM25 token base takes): the codebook seed collect, every Lloyd
    iteration, and the final encode all read the cached residuals
    instead of re-running the broadcast-assign join + top-1 window per
    consumer (round 11, guide §1.2 — the lazy ``resid`` lineage was
    recomputed 4x: seed collect, each iteration, encode).  The cached
    rows are the evaluated output of the identical ``zip_with``
    subtraction, so codes and codebook are bit-identical to the
    recompute-every-time plan."""
    from pipeline311_spark.ext.cache import persist_tracked

    v = _vec_frame(corpus, id_col, vec_col)
    first = v.select(F.size("v").alias("d")).take(1)
    dim = int(first[0]["d"]) if first else m * subdim
    cents = ann_cells_train(v, n_cells, dim, iters=iters)
    if first and not cents:
        # a non-empty corpus training zero cells writes an index that
        # serves nothing (review r10 — the quantizer-build guard,
        # trained edition)
        raise ValueError(
            "ann_index_build_trained: a non-empty corpus trained zero "
            "cells — n_cells must be >= 1"
        )
    centroids_df = meta_df(
        spark, [(int(i), vec) for i, vec in sorted(cents.items())], _centroid_schema("cell")
    )
    centroids_df.write.mode("overwrite").parquet(
        os.path.join(out, "centroids")
    )
    resid = None
    try:
        if cents:
            resid = persist_tracked(
                assign_cells(v, centroids_df).select(
                    "vec_id",
                    "cell",
                    F.zip_with("v", "cv", lambda a, b: a - b).alias("v"),
                )
            )
            cbook = pq_train_codebook(
                resid, pq_k=pq_k, m=m, subdim=subdim, iters=iters
            )
        else:
            cbook = {}
        meta_df(
            spark, [(int(i), vec) for i, vec in sorted(cbook.items())], _centroid_schema("cid")
        ).write.mode("overwrite").parquet(os.path.join(out, "codebook"))
        if resid is not None and cbook:
            # encode from the SAME cached residuals: identical
            # expressions to pq_codes over a fresh assign (pq_code_col
            # on the residual column, pcell from the assigned cell)
            codes = resid.select(
                "vec_id",
                *[
                    pq_code_col(j, cbook, subdim, v_col="v").alias(f"code{j}")
                    for j in range(m)
                ],
                F.concat(F.lit("c"), F.col("cell").cast("string")).alias("pcell"),
            )
            codes.write.mode("overwrite").partitionBy("pcell").parquet(
                os.path.join(out, "codes")
            )
        else:
            _encode_write(spark, v, out, cents, cbook, m, subdim, mode="overwrite")
    finally:
        if resid is not None:
            resid.unpersist(False)


def cell_balance_py(codes_pops: dict[str, int]) -> tuple[int, int]:
    """(max, lower-median) cell population from a collected
    {pcell: count} map — the skew statistic nprobe pruning's worst case
    depends on (a hot cell makes every probe that hits it scan-heavy).
    Driver-side over |cells| values — metadata-scale, deterministic
    (integer counts, sorted fold).

    Caller contract (ADVICE r10): the map must cover the FULL trained
    cell domain with explicit zeros for empty cells — a groupBy over
    stored codes alone never emits a zero-population cell, which
    biases the median upward and hides exactly the imbalance this
    audit exists to expose (empty cells are wasted quantizer capacity
    concentrated onto the hot ones).  Both callers fill from the
    centroid set: plans/ann_store_q.q_ivfpq_trained_audit and
    tools/recall_probe.py."""
    if not codes_pops:
        return (0, 0)
    pops = sorted(codes_pops.values())
    return (pops[-1], pops[(len(pops) - 1) // 2])


def pq_train_codebook(
    v: DataFrame,
    pq_k: int,
    m: int = ANN_M,
    subdim: int = ANN_SUBDIM,
    iters: int = 2,
    exact_decimals: int | None = None,
) -> dict[int, list[float]]:
    """Lloyd-train the PQ codebook from the ``pq_k``-lowest-id seeds.
    Per iteration: one corpus pass assigns every subvector to its
    nearest entry (the shared :func:`pq_code_col` argmin), one
    aggregate computes exact per-(subspace, entry, dim) decimal means
    (m·k·subdim rows — metadata-scale, ONE collect per iteration), and
    empty entries keep their previous value.  Scale: iterations are
    O(corpus) passes with a metadata-sized shuffle, the standard
    distributed-k-means shape.

    Seeds are the ``pq_k`` LOWEST ids via orderBy+limit (review r10:
    the old ``vec_id < pq_k`` filter silently trained nothing on a
    corpus with offset/sparse ids — the exact ADVICE-r9 failure mode
    fixed in ann_quantizer_build, inherited here by the trained
    build).

    ``exact_decimals`` (VERDICT r10 item 1): the default decimal(38,15)
    mean fold is deterministic but NOT cross-engine bit-exact — Spark
    casts double→decimal through the shortest decimal string (HALF_UP)
    while DuckDB rounds the exact binary expansion, and the two can
    disagree in the 15th place.  With ``exact_decimals=d`` set, values
    are rounded to ``d`` decimals FIRST and summed as decimal(28,d) —
    the q_kmeans_update-proven fold (plans/analytics13.py) where both
    engines sum identical exact decimals and the only double op is one
    division of bit-identical operands — so a one-step training query
    can carry a bit-exact DuckDB twin (sim_ann_cells_train_step)."""
    cbook = {
        r["vec_id"]: [float(x) for x in r["v"]]
        for r in v.orderBy("vec_id").limit(pq_k).collect()
    }
    if not cbook:
        return cbook
    for _ in range(iters):
        # ONE corpus pass per iteration (review r9: a union of m
        # per-subspace branches re-scanned and re-encoded the corpus m
        # times — Spark does not share a scan across union branches):
        # all m (j, cid, subvector) assignments ride one struct array,
        # exploded map-side
        coded = v.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            pq_code_col(j, cbook, subdim).alias("cid"),
                            F.slice("v", j * subdim + 1, subdim).alias("sub"),
                        )
                        for j in range(m)
                    ]
                )
            ).alias("x")
        )
        parts = coded.select(
            F.col("x.j").alias("j"),
            F.col("x.cid").alias("cid"),
            F.posexplode("x.sub").alias("d", "val"),
        )
        if exact_decimals is None:
            mean_expr = (
                F.sum(F.col("val").cast("decimal(38,15)")) / F.count("*")
            ).cast("double")
        else:
            # oracle-exact fold: round → exact decimal sum → ONE double
            # division (cast the sum to double BEFORE dividing — a
            # decimal division has engine-specific result scale,
            # whereas double/int division of identical operands is one
            # unique IEEE result on both engines; q_kmeans_update)
            mean_expr = (
                F.sum(
                    F.round("val", exact_decimals).cast(
                        f"decimal(28,{exact_decimals})"
                    )
                ).cast("double")
                / F.count("*")
            ).cast("double")
        stats = parts.groupBy("j", "cid", "d").agg(mean_expr.alias("mean"))
        new_cbook = {c: list(vec) for c, vec in cbook.items()}
        for r in stats.collect():  # m*k*subdim rows — metadata-scale
            if r["mean"] is None:
                # a component outside the decimal type's range or an
                # overflowed sum casts to NULL and would otherwise be
                # silently dropped from the mean (ADVICE r9)
                bound = "1e23" if exact_decimals is None else f"1e{28 - exact_decimals}"
                raise ValueError(
                    "pq_train_codebook: exact-decimal mean overflowed for "
                    f"(subspace={r['j']}, centroid={r['cid']}, dim={r['d']}) "
                    f"— embedding components must satisfy |v| < {bound}"
                )
            new_cbook[r["cid"]][r["j"] * subdim + r["d"]] = float(r["mean"])
        cbook = new_cbook
    return cbook
