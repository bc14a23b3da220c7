"""Unit tests for the extension operators (dedup, similarity, text,
multimodal) — semantic properties, not just row counts."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pipeline311_spark.ext.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    minhash_incremental_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from pipeline311_spark.ext.multimodal import (
    decode_image_features,
    documents_as_media,
    frame_sample,
    media_manifest,
)
from pipeline311_spark.ext.similarity import brute_force_topk, lsh_ann_topk
from pipeline311_spark.ext.textstats import lang_id, quality_score, token_count

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),  # near-dup of 0
    (2, "completely different content about spark shuffles and partition pruning"),
    (3, "The  Quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0 mod case/ws
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_normalizes_case_and_ws(docs):
    kept = exact_dedup(docs, "doc_id", "text")
    assert {r["doc_id"] for r in kept.collect()} == {0, 1, 2}  # 3 collapses into 0


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (0, 1) in got and (0, 3) in got and (1, 3) in got
    assert not any(2 in p for p in got)


def test_minhash_identical_signatures(docs):
    sig = minhash_signatures(docs, "doc_id", "text", k=8, n=3)
    rows = {r["doc"]: tuple(r[f"mh{i}"] for i in range(8)) for r in sig.collect()}
    assert rows[0] == rows[3]  # identical after normalization
    assert rows[0] != rows[2]


def test_minhash_dedup_pairs(docs):
    pairs = minhash_dedup_pairs(docs, "doc_id", "text", k=8, bands=4, n=3, threshold=0.5)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(0, 3)] == 1.0
    assert (0, 1) in got
    assert not any(2 in p for p in got)


def test_minhash_verify_strategies_agree(docs):
    # reuse_grams=True (persisted gram table) and False (recompute
    # restricted to candidates) are two physical plans for the same
    # operator — results must be identical.
    kw = dict(k=8, bands=4, n=3, threshold=0.5)
    reuse = minhash_dedup_pairs(docs, "doc_id", "text", reuse_grams=True, **kw)
    recomp = minhash_dedup_pairs(docs, "doc_id", "text", reuse_grams=False, **kw)
    assert sorted(map(tuple, reuse.collect())) == sorted(map(tuple, recomp.collect()))


def test_minhash_incremental_equals_filtered_full(spark):
    # The incremental contract: existing=even ids, new=odd ids must
    # yield exactly the full run's pairs restricted to >=1 new member
    # (and MUST NOT re-find old-old pairs).  doc 4 is an even near-dup
    # of doc 0 so the full run contains an even-even pair to exclude.
    docs = spark.createDataFrame(
        DOCS + [(4, "the quick brown fox jumps over the lazy dog near the river bank tonight")],
        "doc_id long, text string",
    )
    kw = dict(k=8, bands=4, n=3, threshold=0.5)
    full_rows = minhash_dedup_pairs(docs, "doc_id", "text", **kw).collect()
    inc = minhash_incremental_pairs(
        docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1"), "doc_id", "text", **kw
    )
    want = sorted(tuple(r) for r in full_rows if r["doc_a"] % 2 == 1 or r["doc_b"] % 2 == 1)
    got = sorted(tuple(r) for r in inc.collect())
    assert got == want and len(got) > 0
    # and the full run has at least one even-even pair that inc excludes
    assert any(r["doc_a"] % 2 == 0 and r["doc_b"] % 2 == 0 for r in full_rows)

    # the from-store path (stored corpus signatures + grams, batch-only
    # recompute) must produce the identical pair set
    from pipeline311_spark.ext.dedup import (
        _gram_hash_table,
        _signatures_from_grams,
        minhash_incremental_from_store,
    )

    existing = docs.filter("doc_id % 2 = 0")
    gh = _gram_hash_table(existing, "doc_id", "text", 3)
    store = minhash_incremental_from_store(
        _signatures_from_grams(gh, 8, 42),
        gh,
        docs.filter("doc_id % 2 = 1"),
        "doc_id",
        "text",
        k=8, bands=4, n=3, threshold=0.5,
    )
    assert sorted(tuple(r) for r in store.collect()) == want


def test_minhash_reuse_grams_plan_reads_cache(docs):
    # reuse_grams=True: the verify branch must read the persisted gram
    # table (InMemoryTableScan), never re-scan the source text;
    # reuse_grams=False: the verify branch re-reads the source.
    def plan_of(df):
        spark = df.sparkSession
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )

    kw = dict(k=8, bands=4, n=3, threshold=0.5)
    reuse = plan_of(minhash_dedup_pairs(docs, "doc_id", "text", reuse_grams=True, **kw))
    # the verify branch must be fed from the persisted gram table (a
    # string-negative check on the recompute plan is impossible here:
    # InMemoryRelation nodes print their stored child plan, so source
    # scan text appears inside cache descriptions in both modes)
    assert "InMemoryTableScan" in reuse


def test_minhash_unigram_signatures(docs):
    # n=1 must work through the generic gram fold (regression: the old
    # lead-window formulation special-cased it and once referenced a
    # nonexistent h0 column)
    sig = minhash_signatures(docs, "doc_id", "text", k=4, n=1)
    rows = {r["doc"]: tuple(r[f"mh{i}"] for i in range(4)) for r in sig.collect()}
    assert rows[0] == rows[3]  # same token set after normalization
    assert rows[0] != rows[2]


def test_lsh_hot_bucket_capped(spark):
    # 30 identical docs land in one bucket; max_bucket=10 must drop the
    # bucket before membership collection — zero pairs, no blowup.
    from pipeline311_spark.ext.dedup import lsh_candidate_pairs

    docs = spark.createDataFrame(
        [(i, "same exact text repeated for every single document here") for i in range(30)]
        + [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
           (101, "alpha beta gamma delta epsilon zeta eta theta iota lambda")],
        "doc_id long, text string",
    )
    sig = minhash_signatures(docs, "doc_id", "text", k=8, n=3)
    pairs = lsh_candidate_pairs(sig, k=8, bands=4, max_bucket=10).collect()
    flat = {d for r in pairs for d in (r["doc_a"], r["doc_b"])}
    assert not (flat & set(range(30)))  # hot bucket fully suppressed
    assert (100, 101) in {(r["doc_a"], r["doc_b"]) for r in pairs}  # small bucket survives


def test_simhash_identical_and_near(docs):
    sig = simhash(docs, "doc_id", "text")
    pairs = simhash_near_pairs(sig, max_hamming=6)
    rows = {r["doc"]: r["simhash"] for r in sig.collect()}
    assert rows[0] == rows[3]
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs.collect()}
    assert got[(0, 3)] == 0


VECS = [
    (0, [1.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0]),
    (2, [0.0, 1.0, 0.0]),
    (3, [-1.0, 0.0, 0.0]),
    (4, [0.8, 0.2, 0.0]),
]


@pytest.fixture()
def vecs(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


def test_brute_force_topk_ordering(vecs):
    q = vecs.filter("vec_id = 0")
    res = brute_force_topk(vecs, q, k=3).collect()
    order = [r["neighbor_id"] for r in sorted(res, key=lambda r: r["rank"])]
    assert order == [1, 4, 2]  # by cosine to (1,0,0)
    assert res[0]["cos_sim"] <= 1.0 + 1e-12


def test_lsh_ann_same_bucket_recall(vecs):
    q = vecs.filter("vec_id = 0")
    res = lsh_ann_topk(vecs, q, k=3, n_planes=4, dim=3)
    ids = {r["neighbor_id"] for r in res.collect()}
    # near-identical direction vectors must share the bucket
    assert 1 in ids and 4 in ids
    assert 3 not in ids  # opposite vector differs on every hyperplane


def test_lsh_multiprobe_widens_recall(vecs):
    from pipeline311_spark.ext.similarity import lsh_multiprobe_topk

    q = vecs.filter("vec_id = 0")
    single = {r["neighbor_id"] for r in lsh_ann_topk(vecs, q, k=4, n_planes=4, dim=3).collect()}
    multi = {r["neighbor_id"] for r in lsh_multiprobe_topk(vecs, q, k=4, n_planes=4, dim=3).collect()}
    # probing 1-bit-flipped buckets can only ADD candidates
    assert single <= multi
    assert 1 in multi and 4 in multi
    # no duplicate (query, neighbor) rows: each corpus vector lives in
    # exactly one bucket, so at most one probe can match it
    rows = lsh_multiprobe_topk(vecs, q, k=10, n_planes=4, dim=3).collect()
    pairs = [(r["query_id"], r["neighbor_id"]) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_lsh_bucket_requires_dim_and_runs_no_job(spark, vecs):
    from pipeline311_spark.ext.similarity import lsh_bucket

    with pytest.raises(ValueError, match="dim is required"):
        lsh_bucket(vecs, "vec_id", "embedding", n_planes=4)
    # plan construction with dim given must not trigger a Spark job
    sc = spark.sparkContext
    sc.setJobGroup("lsh-plan-audit", "plan construction only")
    try:
        _plan = lsh_bucket(vecs, "vec_id", "embedding", n_planes=4, dim=3)
        jobs = sc.statusTracker().getJobIdsForGroup("lsh-plan-audit")
    finally:
        sc.setJobGroup("", "")
    assert list(jobs) == []


def test_textstats_basics(docs):
    out = docs.select(
        token_count("text").alias("n"),
        lang_id("text").alias("lang"),
        quality_score("text").alias("q"),
    ).collect()
    assert all(r["n"] > 5 for r in out)
    assert out[0]["lang"] == "en"  # 'the' markers
    assert all(0.0 <= r["q"] <= 1.0 for r in out)


def test_multimodal_manifest_and_decode(docs):
    media = documents_as_media(docs)
    man = {r["media_id"]: r for r in media_manifest(media).collect()}
    assert man[0]["byte_len"] == len(DOCS[0][1].encode())
    feats = {r["media_id"]: r for r in decode_image_features(media).collect()}
    assert feats[0]["byte_len"] == man[0]["byte_len"]
    assert len(feats[0]["features"]) == 8
    assert all(0 <= f <= 1 for f in feats[0]["features"])
    # deterministic: same payload -> same features
    again = {r["media_id"]: r for r in decode_image_features(media).collect()}
    assert feats[0]["features"] == again[0]["features"]


def test_frame_sample_shapes(docs):
    media = documents_as_media(docs)
    frames = frame_sample(media, every_bytes=16, max_frames=3).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["media_id"], []).append(r)
    assert all(len(v) <= 3 for v in by_doc.values())
    assert all(len(bytes(r["frame"])) <= 16 for r in frames)


def test_decode_real_codec_degrades_non_png_to_null_features(docs):
    """r6: fake=False is REAL now (stdlib PNG codec) — document text
    bytes are not PNGs, so every row degrades to NULL features while
    byte_len/sha survive (the quarantine contract; see
    tests/test_codecs.py for actual-PNG decoding)."""
    out = decode_image_features(documents_as_media(docs), fake=False).collect()
    assert len(out) == len(DOCS)
    assert all(r["features"] is None for r in out)
    assert all(r["byte_len"] >= 0 and len(r["sha256"]) == 64 for r in out)


def test_connected_components_clusters(spark):
    from pipeline311_spark.ext.cache import cache_scope
    from pipeline311_spark.ext.graph import connected_components, dup_clusters

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "doc_a long, doc_b long",
    )
    # cache_scope: release the final checkpoints deterministically —
    # a leaked checkpoint reaped ASYNCHRONOUSLY by the ContextCleaner
    # mid-count flakes the storage-accounting test below (r8)
    with cache_scope():
        cc = {r["node"]: r["component"] for r in connected_components(edges, "doc_a", "doc_b").collect()}
        keepers = {
            r["doc_id"] for r in dup_clusters(edges).filter("is_keeper").collect()
        }
    assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    assert keepers == {1, 10, 20}


def test_multiprobe_recall_on_testdata(spark, sf_dir):
    """Quantified recall@k on real embeddings: multi-probe must dominate
    single-probe against the brute-force ground truth."""
    from pipeline311_spark.ext.similarity import lsh_multiprobe_topk
    from pipeline311_spark.plans.common import table

    e = table(spark, sf_dir, "embeddings")
    q = e.filter("vec_id < 5")
    kw = dict(k=5, n_planes=8, seed=7, dim=64)

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    truth = topk_sets(brute_force_topk(e, q, k=5))
    single = topk_sets(lsh_ann_topk(e, q, **kw))
    multi = topk_sets(lsh_multiprobe_topk(e, q, **kw))

    def recall(approx):
        hits = sum(len(truth[qid] & approx.get(qid, set())) for qid in truth)
        total = sum(len(s) for s in truth.values())
        return hits / total

    assert recall(multi) >= recall(single)
    assert recall(multi) > 0  # probes must find some true neighbors


def test_ivf_ann_recall(vecs):
    from pipeline311_spark.ext.similarity import ivf_ann_topk

    centroids = vecs.filter("vec_id IN (0, 2)")  # x-axis and y-axis cells
    q = vecs.filter("vec_id = 0")
    res = ivf_ann_topk(vecs, q, centroids, k=3, nprobe=1)
    ids = {r["neighbor_id"] for r in res.collect()}
    # probing only the x-cell finds the co-directional vectors
    assert {1, 4} <= ids


def test_connected_components_long_chain_converges(spark):
    # adversarial worst case: a 40-node path graph (diameter 39) —
    # min-label propagation must still converge inside max_iter because
    # hash-to-min shortcuts via the min label spreading BOTH directions,
    # and the result is a single component rooted at node 0.
    from pipeline311_spark.ext.cache import cache_scope
    from pipeline311_spark.ext.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], "doc_a long, doc_b long"
    )
    with cache_scope():  # deterministic checkpoint release (see clusters test)
        cc = connected_components(edges, "doc_a", "doc_b", max_iter=50).collect()
    assert len(cc) == 40
    assert {r["component"] for r in cc} == {0}


def test_semantic_dedup_keep_rules(spark):
    from pipeline311_spark.ext.similarity import semantic_dedup_keep

    # two well-separated clusters; in-cluster ids 0/1/2 are near-identical
    # (drop 1 and 2, keep 0), id 3 is same-cluster but dissimilar (kept)
    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0]),
            (2, [0.998, 0.02, 0.0]),
            (3, [0.6, 0.0, 0.8]),       # x-cluster, but far from 0/1/2
            (10, [0.0, 1.0, 0.0]),
            (11, [0.0, 0.999, 0.01]),
        ],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    kept = {
        (r["vec_id"], r["centroid_id"])
        for r in semantic_dedup_keep(corpus, cents, threshold=0.95).collect()
    }
    assert kept == {(0, 100), (3, 100), (10, 200)}

    # oversized-cluster exemption: with max_cluster below the x-cluster
    # size, that cluster is kept WHOLE (no pruning), the other still prunes
    kept2 = {
        r["vec_id"]
        for r in semantic_dedup_keep(corpus, cents, threshold=0.95, max_cluster=3).collect()
    }
    assert kept2 == {0, 1, 2, 3, 10}


def test_degenerate_identical_corpus_star_pairs(spark):
    """The ultimate hot bucket: EVERY doc identical.  Since the r5
    content collapse, the fuzzy generators no longer drop these pairs
    (the r4 semantics ADVICE flagged: the strongest duplicates were
    exactly the ones silently lost) — the 500-member group exceeds
    max_group, so each op emits the 499 STAR pairs rep↔member: linear
    output, bounded work (one representative reaches banding), full
    connectivity for downstream clustering."""
    from pyspark.sql import functions as F

    from pipeline311_spark.ext.dedup import (
        exact_dup_groups,
        minhash_dedup_pairs,
        ngram_jaccard_pairs,
        simhash,
        simhash_near_pairs,
    )

    d = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.lit("the quick brown fox jumps over the lazy dog tonight again").alias("text"),
    )
    groups = exact_dup_groups(d, "doc_id", "text").collect()
    assert len(groups) == 1 and groups[0]["n_docs"] == 500
    kw = dict(k=16, bands=4, n=5, threshold=0.2)
    mh = minhash_dedup_pairs(d, "doc_id", "text", **kw).collect()
    assert len(mh) == 499
    assert all(r["doc_a"] == 0 and r["jaccard"] == 1.0 for r in mh)
    assert {r["doc_b"] for r in mh} == set(range(1, 500))
    ng = ngram_jaccard_pairs(d, "doc_id", "text", n=5, threshold=0.2, max_df=50).collect()
    assert len(ng) == 499 and all(r["doc_a"] == 0 and r["jaccard"] == 1.0 for r in ng)
    sh = simhash_near_pairs(simhash(d, "doc_id", "text")).collect()
    assert len(sh) == 499 and all(r["doc_a"] == 0 and r["hamming"] == 0 for r in sh)


def test_identical_group_clique_and_cross_recall(spark):
    """Content collapse semantics: a small identical group emits its
    full clique (J = 1), dup mass no longer saturates buckets (a
    near-dup pair of OTHER docs is still found next to 300 identical
    docs — the r4 gate dropped the whole bucket), and cross near-dup
    pairs expand to every member of each group."""
    from pyspark.sql import functions as F

    from pipeline311_spark.ext.dedup import minhash_dedup_pairs

    # long text so band recall is ~certain (J = 34/36; one-token change)
    base = " ".join(f"word{i}" for i in range(40))
    near = base.replace("word39", "changed")
    rows = [(i, base) for i in range(300)] + [(1000, near), (1001, "totally unrelated words "
            "about spark adaptive query execution and shuffle partition coalescing")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_dedup_pairs(
            d, "doc_id", "text", k=16, bands=4, n=5, threshold=0.2, max_group=400
        ).collect()
    }
    # clique: C(300, 2) identical pairs, all J=1
    ident = {p for p in pairs if p[0] < 300 and p[1] < 300}
    assert len(ident) == 300 * 299 // 2
    assert all(pairs[p] == 1.0 for p in ident)
    # cross recall: EVERY member pairs with the near-dup doc at the
    # same jaccard (expansion), despite 300 docs sharing the bucket
    cross = {p for p in pairs if p[1] == 1000}
    assert cross == {(i, 1000) for i in range(300)}
    assert len({round(pairs[p], 12) for p in cross}) == 1
    assert not any(1001 in p for p in pairs)


def test_cache_scope_releases_persisted_intermediates(spark):
    """cache_scope: after materializing a MinHash result inside the
    scope, exiting the scope unpersists every intermediate the operator
    family pinned (gram table, signature/group table, candidate set)."""
    from pyspark.sql import functions as F

    from pipeline311_spark.ext.cache import cache_scope
    from pipeline311_spark.ext.dedup import minhash_dedup_pairs

    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    # Track the scope's OWN handles, not global getPersistentRDDs()
    # deltas: the JVM ContextCleaner asynchronously releases earlier
    # tests' collected checkpoint RDDs at arbitrary points, so a
    # global count can DROP mid-test by more than this scope pins —
    # the count-delta form of this test flaked exactly that way in the
    # full suite (r8) once the registry grew more checkpoint-leaving
    # queries ahead of it.
    with cache_scope() as held:
        out = minhash_dedup_pairs(d, "doc_id", "text", k=8, bands=4, n=3)
        assert out.count() >= 1
        # intermediates pinned while in scope: the operator family
        # registered handles, and each tracked DataFrame is cached
        dfs = [h for h in held if hasattr(h, "storageLevel")]
        assert dfs, "operator registered no persisted intermediates"
        assert all(h.storageLevel.useMemory or h.storageLevel.useDisk for h in dfs)
    # scope exit released every tracked persist
    assert all(
        not (h.storageLevel.useMemory or h.storageLevel.useDisk) for h in dfs
    )


def test_connected_components_releases_round_checkpoints(spark):
    """r5: each propagation round's localCheckpoint is released once the
    next round is materialized — only the final labels stay pinned, and
    a cache_scope reclaims even that."""
    from pipeline311_spark.ext.cache import cache_scope, release_local_checkpoint
    from pipeline311_spark.ext.graph import connected_components

    jvm_cached = lambda: spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    # a 6-node chain forces several propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)] + [(10, 11)], "doc_a long, doc_b long"
    )
    base = jvm_cached()
    cc = connected_components(edges, "doc_a", "doc_b")
    got = {r["node"]: r["component"] for r in cc.collect()}
    assert got == {**{i: 1 for i in range(1, 7)}, 10: 10, 11: 10}
    # intermediate rounds released in-loop: only the final labels remain
    assert jvm_cached() == base + 1
    release_local_checkpoint(cc)
    assert jvm_cached() == base

    with cache_scope():
        n = connected_components(edges, "doc_a", "doc_b").count()
        assert n == 8
    assert jvm_cached() == base  # scope reclaimed the final checkpoint


def test_jvm_memo_keyed_on_gateway(spark, monkeypatch):
    """ADVICE r4: memoized Column trees pin py4j handles; a relaunched
    gateway must be a cache MISS (fresh tree), not a dead handle."""
    from pyspark import SparkContext

    from pipeline311_spark.ext.hashing import jvm_memo

    calls = []

    @jvm_memo(maxsize=4)
    def build(tag):
        calls.append(tag)
        return object()

    a1 = build("x")
    a2 = build("x")
    assert a1 is a2 and calls == ["x"]  # memoized within one gateway

    class FakeSC:
        _gateway = object()  # a different gateway identity

    monkeypatch.setattr(SparkContext, "_active_spark_context", FakeSC())
    b1 = build("x")
    assert b1 is not a1 and calls == ["x", "x"]  # gateway change -> rebuild
    build.cache_clear()


def test_lsh_dropped_buckets_audits_distinct_content(spark):
    """The max_bucket audit counts DISTINCT signatures per bucket — the
    signature-space image of the pipeline's content collapse — so a
    pile of identical docs audits as n=1 (no phantom drop), while many
    distinct-but-colliding docs are reported."""
    from pipeline311_spark.ext.dedup import lsh_dropped_buckets, minhash_signatures

    docs = spark.createDataFrame(
        [(i, "same exact text repeated for every single document here") for i in range(30)],
        "doc_id long, text string",
    )
    sig = minhash_signatures(docs, "doc_id", "text", k=8, n=3)
    # 30 identical docs: the real gate sees ONE rep per bucket -> audit
    # must report nothing at any cap >= 1
    assert lsh_dropped_buckets(sig, k=8, bands=4, max_bucket=1).count() == 0

    distinct = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta eta theta iota w{i}") for i in range(12)],
        "doc_id long, text string",
    )
    dsig = minhash_signatures(distinct, "doc_id", "text", k=8, n=3)
    # shared 8-gram prefix collides some bands across genuinely distinct
    # docs; with a cap of 1 every multi-signature bucket is reported
    dropped = lsh_dropped_buckets(dsig, k=8, bands=4, max_bucket=1)
    assert dropped.count() > 0
    assert dropped.agg({"n": "max"}).first()[0] > 1


def test_band_math_rejects_non_divisible(spark):
    """bands that don't divide k/bits would silently produce zero-width
    band keys (one global bucket, size-gated to nothing) — both band
    builders must fail loudly instead."""
    import pytest as _pytest

    from pipeline311_spark.ext.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        simhash,
        simhash_near_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    sig = minhash_signatures(docs, "doc_id", "text", k=8, n=3)
    with _pytest.raises(ValueError, match="bands must divide k"):
        lsh_candidate_pairs(sig, k=8, bands=3)
    with _pytest.raises(ValueError, match="bands must divide k"):
        lsh_candidate_pairs(sig, k=8, bands=16)
    ssig = simhash(docs, "doc_id", "text")
    with _pytest.raises(ValueError, match="bands must divide bits"):
        simhash_near_pairs(ssig, bands=7)


def test_dedup_family_handles_null_and_empty_text(spark):
    """NULL, empty, and whitespace-only texts must neither crash nor
    pair: they have no grams (tokens() -> empty/NULL array), so every
    fuzzy operator drops them; exact dedup groups NULL-normalized
    variants by their md5 (NULL fingerprint rows are NULL-keyed and
    must not join each other into pairs)."""
    from pipeline311_spark.ext.dedup import (
        exact_dup_groups,
        minhash_dedup_pairs,
        ngram_jaccard_pairs,
        simhash,
        simhash_near_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "   \t  "),
            (4, "alpha beta gamma delta epsilon"),
            (5, "alpha beta gamma delta epsilon"),
        ],
        "doc_id long, text string",
    )
    mh = minhash_dedup_pairs(docs, "doc_id", "text", k=8, bands=4, n=3, threshold=0.3).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in mh} == {(4, 5)}
    nj = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in nj} == {(4, 5)}
    sp = simhash_near_pairs(simhash(docs, "doc_id", "text"), max_hamming=3).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in sp} == {(4, 5)}
    exact_dup_groups(docs, "doc_id", "text").collect()  # must not raise
    # and the fingerprints behind it: 4/5 collide, NULL text -> NULL fp
    fp = {
        r["doc_id"]: r["fp"]
        for r in docs.selectExpr(
            "doc_id", "md5(trim(regexp_replace(lower(text), '\\\\s+', ' '))) AS fp"
        ).collect()
    }
    assert fp[4] == fp[5] and fp[1] is None


def test_zero_vectors_never_crash_similarity(spark):
    """A zero embedding (failed encode / padding row) must not kill
    the job under ANSI DIVIDE_BY_ZERO: its cosine is NULL (undefined),
    so it ranks below every real neighbor and never pairs."""
    from pipeline311_spark.ext.quantize import quantized_cosine_error
    from pipeline311_spark.ext.similarity import (
        brute_force_topk,
        embedding_near_dup_pairs,
        semantic_dedup_keep,
    )

    rows = [(1, [0.0, 0.0, 0.0]), (2, [1.0, 2.0, 3.0]), (3, [1.0, 2.0, 3.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(9, [1.0, 1.0, 1.0])], "vec_id long, embedding array<double>")

    top = brute_force_topk(df, q, k=2).collect()
    assert sorted(r["neighbor_id"] for r in top) == [2, 3]  # zero vector outranked

    pairs = embedding_near_dup_pairs(df, threshold=0.9, n_planes=2, dim=3).collect()
    assert sorted((r["id_a"], r["id_b"]) for r in pairs) == [(2, 3)]

    cents = spark.createDataFrame([(0, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>")
    kept = semantic_dedup_keep(df, cents, threshold=0.95).collect()
    assert {r["vec_id"] for r in kept} >= {1, 2}  # no crash; zero vec survives

    quantized_cosine_error(df, "vec_id", "embedding").collect()  # must not raise


def test_connected_components_raises_on_nonconvergence(spark):
    """r8: a component whose diameter exceeds max_iter must FAIL
    loudly, not silently return non-minimal labels (which would make
    downstream survivor sets silently diverge from the exact
    transitive closure)."""
    import pytest

    from pipeline311_spark.ext.graph import connected_components

    # a path graph 0-1-2-...-12: min-label needs ~diameter rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2).collect()
    # and with enough rounds the same graph converges to one component
    labels = connected_components(edges, max_iter=15).collect()
    assert {r["component"] for r in labels} == {0}
    assert len(labels) == 13


def test_connected_components_converging_exactly_at_max_iter(spark):
    """r8 review: convergence reached ON the last allowed round used to
    raise spuriously (a zero-change round is the only way the loop can
    OBSERVE convergence) — the verification pass must accept it."""
    import pytest

    from pipeline311_spark.ext.graph import connected_components

    # path 0-1-2: seeding gives [0,0,1]; exactly ONE round fixes node 2
    from pipeline311_spark.ext.cache import cache_scope

    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    with cache_scope():  # release the final checkpoint (storage hygiene)
        labels = {
            r["node"]: r["component"]
            for r in connected_components(edges, max_iter=1).collect()
        }
    assert labels == {0: 0, 1: 0, 2: 0}

    with pytest.raises(ValueError, match="max_iter"):
        connected_components(edges, max_iter=0)


def test_brute_force_topk_rejects_unknown_metric(spark):
    """r8 review: a typo'd metric must not silently rank by cosine."""
    import pytest

    from pipeline311_spark.ext.similarity import brute_force_topk

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="unknown metric"):
        brute_force_topk(df, df, k=1, metric="l2")
