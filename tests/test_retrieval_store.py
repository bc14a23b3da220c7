"""Stored BM25 index + N-ranker RRF (ext/retrieval.py,
plans/retrieval2.py) — the properties the oracle twins can't see:
incremental-merge ≡ fresh-build on the ARTIFACTS themselves (the
oracle only compares final top-k), fixed-order fusion math, and
temp-store hygiene."""

from __future__ import annotations

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from pipeline311_spark.ext.retrieval import (
    bm25_index_update,
    bm25_topk,
    build_bm25_index,
    rrf_fuse,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_update_equals_fresh_build(spark):
    """The index triple after merging a disjoint batch is row-identical
    to a fresh build over the union — the contract that makes the
    stored index maintainable without corpus re-tokenization."""
    base = _docs(
        spark,
        [(1, "spark merge join"), (2, "merge merge vector"), (3, None), (4, "")],
    )
    batch = _docs(spark, [(10, "spark spark customer"), (11, "join")])
    merged = bm25_index_update(build_bm25_index(base), batch)
    fresh = build_bm25_index(base.unionByName(batch))

    for got, want in zip(merged, fresh):
        g = sorted(map(tuple, got.collect()))
        w = sorted(map(tuple, want.collect()))
        assert g == w

    # the ''-text doc carries dl=0 into corpus stats but produces no
    # postings; the NULL doc is absent everywhere
    stats = dict(zip(("n_docs", "sum_dl"), merged.corpus_stats.collect()[0]))
    assert stats == {"n_docs": 5, "sum_dl": 10}


def test_bm25_topk_from_index_matches_query_local_path(spark):
    """Serving from the index reproduces the query-local plan's result
    exactly (same scoring kernel, same ints in → same doubles out)."""
    from pipeline311_spark.plans.curation3 import (
        _BM25_QUERIES,
        _BM25_TOPK,
        bm25_scored_frame,
    )

    index = build_bm25_index(
        spark.read.parquet(f"{SF}/documents.parquet").filter(
            F.col("text").isNotNull()
        )
    )
    q = spark.createDataFrame(list(_BM25_QUERIES), "query_id long, term string")
    got = sorted(map(tuple, bm25_topk(index, q, k=_BM25_TOPK).collect()))
    want = sorted(map(tuple, bm25_scored_frame(spark, SF).collect()))
    assert got == want


def test_rrf_fuse_three_rankers_closed_form(spark):
    """Three rankers, overlapping and disjoint docs: rrf equals the
    closed form 1/(C+r) summed over present rankers, absent ranks
    render 0, and provenance columns follow ranker order."""
    lex = spark.createDataFrame(
        [(0, 100, 1), (0, 101, 2)], "query_id long, doc_id long, rank long"
    )
    dense = spark.createDataFrame(
        [(0, 100, 1), (0, 102, 2)], "query_id long, doc_id long, rank long"
    )
    rec = spark.createDataFrame(
        [(0, 102, 1)], "query_id long, doc_id long, rank long"
    )
    out = rrf_fuse([("lex", lex), ("dense", dense), ("rec", rec)], k=10, c=60)
    assert out.columns == [
        "query_id", "rank", "doc_id", "rrf", "lex_rank", "dense_rank", "rec_rank",
    ]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[100]["rrf"] == 1.0 / 61 + 1.0 / 61
    assert rows[101]["rrf"] == 1.0 / 62
    assert rows[102]["rrf"] == 1.0 / 62 + 1.0 / 61
    assert (rows[101]["lex_rank"], rows[101]["dense_rank"], rows[101]["rec_rank"]) == (2, 0, 0)
    # doc 102 (two rankers) outranks doc 101 (one ranker, same best rank)
    assert rows[102]["rank"] < rows[101]["rank"]


def test_rrf_fuse_rejects_duplicate_ranker_names(spark):
    f = spark.createDataFrame([(0, 1, 1)], "query_id long, doc_id long, rank long")
    with pytest.raises(ValueError, match="duplicate ranker names"):
        rrf_fuse([("a", f), ("a", f)])


def test_store_queries_do_not_leak_tmp_dirs(spark):
    """Same hygiene contract as the stored-gram queries (r7): each run
    mints a uuid dir, checkpoints eagerly, and rmtree's in a finally."""
    from pipeline311_spark.plans import REGISTRY

    pat = os.path.join(tempfile.gettempdir(), "p311_bm25*")
    before = set(glob.glob(pat))
    for name in (
        "text_bm25_from_store",
        "text_bm25_incr_store",
        "retrieval_rrf_recency",
        "text_bm25_partitioned_store",
        "stream_bm25_index_maintain",
        "stream_bm25_compacted",
    ):
        rows = REGISTRY[name].fn(spark, SF).collect()
        assert rows, name
    after = set(glob.glob(pat))
    assert after == before, f"leaked temp dirs: {sorted(after - before)}"


def test_bm25_partitioned_postings_prune_vocabulary_reads(spark, tmp_path):
    """The retrieval scale layout: postings written partitionBy(term
    bucket) must give partition-PRUNED vocabulary reads — the driver-
    computed bucket isin lands in the scan's PartitionFilters, never a
    post-scan data filter.  Also pins the driver-side bucket twin to
    the Column-side hash (same md5 path)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from pipeline311_spark.ext.retrieval import build_bm25_postings
    from pipeline311_spark.plans.retrieval2 import (
        _term_bucket_col,
        _term_bucket_py,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    postings = build_bm25_postings(d).withColumn("tb", _term_bucket_col())

    # driver twin == Column twin on the real vocabulary
    got = {r["term"]: r["tb"] for r in postings.select("term", "tb").distinct().collect()}
    assert got and all(_term_bucket_py(t) == b for t, b in got.items())

    out = str(tmp_path / "postings")
    postings.write.mode("overwrite").partitionBy("tb").parquet(out)
    back = spark.read.schema(postings.schema).parquet(out)
    probe = back.filter(F.col("tb").isin(sorted(set(got.values()))[:2]))
    buf = io.StringIO()
    with redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    # IN-list predicates carry no isnotnull prefix, unlike equality
    assert "PartitionFilters: [tb" in plan and " IN (t" in plan
    assert "Filter (" not in plan


def test_bm25_batch_append_is_idempotent_under_replay(spark, tmp_path):
    """Crash-recovery delivers a micro-batch at least once; the
    batch_id-partitioned dynamic overwrite must make the second
    delivery a no-op (same index, not doubled counts)."""
    from pipeline311_spark.ext.retrieval import (
        bm25_index_append_batch,
        load_bm25_index,
    )

    idx = str(tmp_path / "idx")
    b0 = _docs(spark, [(1, "spark merge"), (2, "merge")])
    b1 = _docs(spark, [(10, "spark spark")])
    bm25_index_append_batch(b0, 0, idx)
    bm25_index_append_batch(b1, 1, idx)

    def snapshot():
        ix = load_bm25_index(spark, idx)
        return (
            sorted(map(tuple, ix.postings.collect())),
            sorted(map(tuple, ix.term_stats.collect())),
            ix.corpus_stats.collect()[0].asDict(),
        )

    before = snapshot()
    bm25_index_append_batch(b1, 1, idx)  # replay
    assert snapshot() == before
    assert before[2] == {"n_docs": 3, "sum_dl": 5}


def test_rrf_fuse_rejects_empty_rankings(spark):
    with pytest.raises(ValueError, match="at least one ranking"):
        rrf_fuse([])


def test_bm25_stream_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """Operational property of the streaming index maintenance: a
    restarted availableNow stream resumes from its checkpoint — files
    already folded into the index are NOT reprocessed, new files are,
    and the final index equals a fresh one-shot build."""
    from pipeline311_spark.ext.retrieval import (
        bm25_index_append_batch,
        build_bm25_index,
        load_bm25_index,
    )

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    a = _docs(spark, [(1, "spark merge"), (2, "merge vector")])
    b = _docs(spark, [(10, "spark customer"), (11, "join join")])

    def run_stream():
        stream = spark.readStream.schema(a.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            stream.writeStream.foreachBatch(
                lambda batch, bid: bm25_index_append_batch(batch, bid, idx)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    a.coalesce(1).write.mode("append").parquet(src)
    run_stream()
    first = load_bm25_index(spark, idx).corpus_stats.collect()[0]
    assert first["n_docs"] == 2

    b.coalesce(1).write.mode("append").parquet(src)
    run_stream()  # restart: same checkpoint, only the new file folds in

    ix = load_bm25_index(spark, idx)
    fresh = build_bm25_index(a.unionByName(b))
    assert sorted(map(tuple, ix.postings.collect())) == sorted(
        map(tuple, fresh.postings.collect())
    )
    assert sorted(map(tuple, ix.term_stats.collect())) == sorted(
        map(tuple, fresh.term_stats.collect())
    )
    assert ix.corpus_stats.collect() == fresh.corpus_stats.collect()
    # batch ids advanced (1 per restart batch) — nothing was replayed
    bids = {
        r["batch_id"]
        for r in spark.read.parquet(os.path.join(idx, "corpus_stats")).collect()
    }
    assert len(bids) == 2


def test_bm25_index_compact_preserves_serve_and_survives_new_batches(spark, tmp_path):
    """Compaction folds the delta log into a batch_id=-1 base without
    changing what the index serves; a post-compaction stream restarting
    at batch 0 appends WITHOUT clobbering the base (real ids >= 0);
    and a crashed swap window fails loudly then recovers."""
    from pipeline311_spark.ext.retrieval import (
        bm25_index_append_batch,
        bm25_index_compact,
        build_bm25_index,
        load_bm25_index,
    )

    idx = str(tmp_path / "idx")
    a = _docs(spark, [(1, "spark merge"), (2, "merge vector")])
    b = _docs(spark, [(10, "spark customer")])
    c = _docs(spark, [(20, "join join vector")])

    bm25_index_append_batch(a, 0, idx)
    bm25_index_append_batch(b, 1, idx)

    def snap():
        ix = load_bm25_index(spark, idx)
        return (
            sorted(map(tuple, ix.postings.collect())),
            sorted(map(tuple, ix.term_stats.collect())),
            ix.corpus_stats.collect()[0].asDict(),
        )

    before = snap()
    bm25_index_compact(spark, idx)
    assert snap() == before
    # the log physically folded to the single base partition
    bids = {
        r["batch_id"]
        for r in spark.read.parquet(os.path.join(idx, "postings")).collect()
    }
    assert bids == {-1}

    # a fresh-checkpoint stream restarts numbering at 0 — must append,
    # never overwrite the base
    bm25_index_append_batch(c, 0, idx)
    fresh = build_bm25_index(a.unionByName(b).unionByName(c))
    ix = load_bm25_index(spark, idx)
    assert sorted(map(tuple, ix.postings.collect())) == sorted(
        map(tuple, fresh.postings.collect())
    )
    assert ix.corpus_stats.collect() == fresh.corpus_stats.collect()

    # crashed-swap window: live dir renamed away, .old holds the data
    p = os.path.join(idx, "term_stats")
    os.rename(p, p + ".compact.old")
    with pytest.raises(RuntimeError, match="mid-compaction-swap"):
        load_bm25_index(spark, idx).term_stats.collect()
    bm25_index_compact(spark, idx)  # recovers, then re-folds
    assert sorted(map(tuple, load_bm25_index(spark, idx).term_stats.collect())) == sorted(
        map(tuple, fresh.term_stats.collect())
    )


def test_compact_crash_between_renames_recovers_end_to_end(spark, tmp_path, monkeypatch):
    """KILL the swap between its two renames (the live dir is gone, the
    only copy sits in .compact.old): serving must refuse loudly, and a
    re-run of bm25_index_compact must recover to exactly the index a
    never-crashed compaction produces (VERDICT r8 item 3 — the seam
    test the guard at ext/retrieval.py lacked)."""
    import pipeline311_spark.ext.retrieval as retrieval_mod
    from pipeline311_spark.ext.retrieval import (
        bm25_index_append_batch,
        bm25_index_compact,
        load_bm25_index,
    )

    def build(idx):
        bm25_index_append_batch(_docs(spark, [(1, "spark merge"), (2, "merge")]), 0, idx)
        bm25_index_append_batch(_docs(spark, [(10, "spark spark join")]), 1, idx)

    # control twin: same log, compacted without any crash
    control = str(tmp_path / "control")
    build(control)
    bm25_index_compact(spark, control)

    idx = str(tmp_path / "idx")
    build(idx)

    real_rename = os.rename

    def dying_rename(src, dst):
        # swap order per artifact: (live -> .old) then (staging ->
        # live); die entering the SECOND rename of the POSTINGS
        # artifact specifically — the three artifact swaps run
        # concurrently from driver threads since round 11, so a global
        # rename call count no longer lands in a deterministic window,
        # but the per-artifact two-rename sequence is unchanged
        if dst.endswith(os.sep + "postings"):
            raise RuntimeError("injected crash between the two renames")
        real_rename(src, dst)

    monkeypatch.setattr(retrieval_mod.os, "rename", dying_rename)
    with pytest.raises(RuntimeError, match="injected crash"):
        bm25_index_compact(spark, idx)
    monkeypatch.setattr(retrieval_mod.os, "rename", real_rename)

    # the crash window: the postings artifact mid-swap (the concurrent
    # term_stats/corpus_stats swaps ran to completion — run_jobs
    # finishes every thunk before re-raising)
    assert os.path.isdir(os.path.join(idx, "postings.compact.old"))
    assert not os.path.isdir(os.path.join(idx, "postings"))
    with pytest.raises(RuntimeError, match="mid-compaction-swap"):
        load_bm25_index(spark, idx).postings.collect()

    bm25_index_compact(spark, idx)  # the documented recovery re-invoke

    got = load_bm25_index(spark, idx)
    want = load_bm25_index(spark, control)
    for g, w in zip(got, want):
        assert sorted(map(tuple, g.collect())) == sorted(map(tuple, w.collect()))
    assert not glob.glob(os.path.join(idx, "*.compact.*"))


def test_compact_stale_old_dir_does_not_wedge_next_compaction(spark, tmp_path):
    """The OTHER crash window (ADVICE r8): a crash AFTER the
    staging->live rename but BEFORE the .old cleanup leaves a stale
    non-empty .compact.old next to a healthy live dir.  The next
    compaction used to raise OSError renaming onto it — it must instead
    drop the stale dir (live is authoritative) and complete."""
    from pipeline311_spark.ext.retrieval import (
        bm25_index_append_batch,
        bm25_index_compact,
        build_bm25_index,
        load_bm25_index,
    )

    idx = str(tmp_path / "idx")
    a = _docs(spark, [(1, "spark merge"), (2, "merge")])
    b = _docs(spark, [(10, "spark spark join")])
    bm25_index_append_batch(a, 0, idx)
    bm25_index_compact(spark, idx)

    # simulate the crash leftovers: live postings intact, stale .old
    stale = os.path.join(idx, "postings.compact.old")
    os.makedirs(stale)
    with open(os.path.join(stale, "leftover.parquet"), "w") as f:
        f.write("stale")

    bm25_index_append_batch(b, 1, idx)
    bm25_index_compact(spark, idx)  # must not raise

    fresh = build_bm25_index(a.unionByName(b))
    got = load_bm25_index(spark, idx)
    assert sorted(map(tuple, got.postings.collect())) == sorted(
        map(tuple, fresh.postings.collect())
    )
    assert got.corpus_stats.collect() == fresh.corpus_stats.collect()
    assert not glob.glob(os.path.join(idx, "*.compact.*"))


def test_bm25_index_update_validate_disjoint_guard(spark):
    """The merge-by-addition math silently corrupts on an overlapping
    batch; the opt-in probe must catch it (ADVICE r8)."""
    from pipeline311_spark.ext.retrieval import build_bm25_index

    base = _docs(spark, [(1, "spark merge"), (2, "merge join")])
    index = build_bm25_index(base)

    ok = bm25_index_update(index, _docs(spark, [(10, "join")]), validate_disjoint=True)
    assert ok.corpus_stats.collect()[0]["n_docs"] == 3

    with pytest.raises(ValueError, match="already indexed"):
        bm25_index_update(
            index, _docs(spark, [(2, "different text")]), validate_disjoint=True
        )


def test_rrf_fuse_duplicate_pairs_contribute_best_rank(spark):
    """A ranker frame carrying a duplicated (query_id, doc_id) pair
    must contribute the pair's BEST rank to the pivot, not silently its
    worst (ADVICE r8: the F.max pivot kept rank 9 over rank 1)."""
    lex = spark.createDataFrame(
        [(0, 100, 9), (0, 100, 1), (0, 200, 2)],
        "query_id long, doc_id long, rank long",
    )
    out = {
        r["doc_id"]: (r["lex_rank"], r["rrf"])
        for r in rrf_fuse([("lex", lex)], k=10, c=60).collect()
    }
    assert out[100][0] == 1 and out[100][1] == 1.0 / 61
    assert out[200][0] == 2 and out[200][1] == 1.0 / 62


def test_hybrid_rrf_serve_plan_reads_store_not_corpus_text(spark, tmp_path):
    """retrieval_hybrid_rrf must SERVE both rankers from stored
    artifacts (VERDICT r8 item 3 lexical, r9 item 3 dense): the fused
    frame's plan reads the postings/corpus-stats parquet artifacts and
    the pcell-pruned ANN codes — the documents table, its tokenize
    subtree, and any raw-embedding scan must be absent."""
    import io
    from contextlib import redirect_stdout

    from pipeline311_spark.plans.curation3 import hybrid_rrf_frame

    fused = hybrid_rrf_frame(spark, SF, str(tmp_path / "store"))
    buf = io.StringIO()
    with redirect_stdout(buf):
        fused.explain("extended")
    plan = buf.getvalue()
    # store artifacts by schema signature (location strings are
    # truncated under the default maxMetadataStringLength): the
    # postings relation (term, doc_id, tf, dl), the one-row
    # corpus-stats relation (n_docs, sum_dl), and the ANN codes
    # relation (vec_id, code0..)
    assert "Relation [term#" in plan and "Relation [n_docs#" in plan
    assert "code0#" in plan
    assert "documents.parquet" not in plan and "Relation [doc_id#" not in plan
    # the tokenize subtree's signature projections
    assert "regexp_replace" not in plan and "split(" not in plan
    # the dense serve reads M small ints per vector, never the floats
    assert "embedding#" not in plan
    assert fused.count() > 0
