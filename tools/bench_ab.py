"""In-session A/B bench: current tree vs a git ref, interleaved.

Usage::

    python tools/bench_ab.py <gitref> [query ...]

Why this exists (VERDICT r8 item 5): this VM's wall numbers swing
1.2-2x ACROSS sessions with machine load, so a cross-round BENCH diff
cannot distinguish a code regression from a noisy window.  The only
adjudication that works is old-vs-new in ONE process, ONE JVM, runs
interleaved A/B/A/B so both variants sample the same load — exactly
the by-hand procedure every round's verdict has had to reconstruct.

Mechanics: ``git worktree add --detach`` checks the ref out next to
/tmp; the engine is pure Python, so a variant is "activated" by purging
``pipeline311_spark*`` from ``sys.modules`` and re-importing from that
tree's path — the SparkSession (one per process) is shared by both.
Per query the schedule is old,new,old,new (best-of-2 each); the report
is per-query old/new/ratio plus the same machine stamp bench.py embeds.

Defaults: one untouched TPC-H control (q05_nation_revenue) plus the
swingiest hot query (dedup_minhash_lsh); pass explicit query names to
adjudicate the round's changed set.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_QUERIES = ["q05_nation_revenue", "dedup_minhash_lsh"]


def _activate(root: str):
    """Make ``root`` the live pipeline311_spark tree and return its
    query registry.  Purges the package so lazy function-local imports
    inside plan builders also resolve against ``root``."""
    for m in [m for m in sys.modules if m.split(".")[0] == "pipeline311_spark"]:
        del sys.modules[m]
    while REPO in sys.path:
        sys.path.remove(REPO)
    if sys.path and sys.path[0] not in ("", REPO) and os.path.isdir(
        os.path.join(sys.path[0], "pipeline311_spark")
    ):
        sys.path.pop(0)  # drop a previously activated worktree path
    sys.path.insert(0, root)
    import pipeline311_spark.plans as plans  # noqa: PLC0415

    return plans.REGISTRY


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    ref = sys.argv[1]
    queries = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sha = subprocess.check_output(
        ["git", "-C", REPO, "rev-parse", "--short", ref], text=True
    ).strip()
    wt = os.path.join(tempfile.gettempdir(), f"p311_ab_{sha}")
    if not os.path.isdir(wt):
        subprocess.check_call(
            ["git", "-C", REPO, "worktree", "add", "--detach", wt, ref]
        )
    try:
        from bench import _machine_state  # noqa: PLC0415  (repo root on path)
    except ImportError:
        sys.path.insert(0, REPO)
        from bench import _machine_state  # noqa: PLC0415

    # stamp BEFORE the JVM exists: _calibrate_parallel fork()s a pool,
    # and forking a multithreaded live-py4j driver can inherit a held
    # lock and hang, losing the whole report (review r9)
    machine = _machine_state()

    from pyspark.sql import SparkSession  # noqa: PLC0415

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pipeline311_bench_ab")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    variants = {"old": wt, "new": REPO}

    def timed(root: str, name: str):
        reg = _activate(root)  # import/registry build OUTSIDE the timer
        spec = reg.get(name)
        if spec is None:
            return {"err": "not in REGISTRY"}
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            spec.fn(spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001 — isolate per query
            return {"err": f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"}
        return time.time() - t0

    # warm both variants once (JIT/codegen paths) before any timing
    for root in variants.values():
        timed(root, queries[0])

    report: dict[str, object] = {}
    for name in queries:
        best: dict[str, object] = {}
        for rep in range(2):  # interleaved: old,new,old,new
            for label, root in variants.items():
                t = timed(root, name)
                prev = best.get(label)
                if isinstance(t, dict):
                    # keep a valid earlier timing over a later transient
                    # error — the ratio is the whole point (review r9)
                    if not isinstance(prev, float):
                        best[label] = t
                    continue
                best[label] = round(
                    t if not isinstance(prev, float) else min(prev, t), 3
                )
        if isinstance(best.get("old"), float) and isinstance(best.get("new"), float):
            best["ratio_new_over_old"] = round(best["new"] / best["old"], 3)
        report[name] = best

    print(
        json.dumps(
            {
                "metric": "ab_interleaved_best_of_2",
                "old_ref": sha,
                "sf_dir": sf_dir,
                "queries": report,
                "machine": machine,
            }
        )
    )
    spark.stop()
    subprocess.check_call(
        ["git", "-C", REPO, "worktree", "remove", "--force", wt]
    )


if __name__ == "__main__":
    main()
