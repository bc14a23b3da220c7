"""Cross-session determinism gate (r8, VERDICT r7 punch #7).

Every registry query CLAIMS full determinism — portable-hash
tiebreaks, no RNG state, decimal-exact folds — but the oracle gate
only ever compares one Spark run against DuckDB.  This tool proves the
stronger property directly: the SAME query run in TWO FRESH Spark
sessions with DIFFERENT parallelism (default local[7] with 5 shuffle
partitions vs local[32] with 32) produces the identical
order-insensitive value hash.  Partitioning, task scheduling, shuffle
fan-in, and AQE coalescing all differ between the two sessions, so any
hidden dependence on row order, partition count, or aggregation order
(the classic float-sum hazard) diverges the hashes.

Each session is created, run over the full registry, and STOPPED
before the next starts (one JVM per process — sessions are recreated,
the JVM persists, which is exactly the driver's own behavior).

Usage:
    python tools/check_determinism.py [sf_dir] [query ...]

Prints one line per query and a summary; exit 1 on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_oracle import value_hash  # noqa: E402  (same canon as the gate)

SESSIONS = (
    # (master threads, shuffle partitions)
    (7, 5),
    (32, 32),
)


def run_all(sf_dir: str, only: set[str], threads: int, shuffle: int):
    from pyspark.sql import SparkSession

    from pipeline311_spark import plans

    spark = (
        SparkSession.builder.master(f"local[{threads}]")
        .appName(f"determinism_{threads}")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, tuple[str, int] | str] = {}
    for name, spec in plans.REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
            rows = [tuple(r) for r in sdf.collect()]
            out[name] = (value_hash(rows, sdf.columns), len(rows))
        except Exception:
            out[name] = "ERR: " + traceback.format_exc(limit=1).splitlines()[-1][:200]
        finally:
            spark.catalog.clearCache()
    spark.stop()
    return out


def main() -> None:
    args = list(sys.argv[1:])
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    only = set(args)

    t0 = time.time()
    (ta, sa), (tb, sb) = SESSIONS
    a = run_all(sf_dir, only, ta, sa)
    b = run_all(sf_dir, only, tb, sb)

    ok = fail = 0
    if not a:
        # a typo'd query name (or a mistyped sf_dir consumed as a query
        # filter) must not report success having checked nothing
        print(f"FAIL: no registry query matched {sorted(only) or sf_dir!r}")
        sys.stdout.flush()
        os._exit(1)
    for name in a:
        ra, rb = a[name], b.get(name)
        if isinstance(ra, str) or isinstance(rb, str):
            print(f"FAIL {name}: {ra if isinstance(ra, str) else rb}")
            fail += 1
        elif ra != rb:
            print(
                f"FAIL {name}: local[{ta}]x{sa} -> {ra[1]} rows {ra[0][:16]} | "
                f"local[{tb}]x{sb} -> {rb[1]} rows {rb[0][:16]}"
            )
            fail += 1
        else:
            ok += 1
    print(
        f"\n{ok} deterministic, {fail} divergent across "
        f"local[{ta}]/{sa}-shuffle vs local[{tb}]/{sb}-shuffle "
        f"({time.time() - t0:.0f}s)"
    )
    # hard-exit: the second stop/getOrCreate cycle can leave a
    # non-daemon py4j thread alive, hanging a plain sys.exit() forever
    # (observed r8: the summary printed, the process never exited and
    # kept competing for CPU)
    sys.stdout.flush()
    os._exit(1 if fail else 0)


if __name__ == "__main__":
    main()
