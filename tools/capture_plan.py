"""Capture `.explain("formatted")` for named registry queries into
plans/<round>/<query>_<tag>.txt (round from $SPARK_GRAFT_PLAN_ROUND,
default r12) — the optimization round's before/after plan evidence
(guide §1.1/§7.2).

Store-serving queries localCheckpoint before their tmp artifacts are
cleaned up, so the returned frame's plan is a LogicalRDD scan; the
capture therefore routes through plans/common._PLAN_CAPTURE exactly
like tools/gen_plan_report.py and records EVERY pre-checkpoint plan the
query materializes (labeled capture 1..N; the last is the returned
frame).  Queries that never checkpoint are explained directly.

Usage::

    python tools/capture_plan.py <tag> <query> [query ...] [--sf SF_DIR]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r12"),
)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--sf")]
    sf_dir = "/root/testdata/sf0.001"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    if len(args) < 2:
        print(__doc__)
        raise SystemExit(2)
    tag, queries = args[0], args[1:]

    from pyspark.sql import SparkSession

    from pipeline311_spark import plans
    from pipeline311_spark.plans import common

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("capture_plan")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)

    for name in queries:
        spec = plans.REGISTRY.get(name)
        if spec is None:
            print(f"SKIP {name}: not in REGISTRY")
            continue
        try:
            common._PLAN_CAPTURE = []
            df = spec.fn(spark, sf_dir)
            captured = common._PLAN_CAPTURE
        finally:
            common._PLAN_CAPTURE = None
        if not captured:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            captured = [buf.getvalue()]
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {name} — formatted physical plan(s), tag={tag}, sf_dir={sf_dir}\n"
                f"# {len(captured)} captured plan(s); the LAST is the returned frame\n"
                "# (pre-localCheckpoint where the query materializes).\n\n"
            )
            for i, p in enumerate(captured, 1):
                f.write(f"## capture {i}/{len(captured)}\n\n{p}\n")
        print(f"WROTE {path} ({len(captured)} plans)")


if __name__ == "__main__":
    main()
