"""Local replica of the driver's correctness gate.

Runs every registry query on Spark AND its DuckDB oracle on the same
parquet, then compares row count, column names, and an
order-insensitive value hash (rows sorted, columns sorted by name).

Usage:
    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return repr(int(v))  # unify 3.0 across engines
        return repr(v)
    if isinstance(v, bool):
        return "1" if v else "0"
    return str(v)


def value_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    only = set(args)

    from pyspark.sql import SparkSession
    from pipeline311_spark import plans

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', 8)}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    ok = fail = 0
    for name, spec in plans.REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            fail += 1
            continue
        if spec.oracle is None:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            ok += 1
            continue
        try:
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            hs, ho = value_hash(srows, scols), value_hash(orows, ocols)
            if hs != ho:
                problems.append("value-hash mismatch")
                idx_s = sorted(range(len(scols)), key=lambda i: scols[i])
                idx_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                set_s = sorted("|".join(canon(r[i]) for i in idx_s) for r in srows)
                set_o = sorted("|".join(canon(r[i]) for i in idx_o) for r in orows)
                for a, b in zip(set_s, set_o):
                    if a != b:
                        problems.append(f"  first diff:\n  spark : {a[:300]}\n  oracle: {b[:300]}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:3]))
            fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    spark.stop()
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
