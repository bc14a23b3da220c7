"""Engine-vs-oracle parity on a HOSTILE documents corpus.

The driver's testdata contains no NULL / empty / whitespace-only
texts, so a tokenizer-convention divergence between the Spark plan and
its DuckDB twin (e.g. DuckDB's ``string_split('') = ['']`` vs the
engine's ``tokens('') = []``) stays latent under the normal gates.
This harness manufactures exactly that corpus and runs every
documents-only registry query on BOTH engines, comparing with the
driver's own canonicalization (imported from check_oracle).

Queries whose oracle references any other table are skipped (the
hostile dir only ships documents.parquet); Spark-side skips are
reported distinctly from mismatches.

Usage: python tools/check_hostile_docs.py [query ...]
"""

from __future__ import annotations

import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from tools.check_oracle import TABLES, audit_schema, canon as _canon, value_hash as _vh  # noqa: E402


def canon(v):
    """Driver canon PLUS int-valued-float unification: a NULL anywhere
    in an integer column makes pandas float64 the whole column on the
    oracle side ('5.0' vs '5') — a RENDERING artifact of the hostile
    NULLs, not a semantic divergence.  The driver-strict rendering is
    still enforced by check_oracle on the real (NULL-free) testdata."""
    if isinstance(v, float) and not (v != v) and v.is_integer():
        return str(int(v))
    return _canon(v)


def value_hash(rows, columns):
    import hashlib

    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()

HOSTILE_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (0, None, "en", "web", None),
    (1, "", "en", "web", 0),
    (2, "   ", "en", "web", 3),
    (3, "\t\n ", "de", "web", 3),
    (4, "the quick brown fox jumps over the lazy dog", "en", "web", 44),
    (5, "the quick brown fox jumps over the lazy dog", "en", "books", 44),
    (6, "one", "en", "books", 3),
    (7, "der die das und ist der die das", "de", "books", 31),
    (8, "a a a a a a a a", "en", "web", 15),
    (9, "  padded   whitespace   everywhere  ", "en", "books", 36),
    (10, "unicode café naïve résumé tokens", "fr", "web", 32),
    (11, "the and of to a the and of to a", "en", "books", 31),
]


def main() -> None:
    only = set(sys.argv[1:])

    from pyspark.sql import SparkSession

    from pipeline311_spark import plans

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="hostile_docs_")
    spark.createDataFrame(
        HOSTILE_DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(tmp, "documents.parquet"))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp}/documents.parquet/*.parquet')"
    )

    other = [t for t in TABLES if t != "documents"]
    ok = fail = skip = 0
    failures = []
    for name, spec in sorted(plans.REGISTRY.items()):
        if only and name not in only:
            continue
        if spec.oracle is None:
            continue
        if any(re.search(rf"\b{t}\b", spec.oracle) for t in other):
            skip += 1
            continue
        try:
            sdf = spec.fn(spark, tmp)
            if audit_schema(sdf):
                raise RuntimeError("canon-hazard columns")
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            msg = str(e)
            if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
                skip += 1  # engine side reads a table the hostile dir lacks
                continue
            fail += 1
            failures.append(f"{name}: spark error: {msg[:200]}")
            continue
        try:
            odf = con.execute(spec.oracle).fetchdf()
            ocols = list(odf.columns)
            orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
        except Exception as e:
            fail += 1
            failures.append(f"{name}: duckdb error: {str(e)[:200]}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append("column mismatch")
        if not problems and value_hash(srows, scols) != value_hash(orows, ocols):
            idx_s = sorted(range(len(scols)), key=lambda i: scols[i])
            idx_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
            set_s = sorted("|".join(canon(r[i]) for i in idx_s) for r in srows)
            set_o = sorted("|".join(canon(r[i]) for i in idx_o) for r in orows)
            diff = next((f"spark={a[:120]} oracle={b[:120]}" for a, b in zip(set_s, set_o) if a != b), "")
            problems.append(f"value-hash mismatch {diff}")
        if problems:
            fail += 1
            failures.append(f"{name}: " + "; ".join(problems))
        else:
            ok += 1
    for f in failures:
        print("FAIL", f)
    print(f"{ok} ok, {fail} fail, {skip} skipped (non-documents tables)")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
