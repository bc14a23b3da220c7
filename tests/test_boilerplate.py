"""Boilerplate line removal (ext.textstats.remove_boilerplate_lines):
the driver testdata never fires the drop arm (no two docs share a
normalized line), so — like the cross-cap tests — this proves the
semantics AND the DuckDB oracle twin on a corpus where boilerplate
actually exists."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipeline311_spark.ext.textstats import remove_boilerplate_lines

DOCS = [
    # shared header/footer in 3 docs -> boilerplate at max_df=2
    (0, "SITE NAVIGATION MENU\nunique article zero body text\nCopyright Footer 2024"),
    (1, "site navigation menu\nsecond article with its own words\ncopyright footer 2024"),
    (2, "  Site Navigation Menu  \nthird doc content differs here\nCOPYRIGHT FOOTER 2024"),
    # short separator lines (< min_chars) are never dropped
    (3, "---\nfourth doc standalone content\n---"),
    (4, "---\nfifth doc standalone content\n---"),
    (5, "---\nsixth doc standalone content\n---"),
    # doc that is ALL boilerplate -> survives with empty text
    (6, "Site Navigation Menu\nCopyright Footer 2024"),
    (7, ""),  # empty text: one empty line, kept
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_boilerplate_lines_dropped_case_and_trim_insensitive(docs):
    out = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean_text"])
        for r in remove_boilerplate_lines(docs, "doc_id", "text", max_df=2, min_chars=5).collect()
    }
    # header+footer dropped everywhere (normalized identity: lower+trim)
    assert out[0] == (3, 1, "unique article zero body text")
    assert out[1] == (3, 1, "second article with its own words")
    assert out[2] == (3, 1, "third doc content differs here")
    # short '---' separators survive despite df=3 > max_df
    assert out[3] == (3, 3, "---\nfourth doc standalone content\n---")
    # all-boilerplate doc survives as empty text, not a missing row
    assert out[6] == (2, 0, "")
    # empty text: single empty line, kept (min_chars gate)
    assert out[7] == (1, 1, "")


def test_boilerplate_oracle_twin_on_firing_corpus(spark):
    """Engine == DuckDB twin on a corpus where the drop arm FIRES —
    parity on the clean testdata proves nothing about that branch."""
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    from pipeline311_spark.plans.extensions import _BOILERPLATE_SQL

    eng = remove_boilerplate_lines(
        spark.createDataFrame(DOCS, "doc_id long, text string"),
        "doc_id", "text", max_df=1, min_chars=5,
    ).select("doc_id", "n_lines", "n_kept", F.md5("clean_text").alias("clean_md5"))
    eng_rows = sorted(tuple(r) for r in eng.collect())

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    ora_rows = sorted(tuple(r) for r in con.execute(_BOILERPLATE_SQL).fetchall())
    assert eng_rows == ora_rows and len(eng_rows) == len(DOCS)
