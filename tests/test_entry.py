"""Contract tests for __spark_entry__ and the query registry."""

from __future__ import annotations

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = load_entry()
    df = mod.entry(spark)
    assert df.count() > 0
    assert "revenue" in df.columns


def test_registry_contract(spark):
    mod = load_entry()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 40
    # every oracle key has a query
    assert set(oracles) <= set(qs)
    # oracle coverage: only explicitly non-SQL ops may omit the oracle
    missing = set(qs) - set(oracles)
    assert missing <= {"multimodal_image_features"}


@pytest.mark.parametrize("name", ["q01_pricing_summary", "k3_upsert_merge", "dedup_exact_groups"])
def test_sample_queries_run(spark, sf_dir, name):
    mod = load_entry()
    df = mod.queries()[name](spark, sf_dir)
    assert df.count() > 0
