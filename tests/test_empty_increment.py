"""Every registry query must tolerate EMPTY tables — the empty
incremental batch is the single most common edge in a watermark-driven
pipeline (reference: a sync window with no modified rows), and a crash
here means the nightly job dies on a quiet day.

Caught and fixed by this audit: scalar-subquery None arithmetic
(q11), glob/parquet read-back of sinks that flushed zero batches
(k5, t5_t6, stream_merge, connector sync), and schema inference over
partitioned writes that produced no partition dirs (k3_merge_
partitioned, sim_lsh_partitioned_probe, merge_incremental_partitioned).
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from pipeline311_spark.plans import REGISTRY
from pipeline311_spark.sources.readers import TESTDATA_TABLES


@pytest.fixture(scope="session")
def empty_sf_dir(spark, tmp_path_factory):
    """All testdata tables with their real schemas and ZERO rows, in the
    driver's single-file-per-table layout."""
    src = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TESTDATA_TABLES:
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        tmp = os.path.join(out, f"_tmp_{t}")
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(out, f"{t}.parquet"))
        shutil.rmtree(tmp)
    return out


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    from tests.conftest import sweep_map

    def probe(name):
        try:
            REGISTRY[name].fn(spark, empty_sf_dir).count()
            return None
        except Exception as e:  # noqa: BLE001 — collecting the full list
            first = (str(e).splitlines() or [""])[0][:120]
            return f"{name}: {type(e).__name__}: {first}"

    # overlapped sweep (round 12, guide §2.6) — same full failure list
    fails = [f for f in sweep_map(probe, sorted(REGISTRY)) if f]
    assert not fails, "queries crashing on empty input:\n" + "\n".join(fails)
