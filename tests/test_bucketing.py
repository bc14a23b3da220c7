"""Bucketed co-located joins: same results, zero shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipeline311_spark.operators.bucketing import (
    bucketed_tables_join,
    exchange_count,
    write_bucketed,
)
from pipeline311_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    write_bucketed(li, "li_b", ["l_orderkey"], 4, path=str(root / "li"))
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_b", ["l_orderkey"], 4,
        path=str(root / "o"),
    )
    yield "li_b", "o_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_bucketed_join_is_shuffle_free(spark, bucketed):
    left, right = bucketed
    # Force the non-broadcast path so the assertion is about bucketing,
    # not about the dim being small enough to broadcast.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_tables_join(spark, left, right, ["l_orderkey"])
        assert exchange_count(joined) == 0
        # A groupBy on the bucket key on top of the join still needs no
        # Exchange: output partitioning is preserved through the join.
        agg = joined.groupBy("l_orderkey").agg(F.count("*").alias("n"))
        assert exchange_count(agg) == 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    left, right = bucketed
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(o, "l_orderkey").groupBy().agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    )
    buck = bucketed_tables_join(spark, left, right, ["l_orderkey"]).groupBy().agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    )
    assert plain.collect() == buck.collect()
