"""S4 JDBC scan against a live embedded database (round-1 VERDICT
"What's missing" #2: read_jdbc existed but nothing exercised it).

Apache Derby ships on Spark's classpath (it backs the Hive metastore),
so an embedded ``jdbc:derby:`` database is a real JDBC endpoint inside
the test JVM — the same ``read_jdbc`` code points at Postgres on a
cluster (reference ``sync-db2-ago.py:543-571``).  Seeding goes through
Spark's own JDBC writer, so the whole write→scan→pushdown loop is the
production code path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipeline311_spark.sources.readers import read_jdbc


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "s4db"
    url = f"jdbc:derby:{db};create=true"
    df = spark.range(200).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * 3).cast("double").alias("val"),
    )
    df.coalesce(1).write.format("jdbc").option("url", url).option(
        "dbtable", "t"
    ).mode("overwrite").save()
    return url


def test_jdbc_filter_pushdown_reaches_scan(spark, derby_url):
    df = read_jdbc(spark, derby_url, "t").filter(F.col("val") > 300).select("id", "val")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan JDBCRelation" in plan
    assert "PushedFilters: [" in plan and "GreaterThan(val,300.0)" in plan
    # projection pruned to the selected columns too
    assert "ReadSchema: struct<id:bigint,val:double>" in plan
    assert df.count() == 99  # ids 101..199


def test_jdbc_partitioned_scan_parallelizes(spark, derby_url):
    df = read_jdbc(
        spark, derby_url, "t",
        partition_column="id", lower_bound=0, upper_bound=200, num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 200


def test_jdbc_explicit_predicates_partition(spark, derby_url):
    # Derby folds unquoted identifiers to uppercase; Spark's JDBC writer
    # creates quoted lowercase columns, so hand-written predicates must
    # quote too.
    df = read_jdbc(
        spark, derby_url, "t",
        predicates=['"grp" < 3', '"grp" >= 3'],
    )
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 200  # predicates form a disjoint cover


def test_jdbc_roundtrip_values(spark, derby_url):
    back = read_jdbc(spark, derby_url, "t")
    agg = back.agg(
        F.count("*").alias("n"), F.sum("id").alias("s"), F.sum("val").alias("v")
    ).first()
    assert (agg["n"], agg["s"], agg["v"]) == (200, 19900, 59700.0)
