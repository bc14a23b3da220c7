"""Query through the Python-DataSource Salesforce-style connector
(sources/salesforce_sim.py): paginated partitions + source-side filter
pushdown, end-to-end against the oracle."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipeline311_spark.plans.common import table
from pipeline311_spark.plans.registry import register
from pipeline311_spark.session import prep_session

_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CONNECTOR_SQL = """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars, MIN(doc_id) AS min_doc
FROM documents
WHERE n_chars > 200 AND lang IN ('en', 'de', 'fr')
GROUP BY lang
"""


@register("s1_connector_pushdown", _CONNECTOR_SQL, covers=("S1", "S7", "T4"))
def q_connector(spark, sf_dir):
    prep_session(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    from pipeline311_spark.sources import salesforce_sim

    try:
        salesforce_sim.register(spark)
    except Exception:
        pass  # already registered in this session
    df = (
        spark.read.format("sf_cases")
        .schema(_DOCS_SCHEMA)
        .option("path", os.path.join(sf_dir, "documents.parquet"))
        .option("pagesize", 200)
        .load()
    )
    # n_chars > 200 pushes to the source (pyarrow predicate); the IN
    # filter is returned unsupported and evaluated by Spark post-scan.
    return (
        df.filter((F.col("n_chars") > 200) & F.col("lang").isin("en", "de", "fr"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
        )
    )


# ---------------------------------------------------------------------------
# S4: live JDBC scan under the oracle gate.  Embedded Derby (on Spark's
# classpath) is the in-container stand-in for the reference's Postgres
# (sync-db2-ago.py:543-571); the supplier table is seeded through
# Spark's JDBC writer, re-read via read_jdbc with a pushed predicate +
# partitioned scan, and the aggregate is compared against DuckDB
# reading the source parquet directly.
# ---------------------------------------------------------------------------

_JDBC_SQL = """
SELECT s_nationkey, COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM supplier
WHERE s_acctbal > 0
GROUP BY s_nationkey
"""


@register("s4_jdbc_scan", _JDBC_SQL, covers=("S4",))
def q_jdbc_scan(spark, sf_dir):
    import tempfile
    import uuid

    from pipeline311_spark.plans.common import dsum
    from pipeline311_spark.sources.readers import read_jdbc

    db = os.path.join(tempfile.gettempdir(), f"p311_derby_{uuid.uuid4().hex[:12]}")
    url = f"jdbc:derby:{db};create=true"
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey", "s_acctbal")
    sup.coalesce(1).write.format("jdbc").option("url", url).option(
        "dbtable", "supplier"
    ).mode("overwrite").save()
    n_sup = 10000  # generous upper bound on s_suppkey at any test SF
    back = read_jdbc(
        spark, url, "supplier",
        partition_column="s_suppkey", lower_bound=0, upper_bound=n_sup, num_partitions=4,
    )
    return (
        back.filter(F.col("s_acctbal") > 0)  # pushed into the remote WHERE
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_suppliers"), dsum("s_acctbal").alias("total_bal"))
    )
