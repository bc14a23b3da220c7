"""TPC-H q02/q09/q11 analogs: correlated-min selection, profit
decomposition, group-share threshold filtering."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pipeline311_spark.plans.common import dec, one, table
from pipeline311_spark.plans.registry import register

# q02-style: per part, the supplier row(s) achieving the minimum
# "supply cost" (derived deterministically from keys).
_Q02_SQL = """
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey)
SELECT l_partkey, l_suppkey, unit_cost
FROM (
  SELECT *, RANK() OVER (PARTITION BY l_partkey ORDER BY unit_cost, l_suppkey) AS rnk
  FROM supply) t
WHERE rnk = 1 AND l_partkey <= 200
"""


@register("q02_min_cost_supplier", _Q02_SQL, covers=("J-class", "O5", "A-class"))
def q02(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    # raw double division: IEEE-deterministic per row, min() order-free —
    # decimal division would round at engine-specific result scales
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    return (
        supply.withColumn("rnk", F.rank().over(w))
        .filter((F.col("rnk") == 1) & (F.col("l_partkey") <= 200))
        .select("l_partkey", "l_suppkey", "unit_cost")
    )


# q09-style: profit (revenue minus a keyed cost proxy) by supplier
# nation and order year.
_Q09_SQL = """
SELECT n_name, strftime(o_orderdate, '%Y') AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                - CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS profit
FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, strftime(o_orderdate, '%Y')
"""


@register("q09_profit_by_nation_year", _Q09_SQL, covers=("J-class", "A-class"))
def q09(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    profit = F.sum(
        dec("l_extendedprice") * (one() - dec("l_discount"))
        - dec("l_quantity") * dec("l_tax")
    ).cast("double")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", F.date_format("o_orderdate", "yyyy").alias("o_year"))
        .agg(profit.alias("profit"))
    )


# q11-style: part groups whose share of total stock value exceeds a
# threshold (HAVING vs a global scalar).
_Q11_SQL = """
WITH v AS (
  SELECT p_brand, CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)) * p_size) AS DOUBLE) AS val
  FROM part GROUP BY p_brand),
t AS (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)) * p_size) AS DOUBLE) AS total FROM part)
SELECT p_brand, val, val / (SELECT total FROM t) AS share
FROM v WHERE val > 0.02 * (SELECT total FROM t)
"""


@register("q11_value_share", _Q11_SQL, covers=("A-class", "F5"))
def q11(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    stock_val = F.sum(dec("p_retailprice") * F.col("p_size")).cast("double")
    # empty input → SUM is NULL; 0.0 keeps the scalar predicate sane
    total = p.agg(stock_val.alias("t")).first()["t"] or 0.0
    v = p.groupBy("p_brand").agg(stock_val.alias("val"))
    return v.filter(F.col("val") > 0.02 * total).select(
        "p_brand", "val", (F.col("val") / F.lit(total)).alias("share")
    )
