"""TPC-H q13/q15/q16/q20/q21 analogs — completes the classic-shape
sweep (distribution-of-counts, rank-with-ties top entity, filtered
distinct counts, nested semi-joins, multi-EXISTS anti-join)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pipeline311_spark.plans.common import dec, one, revenue_expr, REVENUE_SQL, table
from pipeline311_spark.plans.registry import register

# q13: distribution of orders-per-customer INCLUDING zero-order
# customers (left join + count + group-by-count)
_Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY c_count
"""


@register("q13_order_count_distribution", _Q13_SQL, covers=("J-class", "A-class"))
def q13(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# q15: top supplier(s) by quarterly revenue — rank so exact ties all
# surface (the TPC-H view+max formulation, done with a window)
_Q15_SQL = f"""
WITH srev AS (
  SELECT l_suppkey, {REVENUE_SQL} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM srev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM srev)
"""


@register("q15_top_supplier", _Q15_SQL, covers=("A-class", "F5", "J-class"))
def q15(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = table(spark, sf_dir, "supplier")
    srev = li.groupBy("l_suppkey").agg(revenue_expr().alias("total_revenue"))
    top = srev.withColumn(
        "r", F.rank().over(Window.orderBy(F.col("total_revenue").desc()))
    ).filter("r = 1")
    return top.join(F.broadcast(s), top.l_suppkey == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


# q16: distinct supplier counts per (brand, type, size) excluding a
# supplier denylist (NOT IN subquery)
_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand != 'Brand#13' AND p_size IN (9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@register("q16_supplier_counts", _Q16_SQL, covers=("J3", "A6", "F1"))
def q16(spark, sf_dir):
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(9, 14, 19, 23, 36, 45)
    )
    li = table(spark, sf_dir, "lineitem")
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    ok = li.join(F.broadcast(bad), "l_suppkey", "left_anti")
    return (
        ok.join(F.broadcast(p), ok.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# q20: suppliers with excess stock of PROMO parts (nested semi-joins +
# correlated half-quantity threshold)
_Q20_SQL = """
WITH promo_parts AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
supplied AS (
  SELECT l_suppkey, l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM promo_parts)
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey)
SELECT DISTINCT s_suppkey, s_name
FROM supplier JOIN supplied ON l_suppkey = s_suppkey
WHERE qty > 50
"""


@register("q20_excess_promo_suppliers", _Q20_SQL, covers=("J4", "F2", "A-class"))
def q20(spark, sf_dir):
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    s = table(spark, sf_dir, "supplier")
    supplied = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("qty"))
        .filter(F.col("qty") > 50)
    )
    return (
        s.join(supplied, s.s_suppkey == supplied.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .distinct()
    )


# q21: suppliers whose lineitems were the ONLY late ones in a
# multi-supplier order (EXISTS other supplier + NOT EXISTS other late
# supplier) — adapted to shipdate vs orderdate lateness
_Q21_SQL = """
WITH li2 AS (
  SELECT l_orderkey, l_suppkey, l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN li2 l1 ON l1.l_suppkey = s_suppkey AND l1.late
WHERE EXISTS (SELECT 1 FROM li2 l2 WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey != l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM li2 l3 WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey != l1.l_suppkey AND l3.late)
GROUP BY s_name
"""


@register("q21_lone_late_suppliers", _Q21_SQL, covers=("J3", "J4", "A-class"))
def q21(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    li2 = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.date_add("o_orderdate", 60)).alias("late"),
    )
    # per (order, supplier): any-late flag; then per order: supplier
    # count + late-supplier count — the EXISTS pair becomes two counts
    per_os = li2.groupBy("l_orderkey", "l_suppkey").agg(F.max("late").alias("late"))
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(F.col("late").cast("int")).alias("n_late_supp"),
    )
    lone_late = (
        li2.filter("late")
        .join(per_o, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        lone_late.join(F.broadcast(s), lone_late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
