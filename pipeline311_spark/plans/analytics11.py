"""q07 volume-shipping analog (completes the TPC-H 1-22 sweep) plus
three pipeline shapes: event funnel, NTILE decile profiling, and a
k-means assignment step over the embeddings table.

Scale notes (100 TB):
* q07 — the two nation joins are broadcasts; lineitem->orders->customer
  is the only shuffle chain and all three shuffle on their join keys.
* funnel — three hash aggregates on user_id; each stage reuses the
  previous stage's (already user_id-partitioned) output, so AQE can
  avoid re-shuffling the probe side.
* deciles — global NTILE is a single-partition window; fine for a
  correctness query, but at 100 TB use approxQuantile cutpoints and a
  range-join instead (documented in SCALE.md).
* k-means assign — centroids are tiny (k rows) and broadcast; the
  cross join is a BroadcastNestedLoopJoin over k*N rows with the fold
  computed in-line, no shuffle until the final k-row count.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pipeline311_spark.ext.similarity import as_double
from pipeline311_spark.plans.common import emb_table, REVENUE_SQL, dsum_sql, revenue_expr, table
from pipeline311_spark.plans.extensions import _wtrim_sql
from pipeline311_spark.plans.registry import register

# ---------------------------------------------------------------------------
# q07: bilateral trade volume between two nations by ship year
# (supplier nation x customer nation, both directions)
# ---------------------------------------------------------------------------

_N_A, _N_B = "NATION_1", "NATION_2"

_Q07_SQL = f"""
SELECT supp_nation, cust_nation, l_year, {REVENUE_SQL.replace('l_extendedprice', 'volume_price').replace('l_discount', 'volume_disc')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice AS volume_price, l_discount AS volume_disc
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = '{_N_A}' AND n2.n_name = '{_N_B}')
      OR (n1.n_name = '{_N_B}' AND n2.n_name = '{_N_A}'))
    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q07_volume_shipping", _Q07_SQL, covers=("J-class", "A-class", "F2"))
def q07(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = F.broadcast(table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")))
    pair = ((F.col("supp_nation") == _N_A) & (F.col("cust_nation") == _N_B)) | (
        (F.col("supp_nation") == _N_B) & (F.col("cust_nation") == _N_A))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(revenue_expr().alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Event funnel: users reaching view -> click (after view) -> purchase
# (after click), counted per stage.
# ---------------------------------------------------------------------------

_FUNNEL_SQL = """
WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts >= v.t_view GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
      JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.t_click GROUP BY e.user_id)
SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p
"""


@register("q_events_funnel", _FUNNEL_SQL, covers=("A-class", "J4", "T1"))
def q_funnel(spark, sf_dir):
    return q_funnel_rows(table(spark, sf_dir, "events"))


def q_funnel_rows(ev):
    """Ordered-funnel kernel over an arbitrary event log — split out so
    the step-ordering semantics (click counts only at/after the user's
    FIRST view, purchase only at/after the first qualifying click,
    boundary equality included) are testable on hostile inputs."""
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t_view")))
    c = (ev.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter(F.col("ts") >= F.col("t_view"))
         .groupBy("user_id").agg(F.min("ts").alias("t_click")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter(F.col("ts") >= F.col("t_click"))
         .groupBy("user_id").agg(F.min("ts").alias("t_purchase")))

    def stage(df, name):
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(name).alias("stage"), F.col("n_users").cast("long"))

    return stage(v, "1_view").unionAll(stage(c, "2_click")).unionAll(stage(p, "3_purchase"))


# ---------------------------------------------------------------------------
# Decile profiling of customer balances (global NTILE with unique-key
# tiebreak for cross-engine determinism).
# ---------------------------------------------------------------------------

_DECILE_SQL = f"""
SELECT CAST(decile AS BIGINT) AS decile, CAST(count(*) AS BIGINT) AS n,
       min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
       {dsum_sql('c_acctbal')} / count(*) AS avg_bal
FROM (SELECT c_acctbal, NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
      FROM customer) t
GROUP BY decile
"""


@register("q_decile_stats", _DECILE_SQL, covers=("O5", "A-class"))
def q_deciles(spark, sf_dir):
    from pipeline311_spark.plans.common import dec

    c = table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        c.withColumn("decile", F.ntile(10).over(w).cast("long"))
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            (F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal"),
        )
    )


# ---------------------------------------------------------------------------
# k-means assignment step: seed centroids = embedding of the lowest
# vec_id per label; assign every vector to its nearest centroid by
# squared L2 (sequential fold, deterministic in both engines).
# ---------------------------------------------------------------------------

_SQDIST = (
    "list_reduce(list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) * (p[1] - p[2])), "
    "(x, y) -> x + y)"
)

_KMEANS_SQL = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
cent AS (SELECT label AS c_label, v AS cv
         FROM (SELECT label, v, ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id) AS rn
               FROM e WHERE label IS NOT NULL) t WHERE rn = 1),
scored AS (SELECT e.vec_id, cent.c_label, {_SQDIST.format(a='e.v', b='cent.cv')} AS sqdist
           FROM e CROSS JOIN cent),
assigned AS (SELECT vec_id, c_label
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sqdist, c_label) AS rn
                   FROM scored) t WHERE rn = 1)
SELECT CAST(c_label AS BIGINT) AS centroid_label, CAST(count(*) AS BIGINT) AS n_assigned
FROM assigned GROUP BY c_label
"""


def _sqdist(a, b):
    # one shared fold definition — the oracle twins mirror it slice-wise
    from pipeline311_spark.ext.similarity import sqdist

    return sqdist(a, b)


@register("q_kmeans_assign", _KMEANS_SQL, covers=("ext:similarity", "A-class", "O5"))
def q_kmeans(spark, sf_dir):
    e = emb_table(spark, sf_dir).withColumn("v", as_double("embedding"))
    first = Window.partitionBy("label").orderBy("vec_id")
    cent = (
        e.filter(F.col("label").isNotNull()).withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .select(F.col("label").alias("c_label"), F.col("v").alias("cv"))
    )
    scored = e.select("vec_id", "v").crossJoin(F.broadcast(cent)).withColumn(
        "sqdist", _sqdist(F.col("v"), F.col("cv"))
    )
    nearest = Window.partitionBy("vec_id").orderBy("sqdist", "c_label")
    assigned = scored.withColumn("rn", F.row_number().over(nearest)).filter(F.col("rn") == 1)
    return assigned.groupBy(F.col("c_label").cast("long").alias("centroid_label")).agg(
        F.count("*").cast("long").alias("n_assigned")
    )


# ---------------------------------------------------------------------------
# Context-window chunking of documents (overlapping token windows)
# ---------------------------------------------------------------------------

_CHUNK_SIZE, _CHUNK_STRIDE = 32, 16

_CHUNK_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array({_wtrim_sql('text')}, '\\s+') AS toks
  FROM documents WHERE {_wtrim_sql('text')} <> ''),
n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
s AS (SELECT doc_id, toks, n, unnest(range(0, n, {_CHUNK_STRIDE})) AS start FROM n)
SELECT doc_id,
       CAST(start / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(len(toks[start + 1 : start + {_CHUNK_SIZE}]) AS BIGINT) AS n_chunk_tokens,
       array_to_string(toks[start + 1 : start + {_CHUNK_SIZE}], ' ') AS chunk_text
FROM s
"""


@register("text_chunk_windows", _CHUNK_SQL, covers=("ext:text", "T7"))
def q_chunk_windows(spark, sf_dir):
    from pipeline311_spark.ext.textstats import chunk_token_windows

    d = table(spark, sf_dir, "documents")
    return chunk_token_windows(d, "doc_id", "text", size=_CHUNK_SIZE, stride=_CHUNK_STRIDE)
