"""Second analytics batch: IVF ANN, corpus word-count / TF-IDF, exact
manual median, salted (skew-resistant) aggregation."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pipeline311_spark.ext.similarity import ivf_ann_topk
from pipeline311_spark.ext.textstats import normalize_text, tokens
from pipeline311_spark.operators.skew import salted_agg
from pipeline311_spark.plans.common import emb_table, dec, table
from pipeline311_spark.plans.extensions import _cos_sql
from pipeline311_spark.plans.registry import register

# ---------------------------------------------------------------------------
# IVF ANN: centroids = first 16 corpus vectors (deterministic stand-in
# for trained centroids); corpus assigned to argmax-cosine cell;
# queries probe the 2 nearest cells.
# ---------------------------------------------------------------------------

_IVF_C = 16
_IVF_NPROBE = 2
_IVF_K = 5
_IVF_QUERIES = 5


def _ivf_sql() -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < {_IVF_C}),
assign AS (
  SELECT vec_id AS neighbor_id, v, centroid_id FROM (
    SELECT e.vec_id, e.v, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_cos_sql('e.v', 'cent.cv')} DESC, cent.centroid_id) AS rn
    FROM e CROSS JOIN cent) t
  WHERE rn = 1),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {_IVF_QUERIES}),
probes AS (
  SELECT query_id, qv, centroid_id FROM (
    SELECT q.query_id, q.qv, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
             ORDER BY {_cos_sql('q.qv', 'cent.cv')} DESC, cent.centroid_id) AS pr
    FROM q CROSS JOIN cent) t
  WHERE pr <= {_IVF_NPROBE}),
scored AS (
  SELECT query_id, neighbor_id, {_cos_sql('qv', 'v')} AS cos_sim
  FROM probes JOIN assign USING (centroid_id)
  WHERE query_id != neighbor_id)
SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored) t
WHERE rn <= {_IVF_K}
"""


@register("sim_ivf_ann_topk", _ivf_sql(), covers=("ext:similarity",))
def q_ivf(spark, sf_dir):
    e = emb_table(spark, sf_dir)
    centroids = e.filter(F.col("vec_id") < _IVF_C)
    queries = e.filter(F.col("vec_id") < _IVF_QUERIES)
    res = ivf_ann_topk(e, queries, centroids, k=_IVF_K, nprobe=_IVF_NPROBE)
    return res.select(
        "query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank")
    )


@register("sim_ivf_partitioned_probe", _ivf_sql(), covers=("ext:similarity", "K2"))
def q_ivf_partitioned_probe(spark, sf_dir):
    """The IVF store layout made concrete (what the ivf_assign /
    SemDeDup docstrings prescribe for 100 TB): the cell assignment is
    WRITTEN ``partitionBy(cell)`` once, and each query's ``nprobe``
    cells resolve to partition directories on the read-back table —
    a pruned file read per probe, never a corpus scan.  The partition
    key is prefixed ('c' + id) so Hive-style partition-value inference
    can't re-type it.  Results are identical to sim_ivf_ann_topk —
    same oracle."""
    import os
    import tempfile

    from pipeline311_spark.ext.similarity import cosine_pre, ivf_assign, ivf_probe_cells

    e = emb_table(spark, sf_dir)
    centroids = e.filter(F.col("vec_id") < _IVF_C)
    cells = (
        ivf_assign(e, centroids)
        .withColumnRenamed("vec_id", "neighbor_id")
        .withColumn("pkey", F.concat(F.lit("c"), F.col("centroid_id").cast("string")))
        .drop("centroid_id")
    )
    # pid-keyed deterministic store: one directory per process per sf
    # (a uuid per invocation leaked a corpus-sized copy per run;
    # concurrent gate PROCESSES still get isolated stores)
    out = os.path.join(
        tempfile.gettempdir(),
        f"p311_ivfpart_{os.path.basename(sf_dir)}_{os.getpid()}",
    )
    cells.write.mode("overwrite").partitionBy("pkey").parquet(out)
    corpus = spark.read.schema(cells.schema).parquet(out)

    probes = ivf_probe_cells(
        e.filter(F.col("vec_id") < _IVF_QUERIES), centroids, nprobe=_IVF_NPROBE
    ).select(
        "query_id", "qv", "qn",
        F.concat(F.lit("c"), F.col("centroid_id").cast("string")).alias("pkey"),
    )
    scored = (
        F.broadcast(probes)
        .join(corpus, "pkey")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_pre(F.col("qv"), F.col("v"), F.col("qn"), F.col("nv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _IVF_K)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Corpus word count (top-k terms) + TF-IDF
# ---------------------------------------------------------------------------

_WC_K = 25

_WORDCOUNT_SQL = f"""
WITH norm AS (
  SELECT trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt FROM documents),
tok AS (
  SELECT unnest(CASE WHEN nt = '' THEN [] ELSE string_split(nt, ' ') END) AS term
  FROM norm)
SELECT term, COUNT(*) AS freq
FROM tok GROUP BY term
ORDER BY freq DESC, term LIMIT {_WC_K}
"""


@register("text_wordcount_topk", _WORDCOUNT_SQL, covers=("ext:text",))
def q_wordcount(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens(normalize_text("text"))).alias("term"))
    return (
        tok.groupBy("term")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "term")
        .limit(_WC_K)
    )


# TF-IDF: tf = term count in doc; idf = ln(N / df).  ln() is IEEE-libm
# on both engines — round to 6 decimals to absorb any last-ulp
# difference.  Top-3 terms per doc for the first 50 docs.
_TFIDF_SQL = """
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt FROM documents),
tok AS (
  SELECT doc_id, unnest(CASE WHEN nt = '' THEN [] ELSE string_split(nt, ' ') END) AS term
  FROM norm),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln((SELECT n FROM n) / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term))
SELECT doc_id, term, tfidf
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn FROM scored) t
WHERE rn <= 3 AND doc_id < 50
"""


@register("text_tfidf_top_terms", _TFIDF_SQL, covers=("ext:text",))
def q_tfidf(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    n_docs = d.count()
    tok = d.select("doc_id", F.explode(tokens(normalize_text("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(n_docs) / F.col("df")), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 3) & (F.col("doc_id") < 50))
        .select("doc_id", "term", "tfidf")
    )


# ---------------------------------------------------------------------------
# Exact median without percentile builtins (portable: row_number vs
# count; averages the two middle elements on even counts)
# ---------------------------------------------------------------------------

_MEDIAN_SQL = """
WITH ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS cnt
  FROM events WHERE value IS NOT NULL)
SELECT event_type,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS median_value,
       MIN(cnt) AS n
FROM ranked
WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
GROUP BY event_type
"""


def q_median_rows(e):
    """Exact-median kernel over an arbitrary (event_type, event_id,
    value) table — split out so the two-middle-elements semantics
    (odd/even counts, duplicate values, the decimal-exact average of
    the two mid rows) are testable on hostile inputs."""
    # median over the NON-NULL values (standard semantics; a NULL
    # value would also land at engine-dependent window positions —
    # Spark NULLS FIRST vs DuckDB NULLS LAST, the hostile-gate class)
    e = e.filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    cw = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(cw).alias("cnt"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("cnt") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("cnt") + 2) / 2))
    )
    return mid.groupBy("event_type").agg(
        (F.sum(dec("value")).cast("double") / F.count("*")).alias("median_value"),
        F.min("cnt").alias("n"),
    )


@register("q_exact_median", _MEDIAN_SQL, covers=("A-class", "O5"))
def q_median(spark, sf_dir):
    return q_median_rows(table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Salted aggregation: identical results to a plain groupBy, skew-proof
# plan (two-phase partial/merge)
# ---------------------------------------------------------------------------

_SALTED_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       MAX(value) AS max_value
FROM events GROUP BY event_type
"""


@register("q_salted_agg", _SALTED_SQL, covers=("A-class", "T3"))
def q_salted(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    out = salted_agg(
        e,
        key="event_type",
        partial_aggs={
            "pn": F.count("*"),
            "psum": F.sum(dec("value")),
            "pmax": F.max("value"),
        },
        merge_aggs={
            "n": F.sum("pn"),
            "total_value": F.sum("psum").cast("double"),
            "max_value": F.max("pmax"),
        },
        salt_on="event_id",
        buckets=16,
    )
    return out.select("event_type", "n", "total_value", "max_value")


# ---------------------------------------------------------------------------
# Salted join: identical results to the plain equi-join, but a hot key
# is spread over 8 reducers (small side replicated per salt)
# ---------------------------------------------------------------------------

_SALTED_JOIN_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


@register("q_salted_join", _SALTED_JOIN_SQL, covers=("J-class", "A-class", "T3"))
def q_salted_join(spark, sf_dir):
    from pipeline311_spark.operators.skew import salted_join

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    joined = salted_join(li, o, key="l_orderkey", salt_on="l_linenumber", buckets=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(dec("l_extendedprice")).cast("double").alias("total_price"),
    )
