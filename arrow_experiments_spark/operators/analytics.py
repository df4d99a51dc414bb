"""Product-analytics operators over the events table, plus corpus-level
text statistics: conversion funnel, cohort retention, TF-IDF top terms,
and weight-carrying importance sampling.

Reference parity: the reference's declared relational surface (README.md's
query examples and the arrow-commits analytics fixtures) stops at joins /
windows / aggregation; funnels and retention are the canonical *composite*
analytics built from exactly those primitives, and TF-IDF / importance
sampling are the LLM-pipeline extensions this engine treats as first-class
(brief: training-data pipeline operations).

Every shuffle here is keyed on a high-cardinality column (user_id, term,
doc_id) — the plans survive a 100× scale-up: no cross joins, no driver
loops, the only broadcast is a one-row corpus total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arrow_experiments_spark.functions.text import tokens, TOKENS_SQL
from arrow_experiments_spark.registry import register
from arrow_experiments_spark.tables import table

_TOKS_SQL = TOKENS_SQL.format(col="text")


@register(
    "events_funnel",
    "analytics",
    doc="ordered conversion funnel view -> click -> purchase: per user, "
    "the first view, the first click at-or-after that view, the first "
    "purchase at-or-after that click; stage user-counts plus conversion "
    "ratio from the previous stage.  Three aggregations and two joins, "
    "all keyed on user_id (high cardinality) — each stage's input shrinks "
    "monotonically, so the plan narrows as it deepens; the final 3-row "
    "union is driver-trivial.",
    oracle="""
        WITH v AS (
            SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_view
            FROM events WHERE event_type = 'view' GROUP BY 1
        ), c AS (
            SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_click
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) >= v.t_view
            GROUP BY 1
        ), p AS (
            SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_purchase
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= c.t_click
            GROUP BY 1
        ), s AS (
            SELECT 1 AS stage_no, 'view' AS stage, COUNT(*) AS users FROM v
            UNION ALL
            SELECT 2 AS stage_no, 'click' AS stage, COUNT(*) AS users FROM c
            UNION ALL
            SELECT 3 AS stage_no, 'purchase' AS stage, COUNT(*) AS users FROM p
        )
        SELECT stage_no, stage, CAST(users AS BIGINT) AS users,
               CAST(users AS DOUBLE)
                   / CAST(LAG(users) OVER (ORDER BY stage_no) AS DOUBLE)
                   AS conv_from_prev
        FROM s
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )

    def stage(df: DataFrame, no: int, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(no).alias("stage_no"), F.lit(name).alias("stage"), "users"
        )

    stages = stage(v, 1, "view").unionAll(stage(c, 2, "click")).unionAll(
        stage(p, 3, "purchase")
    )
    w = Window.orderBy("stage_no")
    return stages.withColumn(
        "conv_from_prev",
        F.col("users").cast("double") / F.lag("users").over(w).cast("double"),
    )


@register(
    "events_retention_cohort",
    "analytics",
    doc="cohort retention: users bucketed by first-activity date; for "
    "each (cohort day, day offset) the count of distinct users active "
    "that day.  distinct-(user, day) then one join keyed on user_id then "
    "one grouped count — at 100 TB the (user, day) distinct is the big "
    "shuffle and it is keyed on the highest-cardinality pair available.",
    oracle="""
        WITH f AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
            FROM events GROUP BY 1
        ), a AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        )
        SELECT strftime(f.cohort_date, '%Y-%m-%d') AS cohort_day,
               CAST(a.d - f.cohort_date AS INTEGER) AS day_offset,
               CAST(COUNT(*) AS BIGINT) AS users
        FROM a JOIN f ON a.user_id = f.user_id
        GROUP BY 1, 2
    """,
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_date"))
    active = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    # (user_id, d) is distinct, so COUNT(*) after the join counts users.
    return (
        active.join(first, "user_id")
        .groupBy(
            F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "cohort_date").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("users"))
    )


_TFIDF_TOP_K = 3


@register(
    "text_tfidf_top_terms",
    "text",
    doc=f"top-{_TFIDF_TOP_K} TF-IDF terms per document, inverted-index "
    "shape: explode tokens, per-(doc, term) counts, document frequency "
    "from the same grouped stream, equi-join back on term (high "
    "cardinality — scales), score = tf * (N / df) with a broadcast "
    "one-row corpus count.  The idf is the raw N/df ratio, not log(N/df): "
    "division is IEEE-exact in both engines while transcendental log is "
    "not guaranteed bit-identical; ranking is unchanged (monotone map).",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2
        ), dfreq AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
        ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
        s AS (
            SELECT tf.doc_id, tf.term, tf.tf,
                   CAST(tf.tf AS DOUBLE)
                       * (CAST(n.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE))
                       AS score
            FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
        )
        SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, score,
               CAST(rnk AS INTEGER) AS rnk
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
            FROM s
        ) WHERE rnk <= {_TFIDF_TOP_K}
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            (
                F.col("tf").cast("double")
                * (F.col("n_docs").cast("double") / F.col("df").cast("double"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "score", "rnk")
    )


# quality band -> keep probability, in 1/256ths of the md5 first-byte space
# (exact integer thresholds — no float RNG semantics to match across engines)
_SAMPLE_BANDS = (
    (500, 256),  # n_chars >= 500: keep all
    (200, 128),  # n_chars >= 200: keep half
    (0, 64),     # else: keep a quarter
)


@register(
    "pipeline_importance_sample",
    "text",
    doc="weight-carrying importance sampling: keep probability by length "
    "band (a quality proxy), gated on the first byte of md5(doc_id) — "
    "deterministic, reproducible, row-local (zero shuffle at any scale); "
    "each kept row carries weight = 1/p so downstream aggregates stay "
    "unbiased.  Thresholds are integers in md5-byte space, so both "
    "engines make bit-identical keep decisions.",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, lang, source, n_chars,
                   ((strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR))[1]) - 1) * 16
                    + (strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR))[2]) - 1))
                       AS gate,
                   CASE WHEN n_chars >= 500 THEN 256
                        WHEN n_chars >= 200 THEN 128
                        ELSE 64 END AS thr
            FROM documents
        )
        SELECT doc_id, lang, source, n_chars,
               CAST(256 AS DOUBLE) / CAST(thr AS DOUBLE) AS weight
        FROM d WHERE gate < thr
    """,
)
def pipeline_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_experiments_spark.functions.text import md5_str

    docs = table(spark, sf_dir, "documents")
    gate = F.conv(
        F.substring(md5_str(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    thr = (
        F.when(F.col("n_chars") >= _SAMPLE_BANDS[0][0], _SAMPLE_BANDS[0][1])
        .when(F.col("n_chars") >= _SAMPLE_BANDS[1][0], _SAMPLE_BANDS[1][1])
        .otherwise(_SAMPLE_BANDS[2][1])
    )
    return (
        docs.withColumn("thr", thr)
        .where(gate < F.col("thr"))
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            (F.lit(256).cast("double") / F.col("thr").cast("double")).alias(
                "weight"
            ),
        )
    )
