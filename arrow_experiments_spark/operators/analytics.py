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
    "ratio from the previous stage.  ONE scan of events and ONE user_id "
    "shuffle: three chained full-partition window mins (each stage's "
    "timestamp conditions on the previous stage's windowed value) share a "
    "single Window.partitionBy(user_id) exchange, the per-user collapse "
    "reuses that partitioning (no second exchange), and the three stage "
    "counts come off one global conditional aggregation exploded into the "
    "3-row result — at 100 TB the old 6-scan/3-shuffle CTE shape read the "
    "biggest table six times; this reads it once.",
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
                   / CAST(NULLIF(LAG(users) OVER (ORDER BY stage_no), 0)
                          AS DOUBLE)
                   AS conv_from_prev
        FROM s
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    wu = Window.partitionBy("user_id")
    # Chained full-partition mins: t_click's predicate reads the windowed
    # t_view (ts >= NULL is NULL, so a user who never viewed can't click
    # "after their view" — the ordered-funnel skip-stage rule for free).
    # All three share one hashpartitioning(user_id) exchange.
    staged = (
        ev.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("t_view")),
                    F.col("ts"),
                )
            ).over(wu),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("t_click")),
                    F.col("ts"),
                )
            ).over(wu),
        )
    )
    # Every row of a user carries identical stage timestamps; the collapse
    # to one row per user reuses the window's partitioning (no exchange).
    per_user = staged.groupBy("user_id").agg(
        F.first("t_view").alias("t_view"),
        F.first("t_click").alias("t_click"),
        F.first("t_purchase").alias("t_purchase"),
    )
    counts = per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
    )
    stages = counts.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("stage_no"),
                    F.lit("view").alias("stage"),
                    F.col("n_view").alias("users"),
                ),
                F.struct(
                    F.lit(2).alias("stage_no"),
                    F.lit("click").alias("stage"),
                    F.col("n_click").alias("users"),
                ),
                F.struct(
                    F.lit(3).alias("stage_no"),
                    F.lit("purchase").alias("stage"),
                    F.col("n_purchase").alias("users"),
                ),
            )
        ).alias("s")
    ).select("s.stage_no", "s.stage", "s.users")
    w = Window.orderBy("stage_no")
    # try_divide: an empty upstream stage (0 users) must yield NULL, not an
    # ANSI DIVIDE_BY_ZERO error (Spark 4 default); NULLIF mirrors it in SQL.
    return stages.withColumn(
        "conv_from_prev",
        F.try_divide(
            F.col("users").cast("double"), F.lag("users").over(w).cast("double")
        ),
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
    active = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    # cohort_date = first active day = min(d) over the user's DISTINCT
    # active days — a window over the active frame, not a groupBy on a
    # second events scan joined back (r16: the un-CSE'd join subtree
    # re-read the events table; ReadSchema 2 → 1, Exchange 8 → 6,
    # row-identical).  (user_id, d) is distinct, so COUNT(*) counts users.
    w = Window.partitionBy("user_id")
    return (
        active.withColumn("cohort_date", F.min("d").over(w))
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
    "as a COUNT window over the same grouped stream keyed on term (high "
    "cardinality — scales; same clustering a groupBy+self-join on term "
    "would need, minus the join and minus the second tokenize pass the "
    "un-CSE'd self-join subtree costs), score = tf * (N / df) with a "
    "broadcast one-row corpus count.  The idf is the raw N/df ratio, not "
    "log(N/df): division is IEEE-exact in both engines while "
    "transcendental log is not guaranteed bit-identical; ranking is "
    "unchanged (monotone map).",
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
    # df as a window over the tf stream, not groupBy(term)+self-join:
    # the join form re-derives the whole scan→tokenize→explode→groupBy
    # subtree on the dfreq side (no CSE across the self-join — measured
    # ReadSchema 3 → 2, Exchange 14 → 10 at sf0.1, row-identical), and
    # the count-per-term window needs exactly the clustering on term the
    # join's probe-side shuffle paid anyway.  At 100 TB the saved pass
    # is a full corpus re-tokenize.
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    wdf = Window.partitionBy("term")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(wdf))
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


@register(
    "events_transition_matrix",
    "analytics",
    doc="first-order Markov transition matrix over per-user event "
    "sequences: lead(event_type) over (user_id, ts, event_id) pairs "
    "consecutive events, then one grouped count per (from, to) and a "
    "row-normalized probability.  The window shuffle is keyed on user_id "
    "(high cardinality); the (from, to) regroup is 25 cells — trivially "
    "small at any corpus size.  The event_id tiebreak makes the order "
    "total, so duplicate timestamps cannot flip pairs between engines.",
    oracle="""
        WITH s AS (
            SELECT user_id, event_type AS from_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
            FROM events
        ), n AS (
            SELECT from_type, to_type, COUNT(*) AS n
            FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
               CAST(n AS DOUBLE)
                   / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        FROM n
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("from_type"),
        )
        .withColumn("to_type", F.lead("from_type").over(w))
        .where(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wf = Window.partitionBy("from_type")
    return counts.withColumn(
        "p", F.col("n").cast("double") / F.sum("n").over(wf).cast("double")
    )


_CENT_SCALE = 1_000_000


@register(
    "embedding_label_centroids",
    "analytics",
    doc="exact per-label embedding centroids — the codebook-training step "
    "feeding ann_ivf_codebook: posexplode to (label, dim) cells, exact "
    "integer summation of floor(v * 1e6) (bigint — order-independent, "
    "unlike float sums, so the result is bit-identical across engines and "
    "partitionings), one division at the end.  Output is the exploded "
    "scalar form (label, n_vectors, pos, c) — one row per centroid "
    "dimension — so every column is hashable by any harness; callers "
    "wanting the array form reassemble with collect_list over pos.  "
    "Shuffle rows = n_vectors x dim keyed on (label, dim) — wide but "
    "perfectly partitioned; a 100x corpus scales linearly.",
    oracle=f"""
        WITH e AS (
            SELECT label, embedding[i] AS v, i - 1 AS pos
            FROM embeddings,
                 LATERAL unnest(generate_series(1, len(embedding))) AS t(i)
        ), c AS (
            SELECT label, pos,
                   SUM(CAST(floor(CAST(v AS DOUBLE) * {_CENT_SCALE}) AS BIGINT)) AS s,
                   COUNT(*) AS n
            FROM e GROUP BY 1, 2
        )
        SELECT label,
               CAST(n AS BIGINT) AS n_vectors,
               CAST(pos AS INT) AS pos,
               CAST(s AS DOUBLE) / CAST(n * {_CENT_SCALE} AS DOUBLE) AS c
        FROM c
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    cells = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "label",
        "pos",
        F.floor(F.col("v").cast("double") * _CENT_SCALE).cast("bigint").alias(
            "sv"
        ),
    )
    sums = cells.groupBy("label", "pos").agg(
        F.sum("sv").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return sums.select(
        "label",
        F.col("n").cast("bigint").alias("n_vectors"),
        F.col("pos").cast("int").alias("pos"),
        (
            F.col("s").cast("double")
            / (F.col("n") * _CENT_SCALE).cast("double")
        ).alias("c"),
    )


@register(
    "events_rollup_gapfill",
    "analytics",
    doc="hypertable-style rollup with gap-fill: hourly buckets per "
    "event_type (exact decimal sums), a generated per-key bucket grid "
    "from first to last activity — each bucket row generates itself plus "
    "the silent hours up to its lead, so gaps appear with n_events=0 "
    "from ONE pass — and a carry-forward column (last non-null sum) for "
    "dashboard-style continuity.  The gap explode is bounded by "
    "time-range/bucket-width per key — never by row count; at 100 TB "
    "the key becomes (entity, day) so each partition's grid stays "
    "small.  Window origins: Spark "
    "buckets align to the epoch, DuckDB time_bucket to 2000-01-01 — both "
    "whole multiples of 1 hour, so boundaries agree exactly.",
    oracle="""
        WITH h AS (
            SELECT event_type,
                   time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS bucket,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        ), b AS (
            SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
            FROM h GROUP BY 1
        ), g AS (
            SELECT b.event_type,
                   unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
            FROM b
        )
        SELECT g.event_type,
               strftime(g.bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
               CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
               h.sum_value AS sum_value,
               last_value(h.sum_value IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sum_value_ffill
        FROM g LEFT JOIN h
          ON g.event_type = h.event_type AND g.bucket = h.bucket
    """,
)
def events_rollup_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_experiments_spark.functions.numeric import dsum

    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(dsum("value").alias("sum_value"), F.count(F.lit(1)).alias("n_events"))
        .select(
            "event_type",
            F.col("w.start").alias("bucket"),
            "sum_value",
            "n_events",
        )
    )
    # gap rows generated from each bucket's lead (r16): every hourly row
    # emits itself (pos 0) plus the silent buckets up to the key's next
    # row, whose union is exactly the old lo..hi grid — the previous
    # bounds-aggregate + grid-explode + left-join re-derived the whole
    # scan+bucket-aggregate subtree for the grid side (no CSE;
    # ReadSchema 2 → 1, Exchange 6 → 4, join nodes gone, row-identical).
    # The lead window and the carry-forward window share one
    # (event_type, bucket) clustering, so both run off a single
    # exchange+sort.
    wo = Window.partitionBy("event_type").orderBy("bucket")
    gen = hourly.withColumn("next_b", F.lead("bucket").over(wo)).select(
        "event_type",
        "n_events",
        "sum_value",
        F.posexplode(
            F.sequence(
                "bucket",
                F.coalesce(
                    F.col("next_b") - F.expr("interval 1 hour"),
                    F.col("bucket"),
                ),
                F.expr("interval 1 hour"),
            )
        ).alias("pos", "bucket"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    real_sum = F.when(F.col("pos") == 0, F.col("sum_value"))
    return gen.select(
        "event_type",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        F.when(F.col("pos") == 0, F.col("n_events"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_events"),
        real_sum.alias("sum_value"),
        F.last(real_sum, ignorenulls=True).over(w).alias("sum_value_ffill"),
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


@register(
    "embedding_kmeans_step",
    "analytics",
    doc="one distributed Lloyd iteration of k-means over the embeddings "
    "table, seeded from the exact per-label centroids: (1) seed centroids "
    "= embedding_label_centroids' exact integer-sum means; (2) assign "
    "every vector to its nearest centroid by squared L2 — the distance "
    "fold runs element-order left-to-right in double on both engines and "
    "is snapped to 6 decimals, argmin ties break on the smaller label; "
    "(3) recompute centroids over the new assignment with the same exact "
    "integer summation.  Output is the exploded scalar form "
    "(new_label, n_vectors, n_moved, pos, c).  Scale shape: k centroid "
    "arrays are k x dim doubles (broadcast at any corpus size), "
    "assignment is a map-side cross score + one partial-aggregated "
    "groupBy(vec_id) argmin — no window sort; the centroid regroup "
    "shuffles n x dim integer cells keyed (label, pos).  This is the "
    "building block the iterative-algorithms row of SURVEY §2.6 "
    "declares; looping it to convergence is the driver's choice of "
    "rounds, each round this same bounded plan.",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, label, i - 1 AS pos,
                   CAST(floor(CAST(embedding[i] AS DOUBLE) * {_CENT_SCALE})
                        AS BIGINT) AS sv
            FROM embeddings,
                 LATERAL unnest(generate_series(1, len(embedding))) AS t(i)
        ), cs AS (
            SELECT label, pos, SUM(sv) AS s, COUNT(*) AS n
            FROM e GROUP BY 1, 2
        ), cent AS (
            SELECT label AS c_label,
                   list(CAST(s AS DOUBLE) / CAST(n * {_CENT_SCALE} AS DOUBLE)
                        ORDER BY pos) AS cent
            FROM cs GROUP BY label
        ), d AS (
            SELECT emb.vec_id, emb.label AS old_label, c.c_label,
                   CAST(CAST(list_reduce(
                       list_transform(list_zip(emb.embedding, c.cent),
                           p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                              * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
                       (acc, x) -> acc + x) AS DECIMAL(28,6)) AS DOUBLE) AS d2
            FROM embeddings emb CROSS JOIN cent c
        ), assign AS (
            SELECT vec_id, old_label, c_label AS new_label
            FROM (SELECT d.*, ROW_NUMBER() OVER (
                      PARTITION BY vec_id ORDER BY d2, c_label) AS rn FROM d)
            WHERE rn = 1
        ), stats AS (
            SELECT new_label,
                   COUNT(*) AS n_vectors,
                   SUM(CASE WHEN new_label <> old_label THEN 1 ELSE 0 END)
                       AS n_moved
            FROM assign GROUP BY 1
        ), nc AS (
            SELECT a.new_label, e.pos, SUM(e.sv) AS s, COUNT(*) AS n
            FROM assign a JOIN e ON a.vec_id = e.vec_id
            GROUP BY 1, 2
        )
        SELECT CAST(nc.new_label AS INT) AS new_label,
               CAST(st.n_vectors AS BIGINT) AS n_vectors,
               CAST(st.n_moved AS BIGINT) AS n_moved,
               CAST(nc.pos AS INT) AS pos,
               CAST(nc.s AS DOUBLE) / CAST(nc.n * {_CENT_SCALE} AS DOUBLE) AS c
        FROM nc JOIN stats st USING (new_label)
    """,
)
def embedding_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_experiments_spark.functions.numeric import snap6

    emb = table(spark, sf_dir, "embeddings")
    # (1) seed centroids as pos-ordered double arrays — identical values
    # to the oracle's (same exact integer sums, same IEEE division)
    cent_arr = (
        embedding_label_centroids(spark, sf_dir)
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            F.col("label").alias("c_label"),
            F.transform("pc", lambda s: s["c"]).alias("cent"),
        )
    )
    # (2) nearest centroid: left-to-right double fold (bit-identical to
    # list_reduce seeded with the first element: 0.0 + x == x), snapped;
    # argmin via a partial-aggregable struct-min, ties to smaller label.
    # old_label and the embedding ride THROUGH the argmin groupBy
    # (first() over k rows whose values are identical per vec_id), so no
    # join back to the table is needed for either — the previous shape
    # re-joined emb twice and re-derived the whole argmin subtree for
    # its stats branch (no CSE), ReadSchema 7 / Exchange 28; this one is
    # ReadSchema 2 / Exchange 10 with row-identical output (r16).
    sq = F.zip_with(
        F.col("embedding"),
        F.col("cent"),
        lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
    )
    d2 = snap6(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))
    best = (
        emb.crossJoin(cent_arr)  # k rows — AQE broadcasts, no hint needed
        .select("vec_id", "label", "embedding", "c_label", d2.alias("d2"))
        .groupBy("vec_id")
        .agg(
            F.min(F.struct(F.col("d2"), F.col("c_label"))).alias("m"),
            F.first("label").alias("old_label"),
            F.first("embedding").alias("embedding"),
        )
        .select(
            F.col("m.c_label").alias("new_label"),
            (F.col("m.c_label") != F.col("old_label"))
            .cast("bigint")
            .alias("moved"),
            "embedding",
        )
    )
    # (3) exact centroid recompute over the new assignment.  n_vectors
    # and n_moved are constant across a label's pos rows (every vector
    # contributes exactly one cell per pos), so both fold into the SAME
    # (new_label, pos) regroup — no separate stats branch, no final
    # join, single consumption of the argmin stream.
    cells = best.select(
        "new_label", "moved", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "new_label",
        "moved",
        "pos",
        F.floor(F.col("v").cast("double") * _CENT_SCALE)
        .cast("bigint")
        .alias("sv"),
    )
    out = cells.groupBy("new_label", "pos").agg(
        F.sum("sv").alias("s"),
        F.count(F.lit(1)).alias("n"),
        F.sum("moved").alias("nm"),
    )
    return out.select(
        F.col("new_label").cast("int").alias("new_label"),
        F.col("n").cast("bigint").alias("n_vectors"),
        F.col("nm").cast("bigint").alias("n_moved"),
        F.col("pos").cast("int").alias("pos"),
        (
            F.col("s").cast("double")
            / (F.col("n") * _CENT_SCALE).cast("double")
        ).alias("c"),
    )


@register(
    "events_anomaly_zscore",
    "analytics",
    doc="per-type hourly anomaly scores: exact decimal bucket sums, then "
    "each bucket's z-score against its event_type's mean/std over all "
    "buckets.  Both moment sums stay exact (DECIMAL sum of the bucket "
    "decimals and of their squares — order-independent), so mean/var/z "
    "reduce to a fixed chain of IEEE double ops mirrored verbatim in the "
    "oracle, snapped to 6 decimals.  Stats are windows keyed on "
    "event_type over the bucket frame (state = #buckets per type); z is "
    "NULL when the variance degenerates.",
    oracle="""
        WITH h AS (
            SELECT event_type,
                   time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS bucket,
                   SUM(CAST(value AS DECIMAL(18,2))) AS sv,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        ), s AS (
            SELECT event_type,
                   COUNT(*) AS nb,
                   CAST(SUM(sv) AS DOUBLE) AS sx,
                   CAST(SUM(sv * sv) AS DOUBLE) AS sxx
            FROM h GROUP BY 1
        )
        SELECT h.event_type,
               strftime(h.bucket, '%Y-%m-%d %H:%M:%S') AS bucket_start,
               CAST(h.n_events AS BIGINT) AS n_events,
               CAST(h.sv AS DOUBLE) AS sum_value,
               CAST(CAST(
                   CASE WHEN s.nb > 1
                         AND (s.sxx - s.sx * s.sx / s.nb) / s.nb > 0
                        THEN (CAST(h.sv AS DOUBLE) - s.sx / s.nb)
                             / sqrt((s.sxx - s.sx * s.sx / s.nb) / s.nb)
                   END AS DECIMAL(28,6)) AS DOUBLE) AS zscore
        FROM h JOIN s USING (event_type)
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_experiments_spark.functions.numeric import snap6

    ev = table(spark, sf_dir, "events")
    h = (
        ev.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("event_type", F.col("w.start").alias("bucket"), "sv", "n_events")
    )
    # per-type moments as windows over the bucket frame (r16): the
    # groupBy+join-back form re-derived the whole scan+bucket-aggregate
    # subtree for the stats side (no CSE; ReadSchema 2 → 1, Exchange
    # 8 → 4, join nodes gone, row-identical).  The decimal window sums
    # stay exact — order-independent like the grouped sums they replace.
    ws = Window.partitionBy("event_type")
    h2 = (
        h.withColumn("nb", F.count(F.lit(1)).over(ws))
        .withColumn("sx", F.sum("sv").over(ws).cast("double"))
        .withColumn("sxx", F.sum(F.col("sv") * F.col("sv")).over(ws).cast("double"))
    )
    mean = F.col("sx") / F.col("nb")
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("nb")) / F.col("nb")
    z = snap6(
        F.when(
            (F.col("nb") > 1) & (var > 0),
            (F.col("sv").cast("double") - mean) / F.sqrt(var),
        )
    )
    return h2.select(
        "event_type",
        F.date_format(F.col("bucket").cast("timestamp"), "yyyy-MM-dd HH:mm:ss")
        .alias("bucket_start"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("sv").cast("double").alias("sum_value"),
        z.alias("zscore"),
    )


# temperature-mixing parameters: alpha = 0.5 (sqrt smoothing), output
# budget = half the corpus, 16-bit md5 gate space
_MIX_SQRT_SCALE = 10**12
_MIX_GATE_SPACE = 65536


@register(
    "pipeline_mixture_weights",
    "text",
    doc="temperature-smoothed source mixing (the LLM-corpus data-mixing "
    "op): target share of source s proportional to sqrt(n_s) (alpha=0.5 "
    "flattens head sources, boosts tail ones), output budget = half the "
    "corpus, per-source keep probability least(1, budget*share_s/n_s) "
    "quantized to an integer threshold in 16-bit md5-gate space so both "
    "engines make bit-identical keep decisions; kept rows carry "
    "weight = gate_space/thr for unbiased downstream aggregates.  "
    "sqrt(n_s * 1e12) is floored to a BIGINT before the share sum, so "
    "every aggregate on the stats side is exact integer arithmetic and "
    "the only float chain is the fixed mirrored threshold expression.  "
    "Row-local gating — zero data shuffle; the stats side is rows = "
    "#sources.",
    oracle=f"""
        WITH c AS (
            SELECT source, COUNT(*) AS n_s,
                   CAST(floor(sqrt(CAST(COUNT(*) * {_MIX_SQRT_SCALE}
                        AS DOUBLE))) AS BIGINT) AS w_s
            FROM documents GROUP BY source
        ), t AS (
            SELECT SUM(n_s) AS n_total, SUM(w_s) AS w_sum FROM c
        ), thr_t AS (
            SELECT c.source, c.n_s, c.w_s,
                   CAST(floor(LEAST(
                       1.0,
                       0.5 * CAST(t.n_total AS DOUBLE) * CAST(c.w_s AS DOUBLE)
                         / (CAST(t.w_sum AS DOUBLE) * CAST(c.n_s AS DOUBLE)))
                       * {_MIX_GATE_SPACE}) AS INT) AS thr
            FROM c CROSS JOIN t
        )
        SELECT d.doc_id, d.source, d.n_chars,
               CAST({_MIX_GATE_SPACE} AS DOUBLE) / thr_t.thr AS weight
        FROM documents d JOIN thr_t USING (source)
        WHERE ((strpos('0123456789abcdef', md5(CAST(d.doc_id AS VARCHAR))[1]) - 1) * 4096
             + (strpos('0123456789abcdef', md5(CAST(d.doc_id AS VARCHAR))[2]) - 1) * 256
             + (strpos('0123456789abcdef', md5(CAST(d.doc_id AS VARCHAR))[3]) - 1) * 16
             + (strpos('0123456789abcdef', md5(CAST(d.doc_id AS VARCHAR))[4]) - 1))
              < thr_t.thr
    """,
)
def pipeline_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_experiments_spark.functions.text import md5_str

    docs = table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s")).select(
        "source",
        "n_s",
        F.floor(
            F.sqrt((F.col("n_s") * F.lit(_MIX_SQRT_SCALE)).cast("double"))
        )
        .cast("bigint")
        .alias("w_s"),
    )
    # corpus totals as sums over an unpartitioned window on the
    # per-source frame (r16): the frame is rows = #sources (metadata
    # scale — a single-partition window over it is bounded at any corpus
    # size), while the previous agg-then-crossJoin re-derived the whole
    # scan+groupBy subtree for the totals side (no CSE; ReadSchema
    # 3 → 2, Exchange 10 → 6, row-identical).
    wall = Window.partitionBy()
    c2 = c.withColumn("n_total", F.sum("n_s").over(wall)).withColumn(
        "w_sum", F.sum("w_s").over(wall)
    )
    thr = c2.select(
        "source",
        F.floor(
            F.least(
                F.lit(1.0),
                F.lit(0.5)
                * F.col("n_total").cast("double")
                * F.col("w_s").cast("double")
                / (F.col("w_sum").cast("double") * F.col("n_s").cast("double")),
            )
            * _MIX_GATE_SPACE
        )
        .cast("int")
        .alias("thr"),
    )
    gate = F.conv(
        F.substring(md5_str(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int")
    return (
        # thr is rows = #sources; the gate is row-local — the corpus never
        # shuffles (the join broadcasts by AQE size estimate)
        docs.join(thr, "source")
        .where(gate < F.col("thr"))
        .select(
            "doc_id",
            "source",
            "n_chars",
            (F.lit(float(_MIX_GATE_SPACE)) / F.col("thr")).alias("weight"),
        )
    )


def hll_partial_union_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw sketch-exchange estimates (event_type, est_users): per-type
    PARTIAL HLL sketches of user_id unioned into the corpus-wide row.
    HLL insertion is order-insensitive (register maxima), so the union of
    partials is BIT-IDENTICAL to a single sketch over all rows —
    tests/test_analytics.py asserts that mergeability invariant and the
    <5% error bound.  Not registered directly: the estimate value is
    DataSketches-specific (no SQL-expressible DuckDB twin), so the
    registered query ``agg_hll_partial_union`` emits the hash-checkable
    bounded form instead and this helper carries the demonstrative
    union-of-partials shape for the unit tests."""
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("uid")
    )
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("uid", F.lit(12)).alias("sk")
    )
    per_est = per.select(
        "event_type", F.hll_sketch_estimate("sk").alias("est_users")
    )
    total = (
        per.agg(F.hll_union_agg("sk").alias("sk"))
        .select(
            F.lit("(all)").alias("event_type"),
            F.hll_sketch_estimate("sk").alias("est_users"),
        )
    )
    return per_est.unionByName(total).orderBy("event_type")


_HLL_ORACLE = """
    SELECT CASE WHEN GROUPING(event_type) = 1 THEN '(all)'
                ELSE event_type END AS event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_bound
    FROM events
    GROUP BY ROLLUP(event_type)
    ORDER BY event_type
"""


@register(
    "agg_hll_partial_union",
    "agg",
    doc="mergeable HLL sketch rollup (Apache DataSketches via Spark's "
    "hll_sketch_agg), emitted in the hash-checkable bounded form: one "
    "rollup pass computes per-event_type + corpus-wide HLL sketches AND "
    "the exact distinct counts, and the query asserts the sketch "
    "estimate lands within the 5%% bound (lgK=12 → ~1.6%% RSE) per "
    "group.  This is THE pattern for distinct-count rollups at 100 TB: "
    "each partition builds fixed-size register arrays (4 KiB) merged "
    "associatively — the partial-union mergeability (union of partials "
    "BIT-IDENTICAL to one sketch over all rows) is asserted in "
    "tests/test_analytics.py against hll_partial_union_estimates.  The "
    "DuckDB oracle computes the exact side and TRUE per group, so the "
    "sketch's accuracy contract is what the hash checks.  The exact "
    "count_distinct here is the oracle-side anchor; the production "
    "rollup that skips it is agg_hll_sketch_exchange's sketch-table "
    "path.",
    oracle=_HLL_ORACLE,
)
def agg_hll_partial_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("uid")
    )
    agg = ev.rollup("event_type").agg(
        F.hll_sketch_agg("uid", F.lit(12)).alias("sk"),
        F.count_distinct("uid").alias("exact_users"),
        F.grouping("event_type").alias("g"),
    )
    est = F.hll_sketch_estimate("sk")
    return agg.select(
        F.when(F.col("g") == 1, F.lit("(all)"))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        "exact_users",
        (
            F.try_divide(
                F.abs(est - F.col("exact_users")).cast("double"),
                F.col("exact_users").cast("double"),
            )
            <= F.lit(0.05)
        ).alias("within_bound"),
    ).orderBy("event_type")


_HLL_SKETCH_DIR_CONF = "spark.arrowExperimentsSpark.hll.sketchDir"


def sketch_table_dir(sf_dir: str, spark: SparkSession | None = None) -> str:
    """Location of the HLL sketch artifact table: the
    ``spark.arrowExperimentsSpark.hll.sketchDir`` conf when set (the
    production posture — a named warehouse path), else a deterministic
    per-corpus tempdir (the bench/test sandbox's warehouse).  Either way
    the path is NAMESPACED PER CORPUS (a hash tag of the source dir):
    two corpora sharing one session/conf must not alternate fingerprint
    mismatches and clobber each other's artifacts — that would defeat
    write-if-absent entirely (ADVICE r8)."""
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    if spark is not None:
        conf = spark.conf.get(_HLL_SKETCH_DIR_CONF, "")
        if conf:
            return os.path.join(conf, f"corpus_{tag}")
    return os.path.join(tempfile.gettempdir(), f"aes_hll_sketches_{tag}")


def _source_fingerprint(sf_dir: str, lg_k: int) -> str | None:
    """Cheap freshness token for the events source: (relpath, size,
    mtime) of every file under it plus the sketch precision — no Spark
    job, no data scan.  Any append/rewrite of the source changes it.

    Returns ``None`` when NO source file is locally statable (remote
    filesystem, moved/empty dir): an empty walk must mean
    "un-fingerprintable — always rewrite", not "matches forever" —
    otherwise the manifest would silently serve stale sketches after
    every source change in exactly the production posture the sketchDir
    conf advertises (ADVICE r8, medium)."""
    import hashlib
    import os

    root = os.path.join(sf_dir, "events.parquet")
    entries: list[str] = []
    if os.path.isfile(root):
        st = os.stat(root)
        entries.append(f"events.parquet:{st.st_size}:{st.st_mtime_ns}")
    else:
        for dirpath, _dirs, files in os.walk(root):
            for f in sorted(files):
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                entries.append(
                    f"{os.path.relpath(p, root)}:{st.st_size}:{st.st_mtime_ns}"
                )
    if not entries:
        return None  # fail OPEN: staleness detection unavailable → rewrite
    token = f"lg_k={lg_k};" + ";".join(sorted(entries))
    return hashlib.sha256(token.encode()).hexdigest()


def write_hll_sketch_shards(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    lg_k: int = 12,
    refresh: bool = False,
) -> list[str]:
    """The nightly half of the sketch exchange: per time-shard,
    per-event_type HLL sketches of user_id persisted as a parquet table,
    ONE INDEPENDENT JOB PER SHARD — the shard frames share one persisted
    scan of the source (one events scan total; each job reads its
    shard's cached slice and emits 4 KiB register arrays), exactly like
    the per-partition sketch jobs a 100 TB warehouse runs nightly (there,
    partition pruning on a date-partitioned source gives each job its
    one-partition scan).  Layout: ``out_dir/shard=<week>/`` so partition
    discovery restores the shard column.

    WRITE-IF-ABSENT (r7 verdict #3): a ``_MANIFEST.json`` records a
    stat-based fingerprint of the source files; when it matches (source
    unchanged, same lg_k) the call returns the recorded shard keys
    WITHOUT any Spark job — repeat calls measure nothing but a JSON
    read, so the rollup half answers from the sketch table alone.  An
    un-fingerprintable source (no statable files) NEVER matches — the
    staleness check fails open (ADVICE r8).  Pass ``refresh=True`` to
    force the nightly rewrite.

    The nightly job also audits itself: the manifest records the EXACT
    per-type + global distinct-user counts (one extra rollup over the
    same persisted scan) so the rollup half can assert the sketch
    estimates against a stored exact anchor without ever re-touching a
    raw row — that is what makes agg_hll_sketch_exchange
    oracle-checkable while still answering from kilobytes.

    Returns the shard keys (weeks of the events table; the driver-side
    loop is over ~#weeks scheduler metadata, not data)."""
    import json as _json
    import os
    import shutil

    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    fp = _source_fingerprint(sf_dir, lg_k)
    if not refresh and fp is not None and os.path.exists(manifest_path):
        try:
            with open(manifest_path) as fh:
                manifest = _json.load(fh)
            if manifest.get("fingerprint") == fp and "exact" in manifest:
                return list(manifest["shards"])
        except (OSError, ValueError, KeyError):
            pass  # unreadable manifest → rewrite below

    shutil.rmtree(out_dir, ignore_errors=True)
    ev = table(spark, sf_dir, "events").select(
        F.date_trunc("week", F.col("ts")).cast("date").cast("string").alias(
            "shard"
        ),
        "event_type",
        F.col("user_id").cast("string").alias("uid"),
    )
    # ONE source scan shared by every shard job (ADVICE r7: without the
    # persist, each of the N concurrent jobs rescanned the whole table).
    ev = ev.persist()
    try:
        shards = sorted(
            r["shard"] for r in ev.select("shard").distinct().collect()
        )

        # The per-shard jobs are independent by design — and a warehouse
        # runs its nightly partition jobs CONCURRENTLY, so submit them from
        # a small thread pool (Spark's scheduler interleaves jobs from
        # different threads; each write targets its own directory).
        def write_shard(s: str) -> None:
            (
                ev.filter(F.col("shard") == s)
                .groupBy("event_type")
                .agg(F.hll_sketch_agg("uid", F.lit(lg_k)).alias("sk"))
                .write.mode("overwrite")
                .parquet(os.path.join(out_dir, f"shard={s}"))
            )

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=min(4, max(1, len(shards)))
        ) as pool:
            list(pool.map(write_shard, shards))  # list() re-raises failures

        # exact-count audit anchor: one rollup over the SAME persisted
        # scan; result is ~#event_types + 1 scalar rows
        exact = {
            ("(all)" if r["g"] == 1 else r["event_type"]): r["n"]
            for r in ev.rollup("event_type")
            .agg(
                F.count_distinct("uid").alias("n"),
                F.grouping("event_type").alias("g"),
            )
            .collect()
        }
    finally:
        ev.unpersist()
    with open(manifest_path, "w") as fh:
        _json.dump(
            {
                "fingerprint": fp,
                "shards": shards,
                "lg_k": lg_k,
                "exact": exact,
            },
            fh,
        )
    return shards


@register(
    "agg_hll_sketch_exchange",
    "agg",
    doc="the sketch exchange as a STORAGE pattern, end to end: nightly "
    "per-shard jobs (one independent Spark job per event-week, "
    "write_hll_sketch_shards) persist per-event_type HLL sketches as a "
    "parquet table; this query then answers global + per-type distinct "
    "users from the SKETCH TABLE ALONE — hll_union_agg across shards, "
    "never re-touching a raw row.  At 100 TB this is the warehouse "
    "rollup: the nightly jobs each scan one day's partition, the rollup "
    "reads kilobytes of register arrays and is interactive.  Because HLL "
    "registers are order-insensitive maxima, the union across "
    "independently-written shards is BIT-IDENTICAL to one sketch over "
    "all rows (tests/test_analytics.py asserts equality with "
    "hll_partial_union_estimates and the direct sketch).  build() writes "
    "the shard artifacts IF ABSENT OR STALE (stat-fingerprint manifest, "
    "r7 verdict #3) — the first call pays the nightly half, repeat calls "
    "measure the kilobyte rollup alone, which is the pattern's selling "
    "point.  The artifact dir is namespaced per corpus under the "
    "spark.arrowExperimentsSpark.hll.sketchDir conf when set.  "
    "Oracle-checkable (r8 verdict): the nightly job stores the exact "
    "per-group distinct counts in the manifest (computed on the same "
    "scan it already pays), and the rollup emits (event_type, "
    "exact_users, within_bound) — the sketch-union estimate asserted "
    "within 5%% of the stored exact anchor — so DuckDB's exact side "
    "hash-matches while repeat calls still read only kilobytes of "
    "registers plus one JSON.",
    oracle=_HLL_ORACLE,
)
def agg_hll_sketch_exchange(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os

    out = sketch_table_dir(sf_dir, spark)
    write_hll_sketch_shards(spark, sf_dir, out)
    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        exact = _json.load(fh)["exact"]
    sk = spark.read.parquet(out)
    per = sk.groupBy("event_type").agg(F.hll_union_agg("sk").alias("sk"))
    per_est = per.select(
        "event_type", F.hll_sketch_estimate("sk").alias("est_users")
    )
    total = per.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("(all)").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("est_users"),
    )
    # the exact anchor is ~#event_types + 1 scalars of manifest JSON —
    # inlined as a literal map (no extra job, no join; the rollup's only
    # Spark work stays the kilobyte register scan)
    anchor = F.create_map(
        *[
            lit
            for k, v in sorted(exact.items())
            for lit in (F.lit(k), F.lit(int(v)))
        ]
    )
    return (
        per_est.unionByName(total)
        .select(
            "event_type",
            F.element_at(anchor, F.col("event_type")).alias("exact_users"),
            "est_users",
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.try_divide(
                    F.abs(
                        F.col("est_users") - F.col("exact_users")
                    ).cast("double"),
                    F.col("exact_users").cast("double"),
                )
                <= F.lit(0.05)
            ).alias("within_bound"),
        )
        .orderBy("event_type")
    )
