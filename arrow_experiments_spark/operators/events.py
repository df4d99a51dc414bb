"""Time-window operators over the events table (SURVEY.md §2.6 Streaming
row, batch-checkable form).

``F.window`` / ``F.session_window`` work identically on static DataFrames
and Structured Streaming inputs; the streaming variants (withWatermark +
writeStream) live in arrow_experiments_spark/streaming/ and are exercised by
tests, while these batch forms are the DuckDB-oracle-checkable contract.

Window starts are epoch-aligned in both engines (Spark window origin =
Unix epoch; DuckDB time_bucket origin 2000-01-01 is a whole multiple of
the bucket widths used here), so boundaries agree exactly.  events.ts has
shipped as ns or µs parquet (tables.py normalizes either to µs
timestamp_ntz); the oracle casts to µs TIMESTAMP to match the Spark-side
conversion (tables.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arrow_experiments_spark.functions.numeric import dsum
from arrow_experiments_spark.registry import register
from arrow_experiments_spark.tables import table

_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
_FMT_SPARK_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_FMT_DUCK_US = "%Y-%m-%d %H:%M:%S.%f"


@register(
    "events_tumbling_window",
    "events",
    doc="15-minute tumbling window per event_type: count + exact sum.",
    oracle=f"""
        SELECT strftime(time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)),
                        '{_FMT_DUCK}') AS window_start,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.date_format("w.start", _FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_sliding_window",
    "events",
    doc="10-minute window sliding every 5 minutes: each event lands in two "
    "windows (oracle unnests the two candidate starts).",
    oracle=f"""
        SELECT strftime(w, '{_FMT_DUCK}') AS window_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM (
            SELECT unnest([time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)),
                           time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
                               - INTERVAL '5 minutes']) AS w,
                   value
            FROM events
        )
        GROUP BY w
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.date_format("w.start", _FMT_SPARK).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_session_window",
    "events",
    doc="session windows with 10-minute gap per user "
    "(oracle: gaps-and-islands via lag + cumulative flag sum). Session end "
    "= last event + gap, per Spark session_window semantics.",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id,
                   CASE WHEN CAST(ts AS TIMESTAMP)
                             - LAG(CAST(ts AS TIMESTAMP)) OVER
                               (PARTITION BY user_id ORDER BY ts, event_id)
                             >= INTERVAL '10 minutes'
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ), sessions AS (
            SELECT user_id, ts, value,
                   -- ORDER BY must carry the event_id tiebreak too: with
                   -- duplicate timestamps the cumulative sum is otherwise
                   -- free to assign a tied row to the previous session.
                   SUM(new_session) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM flagged
        )
        SELECT user_id,
               strftime(MIN(ts), '{_FMT_DUCK_US}') AS session_start,
               strftime(MAX(ts) + INTERVAL '10 minutes', '{_FMT_DUCK_US}') AS session_end,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM sessions
        GROUP BY user_id, session_id
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.date_format("w.start", _FMT_SPARK_US).alias("session_start"),
            F.date_format("w.end", _FMT_SPARK_US).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_dedup_first",
    "events",
    doc="stateful-dedup batch analog (dropDuplicatesWithinWatermark "
    "contract): keep the earliest event per (user_id, event_type) under a "
    "deterministic total order.",
    oracle=f"""
        SELECT user_id, event_type, event_id,
               strftime(CAST(ts AS TIMESTAMP), '{_FMT_DUCK_US}') AS first_ts
        FROM (
            SELECT user_id, event_type, event_id, ts,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn = 1
    """,
)
def events_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            "event_id",
            "ts",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.date_format("ts", _FMT_SPARK_US).alias("first_ts"),
        )
    )


@register(
    "events_interval_join",
    "events",
    doc="stream-stream interval join batch analog (view→purchase "
    "attribution): purchases joined to same-user views they follow within "
    "30 minutes.  Equi key user_id + band predicate — one shuffle of each "
    "side on user_id, no time explosion; the streaming twin "
    "(streaming/joins.py:view_purchase_join) runs the identical plan with "
    "watermarks bounding the join state.  lag_us is an exact µs bigint "
    "(timestamp_diff vs DuckDB date_diff at storage granularity).",
    oracle=f"""
        WITH v AS (SELECT event_id AS view_id, user_id,
                          CAST(ts AS TIMESTAMP) AS vts
                   FROM events WHERE event_type = 'view'),
        p AS (SELECT event_id AS purchase_id, user_id,
                     CAST(ts AS TIMESTAMP) AS pts
              FROM events WHERE event_type = 'purchase')
        SELECT view_id, purchase_id, v.user_id,
               CAST(date_diff('microsecond', vts, pts) AS BIGINT) AS lag_us
        FROM v JOIN p ON v.user_id = p.user_id
                     AND pts >= vts AND pts < vts + INTERVAL 30 MINUTE
    """,
)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from arrow_experiments_spark.streaming.joins import view_purchase_join

    ev = table(spark, sf_dir, "events")
    return view_purchase_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
    )


@register(
    "events_sessionize_gaps",
    "events",
    doc="gaps-and-islands sessionization without session_window: a new "
    "session starts where the per-user gap exceeds 30 minutes (lag over "
    "a unique (ts, event_id) order), session ids are the running sum of "
    "the start flags, then one regroup yields per-session stats.  All "
    "arithmetic is on microsecond integers — exact in both engines.  Two "
    "windows + one aggregation, all keyed on user_id: the shuffle story "
    "is one partitioning reused across every stage.",
    oracle="""
        WITH o AS (
            SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                   CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                             - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                             > 1800000000
                          OR lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
            SELECT user_id, event_id, us,
                   SUM(new_s) OVER (PARTITION BY user_id
                                    ORDER BY us, event_id) AS session_seq
            FROM o
        )
        SELECT user_id,
               CAST(session_seq AS BIGINT) AS session_seq,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(us) AS start_us,
               MAX(us) AS end_us,
               MAX(us) - MIN(us) AS duration_us
        FROM s GROUP BY user_id, session_seq
    """,
)
def events_sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "ts",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("us").over(w)
    new_s = F.when(
        prev.isNull() | ((F.col("us") - prev) > 1_800_000_000), 1
    ).otherwise(0)
    w2 = Window.partitionBy("user_id").orderBy("us", "event_id")
    s = ev.withColumn("new_s", new_s).withColumn(
        "session_seq", F.sum("new_s").over(w2)
    )
    return s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    ).select(
        "user_id",
        F.col("session_seq").cast("bigint").alias("session_seq"),
        "n_events",
        "start_us",
        "end_us",
        "duration_us",
    )


@register(
    "events_hourly_unique_users",
    "events",
    doc="hourly audience dashboard: exact distinct users, event count, "
    "and events-per-user per hour bucket.  Exact distinct per bucket is "
    "a two-phase shuffle (dedup on (bucket, user), then regroup on "
    "bucket) — Spark plans exactly that expansion; at 100 TB the same "
    "query swaps approx_count_distinct in (agg_approx shows the "
    "tolerance-gated pattern) and the shuffle drops to one pass of "
    "HLL partials.",
    oracle=f"""
        SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)),
                        '{_FMT_DUCK}') AS bucket_start,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               COUNT(*) AS n_events,
               CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT user_id)
                   AS events_per_user
        FROM events
        GROUP BY 1
    """,
)
def events_hourly_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.date_format("w.start", _FMT_SPARK).alias("bucket_start"),
            "n_users",
            "n_events",
            (F.col("n_events").cast("double") / F.col("n_users")).alias(
                "events_per_user"
            ),
        )
    )


_HIST_LO = 0.0
_HIST_W = 5.0
_HIST_BINS = 10


@register(
    "events_value_histogram",
    "events",
    doc="fixed-bin value histogram per event_type — the data-profiling "
    f"op: {_HIST_BINS} bins of width {_HIST_W} from {_HIST_LO}, "
    "overflow clamped into the last bin so the bin count is bounded by "
    "construction (a groupBy key that can't explode).  One shuffle on "
    "(event_type, bin); bin assignment is integer floor arithmetic — "
    "exact in both engines.  At 100 TB this is the map-side-combine "
    "dream case: partial aggregation reduces each partition to at most "
    f"types x {_HIST_BINS} rows before the shuffle.",
    oracle=f"""
        SELECT event_type,
               CAST(least(greatest(floor((value - {_HIST_LO}) / {_HIST_W}), 0),
                          {_HIST_BINS - 1}) AS INT) AS bin,
               COUNT(*) AS n,
               CAST(MIN(value) AS DOUBLE) AS min_value,
               CAST(MAX(value) AS DOUBLE) AS max_value
        FROM events
        GROUP BY 1, 2
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # clamp the RAW double ratio before floor: Spark's floor returns
    # BIGINT, so an extreme value (~4.6e19) would overflow under ANSI
    # mode if floored first — clamping first keeps the conversion in
    # range for any input, matching the oracle where DuckDB's
    # double-typed floor can't abort (ADVICE r5)
    ratio = (F.col("value") - _HIST_LO) / _HIST_W
    bin_col = (
        F.floor(F.least(F.greatest(ratio, F.lit(0.0)), F.lit(float(_HIST_BINS - 1))))
        .cast("int")
        .alias("bin")
    )
    return ev.groupBy("event_type", bin_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").cast("double").alias("min_value"),
        F.max("value").cast("double").alias("max_value"),
    )


# One oracle, two physical forms (single global window vs two-level
# daily partials) — identical declared result per event_type.
_TWA_ORACLE = """
        WITH o AS (
            SELECT event_type,
                   CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS value_cents,
                   CAST(ts AS TIMESTAMP) AS t,
                   LEAD(CAST(ts AS TIMESTAMP)) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id
                   ) AS t_next
            FROM events
        ), w AS (
            SELECT event_type,
                   SUM(CAST(value_cents AS DECIMAL(38,0))
                       * date_diff('microsecond', t, t_next)) AS weighted,
                   CAST(date_diff('microsecond', MIN(t), MAX(t)) AS BIGINT)
                       AS span_micros,
                   COUNT(*) AS n_events
            FROM o GROUP BY event_type
        )
        SELECT event_type, n_events, span_micros,
               CAST(weighted AS DOUBLE) / (100.0 * NULLIF(span_micros, 0)) AS twa
        FROM w
    """


@register(
    "events_time_weighted_avg",
    "events",
    doc="time-weighted average (hypertable family, LOCF semantics): each "
    "value holds until the next observation, so the mean is "
    "sum(value_i * gap_i) / total_span per event_type.  All weights are "
    "exact integers (value in cents via DECIMAL(18,2), gaps in "
    "microseconds; products summed as DECIMAL(38,0) — no float-sum "
    "order sensitivity), one division at the end (NULL for a zero span "
    "— a single-observation key, inevitable at corpus scale, must not "
    "abort the job under ANSI mode).  Ties on ts are "
    "ordered by event_id in BOTH engines so the value-gap pairing is "
    "deterministic.  One window + one regroup, both keyed on "
    "event_type — window partitions grow linearly with the corpus "
    "(SCALE.md exp 0.68); events_time_weighted_avg_bucketed is the "
    "(type, hour-bucket)-keyed two-level form for full corpora.",
    oracle=_TWA_ORACLE,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    o = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("value_cents"),
        "ts",
        F.lead("ts").over(w).alias("t_next"),
    )
    agg = o.groupBy("event_type").agg(
        F.sum(
            F.col("value_cents").cast("decimal(38,0)")
            * F.expr("timestampdiff(MICROSECOND, ts, t_next)")
        ).alias("weighted"),
        F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))")
        .cast("bigint")
        .alias("span_micros"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg.select(
        "event_type",
        "n_events",
        "span_micros",
        (
            F.try_divide(
                F.col("weighted").cast("double"),
                100.0 * F.col("span_micros"),
            )
        ).alias("twa"),
    )


# Level-1 time-bucket width for the two-level TWA.  The bucket is the
# scale knob: partitions hold one bucket's events, so pick the width
# that keeps bucket population bounded at the corpus's time density —
# measured on the 100× clone corpus (30-day window, so extra volume
# lands as DENSITY): day-keyed still left 150 linearly-growing
# partitions (exp 0.44), hour-keyed re-balances to 3,600 (exp ~0.35).
_TWA_BUCKET = "hour"


@register(
    "events_time_weighted_avg_bucketed",
    "events",
    doc="the SAME time-weighted average re-keyed for scale (the two-level "
    "LOCF form events_time_weighted_avg's docstring promises, VERDICT r5 "
    f"#3): the sort window runs per (event_type, {_TWA_BUCKET} bucket) — "
    "partition size is one time bucket's events, not the whole corpus — "
    "producing per-bucket partial weights (intra-bucket value*gap sums, "
    "exact integer arithmetic) plus boundary state (first/last ts, last "
    "value).  A second window over BUCKETS (state = #buckets, not "
    "#events) adds each bucket's bridge contribution last_value * "
    "gap-to-next-bucket's-first-event, and one regroup per event_type "
    "combines.  Identical declared result to events_time_weighted_avg "
    "(shared oracle): LOCF weighting telescopes exactly across any time "
    "cut, so the bucket width is a pure performance knob (verified "
    "day == hour == single-window in tests).  At 100 TB the heavy sort "
    "is embarrassingly parallel in (type, bucket) and bucket width is "
    "chosen to bound partition size.",
    oracle=_TWA_ORACLE,
)
def events_time_weighted_avg_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.date_trunc(_TWA_BUCKET, "ts").alias("bkt"),
        "ts",
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("value_cents"),
    )
    # level 1: intra-bucket gaps (the only window whose partitions hold
    # event-scale row counts — keyed (type, bucket) so they stay bounded)
    wd = Window.partitionBy("event_type", "bkt").orderBy("ts", "event_id")
    o = base.withColumn("t_next", F.lead("ts").over(wd))
    zero38 = F.lit(0).cast("decimal(38,0)")
    daily = o.groupBy("event_type", "bkt").agg(
        F.coalesce(
            F.sum(
                F.col("value_cents").cast("decimal(38,0)")
                * F.expr("timestampdiff(MICROSECOND, ts, t_next)")
            ),
            zero38,  # single-event bucket: no intra-bucket gap, weight 0
        ).alias("w_intra"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        # the value LOCF carries across the bucket boundary: last event
        # by (ts, event_id) — the same tie order as the global window
        F.max_by("value_cents", F.struct("ts", "event_id")).alias(
            "last_value_cents"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    # level 2: bridge gaps between consecutive buckets-with-data — a
    # window over bucket rows (O(#buckets) state per type, constant in
    # corpus size for a fixed time range)
    wt = Window.partitionBy("event_type").orderBy("bkt")
    bridged = daily.withColumn("next_first_ts", F.lead("first_ts").over(wt))
    agg = bridged.groupBy("event_type").agg(
        F.sum(
            F.col("w_intra")
            + F.coalesce(
                F.col("last_value_cents").cast("decimal(38,0)")
                * F.expr("timestampdiff(MICROSECOND, last_ts, next_first_ts)"),
                zero38,  # final day has no bridge
            )
        ).alias("weighted"),
        F.expr("timestampdiff(MICROSECOND, min(first_ts), max(last_ts))")
        .cast("bigint")
        .alias("span_micros"),
        F.sum("n").alias("n_events"),
    )
    return agg.select(
        "event_type",
        "n_events",
        "span_micros",
        F.try_divide(
            F.col("weighted").cast("double"), 100.0 * F.col("span_micros")
        ).alias("twa"),
    )
