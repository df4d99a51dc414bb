"""Custom operators Spark lacks as built-ins, composed from DataFrame
primitives (SURVEY.md §7: "composition of existing ops" before UDFs).

``asof_join`` — the classic time-series as-of join: for each event, the
most recent purchase by the same user at-or-before the event time.
Implemented as conditional side-tag over ONE scan → single shuffle on
user_id → in-partition sort → ``last(..., ignorenulls)`` running window.
This is THE scalable as-of shape: one scan, one shuffle, no range-join
explosion, no per-key Python.  Oracle: DuckDB's native ASOF LEFT JOIN.

``agg_pivot`` — pivot to columns (Spark ``groupBy().pivot()``), oracle via
conditional aggregation (identical semantics, portable SQL).

``map_functions`` — map_keys/map_values over a JSON-derived map column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arrow_experiments_spark.registry import register
from arrow_experiments_spark.tables import table


def _asof_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-tag + single shuffle on user_id + running
    last(purchase): the shared core of both as-of variants.  Returns the
    non-purchase rows with the carried (pid, pts) struct and the
    inclusive->= gap.

    The purchase/non-purchase split is a pure partition of the table —
    every event lands on exactly one side — so the previous
    filter+filter+union form read events TWICE for the same rows a
    single scan with a conditional side tag produces (r16: ReadSchema
    2 → 1, row-identical, min 0.574 → 0.450 s at sf0.1)."""
    ev = table(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(is_p, 0).otherwise(1).alias("side"),
        F.when(
            is_p,
            F.struct(F.col("event_id").alias("pid"), F.col("ts").alias("pts")),
        )
        .otherwise(F.lit(None).cast("struct<pid:bigint,pts:timestamp_ntz>"))
        .alias("p"),
    )
    # at equal ts the purchase (side=0) sorts first => inclusive >= semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = tagged.select(
        "event_id",
        "user_id",
        "ts",
        "side",
        F.last("p", ignorenulls=True).over(w).alias("lp"),
    )
    return merged.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.col("lp.pid").alias("pid"),
        F.expr("timestampdiff(MICROSECOND, lp.pts, ts)")
        .cast("bigint")
        .alias("gap"),
    )



@register(
    "asof_join",
    "custom",
    doc="as-of join: each non-purchase event matched to the user's most "
    "recent purchase at-or-before it; union+window composition (one "
    "shuffle on user_id), vs DuckDB native ASOF LEFT JOIN.",
    oracle="""
        SELECT e.event_id, e.user_id,
               p.event_id AS last_purchase_id,
               CAST(date_diff('microsecond', CAST(p.ts AS TIMESTAMP),
                              CAST(e.ts AS TIMESTAMP)) AS BIGINT) AS micros_since_purchase
        FROM (SELECT * FROM events WHERE event_type <> 'purchase') e
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON e.user_id = p.user_id AND CAST(e.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP)
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _asof_merged(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.col("pid").alias("last_purchase_id"),
        F.col("gap").alias("micros_since_purchase"),
    )


@register(
    "agg_pivot",
    "aggregation",
    doc="pivot event counts to one column per event_type per user; oracle "
    "via conditional aggregation (same shape a pivot plans to).",
    oracle="""
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
               CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
               CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
        FROM events GROUP BY user_id
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .select("user_id", *[F.col(t).cast("bigint").alias(t) for t in types])
    )


@register(
    "map_functions",
    "scalar",
    doc="map_keys/map_values over a JSON-derived map column "
    "(SURVEY.md §2.6 map row).",
    oracle="""
        SELECT event_id,
               array_to_string(list_sort(json_keys(props)), ',') AS keys_joined,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
               CAST(len(json_keys(props)) AS INTEGER) AS n_keys
        FROM events
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = F.from_json("props", "map<string,int>")
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_joined"),
        F.element_at(m, "k").alias("k_value"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


_ASOF_TOL_MICROS = 600_000_000  # 10 minutes


@register(
    "asof_join_tolerance",
    "custom",
    doc="as-of join with a match tolerance: like asof_join, but a "
    "purchase older than 10 minutes is no match (both id and gap go "
    "NULL).  Same single-shuffle union+window composition — tolerance is "
    "a post-hoc NULL-out of the carried struct, not a different join, so "
    "the 100 TB plan is unchanged.  Oracle: DuckDB native ASOF LEFT JOIN "
    "with the same post-filter.",
    oracle=f"""
        WITH m AS (
            SELECT e.event_id, e.user_id,
                   p.event_id AS pid,
                   CAST(date_diff('microsecond', CAST(p.ts AS TIMESTAMP),
                                  CAST(e.ts AS TIMESTAMP)) AS BIGINT) AS gap
            FROM (SELECT * FROM events WHERE event_type <> 'purchase') e
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
              ON e.user_id = p.user_id AND CAST(e.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP)
        )
        SELECT event_id, user_id,
               CASE WHEN gap <= {_ASOF_TOL_MICROS} THEN pid END
                   AS last_purchase_id,
               CASE WHEN gap <= {_ASOF_TOL_MICROS} THEN gap END
                   AS micros_since_purchase
        FROM m
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    in_tol = F.col("gap") <= _ASOF_TOL_MICROS
    return _asof_merged(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.when(in_tol, F.col("pid")).alias("last_purchase_id"),
        F.when(in_tol, F.col("gap")).alias("micros_since_purchase"),
    )
