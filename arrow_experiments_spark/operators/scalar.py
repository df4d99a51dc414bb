"""Scalar function surface (SURVEY.md §2.6 "Scalar fns" row): string, date,
math, array, JSON — all JVM-side built-ins (whole-stage codegen; no Python
in the hot path).

Includes the reference's own micro-transforms re-expressed relationally:
first-line-of-message split (data/arrow-commits/arrow-commits.R:37-42 →
``split().getItem(0)``), drop-column (R:31 → projection), and length/cast
projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_experiments_spark.functions.numeric import snap6
from arrow_experiments_spark.registry import register
from arrow_experiments_spark.tables import table


@register(
    "scalar_string",
    "scalar",
    doc="upper/lower/substr/length/trim/concat/split/regexp_extract/replace "
    "over the part table (reference first-line idiom = split + element 0).",
    oracle="""
        SELECT p_partkey,
               upper(p_type) AS type_upper,
               lower(p_brand) AS brand_lower,
               substring(p_name, 1, 12) AS name_prefix,
               CAST(length(p_name) AS BIGINT) AS name_len,
               trim(p_name) AS name_trim,
               concat(p_brand, '-', p_type) AS brand_type,
               string_split(p_name, ' ')[1] AS first_word,
               regexp_extract(p_brand, '#([0-9]+)', 1) AS brand_num,
               replace(p_type, 'ECONOMY', 'ECO') AS type_short
        FROM part
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 12).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.trim("p_name").alias("name_trim"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")).alias("type_short"),
    )


@register(
    "scalar_date",
    "scalar",
    doc="year/month/day/date_add/datediff/date_trunc over order dates "
    "(tz-independent: timestamp_ntz → date).",
    oracle="""
        SELECT o_orderkey,
               CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS order_year,
               CAST(month(CAST(o_orderdate AS DATE)) AS INTEGER) AS order_month,
               CAST(day(CAST(o_orderdate AS DATE)) AS INTEGER) AS order_day,
               strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT)
                   AS days_to_y2k,
               strftime(o_orderdate, '%Y-%m') AS order_month_str
        FROM orders
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("o_orderdate").cast("date")
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).cast("bigint").alias("days_to_y2k"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month_str"),
    )


@register(
    "scalar_math",
    "scalar",
    doc="abs/round/floor/ceil/sqrt/ln/x² over lineitem; ln snapped to 6 "
    "decimals (JVM vs libm ulp), round done in decimal space.",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               abs(l_extendedprice - 50000.0) AS abs_delta,
               CAST(round(CAST(l_discount AS DECIMAL(6,4)), 1) AS DOUBLE) AS disc_rounded,
               CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
               CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
               sqrt(l_quantity) AS qty_sqrt,
               CAST(CAST(ln(l_extendedprice) AS DECIMAL(28,6)) AS DOUBLE) AS price_ln,
               l_quantity * l_quantity AS qty_sq
        FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000.0).alias("abs_delta"),
        F.round(F.col("l_discount").cast("decimal(6,4)"), 1).cast("double").alias("disc_rounded"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        snap6(F.log(F.col("l_extendedprice"))).alias("price_ln"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
    )


@register(
    "scalar_json",
    "scalar",
    doc="JSON extraction from the events.props string column "
    "(get_json_object ≙ json_extract_string), bucketed aggregation.",
    oracle="""
        SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
               COUNT(*) AS n_events,
               MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
               MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        FROM events GROUP BY 1
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        table(spark, sf_dir, "events")
        .select((k % 10).alias("k_bucket"), k.alias("k"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "scalar_array",
    "scalar",
    doc="array functions over the embedding column: size, element_at, "
    "array_contains against a literal array.",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS INTEGER) AS emb_dim,
               CAST(embedding[1] AS DOUBLE) AS first_val,
               list_contains([0, 1, 2], label) AS label_in_012
        FROM embeddings
    """,
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size("embedding").alias("emb_dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.array_contains(F.array(F.lit(0), F.lit(1), F.lit(2)), F.col("label")).alias(
            "label_in_012"
        ),
    )


@register(
    "explode_wordcount",
    "scalar",
    doc="explode(split(text)) word count — LATERAL unnest in the oracle; "
    "top-20 with full tiebreak order.",
    oracle="""
        SELECT word, COUNT(*) AS n FROM (
            SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents
        ) WHERE word <> ''
        GROUP BY word ORDER BY n DESC, word LIMIT 20
    """,
)
def explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


@register(
    "scalar_conditional",
    "scalar",
    doc="conditional scalar surface: CASE, coalesce, nullif, greatest, "
    "least — all whole-stage-codegen expressions.",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_quantity >= 25 THEN 'bulk'
                    WHEN l_quantity >= 10 THEN 'mid'
                    ELSE 'small' END AS qty_class,
               coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
               greatest(l_quantity, l_discount * 100.0) AS biggest,
               least(l_tax, l_discount) AS smallest
        FROM lineitem
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") >= 25, "bulk")
        .when(F.col("l_quantity") >= 10, "mid")
        .otherwise("small")
        .alias("qty_class"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100.0).alias("biggest"),
        F.least("l_tax", "l_discount").alias("smallest"),
    )


@register(
    "scalar_to_json",
    "scalar",
    doc="to_json over a constructed struct + map_values over a JSON-derived "
    "map (completes the SURVEY.md §2.6 json/map rows).",
    oracle="""
        SELECT event_id,
               to_json(struct_pack(event_id := event_id, event_type := event_type))
                   AS as_json,
               array_to_string(
                   list_transform(list_sort(json_keys(props)),
                                  k -> json_extract_string(props, '$.' || k)),
                   ',') AS values_joined
        FROM events
    """,
)
def scalar_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = F.from_json("props", "map<string,int>")
    vals = F.transform(
        F.array_sort(F.map_keys(m)), lambda k: F.element_at(m, k).cast("string")
    )
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.to_json(F.struct(F.col("event_id"), F.col("event_type"))).alias("as_json"),
        F.array_join(vals, ",").alias("values_joined"),
    )


@register(
    "scalar_bitwise",
    "scalar",
    doc="bitwise surface over integer keys: AND / OR / XOR / shifts / "
    "popcount — exact integer ops, engine-identical by definition.  "
    "Row-local projection; pushes the key-range filter to the scan.",
    oracle="""
        SELECT o_orderkey,
               o_orderkey & 255 AS k_and,
               o_orderkey | 4096 AS k_or,
               xor(o_orderkey, 1365) AS k_xor,
               o_orderkey << 2 AS k_shl,
               o_orderkey >> 3 AS k_shr,
               bit_count(o_orderkey) AS k_pop
        FROM orders
        WHERE o_orderkey < 4096
    """,
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4096)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("k_and"),
        k.bitwiseOR(F.lit(4096)).alias("k_or"),
        k.bitwiseXOR(F.lit(1365)).alias("k_xor"),
        F.shiftleft(k, 2).alias("k_shl"),
        F.shiftright(k, 3).alias("k_shr"),
        F.bit_count(k).cast("bigint").alias("k_pop"),
    )


@register(
    "scalar_timezone",
    "scalar",
    doc="timezone conversion (§2.6 date row: to_utc_timestamp): the naive "
    "event ts interpreted as New-York wall time → UTC, and as UTC → "
    "New-York wall time.  Both engines resolve through IANA tzdata "
    "(DuckDB: timezone(tz, ...) pairs; the inner call pins the instant, "
    "the outer picks the rendering zone — never the session default, "
    "which would make the oracle depend on container TZ).  The testdata "
    "spans January (no US DST transition), so wall times are unambiguous.  "
    "Row-local, zero shuffle.",
    oracle="""
        SELECT event_id,
               strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_raw,
               strftime(timezone('UTC', timezone('America/New_York',
                        CAST(ts AS TIMESTAMP))), '%Y-%m-%d %H:%M:%S.%f')
                   AS utc_from_ny,
               strftime(timezone('America/New_York', timezone('UTC',
                        CAST(ts AS TIMESTAMP))), '%Y-%m-%d %H:%M:%S.%f')
                   AS ny_from_utc
        FROM events
        WHERE event_id < 2000
    """,
)
def scalar_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.date_format("ts", fmt).alias("ts_raw"),
        F.date_format(
            F.to_utc_timestamp("ts", "America/New_York"), fmt
        ).alias("utc_from_ny"),
        F.date_format(
            F.from_utc_timestamp("ts", "America/New_York"), fmt
        ).alias("ny_from_utc"),
    )
