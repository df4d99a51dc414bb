"""Relational query surface: scans, joins, aggregation, windows, sort/limit,
set operations (SURVEY.md §2.6 rows Scan/Joins/Aggregation/Window/Sort/Set).

The reference itself has no relational algebra beyond slice/take/drop
(SURVEY.md §2.2) — this module is the declared query surface the engine
exposes on top of it, all Catalyst-planned built-ins.  Scale posture:
fixed-cardinality dims (region/nation) are hint-broadcast; SF-scaled
dims are AQE-sized (see tpch.py broadcast policy);
fact-fact joins shuffle on their keys with AQE handling skew; every
aggregate is partial-aggregable (map-side combine) because it is a plain
sum/count/min/max over decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arrow_experiments_spark.functions.numeric import davg, dsum
from arrow_experiments_spark.registry import register
from arrow_experiments_spark.tables import table

# Exact-decimal revenue term: l_extendedprice * (1 - l_discount).
# Decimal in, decimal out — identical in Spark and DuckDB (see registry doc).
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


def _revenue() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )


# --------------------------------------------------------------------------
# Aggregation
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    "aggregation",
    doc="TPC-H Q1-style pricing summary: multi-aggregate groupBy over the "
    "fact table; fully partial-aggregable, one shuffle on a 6-value key.",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                   AS sum_disc_price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice)
                   AS avg_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-31 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(_revenue()).cast("double").alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_basic",
    "aggregation",
    doc="count/sum/min/max/avg per group (SURVEY.md §2.6 Aggregation row).",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice)
                   AS avg_price
        FROM orders GROUP BY o_orderpriority
    """,
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            davg("o_totalprice").alias("avg_price"),
        )
    )


@register(
    "agg_count_distinct",
    "aggregation",
    doc="exact COUNT(DISTINCT) per group — expands to a two-phase "
    "distinct-then-count plan in both engines.",
    oracle="""
        SELECT o_orderstatus,
               COUNT(DISTINCT o_custkey) AS n_customers,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderstatus
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "agg_rollup",
    "aggregation",
    doc="ROLLUP over (returnflag, linestatus); subtotal rows labelled 'ALL'.",
    oracle="""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


@register(
    "agg_cube",
    "aggregation",
    doc="CUBE over (orderstatus, orderpriority).",
    oracle="""
        SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
               COALESCE(o_orderpriority, 'ALL') AS orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("sum_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
            "sum_price",
        )
    )


@register(
    "agg_grouping_sets",
    "aggregation",
    doc="GROUPING SETS ((status),(priority)) expressed as the union of two "
    "aggregations — identical semantics, one shuffle each.",
    oracle="""
        SELECT o_orderstatus AS grp_status, 'ALL' AS grp_priority, COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderstatus
        UNION ALL
        SELECT 'ALL' AS grp_status, o_orderpriority AS grp_priority, COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderpriority
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    by_status = orders.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_orders")).select(
        F.col("o_orderstatus").alias("grp_status"),
        F.lit("ALL").alias("grp_priority"),
        "n_orders",
    )
    by_prio = orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders")).select(
        F.lit("ALL").alias("grp_status"),
        F.col("o_orderpriority").alias("grp_priority"),
        "n_orders",
    )
    return by_status.unionAll(by_prio)


@register(
    "agg_stats",
    "aggregation",
    doc="min/max/stddev_samp per group; stddev computed from exact decimal "
    "sums (sum x, sum x²) so the result is order-independent.",
    oracle="""
        SELECT l_returnflag,
               MIN(l_quantity) AS min_qty,
               MAX(l_quantity) AS max_qty,
               COUNT(*) AS n_rows,
               SQRT((CAST(SUM(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_quantity AS DECIMAL(9,2)))
                          AS DOUBLE)
                     - CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE)
                       * CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) / COUNT(*))
                    / (COUNT(*) - 1)) AS stddev_qty
        FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    qd = F.col("l_quantity").cast("decimal(9,2)")
    sx = F.sum(qd).cast("double")
    sx2 = F.sum(qd * qd).cast("double")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        n.alias("n_rows"),
        F.sqrt((sx2 - sx * sx / n) / (n - F.lit(1))).alias("stddev_qty"),
    )


@register(
    "agg_percentile",
    "aggregation",
    doc="exact percentiles (median, p90) per group; snapped to 6 decimals to "
    "absorb interpolation-formula ulp differences.",
    oracle="""
        SELECT l_returnflag,
               CAST(CAST(quantile_cont(l_quantity, 0.5) AS DECIMAL(28,6)) AS DOUBLE) AS median_qty,
               CAST(CAST(quantile_cont(l_quantity, 0.9) AS DECIMAL(28,6)) AS DOUBLE) AS p90_qty
        FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").cast("decimal(28,6)").cast("double").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.9)").cast("decimal(28,6)").cast("double").alias("p90_qty"),
    )


@register(
    "agg_approx",
    "aggregation",
    doc="approximate aggregates with an in-query tolerance gate (SURVEY.md "
    "§2.6: approx ops checked by tolerance, not hash).  Sketch values are "
    "engine-specific, so the query emits per-group BOOLEANs asserting the "
    "sketch landed within its published error bound — approx_count_distinct "
    "(HLL, default rsd=0.05; gate at 3·rsd) against the exact distinct "
    "count, and percentile_approx (accuracy 10000, rank error 1/10000; "
    "gate: value between the exact 0.49/0.51 quantiles) against exact "
    "percentiles.  The oracle emits literal TRUEs over the same groups: a "
    "sketch outside tolerance turns a Spark boolean false and fails the "
    "hash compare, so this row IS the tolerance check.  Exact distinct "
    "count is included as a direct cross-engine value check.",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
               TRUE AS acd_within_tol,
               TRUE AS median_within_rank_tol
        FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # Two aggregations joined on the tiny group key, NOT one combined agg:
    # count-distinct rewrites through Expand, and a percentile_approx in
    # the same Aggregate then builds its accuracy-10000 sketch once per
    # (group, distinct-key) partial group — measured 41 s vs 2 s split at
    # sf0.1 (~20x), and the gap widens with distinct-key cardinality.
    dist = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    pct = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, 10000).alias("approx_median"),
        F.expr("percentile(l_quantity, array(0.49D, 0.5D, 0.51D))").alias("pct"),
    )
    agg = dist.join(pct, "l_returnflag")
    return agg.select(
        "l_returnflag",
        F.col("exact_orders").cast("long").alias("exact_orders"),
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            <= F.lit(3 * 0.05) * F.col("exact_orders")
        ).alias("acd_within_tol"),
        (
            (F.col("approx_median") >= F.col("pct")[0])
            & (F.col("approx_median") <= F.col("pct")[2])
        ).alias("median_within_rank_tol"),
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    "join",
    doc="TPC-H Q3-style: 3-way join, filter both sides of a date split, "
    "top-10 revenue. customer side AQE-sized (SF-scaled, no hint — see "
    "tpch.py broadcast policy); orders⨝lineitem "
    "shuffles on orderkey.",
    oracle="""
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                   AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cut = F.lit("1998-06-01 00:00:00").cast("timestamp_ntz")
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    "join",
    doc="TPC-H Q5-style: 6-table star join; region/nation hint-broadcast, "
    "supplier AQE-sized, "
    "fact joins shuffle. Revenue per nation in ASIA.",
    oracle="""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                   AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            sup,
            (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@register(
    "join_broadcast_dims",
    "join",
    doc="explicit broadcast-hash join of a fact table against two tiny dims "
    "(the always-broadcast pattern for 100 TB facts).",
    oracle="""
        SELECT r_name, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    region = F.broadcast(table(spark, sf_dir, "region"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("sum_acctbal"),
        )
    )


@register(
    "join_left_semi",
    "join",
    doc="left-semi join: customers with at least one 1999 order (EXISTS).",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
                        AND o.o_orderdate < TIMESTAMP '2000-01-01 00:00:00')
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("2000-01-01 00:00:00").cast("timestamp_ntz"))
    )
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_left_anti",
    "join",
    doc="left-anti join: customers that never placed an order above 300k "
    "(NOT EXISTS).",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_left_outer",
    "join",
    doc="left outer join preserving customers without orders; per-customer "
    "order count (0 for the null side).",
    oracle="""
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_full_outer",
    "join",
    doc="full outer join of per-nation supplier counts vs customer counts.",
    oracle="""
        WITH s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_sup FROM supplier GROUP BY 1),
             c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1)
        SELECT COALESCE(s.nk, c.nk) AS nationkey,
               COALESCE(n_sup, 0) AS n_sup,
               COALESCE(n_cust, 0) AS n_cust
        FROM s FULL OUTER JOIN c ON s.nk = c.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_sup"))
    )
    cust = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    return sup.join(cust, "nk", "full_outer").select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_sup", F.lit(0)).alias("n_sup"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
    )


@register(
    "join_right_outer",
    "join",
    doc="right outer join lineitem → part; per-brand lineitem counts keep "
    "parts with no lineitems.",
    oracle="""
        SELECT p_brand, COUNT(l_orderkey) AS n_lineitems,
               COUNT(DISTINCT p_partkey) AS n_parts
        FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey, "right")
        .groupBy("p_brand")
        .agg(
            F.count("l_orderkey").alias("n_lineitems"),
            F.countDistinct("p_partkey").alias("n_parts"),
        )
    )


@register(
    "join_range_band",
    "join",
    doc="equi-join with a band (range) predicate: lineitems whose quantity "
    "is within ±5 of the part size.",
    oracle="""
        SELECT p_brand, COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem JOIN part ON l_partkey = p_partkey
         AND l_quantity BETWEEN p_size - 5 AND p_size + 5
        GROUP BY p_brand
    """,
)
def join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    cond = (
        (li.l_partkey == part.p_partkey)
        & (li.l_quantity >= part.p_size - 5)
        & (li.l_quantity <= part.p_size + 5)
    )
    return (
        li.join(part, cond)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("l_extendedprice").alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@register(
    "window_rank",
    "window",
    doc="row_number/rank/dense_rank over a per-nation total order "
    "(unique tiebreaker ⇒ deterministic).",
    oracle="""
        SELECT c_custkey, c_nationkey,
               ROW_NUMBER() OVER w AS rn,
               RANK() OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "window_lag_lead",
    "window",
    doc="lag/lead of order price within each customer's order history.",
    oracle="""
        SELECT o_orderkey, o_custkey,
               LAG(o_totalprice) OVER w AS prev_price,
               LEAD(o_totalprice) OVER w AS next_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@register(
    "window_running_sum",
    "window",
    doc="running count + running decimal-exact sum per customer "
    "(explicit ROWS frame).",
    oracle="""
        SELECT o_orderkey, o_custkey,
               COUNT(*) OVER w AS running_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("running_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "window_range_frame",
    "window",
    doc="RANGE frame over a numeric ordering: how many orders fall within "
    "$1000 below each order's price, per status.",
    oracle="""
        SELECT o_orderkey,
               COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                              RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_in_band
        FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PySpark's Window.rangeBetween only takes integer offsets; a decimal
    # RANGE frame over a double ordering needs the SQL form.
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr(
            "count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice"
            " RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)"
        ).alias("n_in_band"),
    )


@register(
    "topk_per_group",
    "window",
    doc="top-3 orders by price per priority class (window + filter — the "
    "scalable top-k-per-group idiom; no global sort).",
    oracle="""
        SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders) t
        WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        table(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# Sort / limit / slice
# --------------------------------------------------------------------------


@register(
    "sort_multi_key",
    "sort",
    doc="multi-key ORDER BY (asc/desc mix) + LIMIT over a total order.",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice
        FROM lineitem
        ORDER BY l_returnflag ASC, l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 100
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
        .orderBy(
            F.col("l_returnflag").asc(),
            F.col("l_extendedprice").desc(),
            "l_orderkey",
            "l_linenumber",
        )
        .limit(100)
    )


@register(
    "slice_offset_limit",
    "sort",
    doc="offset+limit slice over a total order — the reference's "
    "slice(batch, offset, len) (SURVEY.md §2.2) lifted to a sorted relation.",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_orderkey LIMIT 50 OFFSET 100
    """,
)
def slice_offset_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------


@register(
    "set_union_all",
    "setop",
    doc="UNION ALL of two key streams, then per-key occurrence counts.",
    oracle="""
        SELECT k, COUNT(*) AS n FROM (
            SELECT c_custkey AS k FROM customer
            UNION ALL
            SELECT o_custkey AS k FROM orders
        ) GROUP BY k
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return c.unionAll(o).groupBy("k").agg(F.count(F.lit(1)).alias("n"))


@register(
    "set_union_distinct",
    "setop",
    doc="UNION (distinct) of customer keys from two predicates.",
    oracle="""
        SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
        UNION
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("k"))
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("k"))
    )
    return c.union(o).distinct()


@register(
    "set_intersect",
    "setop",
    doc="INTERSECT: customer keys that appear in both tables.",
    oracle="""
        SELECT c_custkey AS k FROM customer
        INTERSECT
        SELECT o_custkey AS k FROM orders
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return c.intersect(o)


@register(
    "set_except",
    "setop",
    doc="EXCEPT (distinct): customers with no order in 1995.",
    oracle="""
        SELECT c_custkey AS k FROM customer
        EXCEPT
        SELECT o_custkey AS k FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .select(F.col("o_custkey").alias("k"))
    )
    return c.subtract(o)


@register(
    "window_ntile_dist",
    "window",
    doc="distribution window functions: ntile(4), percent_rank, cume_dist "
    "over order totals per priority (SURVEY.md §2.6 Window row).",
    oracle="""
        SELECT o_orderkey,
               o_orderpriority,
               CAST(ntile(4) OVER w AS INT) AS price_quartile,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "window_percent_rank_cume_dist",
    "window",
    doc="relative-position window functions per nation: percent_rank "
    "(= (rank-1)/(n-1)) and cume_dist over (c_acctbal, c_custkey).  The "
    "order key is unique, so ranks are total and both ratios are exact "
    "rationals evaluated by one IEEE division — engine-identical without "
    "snapping.  One shuffle on the partition key.",
    oracle="""
        SELECT c_custkey,
               CAST(c_nationkey AS INT) AS nation,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cum_dist
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey
                     ORDER BY c_acctbal, c_custkey)
    """,
)
def window_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        F.col("c_nationkey").cast("int").alias("nation"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    )


# Composite argmin/argmax key: account balance in exact cents scaled past
# the key range, custkey as tiebreak.  10^10 > any custkey at the tested
# SFs (and the collision bound is documented, not silent: 2.1e8 customers
# = SF 1400 before the tiebreak field saturates).
_ARG_KEY_SCALE = 10_000_000_000


@register(
    "agg_min_by_max_by",
    "agg",
    doc="argmin/argmax aggregation per nation: the customers holding the "
    "smallest and largest account balance (ties to the smaller custkey).  "
    "Both engines evaluate min_by/max_by over ONE exact integer composite "
    "key (balance cents * 1e10 +/- custkey) because tie order inside "
    "native multi-key argmax is engine-defined; the composite makes the "
    "selection total.  Fully partial-aggregable — map-side combine keeps "
    "the shuffle at one row per (nation, partition) at any scale.",
    oracle=f"""
        SELECT CAST(c_nationkey AS INT) AS nation,
               min_by(c_name, CAST(round(c_acctbal * 100) AS BIGINT)
                              * {_ARG_KEY_SCALE} + c_custkey) AS poorest,
               max_by(c_name, CAST(round(c_acctbal * 100) AS BIGINT)
                              * {_ARG_KEY_SCALE} - c_custkey) AS richest,
               CAST(MIN(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                   / 100 AS min_acctbal,
               CAST(MAX(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                   / 100 AS max_acctbal
        FROM customer GROUP BY c_nationkey
    """,
)
def agg_min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    key_min = cents * _ARG_KEY_SCALE + F.col("c_custkey")
    key_max = cents * _ARG_KEY_SCALE - F.col("c_custkey")
    return cust.groupBy(
        F.col("c_nationkey").cast("int").alias("nation")
    ).agg(
        F.min_by("c_name", key_min).alias("poorest"),
        F.max_by("c_name", key_max).alias("richest"),
        (F.min(cents).cast("double") / 100).alias("min_acctbal"),
        (F.max(cents).cast("double") / 100).alias("max_acctbal"),
    )


@register(
    "window_first_last_nth",
    "window",
    doc="value-positional window functions per nation over a unique order "
    "key: first_value / last_value / nth_value(3) with an explicit "
    "unbounded frame (last_value under the default frame is the running "
    "row — a classic cross-engine trap; pinning the frame makes both "
    "engines see the whole partition).",
    oracle="""
        SELECT c_custkey,
               CAST(c_nationkey AS INT) AS nation,
               first_value(c_name) OVER w AS first_name,
               last_value(c_name) OVER w AS last_name,
               nth_value(c_name, 3) OVER w AS third_name
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey
                     ORDER BY c_acctbal, c_custkey
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy("c_acctbal", "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return cust.select(
        "c_custkey",
        F.col("c_nationkey").cast("int").alias("nation"),
        F.first("c_name").over(w).alias("first_name"),
        F.last("c_name").over(w).alias("last_name"),
        F.nth_value("c_name", 3).over(w).alias("third_name"),
    )


@register(
    "agg_bool_count_if",
    "agg",
    doc="predicate aggregates per order-priority: bool_and / bool_or / "
    "count_if over exact integer/boolean predicates — partial-aggregable "
    "one-shuffle group-by.",
    oracle="""
        SELECT o_orderpriority,
               bool_and(o_totalprice > 1000) AS all_over_1k,
               bool_or(o_orderstatus = 'F') AS any_finished,
               CAST(count_if(o_orderdate >= DATE '1995-01-01') AS BIGINT)
                   AS n_recent,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderpriority
    """,
)
def agg_bool_count_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.count_if(F.col("o_orderdate") >= F.lit("1995-01-01").cast("date")).alias(
            "n_recent"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "join_null_safe",
    "join",
    doc="null-safe equality join (Spark `<=>` / SQL IS NOT DISTINCT "
    "FROM): two per-bucket aggregates over events joined on a bucket key "
    "that is NULL for one group (user_id % 7 = 0 → NULL) — plain "
    "equality would silently drop the NULL bucket on both sides; the "
    "null-safe operator matches it.  Plans as an ordinary hash join "
    "(coalesce-style key normalization), so the scale posture is "
    "identical to any equi-join.",
    oracle="""
        WITH a AS (
            SELECT NULLIF(user_id % 7, 0) AS bucket, COUNT(*) AS n_events
            FROM events GROUP BY 1
        ), b AS (
            SELECT NULLIF(user_id % 7, 0) AS bucket,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1
        )
        SELECT a.bucket, a.n_events, b.n_users
        FROM a JOIN b ON a.bucket IS NOT DISTINCT FROM b.bucket
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    bucket = F.nullif(F.col("user_id") % 7, F.lit(0)).alias("bucket")
    a = ev.groupBy(bucket).agg(F.count(F.lit(1)).alias("n_events"))
    b = ev.groupBy(bucket).agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    return a.join(
        b.withColumnRenamed("bucket", "b_bucket"),
        a["bucket"].eqNullSafe(F.col("b_bucket")),
    ).select("bucket", "n_events", "n_users")


@register(
    "sort_nulls_ordering",
    "sort",
    doc="explicit NULL placement in ordering (§2.6 sort row: 'nulls "
    "first/last'): a nullable bucket key sorted ASC NULLS FIRST with a "
    "deterministic (value DESC, event_id) tiebreak and a limit that "
    "straddles the null/non-null boundary — the null rows' presence in "
    "the limited result IS the semantics under test (Spark ASC defaults "
    "nulls-first, DESC nulls-last; the query pins it explicitly so the "
    "plan survives an engine-default change).  TopK(limit, order) plans "
    "as a per-partition partial top-k + single-reduce merge — no global "
    "sort shuffle at any scale.",
    oracle="""
        SELECT event_id, NULLIF(user_id % 7, 0) AS bucket,
               CAST(value AS DOUBLE) AS value
        FROM events
        ORDER BY NULLIF(user_id % 7, 0) ASC NULLS FIRST, value DESC, event_id
        LIMIT 10000
    """,
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.nullif(F.col("user_id") % 7, F.lit(0)).alias("bucket"),
            F.col("value").cast("double").alias("value"),
        )
        .orderBy(
            F.col("bucket").asc_nulls_first(),
            F.col("value").desc(),
            F.col("event_id"),
        )
        .limit(10000)
    )


@register(
    "set_except_all",
    "setop",
    doc="EXCEPT ALL (bag semantics): each o_custkey occurrence in orders "
    "minus one occurrence per 1995 order — multiplicities subtract "
    "instead of collapsing, so a customer with 5 orders of which 2 in "
    "1995 keeps 3 rows.  Spark plans exceptAll as a counted anti-"
    "semantics aggregate + generate, the same one-shuffle shape as "
    "EXCEPT.",
    oracle="""
        SELECT o_custkey AS k FROM orders
        EXCEPT ALL
        SELECT o_custkey AS k FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    all_keys = o.select(F.col("o_custkey").alias("k"))
    y1995 = o.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
    ).select(F.col("o_custkey").alias("k"))
    return all_keys.exceptAll(y1995)


@register(
    "set_intersect_all",
    "setop",
    doc="INTERSECT ALL (bag semantics): per customer key, "
    "min(multiplicity in orders, multiplicity in 1995 orders) rows "
    "survive — the counted intersection.  Same plan family as "
    "INTERSECT; one shuffle on the key.",
    oracle="""
        SELECT o_custkey AS k FROM orders
        INTERSECT ALL
        SELECT o_custkey AS k FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    all_keys = o.select(F.col("o_custkey").alias("k"))
    y1995 = o.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
    ).select(F.col("o_custkey").alias("k"))
    return all_keys.intersectAll(y1995)


@register(
    "join_cross_small",
    "join",
    doc="explicit CROSS JOIN of the two fixed-cardinality dimensions "
    "(nation 25 x region 5 = 125 rows) — the deliberate-Cartesian "
    "operator, legitimate exactly when both sides are bounded by "
    "construction (grids, calendars, parameter sweeps).  Spark plans a "
    "BroadcastNestedLoopJoin; anything SF-scaled on either side would "
    "fail this repo's plan audit instead.",
    oracle="""
        SELECT n.n_nationkey, n.n_name, r.r_regionkey, r.r_name,
               n.n_regionkey = r.r_regionkey AS is_home_region
        FROM nation n CROSS JOIN region r
    """,
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return n.crossJoin(F.broadcast(r)).select(
        "n_nationkey",
        "n_name",
        "r_regionkey",
        "r_name",
        (F.col("n_regionkey") == F.col("r_regionkey")).alias("is_home_region"),
    )


@register(
    "agg_unpivot",
    "aggregation",
    doc="unpivot/melt (the pivot's inverse, §2.6 aggregation family): "
    "three lineitem measures rotate into (measure, value) rows — the "
    "wide-to-long reshape feeding generic per-measure aggregation "
    "downstream.  Row-local (each input row becomes 3), zero shuffle "
    "before the per-measure regroup; Spark plans unpivot as an Expand, "
    "the same map-side operator rollup/cube use.",
    oracle="""
        SELECT l_orderkey, l_linenumber, measure,
               CAST(value AS DOUBLE) AS value
        FROM (
            SELECT l_orderkey, l_linenumber,
                   CAST(l_quantity AS DOUBLE) AS quantity,
                   CAST(l_extendedprice AS DOUBLE) AS extendedprice,
                   CAST(l_discount AS DOUBLE) AS discount
            FROM lineitem WHERE l_orderkey < 100
        ) UNPIVOT (value FOR measure IN (quantity, extendedprice, discount))
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("double").alias("quantity"),
            F.col("l_extendedprice").cast("double").alias("extendedprice"),
            F.col("l_discount").cast("double").alias("discount"),
        )
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "extendedprice", "discount"],
        "measure",
        "value",
    )
