"""TPC-H-adapted query suite over the reduced testdata star schema.

The testdata (TESTDATA.md) is TPC-H-ish but smaller: no partsupp table and
no l_commitdate / l_receiptdate / l_shipmode / c_phone / p_container
columns.  Each classic query is adapted to the available columns while
keeping its *plan shape* (the thing that matters at 100 TB): the same
joins, the same aggregate structure, the same correlated-subquery
patterns.  Scale posture per query is noted in its doc string.

Float discipline (oracle.py compares doubles bit-exact): every SUM over a
money/quantity column goes through DECIMAL(18,2) so Spark and DuckDB both
compute exact sums, cast to double only at the end; ratios divide two
exact doubles (one IEEE op, deterministic on both engines).

Broadcast policy (100 TB posture): an explicit ``F.broadcast`` hint
bypasses ``autoBroadcastJoinThreshold``, so it is reserved for frames
whose size is bounded by CONSTRUCTION, independent of SF — nation (25
rows), region (5), their projections, and 1-row scalar aggregates.
SF-scaled tables (part = SF x 200k, supplier = SF x 10k, customer =
SF x 150k, and per-key aggregates derived from the fact) carry NO hint:
at bench SF AQE still picks a broadcast join from actual sizes, while at
1000-executor scale the same code degrades gracefully to a shuffle join
instead of a driver OOM.  ``tools/explain_audit.py`` asserts the policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arrow_experiments_spark.functions.numeric import dsum
from arrow_experiments_spark.registry import register
from arrow_experiments_spark.tables import table

# Exact-decimal revenue term (same as relational.py).
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


def _revenue() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )


@register(
    "q2_best_supplier_per_part",
    "join",
    doc="TPC-H Q2 adapted (no partsupp): for each small part, the "
    "highest-acctbal supplier that actually shipped it.  distinct "
    "part-supp pairs from the fact table, AQE-sized part/supplier joins (hint-free per the module broadcast policy), "
    "per-part max via window; ties kept on both sides.",
    oracle="""
        SELECT p_partkey, p_name, s_name, s_acctbal, n_name
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE p_size <= 5 AND p_type = 'SMALL'
        QUALIFY s_acctbal = MAX(s_acctbal) OVER (PARTITION BY p_partkey)
    """,
)
def q2_best_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 5) & (F.col("p_type") == "SMALL")
    )
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    w = Window.partitionBy("p_partkey")
    return (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .join(supp, pairs.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .withColumn("max_bal", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("max_bal"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
    )


@register(
    "q4_order_priority",
    "aggregation",
    doc="TPC-H Q4 adapted (no commitdate): priority count of 1997-H1 orders "
    "having a line shipped after the order date — EXISTS as left-semi join "
    "(no row multiplication), single shuffle on o_orderkey.",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q6_forecast_revenue",
    "aggregation",
    doc="TPC-H Q6: single-table scan-filter-sum; the whole query is one "
    "map-side partial aggregate — filters push to the parquet scan.",
    oracle=f"""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q7_volume_shipping",
    "join",
    doc="TPC-H Q7: revenue between two nations by year and direction; "
    "fact shuffles once per dim key; nation projections are hint-broadcast, supplier/customer joins are AQE-sized; "
    "year() stays in whole-stage codegen.",
    oracle=f"""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
               CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        GROUP BY sn.n_name, cn.n_name, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    "join",
    doc="TPC-H Q8 adapted: NATION_3's share of PROMO-part revenue inside "
    "region REGION_0 by order year.  Share = exact-decimal sums cast to "
    "double, one division.  Part filter prunes the fact early via the "
    "AQE-sized join; conditional sum is a single pass.",
    oracle=f"""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               CAST(CAST(SUM(CASE WHEN sn.n_name = 'NATION_3' THEN {_REV_SQL}
                                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                    / CAST(SUM({_REV_SQL}) AS DOUBLE) AS DOUBLE) AS mkt_share
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = cn.n_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = _revenue()
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            )
            .cast("double")
            .alias("nation_rev"),
            F.sum(rev).cast("double").alias("total_rev"),
        )
        .select(
            "o_year",
            (F.col("nation_rev") / F.col("total_rev")).cast("double").alias("mkt_share"),
        )
    )


@register(
    "q9_profit_by_nation_year",
    "join",
    doc="TPC-H Q9 adapted (no partsupp supplycost): net revenue on "
    "red-named parts by supplier nation and year.  p_name LIKE filter "
    "prunes the fact via an AQE-sized join; group key (25 nations × 7 years) is tiny "
    "so the final shuffle is negligible at any SF.",
    oracle=f"""
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               CAST(SUM({_REV_SQL}) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN orders ON o_orderkey = l_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, o_year
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(_revenue()).cast("double").alias("sum_profit"))
    )


@register(
    "q10_returned_items",
    "join",
    doc="TPC-H Q10: revenue lost to returns per customer in a quarter, "
    "top 20.  Aggregates on c_custkey BEFORE attaching dim columns "
    "(min shuffle width); deterministic order by (revenue desc, custkey).",
    oracle=f"""
        SELECT c_custkey, c_name,
               CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON n_nationkey = c_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q13_customer_distribution",
    "aggregation",
    doc="TPC-H Q13: distribution of order counts per customer including "
    "zero-order customers — left outer join + two-level aggregation; "
    "first agg on o_custkey is partial-aggregable, second is 1-column.",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT OUTER JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey) c_orders
        GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q14_promo_revenue",
    "join",
    doc="TPC-H Q14: PROMO-part share of one month's revenue; part dim "
    "joined AQE-sized, one conditional aggregate pass, single double division.",
    oracle=f"""
        SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL}
                                          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                    / CAST(SUM({_REV_SQL}) AS DOUBLE) AS DOUBLE) AS promo_revenue,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    part = table(spark, sf_dir, "part")
    rev = _revenue()
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            )
            .cast("double")
            .alias("promo_rev"),
            F.sum(rev).cast("double").alias("total_rev"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev"))
            .cast("double")
            .alias("promo_revenue"),
            "n_lines",
        )
    )


@register(
    "q15_top_supplier",
    "join",
    doc="TPC-H Q15: supplier(s) with max quarterly revenue.  The max is a "
    "1-row aggregate broadcast back over the per-supplier revenues (no "
    "unpartitioned window — that would single-thread at scale); ties kept.",
    oracle=f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no, CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    supp = table(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).cast("double").alias("total_revenue"))
        .cache()
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    "join",
    doc="TPC-H Q17: revenue from small-quantity orders of one brand — "
    "correlated avg-per-part subquery as a self-aggregate join; the "
    "per-part avg df is ≤ #parts rows — SF-scaled, so AQE sizes the join.",
    oracle="""
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                    / 7.0 AS DOUBLE) AS avg_yearly,
               COUNT(*) AS n_lines
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN (SELECT l_partkey AS ap_key,
                     0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                            / COUNT(l_quantity)) AS qty_threshold
              FROM lineitem GROUP BY l_partkey) pa
          ON ap_key = l_partkey
        WHERE p_brand = 'Brand#2' AND l_quantity < qty_threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    # per-part avg threshold as a window over ONE lineitem pass (r16):
    # the groupBy+join-back form re-scanned lineitem for the aggregate
    # subtree (no CSE across the self-join) and then shuffled the probe
    # side by partkey anyway — the window pays that one clustering
    # shuffle and nothing else (ReadSchema 3 → 2, Exchange 8 → 6,
    # row-identical; exact same arithmetic, so the declared result is
    # bit-equal).
    w = Window.partitionBy("l_partkey")
    li2 = li.withColumn(
        "qty_threshold",
        F.lit(0.2)
        * (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w).cast("double")
            / F.count("l_quantity").over(w)
        ),
    )
    return (
        li2.join(part, li2.l_partkey == part.p_partkey)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0)
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q18_large_volume_customer",
    "join",
    doc="TPC-H Q18: customers whose single order exceeds 250 units — "
    "HAVING on a fact-side pre-aggregate, then dim joins on the tiny "
    "surviving set (aggregate-before-join keeps the shuffle narrow).",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey, o_totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
    )


@register(
    "q19_discounted_revenue",
    "join",
    doc="TPC-H Q19 adapted (no container/shipmode): disjunctive "
    "brand × size × quantity predicates — one AQE-sized join pass with the "
    "OR evaluated post-join inside codegen, no union-of-scans.",
    oracle=f"""
        SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q20_red_part_shippers",
    "join",
    doc="TPC-H Q20 adapted (no partsupp): suppliers that shipped more than "
    "400 units of red parts in 1996 — semi-join shaped: aggregate fact "
    "per supplier after the part filter (AQE-sized joins; nation hint-broadcast).",
    oracle="""
        SELECT s_name, n_name,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS red_qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE p_name LIKE '%red%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY s_name, n_name
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 400
    """,
)
def q20_red_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("s_name", "n_name")
        .agg(dsum("l_quantity").alias("red_qty"))
        .filter(F.col("red_qty") > 400)
    )


@register(
    "q22_idle_rich_customers",
    "join",
    doc="TPC-H Q22 adapted (no phone): per-nation count and balance of "
    "above-average-balance customers with no 2001 orders — anti-join + "
    "scalar aggregate broadcast (exact decimal avg: sum/count, one "
    "division).",
    oracle="""
        SELECT c_nationkey,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                  / COUNT(c_acctbal)
                           FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        GROUP BY c_nationkey
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp_ntz")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


@register(
    "q11_part_value_concentration",
    "aggregation",
    doc="TPC-H Q11 adapted (no partsupp): parts whose revenue exceeds "
    "0.01% of grand-total revenue — per-part aggregate filtered against a "
    "1-row scalar aggregate broadcast back (no second pass over the fact).",
    oracle=f"""
        SELECT l_partkey, CAST(SUM({_REV_SQL}) AS DOUBLE) AS part_value
        FROM lineitem
        GROUP BY l_partkey
        HAVING CAST(SUM({_REV_SQL}) AS DOUBLE) >
               (SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) * 0.0001 FROM lineitem)
    """,
)
def q11_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_revenue()).cast("double").alias("part_value")
    )
    total = li.agg(
        (F.sum(_revenue()).cast("double") * F.lit(0.0001)).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


@register(
    "q12_late_shipment_priority",
    "join",
    doc="TPC-H Q12 adapted (no shipmode/receiptdate): for lines shipped "
    ">30 days after order date, urgent-vs-other order counts per return "
    "flag — one fact-fact join, conditional aggregation, tiny group key.",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
        GROUP BY l_returnflag
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 30 DAY"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "q16_supplier_part_counts",
    "aggregation",
    doc="TPC-H Q16 adapted (partsupp ≡ distinct lineitem pairs): distinct "
    "shipping suppliers per (brand, type, size) for mid-size parts, "
    "excluding negative-balance suppliers — AQE-sized dim joins straight "
    "off the fact, then count(distinct): the count's own distinct "
    "aggregate dedupes (partkey, suppkey) repeats, so a separate "
    "pre-distinct pass (a full-fact exchange) would be pure overhead.",
    oracle="""
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON p_partkey = ps.l_partkey
        JOIN supplier ON s_suppkey = ps.l_suppkey
        WHERE p_size BETWEEN 10 AND 20 AND s_acctbal >= 0
        GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_size").between(10, 20))
    supp = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") >= 0)
    # No pre-distinct (r16): countDistinct's expand/partial-distinct
    # aggregate dedupes suppkey repeats per group anyway, so the
    # distinct-pairs pass only added a full-fact exchange (Exchange
    # 10 → 8, min 0.835 → 0.542 s at sf0.1, row-identical; the oracle
    # keeps the declared distinct-pairs CTE — same result by set
    # semantics).
    rows = li.select("l_partkey", "l_suppkey")
    return (
        rows.join(part, rows.l_partkey == part.p_partkey)
        .join(supp, rows.l_suppkey == supp.s_suppkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@register(
    "q21_last_shipper_waiting",
    "join",
    doc="TPC-H Q21 adapted (no receipt/commit dates): suppliers from one "
    "nation that shipped the final line of a multi-supplier finished "
    "order.  Per-order stats (max shipdate, distinct-supplier count) are "
    "windows over ONE pass of the fact keyed on l_orderkey — no "
    "correlated exists/not-exists rescans of lineitem, and no "
    "aggregate-then-join-back (which re-scanned the fact for the stats "
    "subtree; the join's probe side shuffled by orderkey anyway, so the "
    "window pays the same one clustering shuffle).",
    oracle="""
        WITH order_stats AS (
            SELECT l_orderkey AS so_key,
                   MAX(l_shipdate) AS max_ship,
                   COUNT(DISTINCT l_suppkey) AS n_supp
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT s_name,
               CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS numwait
        FROM lineitem l
        JOIN order_stats ON so_key = l.l_orderkey
        JOIN orders ON o_orderkey = l.l_orderkey
        JOIN supplier ON s_suppkey = l.l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_5'
          AND o_orderstatus = 'F'
          AND n_supp >= 2
          AND l.l_shipdate = max_ship
        GROUP BY s_name
    """,
)
def q21_last_shipper_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    # per-order stats as windows over one lineitem pass (r16): the
    # groupBy+join-back form re-derived the fact scan for the stats
    # subtree (no CSE across the self-join; ReadSchema 5 → 4, Exchange
    # 16 → 10, min 1.331 → 0.621 s at sf0.1, row-identical).
    # size(collect_set()) == countDistinct — windows don't support
    # distinct aggregates directly.
    from pyspark.sql.window import Window

    w = Window.partitionBy("l_orderkey")
    li2 = (
        li.withColumn("max_ship", F.max("l_shipdate").over(w))
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .filter(
            (F.col("n_supp") >= 2)
            & (F.col("l_shipdate") == F.col("max_ship"))
        )
    )
    return (
        li2.join(orders, li2.l_orderkey == orders.o_orderkey)
        .join(supp, li2.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.countDistinct(li2.l_orderkey).cast("bigint").alias("numwait"))
    )
