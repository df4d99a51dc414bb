"""Scale techniques as reusable operators: bucketed co-located joins and
salted skew joins (SURVEY.md §7 scale posture; the knobs a 100 TB
deployment actually turns).

Neither changes query *results* — both change the physical plan — so their
tests assert (a) result equivalence against the naive plan and (b) the
plan property itself (no shuffle exchange for bucketed joins; salt-spread
partitions for skew joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_experiments_spark.functions.numeric import dsum
from arrow_experiments_spark.registry import register
from arrow_experiments_spark.tables import table


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist a DataFrame as a bucketed managed table.  Both sides of a
    future equi-join bucketed the same way join WITHOUT a shuffle — the
    co-location is computed once at write time and amortized over every
    downstream join (the standard layout for 100 TB fact tables that are
    repeatedly joined on the same key)."""
    writer = df.write.mode("overwrite").format("parquet")
    writer = writer.bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.  With matching
    bucket specs Catalyst plans a SortMergeJoin whose children read
    pre-bucketed files — zero Exchange operators in the plan."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot fact key over ``n_salts``
    shuffle partitions by appending a random salt to the fact side and
    replicating the (small-ish) dim side once per salt value.

    Equivalent to ``fact.join(dim, key)`` for any data; worth its dim
    replication only when a few keys dominate the fact distribution (AQE's
    skew handling covers sort-merge joins, but salting also works for
    aggregations and pre-AQE engines — and the pattern is the one to reach
    for when a single key exceeds one executor's memory)."""
    fact_cols = fact.columns
    dim_cols = [c for c in dim.columns if c != key]
    salted_fact = fact.withColumn(
        "_salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    salted_dim = dim.select("*", salts)
    joined = salted_fact.join(salted_dim, [key, "_salt"], how)
    return joined.select(*fact_cols, *dim_cols)


@register(
    "join_salted_skew",
    "join",
    doc="skew-resistant salted equi-join (orders fact × customer dim, dim "
    "replicated over 8 salts) rolled up to revenue per market segment. "
    "Salting changes only the physical plan — the oracle is the plain "
    "join — but spreads any hot key over 8 shuffle partitions, the manual "
    "fallback when one key exceeds an executor (AQE skew-join only covers "
    "sort-merge).",
    oracle="""
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(orders, dim, "o_custkey", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )
