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
