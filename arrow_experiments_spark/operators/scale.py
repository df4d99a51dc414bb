"""Scale techniques as reusable operators: bucketed co-located joins and
salted skew joins (SURVEY.md §7 scale posture; the knobs a 100 TB
deployment actually turns).

Neither changes query *results* — both change the physical plan — so their
tests assert (a) result equivalence against the naive plan and (b) the
plan property itself (no shuffle exchange for bucketed joins; salt-spread
partitions for skew joins).
"""

from __future__ import annotations

import shutil
from pathlib import Path
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_experiments_spark.functions.numeric import dsum
from arrow_experiments_spark.registry import register
from arrow_experiments_spark.tables import table


def drop_table_and_location(spark: SparkSession, table_name: str) -> None:
    """Drop a managed table AND its orphaned warehouse directory.  A
    killed earlier run can leave the table's location on disk while the
    fresh session's catalog has no such table — then ``DROP TABLE IF
    EXISTS`` is a no-op and the next ``saveAsTable`` raises
    ``LOCATION_ALREADY_EXISTS``.  One leftover directory must never be
    able to fail a rerun.

    The location is cleared only when the table was ABSENT from the
    catalog (a true orphan): when it exists, DROP TABLE already handles
    the location per the table's own type — deleting it for a managed
    table, preserving it for an external one — and an unconditional
    rmtree would violate the external-table contract.  Qualified names
    (``db.table``) resolve to ``<warehouse>/<db>.db/<table>``, which
    this default-database helper does not model — callers use simple
    names; the guard keeps a qualified call safe (drop only, no rmtree).
    """
    existed = spark.catalog.tableExists(table_name)
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    if existed or "." in table_name:
        return
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = Path(urlparse(warehouse).path or warehouse) / table_name.lower()
    if loc.exists() and not _location_in_catalog(spark, loc):
        shutil.rmtree(loc, ignore_errors=True)


def _location_in_catalog(spark: SparkSession, loc: Path) -> bool:
    """ADVICE r15: a directory at ``<warehouse>/<name>`` is not
    necessarily an orphan — it could be the declared LOCATION of a
    *differently-named* external table.  True when any current-database
    table's storage location resolves to ``loc`` (live catalog state:
    must not be rmtree'd; the next ``saveAsTable`` then fails loudly
    with LOCATION_ALREADY_EXISTS, which is correct — the caller's name
    genuinely collides with someone else's storage).  Runs only on the
    already-rare orphan path over the handful of tables a bench session
    registers, so cost is immaterial."""
    target = loc.resolve()
    for t in spark.catalog.listTables():
        try:
            rows = spark.sql(f"DESCRIBE TABLE EXTENDED `{t.name}`").collect()
        except Exception:
            continue  # a table we cannot describe cannot vouch for loc
        for r in rows:
            if r.col_name == "Location" and r.data_type:
                p = Path(urlparse(r.data_type).path or r.data_type)
                if p.resolve() == target:
                    return True
    return False


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
    drop_table_and_location(df.sparkSession, table_name)
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


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 0,
    sort_within: list[str] | None = None,
) -> None:
    """Hive-partitioned parquet write without the files-per-task explosion.

    A naive ``df.write.partitionBy(cols)`` has every task write one file
    into every partition directory it holds rows for — at 1000 tasks ×
    1000 partition values that is up to a million tiny files per write,
    the classic 100 TB output trap.  Repartitioning on the partition
    columns first routes each partition value to one task, so each
    directory gets one file (plus ``maxRecordsPerFile`` splits, which cap
    file size without re-introducing the explosion).  ``sort_within``
    clusters rows inside each file (e.g. by doc_id or timestamp) so
    downstream range scans and parquet row-group statistics prune well.
    """
    routed = df.repartition(*[F.col(c) for c in partition_cols])
    if sort_within:
        routed = routed.sortWithinPartitions(*partition_cols, *sort_within)
    writer = routed.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_cols).parquet(path)


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    roughly ``target_file_bytes``.  Streaming ingest and fine-grained
    partitioned writes both accumulate small files, and at 100 TB the
    file-open overhead (driver listing, footer reads, one scan task per
    tiny file) dominates scan cost long before the data does — periodic
    compaction is standard pipeline hygiene.  The output file count comes
    from the *actual* input bytes, so the same call works at any scale.
    Returns the file count it targeted."""
    import math

    df = spark.read.parquet(in_path)
    total_bytes = sum(
        f.stat().st_size
        for f in __import__("pathlib").Path(in_path).rglob("*.parquet")
    )
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    # repartition (not coalesce): coalesce(1) would also collapse the
    # *read* parallelism of the scan into one task; a shuffle keeps the
    # scan wide and only narrows at the write.
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def zorder_key(a, b, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative int columns, low
    ``bits`` bits each -> one 2*bits-bit sort key.

    Sorting (and then range-partitioning a write) by this key clusters
    rows that are close in BOTH dimensions into the same parquet files,
    so row-group min/max statistics prune scans filtered on *either*
    column.  A lexicographic sort only ever prunes its leading column —
    the classic multi-dimensional data-skipping gap at 100 TB.  Pure
    bitwise column expressions: whole-stage codegen, zero Python.
    """
    a = (F.col(a) if isinstance(a, str) else a).cast("long")
    b = (F.col(b) if isinstance(b, str) else b).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return key


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int = 8
) -> None:
    """Write parquet clustered on the Z-order of (col_a, col_b):
    repartitionByRange on the Morton key routes contiguous key ranges to
    files, sortWithinPartitions orders rows inside each.  Downstream
    filters on either column skip files/row-groups via parquet stats."""
    keyed = df.withColumn("__z", zorder_key(col_a, col_b))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
