"""Loaders for the driver's testdata star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under ``{sf_dir}/{name}.parquet``.

The only schema quirk: ``events.ts`` is parquet TIMESTAMP(NANOS), which
Spark's vectorized reader rejects.  We read it via the
``spark.sql.legacy.parquet.nanosAsLong`` conf (runtime-settable, so it also
works on a driver-owned session) and rebuild a microsecond
``timestamp_ntz`` with timezone-independent arithmetic.  The testdata's ns
values are whole microseconds, so the ``div 1000`` is lossless (mirrors the
SURVEY.md §1.2 row 15 ns→µs decision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # ts arrives as LongType (ns since epoch); rebuild µs timestamp_ntz
        # without consulting the session timezone.
        return df.withColumn(
            "ts", F.expr(f"timestampadd(MICROSECOND, ts div 1000, {_EPOCH_NTZ})")
        )
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
