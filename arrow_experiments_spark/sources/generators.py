"""Deterministic data generators reproducing the reference's three fixture
workloads (SURVEY.md §2.1 gen_flight_bench / gen_many_types / gen_trading)
— same schema, size, shape, and value distributions, Spark-first where the
data is big and distributed generation matters.

The functional-equivalence rule these implement: "equivalent data with the
same schema, size, shape, and distribution of values"
(http/get_simple/README.md:36).
"""

from __future__ import annotations

import decimal
import random
import string

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---- flight benchmark: 100M × 4 int64 (get_simple server.py:33-57) --------

FLIGHT_BENCH_ROWS = 100_000_000
FLIGHT_BENCH_BATCH = 4096


def gen_flight_bench(
    spark: SparkSession, rows: int = FLIGHT_BENCH_ROWS, seed: int = 42
) -> DataFrame:
    """4 columns a,b,c,d of uniform random int64 — generated distributed
    (spark.range is split across executors; no driver materialization).
    Batch sizing to 4096 rows happens at the Arrow egress boundary via
    maxRecordsPerBatch / to_batches."""
    df = spark.range(rows)
    cols = [
        ((F.rand(seed + i) - 0.5) * F.lit(float(2**64))).cast("long").alias(c)
        for i, c in enumerate("abcd")
    ]
    return df.select(*cols)


# ---- trading data: 42M rows ticker/price/volume (get_compressed) ----------

TRADING_ROWS = 42_000_000
TRADING_BATCH = 6144


def gen_tickers(n: int = 60, seed: int = 42) -> list[str]:
    """n unique random 3-4 char uppercase tickers
    (get_compressed server.py:40-47 shape)."""
    rng = random.Random(seed)
    out: set[str] = set()
    while len(out) < n:
        out.add(
            "".join(rng.choice(string.ascii_uppercase) for _ in range(rng.randint(3, 4)))
        )
    return sorted(out)


def gen_trading(
    spark: SparkSession,
    rows: int = TRADING_ROWS,
    n_tickers: int = 60,
    seed: int = 42,
) -> DataFrame:
    """ticker (low-cardinality string), price (int64 cents), volume (int64).
    The ticker dim is broadcast via a literal array lookup — no shuffle."""
    tickers = gen_tickers(n_tickers, seed)
    arr = F.array(*[F.lit(t) for t in tickers])
    df = spark.range(rows)
    return df.select(
        F.element_at(arr, (F.rand(seed) * n_tickers).cast("int") + 1).alias("ticker"),
        (F.rand(seed + 1) * 100_000).cast("long").alias("price"),
        (F.rand(seed + 2) * 10_000).cast("long").alias("volume"),
    )


def gen_ticker_descriptions(tickers: list[str], seed: int = 42) -> list[dict]:
    """JSON side-table: ticker → random word description
    (get_multipart server.py:51-63 shape)."""
    rng = random.Random(seed)
    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "theta", "kappa"]
    return [
        {"ticker": t, "description": " ".join(rng.choice(words) for _ in range(3))}
        for t in tickers
    ]


# ---- 21-type fixture (rand-many-types generate.py semantics) --------------

MANY_TYPES_BATCHES = 100
MANY_TYPES_ROWS_PER_BATCH = 1000


def many_types_schema() -> pa.Schema:
    """The authoritative 21-type surface (SURVEY.md §1.2)."""
    return pa.schema(
        [
            ("col_0", pa.int8()),
            ("col_1", pa.int16()),
            ("col_2", pa.int32()),
            ("col_3", pa.int64()),
            ("col_4", pa.uint8()),
            ("col_5", pa.uint16()),
            ("col_6", pa.uint32()),
            ("col_7", pa.uint64()),
            ("col_8", pa.float32()),
            ("col_9", pa.float64()),
            ("col_10", pa.string()),
            ("col_11", pa.binary(8)),
            ("col_12", pa.bool_()),
            ("col_13", pa.date32()),
            ("col_14", pa.date64()),
            ("col_15", pa.timestamp("ns")),
            ("col_16", pa.decimal128(10, 2)),
            ("col_17", pa.list_(pa.int32())),
            (
                "col_18",
                pa.struct([("field1", pa.int32()), ("field2", pa.float64())]),
            ),
            ("col_19", pa.dictionary(pa.int32(), pa.string())),
            ("col_20", pa.null()),
        ]
    )


def _gen_batch(rng: np.random.Generator, n: int) -> pa.RecordBatch:
    alnum = np.array(list(string.ascii_letters + string.digits))
    strings = ["".join(rng.choice(alnum, 8)) for _ in range(n)]
    dict_keys = [f"key_{i}" for i in range(32)]
    day_ms = 86_400_000
    arrays = [
        pa.array(rng.integers(-(2**7), 2**7, n, dtype=np.int8), pa.int8()),
        pa.array(rng.integers(-(2**15), 2**15, n, dtype=np.int16), pa.int16()),
        pa.array(rng.integers(-(2**31), 2**31, n, dtype=np.int32), pa.int32()),
        pa.array(rng.integers(-(2**63), 2**63, n, dtype=np.int64), pa.int64()),
        pa.array(rng.integers(0, 2**8, n, dtype=np.uint8), pa.uint8()),
        pa.array(rng.integers(0, 2**16, n, dtype=np.uint16), pa.uint16()),
        pa.array(rng.integers(0, 2**32, n, dtype=np.uint32), pa.uint32()),
        pa.array(rng.integers(0, 2**64, n, dtype=np.uint64), pa.uint64()),
        pa.array(rng.random(n, dtype=np.float32), pa.float32()),
        pa.array(rng.random(n, dtype=np.float64), pa.float64()),
        pa.array(strings, pa.string()),
        pa.array([rng.bytes(8) for _ in range(n)], pa.binary(8)),
        pa.array(rng.integers(0, 2, n).astype(bool), pa.bool_()),
        pa.array(rng.integers(0, 10_000, n, dtype=np.int32), pa.date32()),
        pa.array(rng.integers(0, 10_000, n, dtype=np.int64) * day_ms, pa.date64()),
        pa.array(
            np.datetime64("2016-01-01", "ns")
            + rng.integers(0, 10_000, n) * np.timedelta64(1, "s"),
            pa.timestamp("ns"),
        ),
        pa.array(
            [
                decimal.Decimal(int(rng.integers(0, 10**10))) / 100
                for _ in range(n)
            ],
            pa.decimal128(10, 2),
        ),
        pa.array(
            [rng.integers(-100, 100, 3).tolist() for _ in range(n)],
            pa.list_(pa.int32()),
        ),
        pa.array(
            [
                {"field1": int(rng.integers(-100, 100)), "field2": float(rng.random())}
                for _ in range(n)
            ],
            pa.struct([("field1", pa.int32()), ("field2", pa.float64())]),
        ),
        pa.DictionaryArray.from_arrays(
            pa.array(rng.integers(0, len(dict_keys), n, dtype=np.int32)),
            pa.array(dict_keys),
        ),
        pa.nulls(n, pa.null()),
    ]
    return pa.RecordBatch.from_arrays(arrays, schema=many_types_schema())


def gen_many_types(
    seed: int = 12345,
    batches: int = MANY_TYPES_BATCHES,
    rows_per_batch: int = MANY_TYPES_ROWS_PER_BATCH,
) -> pa.RecordBatchReader:
    """Seeded 21-type fixture: 100 batches × 1000 rows (generate.py:166-182
    shape — seed 12345, same schema/size/batching; fresh implementation)."""
    rng = np.random.default_rng(seed)

    def it():
        for _ in range(batches):
            yield _gen_batch(rng, rows_per_batch)

    return pa.RecordBatchReader.from_batches(many_types_schema(), it())


# ---- taxi-data fixture (dissociated-ipc serving scenario) -----------------
#
# The reference's dissociated-ipc example serves data/taxi-data/
# train.parquet (38,521,857 bytes per its LFS pointer — the file itself is
# an LFS stub, not in the tree), loaded through a chunked parquet reader
# with a 1 MiB chunk limit (dissociated-ipc/cudf-flight-server.cc:68-93).
# The honest substitute is a synthesized same-shape parquet: the NYC TLC
# yellow-trip schema the README names, at a row count that lands the
# snappy-compressed file at the pointer's size.

TAXI_ROWS = 1_500_000  # ≈38.5 MB snappy parquet (tuned, test asserts ±15%)


def gen_taxi(spark: SparkSession, rows: int = TAXI_ROWS, seed: int = 7) -> DataFrame:
    """NYC yellow-taxi trip records, generated distributed: 17 columns of
    the TLC yellow tripdata schema with plausible value distributions.
    Deterministic (seeded F.rand) so the fixture is reproducible."""
    df = spark.range(rows)
    pickup = (
        F.lit("2015-01-01 00:00:00").cast("timestamp_ntz")
        + F.make_dt_interval(secs=(F.rand(seed) * 2_592_000).cast("long"))
    )
    duration = (F.rand(seed + 1) * 3600 + 60).cast("long")
    dist = F.round(F.rand(seed + 2) * 15 + 0.3, 2)
    fare = F.round(F.col("trip_distance") * 2.5 + 2.5, 2)
    tip = F.round(F.col("fare_amount") * F.rand(seed + 3) * 0.3, 2)
    return (
        df.select(
            (F.rand(seed + 4) * 2 + 1).cast("int").alias("vendor_id"),
            pickup.alias("tpep_pickup_datetime"),
            (pickup + F.make_dt_interval(secs=duration)).alias(
                "tpep_dropoff_datetime"
            ),
            (F.rand(seed + 5) * 6 + 1).cast("int").alias("passenger_count"),
            dist.alias("trip_distance"),
            (F.rand(seed + 6) * 6 + 1).cast("int").alias("rate_code_id"),
            F.when(F.rand(seed + 7) < 0.01, "Y").otherwise("N").alias(
                "store_and_fwd_flag"
            ),
            (F.rand(seed + 8) * 265 + 1).cast("int").alias("pu_location_id"),
            (F.rand(seed + 9) * 265 + 1).cast("int").alias("do_location_id"),
            (F.rand(seed + 10) * 4 + 1).cast("int").alias("payment_type"),
        )
        .withColumn("fare_amount", fare)
        .withColumn("extra", F.round(F.rand(seed + 11) * 1.0, 2))
        .withColumn("mta_tax", F.lit(0.5))
        .withColumn("tip_amount", tip)
        .withColumn(
            "tolls_amount",
            F.round(
                F.when(F.rand(seed + 12) < 0.05, 5.54).otherwise(0.0), 2
            ),
        )
        .withColumn("improvement_surcharge", F.lit(0.3))
        .withColumn(
            "total_amount",
            F.round(
                F.col("fare_amount")
                + F.col("extra")
                + F.col("mta_tax")
                + F.col("tip_amount")
                + F.col("tolls_amount")
                + F.col("improvement_surcharge"),
                2,
            ),
        )
    )
