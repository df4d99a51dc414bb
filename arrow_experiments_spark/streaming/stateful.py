"""Custom stateful streaming operator: per-user running statistics via
``applyInPandasWithState`` (SURVEY.md §7 Phase 5; the "custom stateful
operators" row of the north-star streaming surface).

Semantics: for every user, maintain (n_events, sum_cents, last_ts_us)
across micro-batches; each micro-batch emits the user's updated running
totals together with a monotone update sequence number.  The final
emission per user therefore equals the batch ``groupBy(user_id)``
aggregate — which is what the DuckDB oracle checks.

Exactness discipline: money-like sums accumulate as integer cents
(``floor(value * 100)`` — floor is bit-identical across numpy and DuckDB
on the same IEEE doubles), timestamps as integer microseconds.  No float
state crosses micro-batch boundaries, so results are independent of
micro-batch count and arrival order within a user.

Scale posture: state is keyed by user_id — shuffle once per micro-batch
on the grouping key, state store partitions scale with
``spark.sql.shuffle.partitions``; per-group state is O(1) (three ints).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

OUTPUT_SCHEMA = (
    "user_id bigint, upd_seq int, n_events bigint, sum_cents bigint, last_ts_us bigint"
)
STATE_SCHEMA = "seq int, n bigint, cents bigint, last_us bigint"


def _update_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    import numpy as np

    seq, n, cents, last_us = state.get if state.exists else (0, 0, 0, 0)
    for pdf in pdfs:
        n += int(len(pdf))
        # vectorized: np.floor on float64 matches math.floor / DuckDB floor
        # bit-for-bit on the same IEEE doubles
        cents += int(
            np.floor(pdf["value"].to_numpy() * 100).astype("int64").sum()
        )
        # Arrow hands pandas datetime64 columns whose unit varies by
        # pandas/pyarrow version (ns historically, us on pandas 2.x):
        # normalize explicitly instead of assuming ns.
        ts_us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        last_us = max(last_us, int(ts_us.max()))
    seq += 1
    state.update((seq, n, cents, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "upd_seq": [seq],
            "n_events": [n],
            "sum_cents": [cents],
            "last_ts_us": [last_us],
        }
    )


def user_running_stats(events: DataFrame) -> DataFrame:
    """Apply the stateful operator to a *streaming* events DataFrame
    (ts timestamp, user_id long, value double)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


class _UserStatsProcessor:
    """Spark 4 ``StatefulProcessor`` form of the same operator —
    ``transformWithStateInPandas`` with a typed ``ValueState`` handle
    (requires the RocksDB state store provider, which is also the 100 TB
    posture: state spills to disk instead of living on the executor
    heap).  Same integer-cents exactness discipline as
    :func:`_update_user_stats`."""

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "stats", "n bigint, cents bigint, last_us bigint"
        )

    def handleInputRows(self, key, rows, timerValues):
        import numpy as np

        got = self._state.get()
        n, cents, last_us = got if got is not None else (0, 0, 0)
        for pdf in rows:
            n += int(len(pdf))
            cents += int(
                np.floor(pdf["value"].to_numpy() * 100).astype("int64").sum()
            )
            ts_us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            last_us = max(last_us, int(ts_us.max()))
        self._state.update((n, cents, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_cents": [cents],
                "last_ts_us": [last_us],
            }
        )

    def close(self) -> None:
        pass


def user_running_stats_tws(events: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` application of the per-user stats
    operator to a streaming DataFrame (ts timestamp, user_id long,
    value double)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass inside the function so importing this module never
    # requires the streaming-state API to exist (older runtimes)
    class UserStatsProcessor(_UserStatsProcessor, StatefulProcessor):
        pass

    proc = UserStatsProcessor()
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType="user_id bigint, n_events bigint, "
        "sum_cents bigint, last_ts_us bigint",
        outputMode="Update",
        timeMode="None",
    )


def run_user_stats(
    spark: SparkSession,
    sf_dir: str,
    n_files: int = 4,
    query_name: str = "stateful_user_stats",
    stage_dir: str | None = None,
    api: str = "applyInPandasWithState",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drive the stateful operator over the events table as a stream and
    return the final per-user state.

    Default path: stream straight off the source parquet (one file per
    trigger) — zero staging copies, so the query body scales with the
    source layout; a partitioned production table yields one micro-batch
    per file.  Pass ``stage_dir`` (a SHARED-storage path on a cluster;
    tests use a tmp dir) to first re-split the table into ``n_files``
    files and exercise true multi-micro-batch state evolution even when
    the source is a single file.  ``max_files_per_trigger`` is the
    operational batch-size knob a production deployment tunes (r16): on
    a directory-layout table it trades per-trigger fixed cost (state
    store load/commit per partition) against batch memory — the decade
    sweep uses it to separate volume scaling from trigger-count scaling.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from arrow_experiments_spark.tables import events_stream, table

    def project(df: DataFrame) -> DataFrame:
        return df.select(
            F.col("ts").cast("timestamp").alias("ts"), "user_id", "value"
        )

    if stage_dir is None:
        stream = project(
            events_stream(spark, sf_dir, max_files_per_trigger)
        )
    else:
        src = project(table(spark, sf_dir, "events"))
        src.repartition(n_files).write.mode("overwrite").parquet(stage_dir)
        stream = (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(stage_dir)
        )
    if api == "transformWithState":
        # transformWithState requires the RocksDB state store provider
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        out = user_running_stats_tws(stream)
    else:
        out = user_running_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    emissions = spark.table(query_name)
    if api == "transformWithState":
        # n_events is monotone per user: the max-count row is final state
        order = F.desc("n_events")
    else:
        order = F.desc("upd_seq")
    w = Window.partitionBy("user_id").orderBy(order)
    return (
        emissions.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "sum_cents", "last_ts_us")
    )


def user_stats_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalent plan of the stateful operator (same integer-cents
    semantics, pure built-ins).  Streaming plans don't explain() like
    batch ones, so this is the shape the plan audit checks: one shuffle
    on user_id with partial aggregation below it — exactly the state
    store's partitioning in the streaming form."""
    from pyspark.sql import functions as F

    from arrow_experiments_spark.tables import table

    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("sum_cents"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("last_ts_us"),
    )


ORACLE_SQL = """
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           epoch_us(MAX(CAST(ts AS TIMESTAMP))) AS last_ts_us
    FROM events GROUP BY user_id
"""

# ---- query-registry entry -------------------------------------------------

from arrow_experiments_spark.registry import register  # noqa: E402


@register(
    "stateful_user_stats",
    "events",
    doc="custom stateful streaming operator (applyInPandasWithState): "
    "per-user running count / integer-cents sum / last-event time across "
    "micro-batches; final state oracle-checked against batch groupBy.",
    oracle=ORACLE_SQL,
)
def stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_user_stats(spark, sf_dir)


def tws_available() -> bool:
    """transformWithStateInPandas drives its state protocol over protobuf
    (a standard pyspark extra, present on real clusters); this container
    ships a broken google.protobuf, so the TWS form is registered only
    where it can actually run — the applyInPandasWithState form above is
    the always-available operator."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stateful_user_stats_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_user_stats(
        spark, sf_dir, query_name="stateful_user_stats_tws",
        api="transformWithState",
    )


if tws_available():  # pragma: no cover — container lacks protobuf
    register(
        "stateful_user_stats_tws",
        "events",
        doc="Spark 4 transformWithStateInPandas form of the stateful "
        "operator (StatefulProcessor + typed ValueState on the RocksDB "
        "state store — the disk-backed state posture for 100 TB); same "
        "oracle as the applyInPandasWithState form.",
        oracle=ORACLE_SQL,
    )(stateful_user_stats_tws)
