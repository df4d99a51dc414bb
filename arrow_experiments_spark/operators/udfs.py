"""The declared Arrow-vectorized UDF surface (SURVEY.md §2.6 UDF row):
scalar ``pandas_udf``, grouped-aggregate ``pandas_udf``, and grouped-map
``applyInPandas`` — the reference's whole spirit is Arrow-batch exchange,
so every Python hot path here moves columnar batches, never rows.

Exactness: Python sides compute in integer cents (`floor(value*100)` —
bit-identical to DuckDB on the same IEEE doubles) or single-IEEE-op
normalizations, so the oracle comparison stays bit-exact.  At scale these
run one Arrow batch per task; grouped variants shuffle once on the group
key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from arrow_experiments_spark.registry import register
from arrow_experiments_spark.tables import table


def _cents_udf():
    # defined lazily: pandas_udf parses its return type against the active
    # session, so decorating at import time fails without a SparkContext
    @pandas_udf("bigint")
    def _cents(v: pd.Series) -> pd.Series:
        return pd.Series(np.floor(v.to_numpy() * 100.0)).astype("int64")

    return _cents


@register(
    "udf_pandas_scalar",
    "udf",
    doc="scalar pandas_udf (Arrow-batched, vectorized numpy body): "
    "event value → integer cents; compare to the JVM expression oracle.",
    oracle="""
        SELECT event_id,
               CAST(floor(value * 100) AS BIGINT) AS value_cents
        FROM events
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select(
        "event_id", _cents_udf()(F.col("value")).alias("value_cents")
    )


def _sum_cents_udf():
    @pandas_udf("bigint")
    def _sum_cents(v: pd.Series) -> int:
        return int(np.floor(v.to_numpy() * 100.0).astype("int64").sum())

    return _sum_cents


@register(
    "udf_pandas_grouped_agg",
    "udf",
    doc="grouped-aggregate pandas_udf: per-event-type integer-cents sum; "
    "partial batches aggregated executor-side, one shuffle on the key.",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM events GROUP BY event_type
    """,
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(_sum_cents_udf()(F.col("value")).alias("sum_cents"))
    )


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    v = pdf["value"].to_numpy()
    mn, mx = v.min(), v.max()
    span = mx - mn
    norm = np.where(span > 0, (v - mn) / span, 0.5)
    return pd.DataFrame(
        {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "value_norm": norm}
    )


@register(
    "udf_grouped_map_normalize",
    "udf",
    doc="grouped-map applyInPandas: per-user min-max normalization — the "
    "whole group arrives as one pandas frame (the custom-operator escape "
    "hatch when window functions can't express the body).  Single-IEEE-op "
    "arithmetic keeps it bit-exact vs the window-function oracle.",
    oracle="""
        SELECT event_id, user_id,
               CASE WHEN mx > mn THEN (value - mn) / (mx - mn) ELSE 0.5 END
                   AS value_norm
        FROM (SELECT event_id, user_id, value,
                     MIN(value) OVER (PARTITION BY user_id) AS mn,
                     MAX(value) OVER (PARTITION BY user_id) AS mx
              FROM events)
    """,
)
def udf_grouped_map_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(_normalize, "event_id bigint, user_id bigint, value_norm double")
    )


@register(
    "udf_map_in_arrow",
    "udf",
    doc="mapInArrow (§2.6 UDF row): a zero-copy Arrow-batch transform — "
    "the lowest-overhead Python hook Spark has (no pandas conversion at "
    "all; pyarrow.compute kernels on the exchanged RecordBatch).  "
    "Row-local arithmetic only (floor-cents — bit-identical to the "
    "oracle on the same IEEE doubles — and utf8_upper), so output is "
    "independent of batch geometry and the oracle comparison stays "
    "exact.  At 100 TB this is one Arrow batch per task, zero shuffle.",
    oracle="""
        SELECT event_id,
               CAST(floor(value * 100) AS BIGINT) AS value_cents,
               upper(event_type) AS event_type_uc
        FROM events
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def batches(it):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in it:
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("event_id"),
                    pc.cast(
                        pc.floor(pc.multiply(b.column("value"), 100.0)),
                        pa.int64(),
                    ),
                    pc.utf8_upper(b.column("event_type")),
                ],
                names=["event_id", "value_cents", "event_type_uc"],
            )

    return ev.mapInArrow(
        batches, "event_id bigint, value_cents bigint, event_type_uc string"
    )
