"""Loader robustness: driver testdata physical types have CHANGED between
rounds (events.ts shipped as TIMESTAMP(NANOS), later TIMESTAMP(MICROS));
``tables.table`` must absorb dtype drift instead of erroring deep inside
a query plan."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from arrow_experiments_spark.tables import table
from conftest import SF_DIR


def test_events_ts_normalizes_to_micros_ntz(spark):
    df = table(spark, SF_DIR, "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp_ntz"
    assert df.count() > 0


def test_events_nanos_layout_also_normalizes(spark, tmp_path):
    """Rebuild the pre-round-3 layout (int64 ns under nanosAsLong) and
    check both layouts load to identical values."""
    cur = table(spark, SF_DIR, "events")
    rows = cur.limit(50).collect()
    tbl = pa.Table.from_pylist(
        [
            {
                "event_id": r.event_id,
                "ts": r.ts,
                "user_id": r.user_id,
                "event_type": r.event_type,
                "value": r.value,
                "props": r.props,
            }
            for r in rows
        ]
    )
    ns_type = pa.timestamp("ns")
    tbl = tbl.set_column(
        tbl.schema.get_field_index("ts"),
        pa.field("ts", ns_type),
        tbl.column("ts").cast(ns_type),
    )
    d = tmp_path / "nanos"
    d.mkdir()
    pq.write_table(
        tbl, str(d / "events.parquet"), coerce_timestamps=None,
        store_schema=False, version="2.6",
    )
    got = table(spark, str(d), "events")
    assert got.schema["ts"].dataType.simpleString() == "timestamp_ntz"
    want = {r.event_id: r.ts for r in rows}
    for r in got.collect():
        assert r.ts == want[r.event_id]


@pytest.mark.parametrize(
    "name,col,want",
    [
        ("documents", "doc_id", "bigint"),
        ("embeddings", "embedding", "array<float>"),
        ("embeddings", "label", "int"),
        ("events", "value", "double"),
    ],
)
def test_canonical_dtypes(spark, name, col, want):
    df = table(spark, SF_DIR, name)
    assert df.schema[col].dataType.simpleString() == want


def test_dtype_drift_absorbed(spark, tmp_path):
    """A future testdata drop with widened/narrowed physical types must
    load with canonical engine dtypes."""
    import pandas as pd

    d = tmp_path / "drifted"
    d.mkdir()
    drifted = pa.table(
        {
            "vec_id": pa.array([1, 2], pa.int32()),          # narrowed
            "embedding": pa.array(
                [[1.0, 0.0], [0.0, 1.0]], pa.list_(pa.float64())  # widened
            ),
            "label": pa.array([0, 1], pa.int64()),           # widened
        }
    )
    pq.write_table(drifted, str(d / "embeddings.parquet"))
    got = table(spark, str(d), "embeddings")
    assert got.schema["vec_id"].dataType.simpleString() == "bigint"
    assert got.schema["embedding"].dataType.simpleString() == "array<float>"
    assert got.schema["label"].dataType.simpleString() == "int"
    assert got.count() == 2
