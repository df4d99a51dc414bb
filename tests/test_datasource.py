"""The "arrows" Python DataSource (sources/datasource.py): local files,
HTTP streams, multi-URI parallel ingest, catalog (get_indirect) fan-out,
and the 21-type widening path."""

from __future__ import annotations

import io

import pyarrow as pa
import pytest
from pyarrow import ipc

from arrow_experiments_spark.sources.datasource import register_arrows_source
from arrow_experiments_spark.sources.generators import gen_many_types
from arrow_experiments_spark.transport.server import DatasetRegistry, serve


@pytest.fixture(scope="module")
def small_table() -> pa.Table:
    n = 5_000
    return pa.table(
        {
            "a": pa.array(range(n), pa.int64()),
            "b": pa.array([i * 3 for i in range(n)], pa.int64()),
            "s": pa.array([f"r{i}" for i in range(n)]),
        }
    )


def _stream_bytes(table: pa.Table, chunk: int = 1000) -> bytes:
    sink = io.BytesIO()
    with ipc.new_stream(sink, table.schema) as w:
        for b in table.to_batches(max_chunksize=chunk):
            w.write_batch(b)
    return sink.getvalue()


@pytest.fixture(scope="module")
def server(small_table):
    registry = DatasetRegistry()
    registry.register_file("part1.arrows", _stream_bytes(small_table.slice(0, 2500)))
    registry.register_file("part2.arrows", _stream_bytes(small_table.slice(2500)))
    httpd = serve(registry)
    host, port = httpd.server_address
    yield f"http://{host}:{port}"
    httpd.shutdown()


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_arrows_source(spark)


def test_local_file(spark, small_table, tmp_path_factory):
    p = tmp_path_factory.mktemp("ds") / "t.arrows"
    p.write_bytes(_stream_bytes(small_table))
    df = spark.read.format("arrows").load(str(p))
    assert df.count() == small_table.num_rows
    assert df.columns == ["a", "b", "s"]
    assert df.agg({"b": "sum"}).collect()[0][0] == sum(range(5000)) * 3


def test_http_single_url(spark, server, small_table):
    df = (
        spark.read.format("arrows")
        .option("urls", f"{server}/files/part1.arrows")
        .load()
    )
    assert df.count() == 2500


def test_http_multi_url_parallel(spark, server, small_table):
    df = (
        spark.read.format("arrows")
        .option(
            "urls",
            f"{server}/files/part1.arrows,{server}/files/part2.arrows",
        )
        .load()
    )
    # one Spark partition per URI (the get_indirect parallel-fetch shape)
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == small_table.num_rows
    got = {r["a"] for r in df.select("a").collect()}
    assert got == set(range(5000))


def test_catalog_fanout(spark, server, small_table):
    df = (
        spark.read.format("arrows")
        .option("catalog_url", f"{server}/catalog")
        .load()
    )
    assert df.count() == small_table.num_rows
    assert df.rdd.getNumPartitions() == 2


def test_many_types_widening(spark, tmp_path_factory):
    """21-type fixture round-trips through the source with sidecar
    widening (unsigned → wider ints, ns → µs, dictionary → values)."""
    reader = gen_many_types(batches=3, rows_per_batch=100)
    sink = io.BytesIO()
    with ipc.new_stream(sink, reader.schema) as w:
        for b in reader:
            w.write_batch(b)
    p = tmp_path_factory.mktemp("ds21") / "many.arrows"
    p.write_bytes(sink.getvalue())

    df = spark.read.format("arrows").load(str(p))
    assert df.count() == 300
    dtypes = dict(df.dtypes)
    assert dtypes["col_4"] == "smallint"  # uint8 widened
    assert dtypes["col_7"] == "decimal(20,0)"  # uint64 widened
    assert dtypes["col_19"] == "string"  # dictionary decoded
    # values survive: col_3 is int64 passthrough
    assert df.select("col_3").distinct().count() > 1


def test_server_side_projection_pushdown(spark, small_table):
    """columns/limit options ride the URI so the SERVER prunes before any
    bytes cross the wire; schema inference sees the projected schema."""
    registry = DatasetRegistry()
    registry.register_table("part", small_table)
    httpd = serve(registry)
    host, port = httpd.server_address
    try:
        df = (
            spark.read.format("arrows")
            .option("urls", f"http://{host}:{port}/datasets/part")
            .option("columns", "a,s")
            .option("limit", "100")
            .load()
        )
        assert df.columns == ["a", "s"]
        rows = df.collect()
        assert len(rows) == 100
        assert [r.a for r in rows] == list(range(100))
    finally:
        httpd.shutdown()


def _file_bytes(table: pa.Table, chunk: int = 1000) -> bytes:
    sink = io.BytesIO()
    with ipc.new_file(sink, table.schema) as w:
        for b in table.to_batches(max_chunksize=chunk):
            w.write_batch(b)
    return sink.getvalue()


def test_ipc_file_local_splits(spark, small_table, tmp_path_factory):
    """IPC file format splits into block-range partitions."""
    p = tmp_path_factory.mktemp("dsf") / "t.arrow"
    p.write_bytes(_file_bytes(small_table))  # 5 blocks of 1000 rows
    df = spark.read.format("arrows").option("file_splits", "3").load(str(p))
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == small_table.num_rows
    assert df.agg({"b": "sum"}).collect()[0][0] == sum(range(5000)) * 3


def test_ipc_file_http_range_partitioned(spark, small_table):
    """Each task range-reads only its blocks of ONE remote .arrow file —
    distributed HTTP ingest of a single artifact (get_range as splits)."""
    registry = DatasetRegistry()
    registry.register_file("whole.arrow", _file_bytes(small_table))
    httpd = serve(registry)
    host, port = httpd.server_address
    try:
        df = (
            spark.read.format("arrows")
            .option("urls", f"http://{host}:{port}/files/whole.arrow")
            .option("file_splits", "5")
            .load()
        )
        assert df.rdd.getNumPartitions() == 5
        assert df.count() == small_table.num_rows
        got = df.orderBy("a").toPandas()
        assert list(got["a"]) == list(range(5000))
    finally:
        httpd.shutdown()
