"""Round-trip property tests (SURVEY.md §5 items 1-2): the 21-type fixture
through Spark and back via the sidecar; cross-format golden mirrors via the
conversion pipeline; generator determinism."""

from __future__ import annotations

import io

import duckdb
import pyarrow as pa
import pyarrow.ipc as ipc
import pytest

from arrow_experiments_spark.sources.arrow_ipc import (
    arrows_to_arrow_file,
    arrows_to_parquet,
    parquet_to_duckdb,
    read_ipc_stream,
    read_ipc_streams_parallel,
    write_ipc_stream,
)
from arrow_experiments_spark.sources.generators import (
    gen_flight_bench,
    gen_many_types,
    gen_tickers,
    gen_trading,
    many_types_schema,
)
from arrow_experiments_spark.sources.sidecar import (
    build_sidecar,
    restore_from_sidecar,
    widen_for_spark,
)


@pytest.fixture(scope="module")
def fixture_table() -> pa.Table:
    return gen_many_types(batches=5, rows_per_batch=200).read_all()


def test_many_types_schema_is_21_wide(fixture_table):
    assert len(fixture_table.schema) == 21
    assert fixture_table.schema.equals(many_types_schema())
    assert fixture_table.num_rows == 1000


def test_generator_deterministic():
    a = gen_many_types(batches=2, rows_per_batch=100).read_all()
    b = gen_many_types(batches=2, rows_per_batch=100).read_all()
    assert a.equals(b)


def test_sidecar_restores_exact_schema(fixture_table):
    widened, sidecar = widen_for_spark(fixture_table)
    # widened table has no types Spark can't hold
    for f in widened.schema:
        assert not pa.types.is_unsigned_integer(f.type)
        assert not pa.types.is_dictionary(f.type)
    restored = restore_from_sidecar(widened, sidecar)
    assert restored.schema.equals(fixture_table.schema), (
        f"{restored.schema}\n!=\n{fixture_table.schema}"
    )
    # value fidelity for everything except dictionary indices (re-encoded;
    # logical values must still match)
    for name in [f.name for f in fixture_table.schema]:
        orig, back = fixture_table.column(name), restored.column(name)
        if pa.types.is_dictionary(orig.type):
            assert orig.combine_chunks().dictionary_decode().equals(
                back.combine_chunks().dictionary_decode()
            )
        else:
            assert orig.equals(back), f"column {name} mismatch"


def test_spark_roundtrip_21_types(spark, fixture_table, tmp_path):
    """Fixture → widen → Spark DataFrame → Arrow → restore → equal.
    (The R identical() round-trip pattern, arrow-commits.R:66.)"""
    widened, sidecar = widen_for_spark(fixture_table)
    df = spark.createDataFrame(widened)
    back = df.toArrow()
    # Spark normalizes some physical details; compare restored values
    restored = restore_from_sidecar(back, sidecar)
    assert restored.schema.equals(fixture_table.schema)
    for name in ["col_0", "col_3", "col_7", "col_10", "col_16", "col_17"]:
        orig = fixture_table.column(name).combine_chunks()
        got = restored.column(name).combine_chunks()
        # row order is preserved by createDataFrame(pa.Table) on local data
        assert orig.equals(got), f"column {name} value drift"


def test_cross_format_golden(spark, tmp_path):
    """Same data as .arrows/.arrow/.parquet/.duckdb must agree
    (rand-many-types Makefile pattern)."""
    df = gen_flight_bench(spark, rows=10_000)
    arrows = str(tmp_path / "g.arrows")
    n = write_ipc_stream(df, arrows)
    assert n == 10_000
    arrow_f = str(tmp_path / "g.arrow")
    parquet_f = str(tmp_path / "g.parquet")
    duck_f = str(tmp_path / "g.duckdb")
    arrows_to_arrow_file(arrows, arrow_f)
    arrows_to_parquet(arrows, parquet_f)
    parquet_to_duckdb(parquet_f, duck_f, "random")

    t_stream = ipc.open_stream(open(arrows, "rb")).read_all()
    t_file = ipc.open_file(open(arrow_f, "rb")).read_all()
    assert t_stream.equals(t_file)
    con = duckdb.connect(duck_f)
    agg = "SELECT count(*) n, sum(a) sa, sum(b) sb, sum(c) sc, sum(d) sd FROM "
    got = con.execute(agg + "random").fetchone()
    want = duckdb.sql(agg + f"read_parquet('{parquet_f}')").fetchone()
    assert got == want
    con.close()


def test_ipc_stream_spark_roundtrip(spark, tmp_path):
    df = gen_trading(spark, rows=5000, n_tickers=10)
    path = str(tmp_path / "t.arrows")
    write_ipc_stream(df, path)
    back = read_ipc_stream(spark, path)
    assert back.count() == 5000
    assert set(back.columns) == {"ticker", "price", "volume"}
    assert back.selectExpr("count(distinct ticker) n").first()["n"] <= 10


def test_parallel_stream_ingest(spark, tmp_path):
    paths = []
    for i in range(3):
        df = gen_flight_bench(spark, rows=1000, seed=i)
        p = str(tmp_path / f"part{i}.arrows")
        write_ipc_stream(df, p)
        paths.append(p)
    merged = read_ipc_streams_parallel(spark, paths)
    assert merged.count() == 3000
    assert merged.rdd.getNumPartitions() == 3  # one task per stream


def test_tickers_deterministic_and_unique():
    t1, t2 = gen_tickers(60, 42), gen_tickers(60, 42)
    assert t1 == t2
    assert len(set(t1)) == 60
    assert all(3 <= len(t) <= 4 and t.isupper() for t in t1)
