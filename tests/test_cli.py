"""CLI smoke test (main_dispatch analog, SURVEY.md §2.5): start the serve
subcommand in a subprocess, fetch the catalog and one dataset, check the
fetch subcommand's metrics line."""

from __future__ import annotations

import subprocess
import sys
import time
import urllib.request

import pytest

from arrow_experiments_spark.transport.client import fetch_arrow

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cli_server():
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "arrow_experiments_spark",
            "serve",
            "--port",
            "0",
            "--sf-dir",
            SF_DIR,
            "--tables",
            "region,nation",
            "--queries",
            "--sql",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd="/root/repo",
    )
    url = None
    deadline = time.time() + 120
    while time.time() < deadline:
        line = proc.stdout.readline()
        if "serving" in line:
            url = line.split("at ", 1)[1].strip()
            break
    assert url, "server did not announce itself"
    yield url
    proc.terminate()
    proc.wait(timeout=30)


def test_cli_serve_catalog_and_dataset(cli_server):
    import json

    with urllib.request.urlopen(f"{cli_server}/catalog") as resp:
        doc = json.loads(resp.read())
    uris = [e["uri"] for e in doc["arrow_stream_files"]]
    assert any(u.endswith("/datasets/region") for u in uris)
    table, metrics = fetch_arrow(
        f"{cli_server}/datasets/region", accept_encoding="identity"
    )
    assert table.num_rows == 5  # TPC-H region is always 5 rows
    assert metrics.batches >= 1


def test_cli_serves_engine_queries(cli_server):
    """--queries exposes every registered engine query as a dataset:
    fetching one runs the Spark plan and streams the Arrow result."""
    table, _ = fetch_arrow(
        f"{cli_server}/datasets/query.q1_pricing_summary",
        accept_encoding="identity",
    )
    assert table.num_rows == 6  # canonical q1 group count on the testdata
    assert "sum_qty" in table.schema.names or table.num_columns >= 4


def test_cli_fetch_prints_metrics(cli_server):
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "arrow_experiments_spark",
            "fetch",
            f"{cli_server}/datasets/nation",
            "--no-collect",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=60,
    )
    assert out.returncode == 0, out.stderr
    assert "record batches received" in out.stdout
    assert "seconds elapsed" in out.stdout


def test_cli_serve_and_fetch_sockets(tmp_path_factory):
    """The socket-transport dissociated pair end-to-end as subprocesses:
    serve-sockets announces its port, fetch-sockets prints the metrics
    contract and the schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path_factory.mktemp("taxi") / "train.parquet")
    pq.write_table(
        pa.table({"a": pa.array(range(20_000), pa.int64())}), path
    )
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "arrow_experiments_spark",
            "serve-sockets",
            "--port",
            "0",
            "--taxi",
            path,
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd="/root/repo",
    )
    try:
        port = None
        deadline = time.time() + 60
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "dissociated socket server at" in line:
                port = int(line.split("at ", 1)[1].split()[0].rsplit(":", 1)[1])
                break
        assert port, "socket server did not announce itself"
        out = subprocess.run(
            [
                sys.executable,
                "-m",
                "arrow_experiments_spark",
                "fetch-sockets",
                "--port",
                str(port),
            ],
            capture_output=True,
            text=True,
            cwd="/root/repo",
            timeout=60,
        )
        assert out.returncode == 0, out.stderr
        assert "record batches received" in out.stdout
        assert "seconds elapsed" in out.stdout
        assert "a: int64" in out.stdout
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_cli_serve_sockets_spark_tables():
    """serve-sockets --tables serves real Spark tables over the
    dissociated socket transport; fetch-sockets retrieves one by ident."""
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "arrow_experiments_spark",
            "serve-sockets",
            "--port",
            "0",
            "--tables",
            "nation",
            "--sf-dir",
            SF_DIR,
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd="/root/repo",
    )
    try:
        port = None
        deadline = time.time() + 120
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "dissociated socket server at" in line:
                port = int(line.split("at ", 1)[1].split()[0].rsplit(":", 1)[1])
                break
        assert port, "socket server did not announce itself"
        out = subprocess.run(
            [
                sys.executable,
                "-m",
                "arrow_experiments_spark",
                "fetch-sockets",
                "--port",
                str(port),
                "--ident",
                "nation",
            ],
            capture_output=True,
            text=True,
            cwd="/root/repo",
            timeout=120,
        )
        assert out.returncode == 0, out.stderr
        assert "record batches received" in out.stdout
        assert "n_nationkey" in out.stdout or "nation" in out.stdout
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_cli_adhoc_sql_query(cli_server):
    """GET /query?sql=... plans ad-hoc SQL through the served Spark
    session and streams the Arrow result."""
    from urllib.parse import quote_plus

    sql = "SELECT n_name FROM nation ORDER BY n_name LIMIT 3"
    table, _ = fetch_arrow(
        f"{cli_server}/query?sql={quote_plus(sql)}", accept_encoding="identity"
    )
    assert table.num_rows == 3
    assert table.column_names == ["n_name"]
    names = table.column("n_name").to_pylist()
    assert names == sorted(names)


def test_cli_adhoc_sql_bad_statement(cli_server):
    import urllib.error
    import urllib.request
    from urllib.parse import quote_plus

    import pytest as _pytest

    with _pytest.raises(urllib.error.HTTPError) as exc_info:
        urllib.request.urlopen(
            f"{cli_server}/query?sql={quote_plus('SELECT nope FROM nowhere')}"
        )
    assert exc_info.value.code == 400
