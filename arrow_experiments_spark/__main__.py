"""CLI entry point — the engine's main_dispatch analog (reference
dissociated-ipc/cudf-flight-ucx.cc:25-39 selects server vs client with
-port/-address/-client flags; here subcommands do the same job).

  python -m arrow_experiments_spark serve --port 8008 --sf-dir DIR
      Serve the testdata tables (and any registered query by name) as
      Arrow-over-HTTP datasets: negotiated compression, multipart,
      catalog, describe, range-served artifacts, POST ingest.

  python -m arrow_experiments_spark fetch URL
      One-shot client: stream-decode a dataset and print the metrics
      contract (batches + seconds, get_simple/README.md:37).

  python -m arrow_experiments_spark pipeline --out DIR
      The make-pipeline (reference data/rand-many-types/Makefile:18-33):
      21-type fixture → .arrows → {.arrow, .parquet} → {.duckdb, .sqlite3}.

  python -m arrow_experiments_spark commits --repo PATH --out DIR
      The arrow-commits fixture builder (data/arrow-commits):
      git log → drop author / UTC / first-line → .arrows + JSONL mirror.
"""

from __future__ import annotations

import argparse
import sys


def _cmd_serve(args: argparse.Namespace) -> int:
    from arrow_experiments_spark.session import build_session
    from arrow_experiments_spark.sources.arrow_ipc import register_dataframe
    from arrow_experiments_spark.tables import TABLE_NAMES, table
    from arrow_experiments_spark.transport.server import DatasetRegistry, serve

    spark = build_session(app_name="arrow-experiments-serve")
    spark.sparkContext.setLogLevel("ERROR")
    registry = DatasetRegistry()
    names = args.tables.split(",") if args.tables else list(TABLE_NAMES)
    for name in names:
        df = table(spark, args.sf_dir, name)
        # each request re-runs the (lazy) scan through the bounded-memory
        # spill reader; pre-materialization is the client's choice
        register_dataframe(registry, name, df, batch_rows=args.batch_rows)
    if args.taxi:
        from arrow_experiments_spark.sources.arrow_ipc import (
            register_parquet_chunked,
        )

        # the reference's dissociated serving scenario: a taxi-data
        # parquet read in ~1 MiB chunks, exposed at
        # /datasets/train.parquet/{describe,meta,body}
        register_parquet_chunked(registry, "train.parquet", args.taxi)
    n_queries = 0
    if args.queries:
        from arrow_experiments_spark.registry import all_queries
        from arrow_experiments_spark.sources.arrow_ipc import df_to_reader

        # every registered engine query as a dataset: GET /datasets/query.NAME
        # builds and streams the result on request (lazy — iterative
        # queries run their rounds only when asked for)
        def q_factory(q, sf_dir=args.sf_dir, batch_rows=args.batch_rows):
            return lambda: df_to_reader(q.build(spark, sf_dir), batch_rows)

        for qname, q in all_queries().items():
            # no schema hint: computing it would build every plan (and run
            # the iterative ones) at startup — /describe on a query
            # dataset executes it, which is the documented tradeoff
            registry.register(
                f"query.{qname}", q_factory(q), meta={"category": q.category}
            )
            n_queries += 1
    sql_runner = None
    if args.sql:
        from arrow_experiments_spark.sources.arrow_ipc import df_to_reader

        # ad-hoc SQL entry point: testdata tables become temp views and
        # GET /query?sql=... plans through Catalyst (SURVEY.md §7 Phase 1)
        for name in names:
            table(spark, args.sf_dir, name).createOrReplaceTempView(name)
        sql_runner = lambda sql: df_to_reader(spark.sql(sql))  # noqa: E731
    if args.asgi:
        # FastAPI/uvicorn posture (reference fastapi_uvicorn/server.py):
        # same registry, same negotiation, ASGI transport.  Blocks.
        from arrow_experiments_spark.transport.asgi import serve_asgi

        print(f"serving {len(names)} datasets (ASGI) at "
              f"http://{args.host}:{args.port}", flush=True)
        serve_asgi(registry, host=args.host, port=args.port, cors=args.cors,
                   sql_runner=sql_runner)
        spark.stop()
        return 0
    httpd = serve(registry, host=args.host, port=args.port, cors=args.cors,
                  sql_runner=sql_runner)
    host, port = httpd.server_address
    print(
        f"serving {len(names)} datasets + {n_queries} queries "
        f"at http://{host}:{port}",
        flush=True,
    )
    print(f"  catalog: http://{host}:{port}/catalog", flush=True)
    # serve() runs the accept loop on a daemon thread; block until ^C
    import time

    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    httpd.shutdown()
    spark.stop()
    return 0


def _cmd_fetch(args: argparse.Namespace) -> int:
    from arrow_experiments_spark.transport.client import fetch_arrow

    table, metrics = fetch_arrow(
        args.url,
        accept_encoding=args.accept_encoding,
        close_connection=args.close_connection,
        collect_table=not args.no_collect,
    )
    print(metrics.summary())
    if table is not None:
        print(table.schema)
    return 0


def _cmd_pipeline(args: argparse.Namespace) -> int:
    from arrow_experiments_spark.session import build_session
    from arrow_experiments_spark.sources.arrow_ipc import run_pipeline
    from arrow_experiments_spark.sources.generators import gen_many_types
    from arrow_experiments_spark.sources.sidecar import widen_for_spark

    spark = build_session(app_name="arrow-experiments-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    fixture = gen_many_types(
        seed=args.seed, batches=args.batches, rows_per_batch=args.rows_per_batch
    ).read_all()
    widened, _sidecar = widen_for_spark(fixture)
    df = spark.createDataFrame(widened)
    artifacts = run_pipeline(df, args.out, stem=args.stem)
    for kind, path in artifacts.items():
        print(f"{kind}: {path or '(skipped)'}")
    spark.stop()
    return 0


def _cmd_commits(args: argparse.Namespace) -> int:
    from arrow_experiments_spark.session import build_session
    from arrow_experiments_spark.sources.commits import (
        build_commits_table,
        write_commits_fixture,
    )

    spark = build_session(app_name="arrow-experiments-commits")
    spark.sparkContext.setLogLevel("ERROR")
    df = build_commits_table(spark, args.repo)
    out = write_commits_fixture(df, args.out)
    print(f"rows: {out['rows']}")
    print(f"arrows: {out['arrows']}")
    print(f"jsonl: {out['jsonl']}")
    spark.stop()
    return 0


def _cmd_serve_sockets(args: argparse.Namespace) -> int:
    """Dissociated protocol over the raw-socket transport (the UCX-analog
    data plane, transport/sockets.py) — the closest CPU shape to the
    reference's cudf-flight server.  Serves any mix of the taxi parquet
    scenario, the testdata tables, and registered engine queries: every
    dataset the HTTP form exposes is reachable over this data plane too."""
    from arrow_experiments_spark.transport.server import DatasetRegistry
    from arrow_experiments_spark.transport.sockets import DissociatedSocketServer

    registry = DatasetRegistry()
    served: list[str] = []
    if args.taxi:
        from arrow_experiments_spark.sources.arrow_ipc import (
            register_parquet_chunked,
        )

        register_parquet_chunked(registry, "train.parquet", args.taxi)
        served.append("train.parquet")
    if args.tables or args.queries:
        from arrow_experiments_spark.session import build_session
        from arrow_experiments_spark.sources.arrow_ipc import (
            df_to_reader,
            register_dataframe,
        )
        from arrow_experiments_spark.tables import TABLE_NAMES, table

        spark = build_session(app_name="arrow-experiments-serve-sockets")
        spark.sparkContext.setLogLevel("ERROR")
        if args.tables:
            names = (
                list(TABLE_NAMES)
                if args.tables == "all"
                else args.tables.split(",")
            )
            for name in names:
                register_dataframe(
                    registry, name, table(spark, args.sf_dir, name)
                )
                served.append(name)
        if args.queries:
            from arrow_experiments_spark.registry import all_queries

            def q_factory(q, sf_dir=args.sf_dir):
                return lambda: df_to_reader(q.build(spark, sf_dir))

            for qname, q in all_queries().items():
                registry.register(f"query.{qname}", q_factory(q))
            served.append(f"{len(all_queries())} queries")
    if not served:
        print("nothing to serve: pass --taxi, --tables and/or --queries")
        return 2
    server = DissociatedSocketServer(registry)
    host, port = server.init(host=args.host, port=args.port)
    print(
        f"dissociated socket server at {host}:{port} ({', '.join(served)})",
        flush=True,
    )
    import time

    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    server.shutdown()
    return 0


def _cmd_fetch_sockets(args: argparse.Namespace) -> int:
    import time

    from arrow_experiments_spark.transport.sockets import fetch_dissociated_sockets

    t0 = time.perf_counter()
    batches = 0

    def count(_b) -> None:
        nonlocal batches
        batches += 1

    tbl = fetch_dissociated_sockets(
        args.host, args.port, args.ident, batch_callback=count
    )
    # the reference's client metrics contract (get_simple/README.md:37)
    print(f"{batches} record batches received")
    print(f"{time.perf_counter() - t0:.2f} seconds elapsed")
    print(tbl.schema)
    return 0


def _cmd_gen_taxi(args: argparse.Namespace) -> int:
    import os

    import pyarrow.parquet as pq

    from arrow_experiments_spark.session import build_session
    from arrow_experiments_spark.sources.generators import TAXI_ROWS, gen_taxi

    spark = build_session(app_name="arrow-experiments-gen-taxi")
    spark.sparkContext.setLogLevel("ERROR")
    rows = args.rows or TAXI_ROWS
    pq.write_table(gen_taxi(spark, rows=rows).toArrow(), args.out)
    print(f"rows: {rows}")
    print(f"bytes: {os.path.getsize(args.out)}")
    print(f"out: {args.out}")
    spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m arrow_experiments_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("serve", help="serve testdata tables over Arrow HTTP")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8008)
    s.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    s.add_argument("--tables", default=None, help="comma-separated subset")
    s.add_argument("--batch-rows", type=int, default=4096)
    s.add_argument("--cors", action="store_true")
    s.add_argument(
        "--sql",
        action="store_true",
        help="enable GET /query?sql=... (tables become temp views)",
    )
    s.add_argument(
        "--asgi",
        action="store_true",
        help="run the ASGI form under uvicorn (requires uvicorn installed)",
    )
    s.add_argument(
        "--taxi",
        default=None,
        metavar="PARQUET",
        help="serve this parquet as the dissociated taxi-data scenario "
        "(dataset train.parquet, 1 MiB chunks, meta+body streams)",
    )
    s.add_argument(
        "--queries",
        action="store_true",
        help="also serve every registered engine query as /datasets/query.NAME",
    )
    s.set_defaults(fn=_cmd_serve)

    f = sub.add_parser("fetch", help="one-shot client with metrics")
    f.add_argument("url")
    f.add_argument("--accept-encoding", default="identity")
    f.add_argument("--close-connection", action="store_true")
    f.add_argument("--no-collect", action="store_true")
    f.set_defaults(fn=_cmd_fetch)

    pl = sub.add_parser("pipeline", help="rand-many-types make pipeline")
    pl.add_argument("--out", required=True)
    pl.add_argument("--stem", default="random")
    pl.add_argument("--seed", type=int, default=12345)
    pl.add_argument("--batches", type=int, default=100)
    pl.add_argument("--rows-per-batch", type=int, default=1000)
    pl.set_defaults(fn=_cmd_pipeline)

    tx = sub.add_parser(
        "gen-taxi",
        help="synthesize the taxi-data fixture parquet (dissociated-ipc "
        "scenario; ~38.5 MB at the default row count)",
    )
    tx.add_argument("--out", required=True)
    tx.add_argument("--rows", type=int, default=None)
    tx.set_defaults(fn=_cmd_gen_taxi)

    ss = sub.add_parser(
        "serve-sockets",
        help="dissociated meta/body streams over the raw-socket (UCX-analog) "
        "transport; serves a taxi-data parquet in 1 MiB chunks",
    )
    ss.add_argument("--host", default="127.0.0.1")
    ss.add_argument("--port", type=int, default=0)
    ss.add_argument("--taxi", default=None, metavar="PARQUET")
    ss.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ss.add_argument(
        "--tables",
        default=None,
        help="comma-separated testdata tables to serve (or 'all')",
    )
    ss.add_argument(
        "--queries",
        action="store_true",
        help="serve every registered engine query as dataset query.NAME",
    )
    ss.set_defaults(fn=_cmd_serve_sockets)

    fs = sub.add_parser(
        "fetch-sockets",
        help="dissociated socket client: want_data handshake, two "
        "connections, ordered streaming reassembly, metrics",
    )
    fs.add_argument("--host", default="127.0.0.1")
    fs.add_argument("--port", type=int, required=True)
    fs.add_argument("--ident", default="train.parquet")
    fs.set_defaults(fn=_cmd_fetch_sockets)

    cm = sub.add_parser("commits", help="arrow-commits fixture builder")
    cm.add_argument("--repo", default=".")
    cm.add_argument("--out", required=True)
    cm.set_defaults(fn=_cmd_commits)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
