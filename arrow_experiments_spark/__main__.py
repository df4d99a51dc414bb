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
    httpd = serve(registry, host=args.host, port=args.port, cors=args.cors)
    host, port = httpd.server_address
    print(f"serving {len(names)} datasets at http://{host}:{port}", flush=True)
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
    s.set_defaults(fn=_cmd_serve)

    f = sub.add_parser("fetch", help="one-shot client with metrics")
    f.add_argument("url")
    f.add_argument("--accept-encoding", default="identity")
    f.add_argument("--close-connection", action="store_true")
    f.add_argument("--no-collect", action="store_true")
    f.set_defaults(fn=_cmd_fetch)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
