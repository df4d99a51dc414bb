#!/usr/bin/env python
"""Scale evidence for ANY registered query: run it at 1×/10×/100× on the
same perturbation-replicated corpora as ``scale_sweep.py`` (same
partition-scaling and pass protocol) and append a measured row to
SCALE.md.  Generalizes ``topk_scale.py`` so new operators get the same
above-bench-scale treatment without a bespoke tool each time.

Usage: python tools/query_scale.py QUERY [QUERY...] [--base SF_DIR]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from arrow_experiments_spark.registry import all_queries
from arrow_experiments_spark.session import build_session
from tools.scale_sweep import FACTORS, build_corpus


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    work = "/tmp/query_scale"
    spark = build_session(app_name="query_scale")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    for name in args.queries:
        if name not in registry:
            raise SystemExit(f"unknown query: {name}")

    dirs: dict[int, str] = {1: args.base}
    for k in FACTORS:
        if k == 1:
            continue
        dest = f"{work}/x{k}"
        build_corpus(spark, args.base, k, dest)
        dirs[k] = dest
        print(f"built x{k} corpus at {dest}", flush=True)

    def measure(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        registry[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    base_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rows: list[str] = []
    results: dict[str, dict[int, float]] = {}
    for name in args.queries:
        measure(name, args.base)  # warm
        r: dict[int, float] = {}
        for k in FACTORS:
            # same partition-scaling contract as scale_sweep.py
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(min(base_parts * k, 1024))
            )
            runs = 1 if k == 100 else 2
            r[k] = min(measure(name, dirs[k]) for _ in range(runs))
            print(f"x{k} {name} {r[k]:.2f}s", flush=True)
        spark.conf.set("spark.sql.shuffle.partitions", str(base_parts))
        exp = math.log(r[100] / r[1]) / math.log(100)
        rows.append(f"| {name} | {r[1]:.2f} | {r[10]:.2f} | {r[100]:.2f} | {exp:.2f} |")
        results[name] = r

    section = (
        "\n## Later-round additions (same corpora, same protocol)\n"
        "\n"
        "| query | 1x (s) | 10x (s) | 100x (s) | exp |\n"
        "|---|---|---|---|---|\n" + "\n".join(rows) + "\n"
    )
    with open(Path(_REPO, "SCALE.md"), "a") as f:
        f.write(section)
    print(json.dumps({"metric": "query_scale", "results": {
        n: {str(k): v for k, v in r.items()} for n, r in results.items()
    }}))


if __name__ == "__main__":
    main()
