#!/usr/bin/env python
"""Decade sweep for the round-9 incremental batch twins
(`pipeline_neardup_incremental`, `dedup_embedding_incremental`) on the
standard perturbation-replicated corpora (tools/scale_sweep.py recipe,
same protocol: two alternating passes, per-item min, shuffle partitions
scaled data-proportionally).

The usual clone-density caveat applies doubly here: replication makes
every delta document/vector one of a factor-sized near-dup family, so
the candidate mass these gates must VERIFY grows ~quadratically in the
factor by construction — an upper bound, not natural-corpus scaling.
The embedding twin carries the batch family's eager pair-mass guard and
is expected to REFUSE the 100x clone corpus (recorded as `guarded`),
exactly as dedup_embedding_cosine does; the streaming sink's seat of
that bound is the saturated-cell skip.

Usage: python tools/incremental_twins_sweep.py
Appends a section to SCALE.md and prints one JSON line.
"""

from __future__ import annotations

import importlib.util
import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from arrow_experiments_spark.registry import all_queries
from arrow_experiments_spark.session import build_session

_spec = importlib.util.spec_from_file_location(
    "scale_sweep", str(Path(_REPO, "tools", "scale_sweep.py"))
)
_ss = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_ss)

SWEEP = ["pipeline_neardup_incremental", "dedup_embedding_incremental"]
FACTORS = [1, 10, 100]
BASE = "/root/testdata/sf0.1"
WORK = "/tmp/incremental_twins_sweep"


def main() -> None:
    spark = build_session(app_name="incremental_twins_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    dirs = {1: BASE}
    for k in FACTORS:
        if k == 1:
            continue
        dest = f"{WORK}/x{k}"
        _ss.build_corpus(spark, BASE, k, dest)
        dirs[k] = dest
        print(f"built x{k} corpus at {dest}", flush=True)

    def measure(name: str, sf_dir: str) -> float:
        from arrow_experiments_spark.operators.dedup import PairMassExceeded

        t0 = time.perf_counter()
        try:
            queries[name].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except PairMassExceeded:
            spark.catalog.clearCache()
            return float("nan")
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    measure("dedup_exact", BASE)  # warm the JVM

    results: dict[str, dict[int, float]] = {n: {} for n in SWEEP}
    base_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    for k in FACTORS:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(min(base_parts * k, 1024))
        )
        for i in range(2):
            order = SWEEP if i == 0 else list(reversed(SWEEP))
            for name in order:
                dt = measure(name, dirs[k])
                cur = results[name].get(k)
                if cur is None or cur != cur:
                    results[name][k] = dt
                elif dt == dt:
                    results[name][k] = min(cur, dt)
                print(f"x{k} pass{i} {name} {dt:.2f}s", flush=True)
    spark.stop()
    import shutil

    shutil.rmtree(WORK, ignore_errors=True)

    def cell(v: float) -> str:
        return "guarded" if v != v else f"{v:.2f}"

    def expo(r: dict[int, float]) -> str:
        import math

        if any(v != v for v in r.values()):
            return "guarded"
        return f"{math.log(r[100] / r[1]) / math.log(100):.2f}"

    lines = [
        "",
        "## Round-9 incremental twins on the decade corpora",
        "",
        "The batch twins of the streaming ingest gates, measured on the",
        "standard clone corpora (same protocol and caveat as the main",
        "table: every delta row is one of a factor-sized near-dup family",
        "BY CONSTRUCTION, so verify mass is an upper bound).  The",
        "embedding twin carries the family's eager pair-mass guard and",
        "refuses the 100x clone corpus by design (`guarded` — the",
        "bounded path at that density is the streaming sink's",
        "saturated-cell skip / the topk_grouped sibling).",
        "",
        "| query | 1x (s) | 10x (s) | 100x (s) | exp |",
        "|---|---|---|---|---|",
    ]
    for name in SWEEP:
        r = results[name]
        lines.append(
            f"| {name} | {cell(r[1])} | {cell(r[10])} | {cell(r[100])} "
            f"| {expo(r)} |"
        )
    lines.append("")
    with open(Path(_REPO, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines))
    print(json.dumps({
        "metric": "incremental_twins_sweep",
        **{n: {str(k): ("guarded" if v != v else round(v, 2))
               for k, v in r.items()} for n, r in results.items()},
    }))


if __name__ == "__main__":
    main()
