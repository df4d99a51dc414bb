#!/usr/bin/env python
"""Decade sweep of the round-8 retrievers with NO confs set
(r8 verdict #7): ``dedup_minhash_containment`` and ``ann_ivf_multiprobe``
at 100× / 1000× natural density, geometry fully auto-derived.

Containment rides the MinHash band-bucket candidate machinery (no
geometry conf exists — bounded by dup density by construction); the
r8 sweep already measured it at default geometry, re-run here under the
same conf-free protocol as the other sweeps for a like-for-like row.
Multi-probe IVF is the one that needed the round-9 derivation: with
``ivf.k`` unset, k = max(8, ceil(N / 2000)) — 100 cells at 200k
vectors, 1000 at 2M — holding cell population ~constant where the
fixed k=8 left ~250k vectors per cell (a quadratic cell join).

Pass criterion (r8 verdict #7): both queries hold <= ~1.2 decade
exponent with NOBODY setting a conf.

Usage: python tools/retriever_auto_sweep.py
Appends a section to SCALE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from arrow_experiments_spark.registry import all_queries
from arrow_experiments_spark.session import build_session

FACTORS = [100, 1000]
QUERIES = ["dedup_minhash_containment", "ann_ivf_multiprobe"]


def main() -> None:
    work = "/tmp/decade_sweep"
    dirs = {k: f"{work}/x{k}" for k in FACTORS}
    for k, d in dirs.items():
        if not os.path.exists(f"{d}/embeddings.parquet"):
            raise SystemExit(
                f"missing decade corpus at {d} — run tools/decade_sweep.py"
            )

    spark = build_session(app_name="retriever_auto_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    from arrow_experiments_spark.operators.similarity import _ivf_k

    for conf in (
        "spark.arrowExperimentsSpark.ivf.k",
        "spark.arrowExperimentsSpark.emb.lshBits",
    ):
        spark.conf.unset(conf)
    derived = {k: _ivf_k(spark, dirs[k]) for k in FACTORS}
    print("derived ivf k:", json.dumps(derived), flush=True)

    def measure(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        registry[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    base_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    progress = Path(work, "retriever_auto_progress.json")
    results: dict[str, dict[int, list[float]]] = {n: {} for n in QUERIES}
    for k in FACTORS:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(min(base_parts * k, 1024))
        )
        for name in QUERIES:
            runs = [measure(name, dirs[k]) for _ in range(2)]
            results[name][k] = [round(r, 2) for r in runs]
            print(f"x{k} {name} {runs}", flush=True)
            progress.write_text(json.dumps(results))
    spark.stop()

    lines = [
        "",
        "## Round-8 retrievers, conf-free across the decade (round 9)",
        "",
        "Same corpora and protocol as the auto-geometry sweep: NO confs",
        "set.  dedup_minhash_containment rides the band-bucket candidate",
        "machinery (bounded by dup density by construction — no geometry",
        "knob exists to forget).  ann_ivf_multiprobe runs on the round-9",
        f"auto-derived codebook: k = {derived[100]} cells at 100×,",
        f"{derived[1000]} at 1000× (max(8, ceil(N/2000)); the fixed k=8",
        "left ~250k vectors per cell at 1000× — a quadratic cell join).",
        "",
        "| query | geometry | 100× (s) | 1000× (s) | decade exp | runs |",
        "|---|---|---|---|---|---|",
    ]
    summary: dict[str, float] = {}
    for name in QUERIES:
        r100, r1000 = results[name][100], results[name][1000]
        t100, t1000 = min(r100), min(r1000)
        exp = math.log10(t1000 / t100)
        summary[name] = round(exp, 2)
        geo = (
            "band-bucket (no conf)"
            if name == "dedup_minhash_containment"
            else f"auto k {derived[100]}->{derived[1000]}"
        )
        lines.append(
            f"| {name} | {geo} | {t100:.2f} | {t1000:.2f} | "
            f"{exp:.2f} | {r100} / {r1000} |"
        )
    lines.append("")
    with open(Path(_REPO, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines))
    print(json.dumps({"metric": "retriever_auto_decade_exp", **summary}))


if __name__ == "__main__":
    main()
