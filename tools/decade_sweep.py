#!/usr/bin/env python
"""One decade further for the two headline dedup defaults (r6 verdict #6):
``dedup_minhash_lsh`` and ``dedup_embedding_topk_grouped`` at 100× and
1000× the sf0.1 corpus — ~5M documents / ~2M embedding vectors.

Density protocol: the clone-dense recipe (every replica a near-dup,
``scale_sweep.build_corpus`` default) is the right stress at 10×/100×
but is OUTPUT-dominated at 1000× by construction: each original becomes
a 1000-member near-dup family, so the band join's obligated candidate
mass is ~factor²/2 · families · bands ≈ 1000·999/2 · 5,000 · 4 ≈ 10¹⁰
pair rows (a ~240 GB shuffle of pure clone pairs) for minhash — the
measurement would time the disk, not the plan.  So this sweep runs BOTH
scales on corpora with clone families capped at 10 members
(``build_corpus(..., max_family=10)``: excess replicas get fresh
hash-synthesized tokens / uniform vectors), holding dup DENSITY constant
as row count scales — the natural-corpus regime a 100 TB run actually
sees.  The decade exponent log10(t1000/t100) then measures the PLAN's
bend; the clone-dense upper-bound behavior stays documented by the
10×/100× sweeps in SCALE.md.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/decade_sweep.py
Appends a section to SCALE.md and prints one JSON line.

Round-7 results are already recorded in SCALE.md ("One decade further"
and the sections after it — including curate funnel, semantic dedup,
jaccard, ANN and keep_canonical cells measured with this protocol on
the same corpora); re-running appends a fresh section rather than
editing those.
"""

from __future__ import annotations

import json
import math
import os
import sys
import threading
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from arrow_experiments_spark.registry import all_queries
from arrow_experiments_spark.session import build_session
from tools.scale_sweep import build_corpus

FACTORS = [100, 1000]
QUERIES = ["dedup_minhash_lsh", "dedup_embedding_topk_grouped"]
MAX_FAMILY = 10


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = "/tmp/decade_sweep"
    spark = build_session(app_name="decade_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    dirs: dict[int, str] = {}
    for k in FACTORS:
        dest = f"{work}/x{k}"
        if os.path.exists(f"{dest}/documents.parquet"):
            print(f"reusing x{k} corpus at {dest}", flush=True)
        else:
            build_corpus(spark, base, k, dest, max_family=MAX_FAMILY)
            print(f"built x{k} (max_family={MAX_FAMILY}) at {dest}", flush=True)
        dirs[k] = dest

    def measure(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        registry[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    # The 4-bit 1000× top-k cell exists to MEASURE the quadratic bend the
    # bits knob then removes — cap it so the demonstration can't eat the
    # sweep (inf = "ran past the cap", itself the data point).
    def measure_capped(name: str, sf_dir: str, cap_s: int) -> float:
        box: dict[str, float] = {}

        def run() -> None:
            try:
                box["t"] = measure(name, sf_dir)
            except Exception as exc:  # noqa: BLE001 — cancelled jobs raise
                print(f"capped run ended: {exc}", flush=True)

        th = threading.Thread(target=run, daemon=True)
        t0 = time.perf_counter()
        th.start()
        th.join(cap_s)
        if th.is_alive():
            spark.sparkContext.cancelAllJobs()
            th.join(120)
            spark.catalog.clearCache()
            return float("inf")
        return box.get("t", float("inf"))

    progress = Path(work, "decade_progress.json")

    def checkpoint(results: dict) -> None:
        progress.write_text(json.dumps(results, default=str))

    base_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    results: dict[str, dict[int, list[float]]] = {n: {} for n in QUERIES}
    cap_s = 1800
    for k in FACTORS:
        # same partition-scaling contract as scale_sweep.py
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(min(base_parts * k, 1024))
        )
        for name in QUERIES:
            if name == "dedup_embedding_topk_grouped" and k == 1000:
                # single capped run: ~2M/16 vectors per 4-bit cell makes
                # this the known-quadratic demonstration cell
                runs = [measure_capped(name, dirs[k], cap_s)]
            else:
                runs = [measure(name, dirs[k]) for _ in range(2)]
            results[name][k] = [round(r, 2) for r in runs]
            print(f"x{k} {name} {runs}", flush=True)
            checkpoint(results)

    # the cell-population knob, demonstrated: at 1000× the 4-bit default
    # leaves ~2M/16 vectors per (band, bucket) cell — quadratic in-cell
    # work.  7 bits restores ~the 100×@4-bit cell population (each bit
    # halves it), so per-cell cost returns to the 100× regime.
    knob = "dedup_embedding_topk_grouped@7bits"
    results[knob] = {}
    spark.conf.set("spark.arrowExperimentsSpark.emb.lshBits", "7")
    try:
        for k in FACTORS:
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(min(base_parts * k, 1024))
            )
            runs = [
                measure("dedup_embedding_topk_grouped", dirs[k])
                for _ in range(2)
            ]
            results[knob][k] = [round(r, 2) for r in runs]
            print(f"x{k} {knob} {runs}", flush=True)
            checkpoint(results)
    finally:
        spark.conf.unset("spark.arrowExperimentsSpark.emb.lshBits")
    spark.conf.set("spark.sql.shuffle.partitions", str(base_parts))

    def fmt(t: float) -> str:
        return f">{cap_s} (capped)" if math.isinf(t) else f"{t:.2f}"

    rows = []
    for name in [*QUERIES, knob]:
        t100 = min(results[name][100])
        t1000 = min(results[name][1000])
        exp = (
            "n/a"
            if math.isinf(t1000)
            else f"{math.log(t1000 / t100) / math.log(10):.2f}"
        )
        rows.append(
            f"| {name} | {fmt(t100)} | {fmt(t1000)} | {exp} | "
            f"{results[name][100]} / {results[name][1000]} |"
        )

    section = (
        "\n## One decade further: the dedup defaults at 1000× "
        "(round 7)\n"
        "\n"
        "Natural-density corpora (clone families capped at 10 members —\n"
        "`build_corpus(..., max_family=10)`; excess replicas are\n"
        "hash-synthesized unique docs / uniform vectors), so dup density\n"
        "stays constant while row count scales: ~5M docs / ~2M vectors at\n"
        "1000×.  The clone-dense recipe is deliberately NOT run at 1000×\n"
        "for `dedup_minhash_lsh`: its obligated candidate mass there is\n"
        "~1000·999/2 · 5,000 families · 4 bands ≈ 10¹⁰ pair rows (a\n"
        "~240 GB shuffle of pure clone output, ~100× the 100× corpus's\n"
        "10⁸) — the run would measure disk, not the plan; the 10×/100×\n"
        "clone-dense rows above remain the output-sensitive upper bound.\n"
        "`exp` = log10(t1000/t100): 1.0 is linear in the decade.\n"
        "48 GiB heap, shuffle partitions capped at 1,024, min of 2 runs.\n"
        "The `@7bits` row runs the same query with the cell-population\n"
        "knob (`spark.arrowExperimentsSpark.emb.lshBits`) raised from the\n"
        "oracle default of 4 — each bit halves expected cell population,\n"
        "so 7 bits at 1000× restores roughly the 100×@4-bit cell size and\n"
        "with it the per-cell quadratic cost (recall is bought back in\n"
        "production by adding bands, a disjoint-hyperplane parameter\n"
        "change, not a new codebook).\n"
        "\n"
        "| query | 100x (s) | 1000x (s) | decade exp | runs |\n"
        "|---|---|---|---|---|\n" + "\n".join(rows) + "\n"
    )
    with open(Path(_REPO, "SCALE.md"), "a") as f:
        f.write(section)
    print(
        json.dumps(
            {
                "metric": "decade_sweep",
                "max_family": MAX_FAMILY,
                "results": {
                    n: {str(k): v for k, v in r.items()}
                    for n, r in results.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
