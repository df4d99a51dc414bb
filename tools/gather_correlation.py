#!/usr/bin/env python
"""Correlation collector for the random-gather latency sentinel.

r13 (round 1 of this dataset, 67 points on ONE mixed-runtime leg):
the box's co-tenant phases inflate Spark walls 2-3x while staying
invisible to the loopback sentinel AND the DRAM-copy in-leg probe;
only the 32 MiB random-gather series collapses — but half the QUIET
legs showed collapsed gather too, so promotion was REJECTED (any
useful band false-flags 32-53% of commit-worthy legs; SCALE.md
"Gather-probe promotion: REJECTED on data").

r14 (round 2, the r13 verdict's stated condition): the open hypothesis
is that the phase "steals Python random-access latency without slowing
the JVM" — the gather probe runs IN PYTHON (np.take under the GIL-free
numpy path but through the Python allocator), so a phase that only
degrades Python-side memory access would collapse the gather while a
pure-JVM leg sails through, explaining the quiet-leg false flags.  To
test it, every cycle now runs TWO fixed legs under the full qualifier:

  - jvm:  ``dedup_ngram_jaccard_lsh``   (~2.1 s quiet — shingle/LSH/
          verify joins, whole-stage codegen, zero Python workers)
  - py:   ``dedup_embedding_topk_grouped`` (~2.0 s quiet — the
          applyInPandas blocked-numpy kernel, Python workers hot)

recording per-leg wall, bracket tags, copy/gather medians, and loadavg.
If the hypothesis holds, cycles split: py-leg inflated + jvm-leg quiet,
with gather collapse tracking the PY inflation — which would promote
the gather band as a PYTHON-LEG-ONLY verdict input.  If both legs
inflate together regardless of gather, the question closes permanently
(GATHER_BAND stays None with the second dataset attached).

Usage: python tools/gather_correlation.py [minutes] [out.jsonl]
Prints one JSON summary line at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from arrow_experiments_spark.registry import all_queries
from arrow_experiments_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LEGS = {
    "jvm": "dedup_ngram_jaccard_lsh",
    "py": "dedup_embedding_topk_grouped",
}
CYCLE_SEC = 90.0


def med(vals):
    import statistics

    return statistics.median(vals) if vals else None


def main() -> None:
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gather_correlation.jsonl"
    spark = build_session(app_name="gather_correlation")
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    qual = bench.sweep_qualifier(spark)
    bw = bench.bw_sentinel()
    queries = all_queries()

    def one_leg(name: str) -> float:
        t0 = time.perf_counter()
        queries[name].build(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    for name in LEGS.values():  # warm footers/codegen outside the series
        one_leg(name)

    deadline = time.monotonic() + minutes * 60
    points = []
    with open(out_path, "w") as fh:
        while time.monotonic() < deadline:
            cycle_t0 = time.monotonic()
            rec = {"t": round(time.monotonic(), 1)}
            for tag, name in LEGS.items():
                b = qual.probe()
                with bw.window() as w:
                    wall = one_leg(name)
                a = qual.probe()
                rec[f"wall_{tag}"] = round(wall, 2)
                rec[f"bracket_clean_{tag}"] = qual.clean(b, a)
                rec[f"copy_med_{tag}"] = round(med(w.bws) or 0.0, 2)
                rec[f"gather_med_{tag}"] = round(med(w.gathers()) or 0.0, 3)
            rec["load1"] = round(os.getloadavg()[0], 2)
            points.append(rec)
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            time.sleep(max(0.0, CYCLE_SEC - (time.monotonic() - cycle_t0)))
    spark.stop()

    if not points:
        print(json.dumps({"metric": "gather_correlation", "n": 0,
                          "error": "no points collected (minutes <= 0?)"}))
        return

    gather_ref = sorted(
        p["gather_med_py"] for p in points
    )[int(len(points) * 0.9)]
    summary = {
        "metric": "gather_correlation_r14",
        "legs": LEGS,
        "n": len(points),
        "gather_ref_py_leg": gather_ref,
        "out": out_path,
    }
    # per-leg inflation classification (ground truth = each leg's own
    # run floor; >1.5x = inflated, <=1.2x = quiet, between = marginal)
    floors = {t: min(p[f"wall_{t}"] for p in points) for t in LEGS}
    summary["wall_floors"] = floors

    def cls(p, t):
        r = p[f"wall_{t}"] / floors[t]
        return "inflated" if r > 1.5 else ("quiet" if r <= 1.2 else "mid")

    combos: dict[str, list] = {}
    for p in points:
        key = f"jvm_{cls(p, 'jvm')}__py_{cls(p, 'py')}"
        combos.setdefault(key, []).append(
            round(p["gather_med_py"] / max(gather_ref, 1e-9), 2)
        )
    summary["combo_counts"] = {k: len(v) for k, v in sorted(combos.items())}
    summary["combo_gather_ratios"] = {
        k: sorted(v) for k, v in sorted(combos.items())
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
