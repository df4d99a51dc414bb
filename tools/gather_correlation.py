#!/usr/bin/env python
"""Correlation collector for the random-gather latency sentinel (r13).

The r13 finding: the box's co-tenant phases inflate Spark walls 2-3x
while staying invisible to the loopback sentinel AND the DRAM-copy
in-leg probe; only the 32 MiB random-gather series collapses (to
0.08-0.36x of reference, vs 0.45-0.8x under the engine's own load).
One afternoon gave a thin margin (0.36 vs 0.46) — this tool collects
the dataset that settles the promotion band: every CYCLE_SEC it runs
ONE fixed mid-weight leg (``pipeline_curate_end_to_end`` at sf0.1,
~4-8 s quiet, long enough for 4+ in-leg probes) under the full
qualifier, recording wall, bracket tags, copy/gather medians, and
loadavg to a JSONL file.  Run it across a few phase cycles (the
phases recur every ~10 min), then read the summary: if the gather
ratio separates inflated from quiet walls with margin, promote the
band in bench.BandwidthSentinel.

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
LEG = "pipeline_curate_end_to_end"
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
    q = all_queries()[LEG]

    def one_leg() -> float:
        t0 = time.perf_counter()
        q.build(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    one_leg()  # warm footers/codegen outside the recorded series

    deadline = time.monotonic() + minutes * 60
    points = []
    with open(out_path, "w") as fh:
        while time.monotonic() < deadline:
            cycle_t0 = time.monotonic()
            b = qual.probe()
            with bw.window() as w:
                wall = one_leg()
            a = qual.probe()
            rec = {
                "t": round(time.monotonic(), 1),
                "wall": round(wall, 2),
                "bracket_clean": qual.clean(b, a),
                "copy_med": round(med(w.bws) or 0.0, 2),
                "gather_med": round(med(w.gathers()) or 0.0, 3),
                "load1": round(os.getloadavg()[0], 2),
            }
            points.append(rec)
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            time.sleep(max(0.0, CYCLE_SEC - (time.monotonic() - cycle_t0)))
    spark.stop()

    if not points:
        print(json.dumps({"metric": "gather_correlation", "n": 0,
                          "error": "no points collected (minutes <= 0?)"}))
        return
    copy_ref = sorted(p["copy_med"] for p in points)[int(len(points) * 0.9)]
    gather_ref = sorted(p["gather_med"] for p in points)[
        int(len(points) * 0.9)
    ]
    wall_floor = min(p["wall"] for p in points)
    # a point is "inflated" when its wall exceeds 1.5x the run floor —
    # the ground truth the sentinels are graded against
    inflated = [p for p in points if p["wall"] > 1.5 * wall_floor]
    quiet = [p for p in points if p["wall"] <= 1.2 * wall_floor]
    summary = {
        "metric": "gather_correlation",
        "leg": LEG,
        "n": len(points),
        "wall_floor": wall_floor,
        "copy_ref": copy_ref,
        "gather_ref": gather_ref,
        "n_inflated": len(inflated),
        "n_quiet": len(quiet),
        "inflated_gather_ratios": sorted(
            round(p["gather_med"] / gather_ref, 2) for p in inflated
        ),
        "quiet_gather_ratios": sorted(
            round(p["gather_med"] / gather_ref, 2) for p in quiet
        ),
        "inflated_copy_ratios": sorted(
            round(p["copy_med"] / copy_ref, 2) for p in inflated
        ),
        "out": out_path,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
