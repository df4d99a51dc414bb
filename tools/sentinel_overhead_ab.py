#!/usr/bin/env python
"""Paired A/B of the in-leg BandwidthSentinel's own overhead (r13
ADVICE): the sentinel runs ~50-60 ms of DRAM copy+gather per second
INSIDE every measured leg, so r13+ committed walls embed probe overhead
that r12-and-earlier numbers lack — cross-round deltas conflate sentinel
cost with code changes unless the overhead is measured and recorded.

Protocol: one session, interleaved legs of one mid-weight query
(sentinel-ON leg, sentinel-OFF leg, repeated), every leg loopback-
bracketed (the brackets don't depend on the in-leg sentinel), committed
statistic = min over bracket-clean legs per arm.  The ON legs carry a
live BandwidthSentinel window exactly as bench.py's measure_inleg does;
the OFF legs run bare.  Within-round A/Bs are unaffected by the
overhead (both arms carry probes) — this number exists so CROSS-round
adjudication can subtract it.

Usage: python tools/sentinel_overhead_ab.py [key] [legs_per_arm]
Prints one JSON line.
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


def main() -> None:
    key = sys.argv[1] if len(sys.argv) > 1 else "pipeline_curate_end_to_end"
    legs_per_arm = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = build_session(app_name="sentinel_overhead_ab")
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    qual = bench.sweep_qualifier(spark)
    bw = bench.bw_sentinel()
    q = all_queries()[key]

    def one_leg() -> float:
        t0 = time.perf_counter()
        q.build(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    # r15: THREE warm legs, not one — short keys decay over ~4-6
    # executions after codegen (C2 promotion; see bench.py's deep-warm
    # note), and a decaying series would bias whichever arm runs first
    for _ in range(3):
        one_leg()

    legs: dict[str, list[dict]] = {"on": [], "off": []}
    for i in range(legs_per_arm):
        # alternate arm order per round: any residual warm-up or phase
        # drift then splits evenly across arms instead of loading one
        for arm in (("on", "off") if i % 2 == 0 else ("off", "on")):
            b = qual.probe()
            if arm == "on":
                with bw.window():
                    sec = one_leg()
            else:
                sec = one_leg()
            a = qual.probe()
            legs[arm].append(
                {
                    "sec": round(sec, 3),
                    "window": "clean" if qual.clean(b, a) else "contended",
                }
            )
    spark.stop()

    committed: dict[str, float] = {}
    tags: dict[str, str] = {}
    for arm in ("on", "off"):
        clean = [g["sec"] for g in legs[arm] if g["window"] == "clean"]
        committed[arm] = min(clean) if clean else min(
            g["sec"] for g in legs[arm]
        )
        tags[arm] = "clean" if clean else "contended"
    print(
        json.dumps(
            {
                "metric": "sentinel_overhead_ab",
                "key": key,
                "legs_per_arm": legs_per_arm,
                "on_sec": committed["on"],
                "off_sec": committed["off"],
                "overhead_ratio_on_over_off": round(
                    committed["on"] / max(committed["off"], 1e-9), 3
                ),
                "on_window": tags["on"],
                "off_window": tags["off"],
                "on_legs": legs["on"],
                "off_legs": legs["off"],
                "sentinel": {
                    "floor": round(qual.floor, 4),
                    "limit": round(qual.limit, 4),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
