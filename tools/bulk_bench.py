#!/usr/bin/env python
"""One certified bulk bench pass over registered-but-never-benched queries
(r14 verdict #2).

86 of the 154 registered queries had plan audits and oracle checks but no
committed wall-clock number entering r15 — the "within 2x at the same SF"
clause had nothing to adjudicate them against.  Six more 15-key tail
rotations would close that by ~r20; one bulk pass closes it now, under the
same measurement protocol as the headline bench:

  - quiet gate: 1-min loadavg below LOAD_MAX before the run starts;
  - a WARM pass (every key once, untimed) so recorded samples are
    steady-state (r14 warm-pass rule — pass-1 codegen is not the query);
  - three recorded passes in alternating order, each leg bracketed by the
    loopback sentinel (WindowQualifier) and sampled by the in-leg
    bandwidth sentinel (BandwidthSentinel);
  - committed statistic: MIN over clean legs (bench.commit_stat, the r14
    protocol); keys with zero clean legs commit min-over-all and stay
    flagged "contended", never silently trusted;
  - certification: >=1 clean leg AND spread tightness (max/min across the
    recorded passes within SPREAD_BAND + an absolute slack) — the same
    gates certify_bench applies to headline keys.

Results accrue into BENCH_BULK.json exactly like BENCH_QUIET.json: a key
certified by ANY run keeps its lowest certified floor; carried floors
record the current run's failing result and expire after 3 consecutive
carries (the certify_bench r15 staleness rule).  bench.drift_anchors
reads these floors, so BENCH_DETAIL's vs_certified_floor covers the whole
registry once this has run.

Keys whose first committed number exceeds FLAG_ABS_SEC (default 2.0 s at
sf0.1 — these are mostly sub-second TPC-H/scalar/set/window plans) are
listed in "review" for a manual plan look, per the verdict's "flag any
key whose first number lands >2x its plan-audit expectation".

Usage: python tools/bulk_bench.py [key ...]     # default: never-benched
       LOAD_MAX=1.0 SPREAD_BAND=1.6 FLAG_ABS_SEC=2.0 SPARK_GRAFT_SF_DIR=...
Writes BENCH_BULK.json and prints one JSON summary line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

LOAD_MAX = float(os.environ.get("LOAD_MAX", "1.0"))
SPREAD_BAND = float(os.environ.get("SPREAD_BAND", "1.6"))
SPREAD_SLACK_SEC = 0.02
FLAG_ABS_SEC = float(os.environ.get("FLAG_ABS_SEC", "2.0"))
PASSES = int(os.environ.get("BULK_PASSES", "3"))
# r15 diagnosis: on sub-0.4 s keys a SINGLE warm pass leaves a monotone
# decay across the recorded passes (0.337 -> 0.279 -> 0.273 -> 0.201 ->
# 0.197 -> 0.178 on scalar_timezone, every leg sentinel-clean) — the JVM
# C2 compiler keeps promoting the generated code for several executions
# after codegen, so pass-1 samples are warm-up, not the query.  Three
# warm passes put the recorded samples at steady state; these keys are
# cheap, so the extra wall is ~2 min over the full 86-key registry.
WARM_PASSES = int(os.environ.get("BULK_WARM_PASSES", "3"))


def benched_keys() -> set[str]:
    """Every key with a committed wall-clock number: certified floors
    (BENCH_QUIET/BENCH_BULK) plus headline + tail sections of all
    BENCH_r*.json — exactly the two maps bench.drift_anchors reads, so
    the 'is this key benched?' definition lives in one place."""
    import bench

    certified, best = bench.drift_anchors(str(_REPO))
    return set(certified) | set(best)


def main() -> None:
    load_before = os.getloadavg()[0]
    if load_before >= LOAD_MAX:
        print(json.dumps({
            "metric": "bulk_bench", "certified": False,
            "reason": f"load1 {load_before:.2f} >= {LOAD_MAX} before run "
                      "— not a quiet window; try later",
        }))
        sys.exit(1)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from arrow_experiments_spark.registry import all_queries
    from arrow_experiments_spark.session import build_session

    import bench

    spark = build_session(app_name="bulk_bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    targets = sys.argv[1:] or sorted(set(queries) - benched_keys())
    bad = [t for t in targets if t not in queries]
    if bad:
        raise SystemExit(f"unknown query keys: {bad}")
    if not targets:
        print(json.dumps({"metric": "bulk_bench", "certified": True,
                          "n_keys": 0, "reason": "nothing never-benched"}))
        return

    t0 = time.time()
    qual = bench.sweep_qualifier(spark)
    bw = bench.bw_sentinel()

    def measure(name: str) -> float:
        t = time.perf_counter()
        queries[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t
        spark.catalog.clearCache()
        return dt

    for _ in range(WARM_PASSES):  # warm passes (untimed)
        for name in targets:
            measure(name)

    samples: dict[str, list[tuple[float, bool]]] = {k: [] for k in targets}
    gmed: dict[str, list] = {k: [] for k in targets}
    for i in range(PASSES):
        order = targets if i % 2 == 0 else list(reversed(targets))
        last = qual.probe()
        for name in order:
            with bw.window() as w:
                v = measure(name)
            nxt = qual.probe()
            g = w.gathers()
            gmed[name].append(round(statistics.median(g), 2) if g else None)
            clean = (
                qual.clean(last, nxt)
                and bw.leg_clean_full(w.bws, g) is not False
            )
            samples[name].append((v, bool(clean)))
            last = nxt

    # core-count provenance (r16 verdict #2): floors only anchor the
    # drift gate for runs at the SAME cpus — record per key + top level.
    try:
        run_cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or 32)
    except ValueError:
        run_cpus = 32

    keys: dict[str, dict] = {}
    for k, ss in samples.items():
        vals = [v for v, _ in ss]
        clean_vals = [v for v, c in ss if c]
        sp = [round(min(vals), 3), round(max(vals), 3)]
        spread_ok = sp[1] <= SPREAD_BAND * sp[0] + SPREAD_SLACK_SEC
        quality = "clean" if clean_vals else "contended"
        committed = bench.commit_stat(clean_vals or vals)
        keys[k] = {
            "sec": committed,
            "cpus": run_cpus,
            "quality": quality,
            "n_clean": len(clean_vals),
            "samples": [[round(v, 3), c] for v, c in ss],
            "spread": sp,
            "spread_ok": spread_ok,
            "gather_meds": [g for g in gmed[k] if g is not None],
            "certified": bool(clean_vals) and spread_ok,
        }

    # accrue with the prior BENCH_BULK.json: lowest certified floor wins;
    # carried floors record the current failing result and expire after
    # CARRY_STALE_LIMIT consecutive carries (bench.accrue_certified)
    prev_path = _REPO / "BENCH_BULK.json"
    if prev_path.exists():
        try:
            prev = json.load(open(prev_path)).get("keys", {})
        except (OSError, ValueError):
            prev = {}
        bench.accrue_certified(
            keys, prev,
            stale_limit=int(os.environ.get("CARRY_STALE_LIMIT", "3")),
        )

    n_cert = sum(1 for r in keys.values() if r["certified"])
    review = sorted(
        k for k, r in keys.items()
        if r["certified"] and r["sec"] > FLAG_ABS_SEC
    )
    out = {
        "metric": "bulk_bench",
        "certified": n_cert == len(keys),
        "n_certified": n_cert,
        "n_keys": len(keys),
        "cpus": run_cpus,
        "sf": sf_dir,
        "wall_min": round((time.time() - t0) / 60, 1),
        "evidence": {
            "load1_before": round(load_before, 2),
            "load1_after": round(os.getloadavg()[0], 2),
            "load_max": LOAD_MAX,
            "spread_band": SPREAD_BAND,
            "spread_slack_sec": SPREAD_SLACK_SEC,
            "passes": PASSES,
            "warm_passes": WARM_PASSES,
            "sentinel_probe_floor": round(qual.floor, 4),
            "bw_reference_gbs": round(bw.reference, 1),
            "statistic": "min over window-qualified clean samples"
                         " (bench.commit_stat, r14 protocol)",
        },
        "review": review,
        "keys": keys,
    }
    with open(prev_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({
        "metric": "bulk_bench",
        "certified": out["certified"],
        "n_certified": n_cert,
        "n_keys": len(keys),
        "wall_min": out["wall_min"],
        "uncertified": sorted(
            k for k, r in keys.items() if not r["certified"]
        ),
        "review": review,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
