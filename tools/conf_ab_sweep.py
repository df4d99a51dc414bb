#!/usr/bin/env python
"""Paired same-window A/B of the round-12 session-conf set on the
headline keys it was never validated on (r12 verdict Wrong #1 / Next #1).

Round 12 shipped three linked SQL confs as session defaults —
``coalescePartitions.parallelismFirst=false`` +
``canChangeCachedPlanOutputPartitioning=true`` + a 16m advisory
partition size — validated only on the streaming gate sinks (where they
cut the per-batch floor 27-41%).  The r12 headline bench then regressed
4.9% geomean vs r11, concentrated in persisted-frame pipelines
(``dedup_embedding_incremental`` +38%, a new series max).  A clean tag
on those r12 samples is not conclusive (the box's co-tenant phases can
open and close inside a leg), so this tool settles it the only way the
box allows: INTERLEAVED legs, new-conf vs old-conf back-to-back within
one session (all three confs are runtime-settable), sentinel-bracketed,
min-over-clean per arm — the paired protocol from the measurement
memory.  parallelWrites is sink-only machinery and does not touch these
batch plans, so the batch A/B toggles exactly the three SQL confs.

Usage: python tools/conf_ab_sweep.py [key ...]
Prints one JSON line; appends a section to SCALE.md when run on the
default key set.
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

# The 6 most-regressed r12 headline keys (r12 verdict Wrong #1), the
# worst first.
DEFAULT_KEYS = [
    "dedup_embedding_incremental",
    "pipeline_neardup_incremental",
    "dedup_semantic_clusters",
    "text_tfidf_top_terms",
    "agg_hll_sketch_exchange",
    "events_session_window",
]

# (short name, conf, new value, old value).  Old = the r11 session
# defaults (parallelismFirst/cachedPlan at Spark defaults, advisory at
# Spark's 64m default — session.py r11 set none of the three).  The
# special value "<unset>" clears the conf (Spark's own default).
ALL_CONFS = [
    ("pf", "spark.sql.adaptive.coalescePartitions.parallelismFirst",
     "false", "true"),
    ("cached", "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
     "true", "false"),
    ("advisory", "spark.sql.adaptive.advisoryPartitionSizeInBytes",
     "16m", "64m"),
    # r13 verdict Wrong #3 lever: with parallelismFirst=false the
    # coalescer floors at minPartitionNum-or-1; a small floor could
    # recover events_session_window's measured 1.26x small-SF cost
    # without re-enabling parallelism-first globally.  MINPN env
    # overrides the candidate floor value.
    ("minpn", "spark.sql.adaptive.coalescePartitions.minPartitionNum",
     os.environ.get("MINPN", "8"), "<unset>"),
]
# CONF_AB_CONFS=pf,advisory restricts the TOGGLED set for factorial
# decomposition (the un-toggled confs stay at their NEW defaults in
# both arms, so a single-conf A/B isolates that conf's marginal cost
# against the shipped posture).
_only = os.environ.get("CONF_AB_CONFS", "")
if _only:
    _known = {s for s, *_ in ALL_CONFS}
    _bad = [t for t in _only.split(",") if t not in _known]
    if _bad:
        raise SystemExit(
            f"CONF_AB_CONFS entries must be comma-separated names from "
            f"{sorted(_known)}, got {_bad!r}"
        )
# minpn SHIPPED as a build_session default in r14 (minPartitionNum=8,
# session.py) — it stays out of CONFS/_HELD not because it's a candidate
# but because build_session already supplies 8 in BOTH arms, so toggling
# or holding it here would double-apply the shipped default; an old-arm
# reproduction therefore matches shipped-defaults-minus-the-toggled-conf.
# Name it in CONF_AB_CONFS to A/B the floor itself (MINPN overrides).
_CANDIDATES = {"minpn"}
CONFS = [
    (c, n, o) for s, c, n, o in ALL_CONFS
    if (s in _only.split(",") if _only else s not in _CANDIDATES)
]
_HELD = [
    (c, n) for s, c, n, o in ALL_CONFS
    if _only and s not in _only.split(",") and s not in _CANDIDATES
]

LEGS_PER_ARM = 3


def main() -> None:
    keys = sys.argv[1:] or DEFAULT_KEYS
    spark = build_session(app_name="conf_ab_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    queries = all_queries()
    qual = bench.sweep_qualifier(spark)
    bw = bench.bw_sentinel()

    for conf, val in _HELD:
        spark.conf.set(conf, val)

    def set_arm(arm: str) -> None:
        for conf, new, old in CONFS:
            val = new if arm == "new" else old
            if val == "<unset>":
                spark.conf.unset(conf)
            else:
                spark.conf.set(conf, val)

    def one_leg(name: str) -> float:
        t0 = time.perf_counter()
        queries[name].build(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    results: dict[str, dict] = {}
    for name in keys:
        # one discarded warmup leg per arm: pays parquet footers, plan
        # codegen, and any write-if-absent side effect (the sketch
        # exchange's shard fill) so both arms' timed legs replay the
        # same steady shape
        for arm in ("new", "old"):
            set_arm(arm)
            one_leg(name)
        legs: dict[str, list[dict]] = {"new": [], "old": []}
        # strict interleave: N O N O N O — a co-tenant phase that spans
        # adjacent legs hits both arms equally (paired protocol)
        for _ in range(LEGS_PER_ARM):
            for arm in ("new", "old"):
                set_arm(arm)
                b = qual.probe()
                with bw.window() as w:
                    sec = one_leg(name)
                a = qual.probe()
                ok = qual.clean(b, a) and bw.leg_clean_full(w.bws, w.gathers()) is not False
                legs[arm].append(
                    {
                        "sec": round(sec, 3),
                        "window": "clean" if ok else "contended",
                    }
                )
        committed: dict[str, float] = {}
        tags: dict[str, str] = {}
        for arm in ("new", "old"):
            clean = [g["sec"] for g in legs[arm] if g["window"] == "clean"]
            committed[arm] = min(clean) if clean else min(
                g["sec"] for g in legs[arm]
            )
            tags[arm] = "clean" if clean else "contended"
        results[name] = {
            "new_sec": committed["new"],
            "old_sec": committed["old"],
            "ratio_new_over_old": round(
                committed["new"] / max(committed["old"], 1e-9), 3
            ),
            "new_window": tags["new"],
            "old_window": tags["old"],
            "new_legs": legs["new"],
            "old_legs": legs["old"],
        }
        print(
            f"{name}: new {committed['new']:.3f}s [{tags['new']}] vs old "
            f"{committed['old']:.3f}s [{tags['old']}] -> "
            f"{results[name]['ratio_new_over_old']}x",
            flush=True,
        )
    spark.stop()

    out = {
        "metric": "conf_ab_sweep",
        "confs": {c: {"new": n, "old": o} for c, n, o in CONFS},
        "legs_per_arm": LEGS_PER_ARM,
        "sf_dir": SF_DIR,
        "results": results,
        "sentinel": {
            "floor": round(qual.floor, 4),
            "limit": round(qual.limit, 4),
            "samples": [round(s, 3) for s in qual.samples],
        },
    }
    print(json.dumps(out))
    if sys.argv[1:] or _only:
        # restricted run (explicit keys, or a CONF_AB_CONFS factorial
        # slice): JSON only — the committed SCALE.md section's
        # narrative describes the FULL conf-set A/B and must not be
        # appended from a single-conf decomposition
        return
    # default full-set run owns the committed SCALE.md section
    lines = [
        "",
        "## Round-12 conf set adjudicated on the regressed headline keys"
        " (round 13)",
        "",
        "r12 verdict Wrong #1: the coalescing pair + 16m advisory shipped",
        "validated only on the gate sinks while the headline geomean",
        "regressed 4.9%, concentrated in persisted-frame pipelines.",
        "Interleaved in-session A/B (new confs vs r11 defaults,",
        "N O N O N O per key, sentinel-bracketed, min over clean legs —",
        "the paired box-noise protocol):",
        "",
        "| key | new confs (s) | old confs (s) | new/old | windows |",
        "|---|---|---|---|---|",
    ]
    for name, r in results.items():
        lines.append(
            f"| {name} | {r['new_sec']} | {r['old_sec']} "
            f"| {r['ratio_new_over_old']} "
            f"| {r['new_window']}/{r['old_window']} |"
        )
    lines.append("")
    with open(Path(_REPO, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines))


if __name__ == "__main__":
    main()
