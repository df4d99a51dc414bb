#!/usr/bin/env python
"""Delta-vs-rerun cost of the incremental curation funnel at 100×
(r7 verdict #4).

``incremental_curation_sink`` is equality-tested at fixture scale; this
measures its scale claim: one new day of documents against a 100×
snapshot must cost a delta-sized quality gate + one hash-keyed anti-join
+ the snapshot version write — NOT a full-corpus recurate.  Protocol:

1. seed: the round-7 x100 decade corpus' documents (500k rows) minus a
   ~1% doc_id-stride slice, staged as ONE file and streamed through the
   sink with a durable checkpoint (the seed build — the initial full
   cost, reported for context).  The stride (not a top-of-range cut)
   matters: the corpus' highest doc_ids are all hash-synthesized clone
   filler that fails the stopword gate, so a range delta would
   contribute zero rows and demonstrate nothing;
2. delta: the held-out 1% lands as one new file; the SAME checkpointed
   query restarts and processes only it — the measured delta cost;
3. full-rerun yardstick: ``pipeline_curate_end_to_end`` built fresh over
   the same 100× corpus (what a batch pipeline would redo nightly);
4. equality: a from-scratch sink run over seed+delta — with
   maxFilesPerTrigger=1 so its micro-batch order replays the
   incremental arrival order (first-seen-wins is order-sensitive by
   contract) — must equal the incrementally-updated snapshot
   row-for-row (doc_id, content_hash).

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/incremental_sweep.py
Appends a section to SCALE.md and prints one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import pyspark.sql.functions as F

from arrow_experiments_spark.registry import all_queries
from arrow_experiments_spark.session import build_session

CORPUS = "/tmp/decade_sweep/x100"
WORK = "/tmp/incr_sweep"


def main() -> None:
    if not os.path.exists(f"{CORPUS}/documents.parquet"):
        raise SystemExit(
            f"missing decade corpus at {CORPUS} — run tools/decade_sweep.py"
        )
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)

    spark = build_session(app_name="incremental_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    from arrow_experiments_spark.streaming.egress import (
        incremental_curation_sink,
        read_snapshot,
    )

    docs = spark.read.parquet(f"{CORPUS}/documents.parquet")
    n_total = docs.count()
    staged = os.path.join(WORK, "staged")
    os.makedirs(staged)

    def stage(name: str, frame, mtime: int) -> None:
        # ONE file per leg: each staged file is exactly one micro-batch,
        # so the scratch run's maxFilesPerTrigger=1 replay has the same
        # batch boundaries as the incremental runs
        wdir = os.path.join(WORK, f"w_{name}")
        frame.coalesce(1).write.mode("overwrite").parquet(wdir)
        (src,) = glob.glob(os.path.join(wdir, "part-*.parquet"))
        dst = os.path.join(staged, f"{name}.parquet")
        shutil.copy(src, dst)
        os.utime(dst, (mtime, mtime))

    is_delta = F.pmod(F.col("doc_id"), F.lit(90)) == 7
    seed_df = docs.filter(~is_delta)
    delta_df = docs.filter(is_delta)
    n_seed, n_delta = seed_df.count(), delta_df.count()
    print(f"corpus {n_total} rows -> seed {n_seed} + delta {n_delta}", flush=True)
    stage("seed", seed_df, 1_000_000)

    snap = os.path.join(WORK, "snap")
    ckpt = os.path.join(WORK, "ckpt")
    schema = docs.schema

    def run_sink(timeout: int) -> float:
        stream = spark.readStream.schema(schema).parquet(staged)
        t0 = time.perf_counter()
        incremental_curation_sink(
            stream, snap, timeout_sec=timeout, checkpoint_dir=ckpt
        )
        return time.perf_counter() - t0

    t_seed = run_sink(3600)
    n_snap_seed = read_snapshot(spark, snap).count()
    print(f"seed build: {t_seed:.2f}s, snapshot {n_snap_seed} rows", flush=True)

    stage("delta", delta_df, 2_000_000)
    t_delta = run_sink(3600)
    final = read_snapshot(spark, snap)
    n_snap_final = final.count()
    print(f"delta run: {t_delta:.2f}s, snapshot {n_snap_final} rows", flush=True)

    # full-rerun yardstick: the batch funnel over the same corpus
    registry = all_queries()
    t0 = time.perf_counter()
    registry["pipeline_curate_end_to_end"].build(spark, CORPUS).write.format(
        "noop"
    ).mode("overwrite").save()
    t_full = time.perf_counter() - t0
    spark.catalog.clearCache()
    print(f"full funnel rerun: {t_full:.2f}s", flush=True)

    # equality: from-scratch over seed+delta == incrementally-updated.
    # maxFilesPerTrigger=1 + mtime ordering replays the incremental
    # arrival order (seed batch, then delta batch) — first-seen-wins
    # is order-sensitive by contract, so the comparison must hold the
    # order fixed and vary only one-session-vs-two.
    snap2 = os.path.join(WORK, "snap_scratch")
    ckpt2 = os.path.join(WORK, "ckpt_scratch")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    incremental_curation_sink(
        stream, snap2, timeout_sec=3600, checkpoint_dir=ckpt2
    )
    scratch = read_snapshot(spark, snap2)
    n_scratch = scratch.count()
    diff = (
        final.select("doc_id", "content_hash")
        .exceptAll(scratch.select("doc_id", "content_hash"))
        .count()
    )
    equal = n_scratch == n_snap_final and diff == 0
    print(f"equality: scratch {n_scratch} rows, diff {diff}", flush=True)
    spark.stop()
    if not equal:
        raise SystemExit("snapshot inequality — delta path is wrong")

    n_new = n_snap_final - n_snap_seed
    lines = [
        "",
        "## Incremental curation funnel at 100×: delta vs rerun (round 8)",
        "",
        f"One new day ({n_delta:,} docs, a doc_id stride so it carries real",
        f"documents, not just clone filler) lands against a committed",
        f"{n_snap_seed:,}-row snapshot built from the x100 decade corpus'",
        f"other {n_seed:,} documents.  The checkpointed sink restarts,",
        "processes ONLY the delta file (delta-sized tokenize + one",
        f"content_hash anti-join against the snapshot + the version write),",
        f"admits {n_new:,} new survivors, and the result equals a",
        "from-scratch run over the same arrival order row-for-row",
        "(asserted, exceptAll = 0).",
        "",
        "| leg | wall (s) |",
        "|---|---|",
        f"| seed build ({n_seed:,} docs, one-time) | {t_seed:.2f} |",
        f"| **delta update ({n_delta:,} docs, +{n_new:,} rows)** | **{t_delta:.2f}** |",
        f"| full pipeline_curate_end_to_end rerun at 100× | {t_full:.2f} |",
        "",
        f"Delta cost is {t_full / t_delta:.1f}× cheaper than the nightly",
        "batch rerun it replaces.  The delta leg's floor is the snapshot",
        "version write (the plain-parquet seat of a MERGE INTO rewrites",
        "the keyed snapshot; a Delta/Iceberg table would make that leg",
        "O(delta) too) — the curation compute itself is delta-sized, so",
        "at 100 TB the anti-join gate rides a bucketed fingerprint table",
        "and never rescans the corpus.",
        "",
    ]
    with open(Path(_REPO, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines))
    print(
        json.dumps(
            {
                "metric": "incremental_funnel_100x",
                "seed_sec": round(t_seed, 2),
                "delta_sec": round(t_delta, 2),
                "full_rerun_sec": round(t_full, 2),
                "snapshot_rows": n_snap_final,
                "delta_new_rows": n_new,
                "equal": equal,
            }
        )
    )


if __name__ == "__main__":
    main()
