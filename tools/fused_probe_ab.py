#!/usr/bin/env python
"""Paired in-session A/B of any conf's effect on the embedding gate
sink's per-batch floor — the protocol that adjudicated (and killed)
the fused cells probe.

History: r12 recorded the fused probe (touched CELL buckets computed
in the same aggregate as the id buckets and the batch row count —
three outputs, one job) as the next floor lever; r13 shipped it
behind ``embdedup.fusedProbe`` and this tool measured a WASH (min
6.37 s fused vs 6.30 s two-pass over 12 paired marginal batches, but
only 5/12 clean on the fused arm); the r14 quiet-window re-run at
equal evidence quality confirmed it (min 6.41 fused vs 6.11
two-pass, 6/12 vs 10/12 clean) and the fused path was DELETED from
the engine (r13 verdict #4) — job elimination conserves work unless
the job was pure overhead, the r12 guard-count lesson, measured
twice.

The harness survives because the protocol generalizes: ONE session,
ONE seeded 2M corpus, FOUR alternating attach+7-batch runs with
AB_CONF toggled between AB_NEW (arm_a) and AB_OLD (arm_b) in-session
("<unset>" clears the conf), fresh 40-row deltas per run, every batch
bracket- AND in-batch-bandwidth-qualified, committed statistic =
median (and min) over each arm's clean marginal batches.  First
generalized use: the minPartitionNum coalescing-floor neutrality
check (r13 verdict #5).

Usage: AB_CONF=<spark conf> AB_NEW=<val> AB_OLD=<val|<unset>> \\
           python tools/fused_probe_ab.py
Prints one JSON line.
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

from arrow_experiments_spark.session import build_session

WORK = "/tmp/fused_probe_ab"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DELTA_ROWS = 40
N_BATCHES = 7
N_RUNS = 4  # fused, two-pass, fused, two-pass
BANDS = 3
ROWS = 2_000_000
BUCKETS = 64
# The toggled conf: required — the original fusedProbe toggle no
# longer exists in the engine (the fused path was deleted r14).
AB_CONF = os.environ.get("AB_CONF", "")
AB_NEW = os.environ.get("AB_NEW", "")
AB_OLD = os.environ.get("AB_OLD", "<unset>")
AB_ARMS = ("arm_a", "arm_b")
if not AB_CONF or not AB_NEW:
    raise SystemExit(
        "AB_CONF and AB_NEW are required (AB_OLD defaults to '<unset>'): "
        "the harness A/Bs any runtime-settable conf against the gate "
        "sink's per-batch floor — see the module docstring"
    )


def median(vals):
    import statistics

    return statistics.median(vals)


def main() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "88g")
    spark = build_session(app_name="fused_probe_ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "128")

    import bench

    from arrow_experiments_spark.operators.dedup import derive_lsh_bits
    from arrow_experiments_spark.streaming.egress import (
        _merge_batch,
        derive_index_buckets,
        incremental_embedding_dedup_sink,
    )
    from arrow_experiments_spark.tables import table

    qual = bench.sweep_qualifier(spark)
    bw = bench.bw_sentinel()
    bits = derive_lsh_bits(ROWS, 2000)

    # per-batch listener + wall extraction from the steady_state
    # protocol; tools/ is not a package — load the sibling by path
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "steady_state_sweep",
        os.path.join(_REPO, "tools", "steady_state_sweep.py"),
    )
    sss = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sss)
    batch_walls, make_probe_listener = (
        sss.batch_walls, sss.make_probe_listener
    )

    emb = table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    rows = emb.orderBy("vec_id").limit(N_BATCHES * DELTA_ROWS * N_RUNS).collect()
    need = N_BATCHES * DELTA_ROWS * N_RUNS
    assert len(rows) >= need, (len(rows), need)
    runs = []
    for r in range(N_RUNS):
        frames = []
        for i in range(N_BATCHES):
            lo = (r * N_BATCHES + i) * DELTA_ROWS
            frames.append(
                spark.createDataFrame(rows[lo:lo + DELTA_ROWS], emb.schema)
            )
        runs.append(frames)

    # ---- seed the 2M corpus (the steady_state_sweep protocol) ----
    base = os.path.join(WORK, "base")
    os.makedirs(base)
    vecs_dir = os.path.join(base, "vecs")
    cells_dir = os.path.join(base, "cells")
    idx_buckets = derive_index_buckets(
        BANDS * ROWS, bands=BANDS, delta_rows=DELTA_ROWS
    )
    seed = spark.range(ROWS).select(
        (F.col("id") + 10_000_000).alias("vec_id"),
        F.array_repeat(
            (F.col("id") % 997).cast("float") / 7.0, 64
        ).alias("embedding"),
    )
    t0 = time.perf_counter()
    _merge_batch(
        spark, seed, vecs_dir,
        key_cols=["vec_id"], order_col="vec_id",
        n_buckets=BUCKETS, bucket_cols=None, seq=0, committed=None,
    )
    postings = seed.select(
        "vec_id",
        "embedding",
        F.explode(F.array(*[F.lit(b) for b in range(BANDS)])).alias("band"),
    ).select(
        "vec_id",
        "band",
        ((1 << bits) + F.pmod(F.xxhash64("vec_id", "band"), F.lit(1 << bits)))
        .cast("int")
        .alias("cell"),
        "embedding",
    )
    _merge_batch(
        spark, postings, cells_dir,
        key_cols=["band", "cell", "vec_id"], order_col="vec_id",
        n_buckets=idx_buckets, bucket_cols=["band", "cell"],
        seq=0, committed=None,
    )
    print(f"seeded {ROWS:,} rows: {time.perf_counter() - t0:.1f}s", flush=True)

    def stage(run_idx, frames):
        staged = os.path.join(WORK, f"staged_{run_idx}")
        os.makedirs(staged)
        for i, dfr in enumerate(frames):
            wdir = os.path.join(WORK, f"w_{run_idx}_{i}")
            dfr.coalesce(1).write.mode("overwrite").parquet(wdir)
            shutil.copy(
                glob.glob(os.path.join(wdir, "part-*.parquet"))[0],
                os.path.join(staged, f"{i:03d}.parquet"),
            )
        return staged

    def run_once(run_idx, frames):
        staged = stage(run_idx, frames)
        stream = (
            spark.readStream.schema(frames[0].schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staged)
        )
        # per-batch brackets + in-batch bandwidth (steady_state protocol:
        # timestamped listener marks bound the bw windows)
        listener = make_probe_listener(qual)
        spark.streams.addListener(listener)
        b0 = qual.probe()
        t_run0 = time.monotonic()
        bww = bw.window()
        bww.__enter__()
        try:
            q = incremental_embedding_dedup_sink(
                stream, base_dir=base, timeout_sec=3600,
                n_buckets=BUCKETS, bands=BANDS, bits=bits,
            )
            deadline = time.monotonic() + 15
            while (
                len(listener.marks) < len(frames)
                and time.monotonic() < deadline
            ):
                time.sleep(0.1)
        finally:
            bww.__exit__(None, None, None)
            spark.streams.removeListener(listener)
        walls = batch_walls(q)
        assert len(walls) == len(frames), walls
        marks = sorted(listener.marks)
        tags = []
        prev, prev_t = b0, t_run0
        for _bid, after, t_mark in marks:
            ok = qual.clean(prev, after) and (
                bw.leg_clean_full(
                    bw.between(prev_t, t_mark),
                    bw.gather_between(prev_t, t_mark),
                )
                is not False
            )
            tags.append("clean" if ok else "contended")
            prev, prev_t = after, t_mark
        return walls, tags

    # warm-up attach (codegen) on a throwaway base
    warm = os.path.join(WORK, "warm")
    os.makedirs(warm)
    wstage = stage("warm", runs[0][:1])
    incremental_embedding_dedup_sink(
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(wstage),
        base_dir=warm, timeout_sec=3600,
        n_buckets=8, bands=BANDS, bits=bits,
    )
    shutil.rmtree(warm, ignore_errors=True)

    arm_a, arm_b = AB_ARMS
    arms = {arm_a: [], arm_b: []}
    order = [arm_a, arm_b, arm_a, arm_b]
    for run_idx, (arm, frames) in enumerate(zip(order, runs)):
        val = AB_NEW if arm == arm_a else AB_OLD
        if val == "<unset>":
            spark.conf.unset(AB_CONF)
        else:
            spark.conf.set(AB_CONF, val)
        walls, tags, = run_once(run_idx, frames)
        arms[arm].append(
            {
                "batch1": round(walls[0], 2),
                "marginal": [round(w, 2) for w in walls[1:]],
                "windows": tags[1:],
            }
        )
        print(
            f"run {run_idx} [{arm}]: batch1 {walls[0]:.2f}s marginal "
            f"{[round(w, 2) for w in walls[1:]]} {tags[1:]}",
            flush=True,
        )
    spark.conf.unset(AB_CONF)
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)

    committed = {}
    for arm, arm_runs in arms.items():
        clean = [
            w
            for r in arm_runs
            for w, t in zip(r["marginal"], r["windows"])
            if t == "clean"
        ]
        allv = [w for r in arm_runs for w in r["marginal"]]
        vals = clean or allv
        committed[arm] = {
            "steady_sec": round(median(vals), 2),
            "min_sec": round(min(vals), 2),
            "n_clean": len(clean),
            "n_total": len(allv),
            "window": "clean" if len(clean) >= 6 else "contended",
        }
    out = {
        "metric": "fused_probe_ab",
        "ab_conf": {AB_CONF: {"a": AB_NEW, "b": AB_OLD}},
        "order": order,
        **committed,
        "runs": arms,
        "sentinel": {
            "floor": round(qual.floor, 4),
            "limit": round(qual.limit, 4),
            "bw_reference_gbs": round(bw.reference, 1),
            "gather_reference_gbs": round(bw.gather_reference, 2),
        },
    }
    print(json.dumps(out))
    # JSON only: committed SCALE.md entries are hand-written, citing
    # the printed line (the original r13 fused-probe section was
    # tool-appended; that one-shot block was removed with the fused
    # path)


if __name__ == "__main__":
    main()
