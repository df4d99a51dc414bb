#!/usr/bin/env python
"""Steady-state per-batch cost of the streaming gate sinks (r11
verdict #1 — the number that settles the r9-r11 floor thread).

The SCALE sweeps measure attach+one-batch legs, which overstate the
deployed cost: a long-lived sink pays the ~1.8 s per-attach plan
compile and the stream start/stop ONCE, then processes batches at the
marginal rate.  This tool measures that marginal rate directly: ONE
attach, N consecutive genuinely fresh 40-row deltas delivered as N
micro-batches (``maxFilesPerTrigger=1`` + ``availableNow``), per-batch
walls taken from the stream's own progress events
(``durationMs.triggerExecution``).  The committed statistic is the
MEDIAN of batches 2..N — batch 1 carries the first-action plan
compile and is reported separately.

Covers both gate sinks at both decade scales (the SCALE.md:812
protocol: synthetic 2M/20M corpora, real deltas, derived geometry):

* ``incremental_embedding_dedup_sink`` — cosine near-dup gate over the
  (band, cell)-bucketed cell index;
* ``incremental_neardup_sink`` composed with decontamination
  (``eval_docs``) — the full 4-stage curation funnel;
* ``incremental_ivf_index_sink`` (STEADY_KINDS=ivf; r12 verdict #6) —
  the third leased sink: Arrow-batched cell assignment + insert-only
  O(delta) append into the maintained IVF artifact.

EVERY batch is sentinel-bracketed with the bench window qualifier (r11
verdict #2) via a progress-listener probe, AND judged against the
IN-BATCH memory-bandwidth sentinel (r12 verdict Wrong #2: a co-tenant
phase that opens and closes inside one batch is invisible to the
bracketing probes — bench.BandwidthSentinel samples DRAM-copy GB/s at
~1 Hz through the whole run and each batch's window must keep its
median in band); a run with fewer than 3 clean marginal batches
re-runs once on the next set of fresh deltas.
The write-concurrency A/B (r11 verdict #7 lineage) isolates the
write-phase overlap: the MAIN legs run under the current parallel
default (``snapshot.parallelWrites=true`` since the r12 coalescing
round); a control leg re-runs the same embedding-sink shape at 1x with
``snapshot.parallelWrites=false`` (the sequential control).

Usage: python tools/steady_state_sweep.py
Appends a section to SCALE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import math
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

WORK = "/tmp/steady_state_sweep"
# sf0.1 as the DELTA source (2000 embeddings / 5000 docs): two runs of
# 7 fresh 40-row deltas per sink need 560 rows, which sf0.01's 500
# cannot supply
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# Decomposition knobs: STEADY_DELTA_ROWS=1 measures the FIXED per-batch
# machinery floor (per-batch plan analysis, probes, listing, commit,
# manifest walk — a 1-row delta's gate work is ~zero), so
# steady(40) - steady(1) isolates the delta-proportional term.
# STEADY_KINDS / STEADY_SCALES restrict the matrix for cheap reruns
# (e.g. STEADY_KINDS=embdedup STEADY_SCALES=1x).
DELTA_ROWS = int(os.environ.get("STEADY_DELTA_ROWS", "40"))
KINDS = os.environ.get("STEADY_KINDS", "embdedup,neardup_composed").split(",")
SCALES = os.environ.get("STEADY_SCALES", "1x,10x").split(",")
N_BATCHES = 7  # 1 attach batch + 6 marginal batches
BANDS = 3  # embedding sink's band count (matches embdedup_delta_sweep)


def median(vals):
    s = sorted(vals)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def batch_walls(query):
    """Per-micro-batch wall seconds from the stream's progress events,
    input batches only (availableNow appends an empty final trigger)."""
    walls = []
    for p in query.recentProgress:
        if p.get("numInputRows", 0) > 0:
            walls.append(p["durationMs"]["triggerExecution"] / 1000.0)
    return walls


def make_probe_listener(qual):
    """StreamingQueryListener that runs one sentinel probe as each
    micro-batch completes: whole-run brackets cannot see a co-tenant
    window that opens and closes INSIDE a multi-minute N-batch run
    (observed: a 1x fused run committed marginal batches of 15-36 s
    with clean end brackets while the same code measured 9.3-9.6 s in
    quiet windows) — per-batch probes give every marginal batch its
    own bracket, so contended batches are excluded individually.  The
    probe is pure CPU + loopback (no Spark jobs) and costs ~10 ms, so
    running it on the listener thread between batches does not perturb
    the measured stream."""
    from pyspark.sql.streaming import StreamingQueryListener

    class ProbeListener(StreamingQueryListener):
        def __init__(self):
            self.marks: list[tuple[int, int]] = []  # (batchId, probe idx)

        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            try:
                rows = p["numInputRows"]
            except Exception:
                rows = getattr(p, "numInputRows", 0)
            if rows and rows > 0:
                try:
                    bid = p["batchId"]
                except Exception:
                    bid = getattr(p, "batchId", len(self.marks))
                # (batchId, bracket probe idx, monotonic mark) — the
                # mark bounds the batch's in-leg bandwidth window
                self.marks.append((bid, qual.probe(), time.monotonic()))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    return ProbeListener()


def stage_deltas(base, frames):
    """Write each delta frame as one staged file: N files -> N batches
    under maxFilesPerTrigger=1."""
    import glob

    staged = os.path.join(base, "staged")
    os.makedirs(staged)
    for i, dfr in enumerate(frames):
        wdir = os.path.join(base, f"w_{i}")
        dfr.coalesce(1).write.mode("overwrite").parquet(wdir)
        shutil.copy(
            glob.glob(os.path.join(wdir, "part-*.parquet"))[0],
            os.path.join(staged, f"{i:03d}.parquet"),
        )
    return staged


def main() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "88g")
    spark = build_session(app_name="steady_state_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "128")

    import bench

    from arrow_experiments_spark.operators.dedup import (
        _N_BANDS,
        _N_SIGS,
        derive_lsh_bits,
    )
    from arrow_experiments_spark.streaming.egress import (
        _merge_batch,
        derive_index_buckets,
        incremental_embedding_dedup_sink,
        incremental_ivf_index_sink,
        incremental_neardup_sink,
    )
    from arrow_experiments_spark.tables import table

    qual = bench.sweep_qualifier(spark)
    bw = bench.bw_sentinel()

    # ---- fresh-delta supplies (two runs' worth per sink) ----
    emb = table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")

    def slices(src, schema, n_runs=2):
        rows = src.collect()
        need = N_BATCHES * DELTA_ROWS * n_runs
        assert len(rows) >= need, (len(rows), need)
        runs = []
        for r in range(n_runs):
            frames = []
            for i in range(N_BATCHES):
                lo = (r * N_BATCHES + i) * DELTA_ROWS
                frames.append(
                    spark.createDataFrame(
                        rows[lo:lo + DELTA_ROWS], schema
                    )
                )
            runs.append(frames)
        return runs

    emb_runs = slices(
        emb.orderBy("vec_id").limit(N_BATCHES * DELTA_ROWS * 2), emb.schema
    )
    doc_runs = slices(
        docs.orderBy("doc_id").limit(N_BATCHES * DELTA_ROWS * 2), docs.schema
    )
    # decontamination eval set: 20 real docs OUTSIDE the delta slices
    eval_docs = docs.orderBy(F.desc("doc_id")).limit(20).persist()
    eval_docs.count()
    sig_cols = [f"s{i}" for i in range(_N_SIGS)]

    # ---- corpus seeders (the SCALE.md decade protocol) ----
    def seed_embedding(base, rows, buckets, bits):
        vecs_dir = os.path.join(base, "vecs")
        cells_dir = os.path.join(base, "cells")
        idx_buckets = derive_index_buckets(
            BANDS * rows, bands=BANDS, delta_rows=DELTA_ROWS
        )
        seed = spark.range(rows).select(
            (F.col("id") + 10_000_000).alias("vec_id"),
            F.array_repeat(
                (F.col("id") % 997).cast("float") / 7.0, 64
            ).alias("embedding"),
        )
        _merge_batch(
            spark, seed, vecs_dir,
            key_cols=["vec_id"], order_col="vec_id",
            n_buckets=buckets, bucket_cols=None, seq=0, committed=None,
        )
        postings = seed.select(
            "vec_id",
            "embedding",
            F.explode(
                F.array(*[F.lit(b) for b in range(BANDS)])
            ).alias("band"),
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

    def seed_neardup(base, rows, buckets):
        docs_dir = os.path.join(base, "docs")
        bands_dir = os.path.join(base, "bands")
        idx_buckets = derive_index_buckets(
            _N_BANDS * rows, bands=_N_BANDS, delta_rows=DELTA_ROWS
        )
        seed = spark.range(rows).select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.lit("seed").alias("text"),
            F.md5(F.concat(F.lit("seed-"), F.col("id")).cast("binary")).alias(
                "content_hash"
            ),
            *[
                F.substring(
                    F.md5(
                        F.concat(F.lit(f"sig{i}-"), F.col("id")).cast("binary")
                    ),
                    1,
                    8,
                ).alias(f"s{i}")
                for i in range(_N_SIGS)
            ],
        )
        _merge_batch(
            spark, seed, docs_dir,
            key_cols=["content_hash"], order_col="doc_id",
            n_buckets=buckets, bucket_cols=None, seq=0, committed=None,
        )
        bexpr = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.concat(F.col(f"s{2 * b}"), F.col(f"s{2 * b + 1}")).alias(
                        "band_val"
                    ),
                )
                for b in range(_N_BANDS)
            ]
        )
        postings = seed.select(
            "doc_id", *sig_cols, F.explode(bexpr).alias("_b")
        ).select(
            "doc_id",
            F.col("_b.band_idx").alias("band_idx"),
            F.col("_b.band_val").alias("band_val"),
            *sig_cols,
        )
        _merge_batch(
            spark, postings, bands_dir,
            key_cols=["band_idx", "band_val", "doc_id"], order_col="doc_id",
            n_buckets=idx_buckets, bucket_cols=["band_idx", "band_val"],
            seq=0, committed=None,
        )

    def seed_ivf(base, rows, buckets, k):
        """Synthetic postings across the real cell range [0, k), the
        ivf_index_sweep protocol: geometry pinned first, one full
        _merge_batch build."""
        cells_dir = os.path.join(base, "cells")
        with open(os.path.join(base, "_GEOMETRY.json"), "w") as f:
            json.dump({"ivf_k": k}, f)
        seed = spark.range(rows).select(
            F.pmod(F.xxhash64("id"), F.lit(k)).cast("int").alias("cell"),
            (F.col("id") + 10_000_000).alias("vec_id"),
            F.array_repeat(
                (F.col("id") % 997).cast("float") / 7.0, 64
            ).alias("embedding"),
        )
        _merge_batch(
            spark, seed, cells_dir,
            key_cols=["cell", "vec_id"], order_col="vec_id",
            n_buckets=buckets, bucket_cols=["cell"], seq=0, committed=None,
        )

    def run_sink(kind, base, frames, buckets, bits, k=None):
        """One attach, N batches; returns (batch walls, per-batch
        window tags, attach-to-stop wall).  Every batch gets its OWN
        sentinel bracket via the progress listener — a whole-run
        bracket cannot see a co-tenant window inside a multi-minute
        run."""
        staged = stage_deltas(
            os.path.join(base, f"run{len(os.listdir(base))}"), frames
        )
        stream = (
            spark.readStream.schema(frames[0].schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staged)
        )
        listener = make_probe_listener(qual)
        spark.streams.addListener(listener)
        b0 = qual.probe()
        t_run0 = time.monotonic()
        bww = bw.window()
        bww.__enter__()
        try:
            t0 = time.perf_counter()
            if kind == "embdedup":
                q = incremental_embedding_dedup_sink(
                    stream, base_dir=base, timeout_sec=3600,
                    n_buckets=buckets, bands=BANDS, bits=bits,
                )
            elif kind == "ivf":
                q = incremental_ivf_index_sink(
                    stream, base_dir=base, timeout_sec=3600,
                    n_buckets=buckets, k=k,
                )
            else:
                q = incremental_neardup_sink(
                    stream, base_dir=base, timeout_sec=3600,
                    n_buckets=buckets, eval_docs=eval_docs,
                )
            total = time.perf_counter() - t0
            # the listener bus is async: drain the final progress event
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
        assert len(marks) == len(walls), (marks, walls)
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
        return walls, tags, total

    # warm-up: throwaway attach per sink kind (session codegen)
    for kind, frames in (
        ("embdedup", emb_runs[0][:1]),
        ("neardup", doc_runs[0][:1]),
        ("ivf", emb_runs[0][:1]),
    ):
        if kind == "embdedup" and "embdedup" not in KINDS:
            continue
        if kind == "neardup" and "neardup_composed" not in KINDS:
            continue
        if kind == "ivf" and "ivf" not in KINDS:
            continue
        warm = os.path.join(WORK, f"warm_{kind}")
        os.makedirs(warm)
        run_frames = [frames[0]] * 1
        try:
            run_sink(kind, warm, run_frames, 64, 10, k=8)
        finally:
            shutil.rmtree(warm, ignore_errors=True)

    results: dict[str, dict] = {}
    ab_result: dict | None = None
    for kind, runs_frames in (
        ("embdedup", emb_runs),
        ("neardup_composed", doc_runs),
        ("ivf", emb_runs),
    ):
        if kind not in KINDS:
            continue
        results[kind] = {}
        for scale, rows, buckets in (
            ("1x", 2_000_000, 64),
            ("10x", 20_000_000, 640),
        ):
            if scale not in SCALES:
                continue
            bits = derive_lsh_bits(rows, 2000)
            # the ivf artifact's codebook size: the _ivf_k
            # N/targetCellPop rule (ivf_index_sweep protocol)
            k = max(8, math.ceil(rows / 2000))
            base = os.path.join(WORK, f"{kind}_{scale}")
            os.makedirs(base)
            t0 = time.perf_counter()
            if kind == "embdedup":
                seed_embedding(base, rows, buckets, bits)
            elif kind == "ivf":
                seed_ivf(base, rows, buckets, k)
            else:
                seed_neardup(base, rows, buckets)
            t_seed = time.perf_counter() - t0
            print(f"{kind} {scale}: seeded {rows:,} rows: {t_seed:.1f}s",
                  flush=True)

            committed = None
            for attempt, frames in enumerate(runs_frames):
                walls, tags, total = run_sink(
                    kind, base, frames, buckets, bits, k=k
                )
                clean_marginal = [
                    w for w, t in zip(walls[1:], tags[1:]) if t == "clean"
                ]
                # the committed statistic is the median of the CLEAN
                # marginal batches; the run is trusted when at least 3
                # of the 6 marginal batches were clean-bracketed
                tag = "clean" if len(clean_marginal) >= 3 else "contended"
                vals = clean_marginal or walls[1:]
                committed = {
                    "rows": rows,
                    "batch1_sec": round(walls[0], 2),
                    "batch1_window": tags[0],
                    "marginal_sec": [round(w, 2) for w in walls[1:]],
                    "marginal_window": tags[1:],
                    "steady_sec": round(median(vals), 2),
                    "steady_min_sec": round(min(vals), 2),
                    "attach_run_sec": round(total, 2),
                    "seed_sec": round(t_seed, 1),
                    "window": tag,
                    "attempt": attempt + 1,
                }
                print(f"{kind} {scale} attempt {attempt + 1}: batch1 "
                      f"{committed['batch1_sec']}s, marginal "
                      f"{committed['marginal_sec']} {tags[1:]} -> steady "
                      f"{committed['steady_sec']}s [{tag}]", flush=True)
                if tag == "clean":
                    break
            results[kind][scale] = committed

            # write-concurrency A/B at 1x on the embedding sink (r11
            # verdict #7 lineage): the MAIN legs above run the default
            # (parallel since the coalescing round); this leg re-runs
            # the same shape with snapshot.parallelWrites=false to keep
            # the sequential control measured — fresh deltas come from
            # the second run's supply when the first attempt was clean
            # (it is otherwise consumed by the retry; skip then)
            if (
                kind == "embdedup"
                and scale == "1x"
                and committed["window"] == "clean"
                and committed["attempt"] == 1
            ):
                from arrow_experiments_spark.streaming.egress import (
                    _PARALLEL_WRITES_CONF,
                )

                spark.conf.set(_PARALLEL_WRITES_CONF, "false")
                try:
                    walls_seq, tags_seq, _ = run_sink(
                        kind, base, runs_frames[1], buckets, bits
                    )
                finally:
                    spark.conf.unset(_PARALLEL_WRITES_CONF)
                seq_clean = [
                    w
                    for w, t in zip(walls_seq[1:], tags_seq[1:])
                    if t == "clean"
                ]
                ab_result = {
                    "parallel_steady_sec": committed["steady_sec"],
                    "sequential_steady_sec": round(
                        median(seq_clean or walls_seq[1:]), 2
                    ),
                    "sequential_marginal_sec": [
                        round(w, 2) for w in walls_seq[1:]
                    ],
                    "sequential_marginal_window": tags_seq[1:],
                    "window": (
                        "clean" if len(seq_clean) >= 3 else "contended"
                    ),
                }
                print(f"A/B parallel-default {ab_result['parallel_steady_sec']}s"
                      f" vs sequential {ab_result['sequential_steady_sec']}s "
                      f"[{ab_result['window']}]", flush=True)
            shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)

    full_matrix = (
        DELTA_ROWS == 40
        and set(KINDS) >= {"embdedup", "neardup_composed"}
        and set(SCALES) >= {"1x", "10x"}
    )
    ivf_matrix = (
        DELTA_ROWS == 40
        and "ivf" in KINDS
        and set(SCALES) >= {"1x", "10x"}
    )
    if ivf_matrix and "ivf" in results:
        # r12 verdict #6: the third leased sink's steady-state row
        lines = [
            "",
            "## Steady-state per-batch cost of the IVF index sink"
            " (round 13)",
            "",
            "r12 verdict #6: the third leased sink"
            " (`incremental_ivf_index_sink`) had decade sweeps but no",
            "steady-state row.  Same protocol as the gate-sink table"
            " (ONE attach, 7 fresh",
            "40-row deltas as micro-batches, per-batch walls from"
            " progress events, every",
            "batch bracket- AND in-batch-bandwidth-qualified;"
            " synthetic postings seed, k per",
            "the N/targetCellPop rule):",
            "",
            "| corpus | batch 1 (s) | steady state (s, median of clean"
            " 2..7) | min | marginal batches (s) | batch windows"
            " | run |",
            "|---|---|---|---|---|---|---|",
        ]
        for scale in ("1x", "10x"):
            r = results["ivf"][scale]
            wins = ", ".join(
                "c" if t == "clean" else "X" for t in r["marginal_window"]
            )
            lines.append(
                f"| {r['rows']:,} postings ({scale}) | {r['batch1_sec']} "
                f"| **{r['steady_sec']}** | {r['steady_min_sec']} "
                f"| {r['marginal_sec']} | {wins} | {r['window']} |"
            )
        ratio = round(
            results["ivf"]["10x"]["steady_sec"]
            / max(results["ivf"]["1x"]["steady_sec"], 1e-9),
            2,
        )
        lines += [
            "",
            f"IVF sink steady-state decade ratio: {ratio}x (1.0 = flat).",
            "The sink has no gate legs — its per-batch cost is cell",
            "assignment (one Arrow-batched kernel over the delta) + the",
            "insert-only O(delta) merge — so its steady state is the",
            "per-batch machinery floor nearly alone.",
            "",
        ]
        with open(Path(_REPO, "SCALE.md"), "a") as fh:
            fh.write("\n".join(lines))
    if not full_matrix:
        # restricted decomposition run: JSON line only (plus the IVF
        # section above when the ivf matrix ran); the full-matrix run
        # owns the committed gate-sink table
        print(
            json.dumps(
                {
                    "metric": "steady_state_sweep",
                    "delta_rows": DELTA_ROWS,
                    **results,
                    "sentinel": {
                        "floor": round(qual.floor, 4),
                        "limit": round(qual.limit, 4),
                        "bw_reference_gbs": round(bw.reference, 1),
                        "gather_reference_gbs": round(bw.gather_reference, 2),
                    },
                }
            )
        )
        return

    lines = [
        "",
        "## Steady-state per-batch cost of the gate sinks (round 13 confirmation)",
        "",
        "r11 verdict #1: the per-leg sweeps conflate the ~1.8 s per-attach",
        "plan compile and stream start/stop with the deployed cadence.  This",
        "table is the number that matters: ONE attach, 7 consecutive fresh",
        "40-row deltas as 7 micro-batches (maxFilesPerTrigger=1), per-batch",
        "walls from the stream's own progress events.  EVERY batch gets its",
        "own sentinel bracket (a progress-listener probe fires as each batch",
        "completes — a whole-run bracket cannot see a co-tenant window that",
        "opens inside a multi-minute run; one did, in this tool's first",
        "form).  Committed statistic = median of the CLEAN batches among",
        "2..7; batch 1 (first-action plan compile) shown separately; a run",
        "with fewer than 3 clean marginal batches re-runs on fresh deltas.",
        "Decade protocol identical to the delta sweeps (synthetic seeds,",
        "derived geometry, real deltas).",
        "",
        "| sink | corpus | batch 1 (s) | steady state (s, median of clean 2..7) | min | marginal batches (s) | batch windows | run |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for kind in ("embdedup", "neardup_composed"):
        for scale in ("1x", "10x"):
            r = results[kind][scale]
            wins = ", ".join(
                "c" if t == "clean" else "X" for t in r["marginal_window"]
            )
            lines.append(
                f"| {kind} | {r['rows']:,} | {r['batch1_sec']} "
                f"| **{r['steady_sec']}** | {r['steady_min_sec']} "
                f"| {r['marginal_sec']} | {wins} | {r['window']} |"
            )
    emb_ratio = round(
        results["embdedup"]["10x"]["steady_sec"]
        / max(results["embdedup"]["1x"]["steady_sec"], 1e-9),
        2,
    )
    nd_ratio = round(
        results["neardup_composed"]["10x"]["steady_sec"]
        / max(results["neardup_composed"]["1x"]["steady_sec"], 1e-9),
        2,
    )
    lines += [
        "",
        f"Steady-state decade ratios: embedding gate {emb_ratio}x, composed",
        f"funnel {nd_ratio}x (1.0 = flat).",
    ]
    if ab_result is not None:
        lines += [
            "",
            "Write-phase concurrency A/B (embedding sink at 1x, same",
            "protocol): parallel default",
            f"{ab_result['parallel_steady_sec']}s vs sequential",
            f"(snapshot.parallelWrites=false) {ab_result['sequential_steady_sec']}s",
            f"steady state (sequential marginal {ab_result['sequential_marginal_sec']},",
            f"window {ab_result['window']}).  With size-coalesced delta",
            "stages the write legs are ~1-task jobs bound by driver",
            "plan/commit latency, so overlapping them is nearly free —",
            "the pre-coalescing oversubscription loss no longer applies;",
            "the ordered deferred commits (docs-before-bands without",
            "read-back) are identical in both modes.",
        ]
    lines.append("")
    with open(Path(_REPO, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines))
    print(
        json.dumps(
            {
                "metric": "steady_state_sweep",
                **results,
                "ab_fused_vs_sequential": ab_result,
                "sentinel": {
                    "floor": round(qual.floor, 4),
                    "limit": round(qual.limit, 4),
                    "samples": [round(s, 3) for s in qual.samples],
                    "bw_reference_gbs": round(bw.reference, 1),
                        "gather_reference_gbs": round(bw.gather_reference, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
