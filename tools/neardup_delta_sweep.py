#!/usr/bin/env python
"""Streaming near-dup gate: delta wall vs corpus scale (round 9).

``incremental_neardup_sink`` maintains two bucketed snapshots — the
curated corpus and its LSH band INDEX (bucketed on the band value via
``bucket_cols``).  The scale claim: a fixed-size delta pays the same
wall against a 10x bigger corpus, because every corpus-sized structure
it touches is bucket-pruned — the exact-hash anti-join reads only the
delta's hash buckets, and the band probe reads only the buckets the
delta's band values hash into.  Before bucketed indexes, the probe side
of near-dup ingestion was a full index scan per delta.

Protocol: two corpora (2M docs / 64 buckets, 20M / 640 — constant
per-bucket size), each seeded DIRECTLY via the merge core with
synthetic signatures (8-hex synthetic sigs; real deltas carry 32-hex
md5 minima — disjoint value spaces, zero accidental band collisions),
and the matching band index (4 postings/doc, 8M / 80M rows) derived
from the same sigs.  Then the SAME 40-document delta (real sf0.01
docs) runs the FULL sink leg — quality gate + exact anti-join +
MinHash + band probe + verify + two version merges.  A reference
column times the UNPRUNED band probe: the delta's band rows joined
against the FULL flattened index (the pre-bucketing shape).  Verified
per scale: survivors merged with 4 postings each, re-delivery adds 0.

Usage: python tools/neardup_delta_sweep.py
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

from arrow_experiments_spark.session import build_session

WORK = "/tmp/neardup_delta_sweep"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
DELTA_DOCS = 40
MAX_LEGS = 4  # fresh deltas available per scale; stop at 2 clean


def main() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    # the 80M-posting seed sorts 12 wide string columns under the window;
    # the 8g test default OOMs execution memory at 32 threads
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = build_session(app_name="neardup_delta_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    from arrow_experiments_spark.functions.text import (
        minhash_sig,
        shingles3,
        tokens,
    )
    from arrow_experiments_spark.operators.dedup import _N_BANDS, _N_SIGS
    from arrow_experiments_spark.streaming.egress import (
        _merge_batch,
        derive_index_buckets,
        incremental_neardup_sink,
        read_snapshot,
    )
    from arrow_experiments_spark.tables import table

    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    # MAX_LEGS genuinely fresh 40-document deltas (disjoint id slices):
    # the window qualifier re-runs a contended leg with the NEXT fresh
    # delta, never a replay.  Same slices at both scales so per-delta
    # survivor counts are cross-scale comparable.
    head = docs.orderBy("doc_id").limit(DELTA_DOCS * MAX_LEGS).collect()
    assert len(head) == DELTA_DOCS * MAX_LEGS
    deltas = [
        spark.createDataFrame(
            head[i * DELTA_DOCS:(i + 1) * DELTA_DOCS], docs.schema
        ).persist()
        for i in range(MAX_LEGS)
    ]
    for d in deltas:
        d.count()
    delta = deltas[0]
    sig_cols = [f"s{i}" for i in range(_N_SIGS)]

    # sentinel window qualifier, ported from bench.py (r11 verdict #2)
    qual = bench.sweep_qualifier(spark)
    bw = bench.bw_sentinel()

    # the delta's band rows, for the unpruned-probe reference (same
    # derivation the sink runs)
    toks = delta.select("doc_id", tokens(F.col("text")).alias("toks")).persist()
    sh = toks.select(
        "doc_id", F.array_distinct(shingles3(F.col("toks"))).alias("sh")
    ).persist()
    dsigs = sh.select(
        "doc_id",
        *[minhash_sig(F.col("sh"), i).alias(f"s{i}") for i in range(_N_SIGS)],
    ).persist()
    dsigs.count()

    def band_rows(frame, keep_sigs=False):
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
        extra = sig_cols if keep_sigs else []
        return frame.select(
            "doc_id", *extra, F.explode(bexpr).alias("_b")
        ).select(
            "doc_id",
            F.col("_b.band_idx").alias("band_idx"),
            F.col("_b.band_val").alias("band_val"),
            *extra,
        )

    dbands = band_rows(dsigs).persist()
    dbands.count()

    # warm-up: one throwaway sink run so the first measured leg doesn't
    # carry session codegen/stream-machinery warm-up
    warm = os.path.join(WORK, "warm")
    os.makedirs(os.path.join(warm, "staged"))
    wdir = os.path.join(warm, "w")
    delta.coalesce(1).write.mode("overwrite").parquet(wdir)
    shutil.copy(
        glob.glob(os.path.join(wdir, "part-*.parquet"))[0],
        os.path.join(warm, "staged", "000.parquet"),
    )
    incremental_neardup_sink(
        spark.readStream.schema(delta.schema).parquet(
            os.path.join(warm, "staged")
        ),
        base_dir=os.path.join(warm, "base"),
        timeout_sec=3600,
        n_buckets=64,
    )
    shutil.rmtree(warm, ignore_errors=True)

    results = {}
    surv_by_delta: dict[str, list[int]] = {}  # scale -> survivors per leg
    for scale, rows, buckets in (("1x", 2_000_000, 64), ("10x", 20_000_000, 640)):
        # conf-free band-index geometry (r10 verdict #4) — same public
        # derivation the sink applies at attach; the sink then ADOPTS
        # the committed layout (index_buckets=None)
        idx_buckets = derive_index_buckets(
            4 * rows, bands=4, delta_rows=DELTA_DOCS
        )
        base = os.path.join(WORK, scale)
        os.makedirs(base)
        docs_dir = os.path.join(base, "docs")
        bands_dir = os.path.join(base, "bands")

        # synthetic corpus: 8-hex sigs (disjoint from real 32-hex minima)
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
        t0 = time.perf_counter()
        _merge_batch(
            spark, seed, docs_dir,
            key_cols=["content_hash"], order_col="doc_id",
            n_buckets=buckets, bucket_cols=None, seq=0, committed=None,
        )
        postings = band_rows(seed, keep_sigs=True)
        _merge_batch(
            spark, postings, bands_dir,
            key_cols=["band_idx", "band_val", "doc_id"], order_col="doc_id",
            n_buckets=idx_buckets, bucket_cols=["band_idx", "band_val"],
            seq=0, committed=None,
        )
        t_seed = time.perf_counter() - t0
        print(
            f"{scale}: seeded {rows:,} docs + {4 * rows:,} postings / "
            f"{buckets} doc buckets, {idx_buckets} index buckets: "
            f"{t_seed:.2f}s",
            flush=True,
        )

        # window-qualified fresh-delta legs (r11 verdict #2): each leg
        # runs the real sink end-to-end on a fresh 40-doc delta between
        # sentinel probes; contended legs re-run on the NEXT fresh
        # delta; committed number = min of CLEAN legs
        staged_files: list[str] = []
        surv_progression: list[int] = []
        count_before = [rows]

        def make_leg(i: int, dfr):
            def leg() -> float:
                staged_i = os.path.join(base, f"staged_d{i}")
                os.makedirs(staged_i)
                wdir = os.path.join(base, f"w_d{i}")
                dfr.coalesce(1).write.mode("overwrite").parquet(wdir)
                src = glob.glob(os.path.join(wdir, "part-*.parquet"))[0]
                shutil.copy(src, os.path.join(staged_i, "000.parquet"))
                staged_files.append(src)
                t0 = time.perf_counter()
                incremental_neardup_sink(
                    spark.readStream.schema(dfr.schema).parquet(staged_i),
                    base_dir=base,
                    timeout_sec=3600,
                    n_buckets=buckets,
                )
                dt = time.perf_counter() - t0
                now = read_snapshot(spark, docs_dir).count()
                surv_progression.append(now - count_before[0])
                count_before[0] = now
                return dt

            return leg

        t_delta, window_tag, legs = bench.qualified_legs(
            qual, [make_leg(i, d) for i, d in enumerate(deltas)], bw=bw
        )
        surv_by_delta[scale] = surv_progression

        corpus = read_snapshot(spark, docs_dir)
        n_final = corpus.count()
        survivors = n_final - rows
        assert survivors > 0, survivors
        index = read_snapshot(spark, bands_dir)
        n_postings = index.count()
        assert n_postings == 4 * rows + 4 * survivors, (n_postings, survivors)

        # reference: the UNPRUNED band probe — delta bands vs the FULL
        # flattened index (pre-bucketing shape)
        t0 = time.perf_counter()
        n_hits = (
            dbands.join(
                index.select("band_idx", "band_val"), ["band_idx", "band_val"]
            ).count()
        )
        t_unpruned = time.perf_counter() - t0

        # idempotence: re-delivering every ingested delta adds nothing
        staged_all = os.path.join(base, "staged_all")
        os.makedirs(staged_all)
        for i, src in enumerate(staged_files):
            shutil.copy(src, os.path.join(staged_all, f"{i:03d}.parquet"))
        incremental_neardup_sink(
            spark.readStream.schema(delta.schema).parquet(staged_all),
            base_dir=base,
            timeout_sec=3600,
            n_buckets=buckets,
        )
        assert read_snapshot(spark, docs_dir).count() == n_final
        assert read_snapshot(spark, bands_dir).count() == n_postings

        print(
            f"{scale}: {len(legs)} deltas x {DELTA_DOCS} docs -> "
            f"{survivors} survivors: legs {legs} -> {t_delta:.2f}s "
            f"[{window_tag}] (unpruned full-index probe ref "
            f"{t_unpruned:.2f}s, {n_hits} hits)",
            flush=True,
        )
        results[scale] = {
            "rows": rows,
            "postings": 4 * rows,
            "buckets": buckets,
            "index_buckets": idx_buckets,
            "seed_sec": round(t_seed, 2),
            "delta_sec": round(t_delta, 2),
            "delta_legs": legs,
            "window": window_tag,
            "survivors": survivors,
            "unpruned_probe_sec": round(t_unpruned, 2),
        }
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)
    # same gate outcome per COMMON delta at both scales
    common = min(len(v) for v in surv_by_delta.values())
    assert (
        surv_by_delta["1x"][:common] == surv_by_delta["10x"][:common]
    ), surv_by_delta

    r1, r10 = results["1x"], results["10x"]

    def legfmt(r):
        return ", ".join(
            f"{g['sec']}s [{g['window']}]" for g in r["delta_legs"]
        )

    lines = [
        "",
        "## Streaming near-dup gate: delta wall vs corpus scale (round 12, window-qualified)",
        "",
        "incremental_neardup_sink maintains the curated corpus AND its LSH",
        "band index as bucketed versioned snapshots (the index bucketed on",
        "the band value via bucket_cols), so a delta's near-dup gate pays:",
        "bucket-pruned exact anti-join, one delta-sized MinHash pass, a",
        "bucket-pruned band probe verified by signature agreement against",
        "the postings' denormalized sigs (zero corpus re-tokenization), and",
        "two O(delta) version merges.  Legs are SENTINEL-QUALIFIED (r11",
        "verdict #2 — the bench.py window qualifier ported here): each",
        f"fresh {DELTA_DOCS}-document real delta is bracketed by sentinel",
        "probes, contended legs re-run on the next fresh delta, committed",
        "number = min of CLEAN legs.  Verified per scale: survivors merged",
        "with 4 postings each, re-delivery adds zero rows to either",
        "snapshot; per-delta survivor counts asserted equal across scales.",
        "",
        "| corpus | band postings | buckets | delta leg (s) | window | legs | unpruned index probe alone (s) |",
        "|---|---|---|---|---|---|---|",
        f"| {r1['rows']:,} docs | {r1['postings']:,} | {r1['buckets']} "
        f"| {r1['delta_sec']} | {r1['window']} | {legfmt(r1)} "
        f"| {r1['unpruned_probe_sec']} |",
        f"| {r10['rows']:,} docs (10×) | {r10['postings']:,} | {r10['buckets']} "
        f"| **{r10['delta_sec']}** | {r10['window']} | {legfmt(r10)} "
        f"| {r10['unpruned_probe_sec']} |",
        "",
        f"Delta-leg ratio at 10× the corpus: "
        f"{r10['delta_sec'] / max(r1['delta_sec'], 1e-9):.2f}× (1.0 = flat).",
        "The unpruned column is the pre-bucketing probe: it scans all",
        "postings per delta and grows with the corpus; the pruned probe",
        "reads at most min(4·delta, n_buckets) index buckets regardless of",
        "corpus size, so the gate's floor is the delta, not the index.",
        "",
    ]
    with open(Path(_REPO, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines))
    print(
        json.dumps(
            {
                "metric": "neardup_delta_sweep",
                **results,
                "sentinel": {
                    "floor": round(qual.floor, 4),
                    "limit": round(qual.limit, 4),
                    "samples": [round(s, 3) for s in qual.samples],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
