#!/usr/bin/env python
"""Streaming embedding dedup gate: delta wall vs corpus scale.

``incremental_embedding_dedup_sink``'s scale terms mirror the MinHash
sink's: bucket-pruned first-seen anti-join on ``vec_id``, delta-sized
cell assignment, a bucket-pruned probe of the (band, cell)-bucketed
CELL INDEX, and two O(delta) version merges.  The geometry knob that
makes the probe prune at scale is the BIT COUNT: at the fixture's 4
bits only 16 cells/band exist, so this sweep derives bits from corpus
size exactly as the batch ops do (``derive_lsh_bits``: 10 bits at 2M,
14 at 20M — cell population held ~constant), making the touched-bucket
set a small fraction of the index.

Protocol: two corpora (2M vectors / 64 buckets, 20M / 640) seeded via
the merge core with synthetic embeddings and SYNTHETIC DISJOINT cell
ids (>= 2^bits, unreachable by any real vector's sign pattern) — the
delta's probes therefore read real pruned buckets but match nothing,
so the survivor set is identical at both scales and the measured
corpus-scaling term is the probe/merge machinery itself.  The SAME
40-vector real delta (sf0.01 embeddings) runs the full sink leg; the
in-batch pairwise verify still does real cosine work.  The reference
column times the UNPRUNED probe: the delta's cell rows joined against
the FULL flattened index.  (Synthetic embeddings compress better than
real ones, understating absolute read cost equally at both scales —
the flatness RATIO is unaffected.)

Usage: python tools/embdedup_delta_sweep.py
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

WORK = "/tmp/embdedup_delta_sweep"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
DELTA_VECS = 40
BANDS = 3
MAX_LEGS = 4  # fresh deltas available per scale; stop at 2 clean


def main() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    # the 60M-posting seed sorts 64-float arrays under the merge window:
    # large heap + more (smaller) sort tasks keep execution memory sane
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "88g")
    spark = build_session(app_name="embdedup_delta_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "128")

    import bench

    from arrow_experiments_spark.operators.dedup import derive_lsh_bits
    from arrow_experiments_spark.operators.similarity import lsh_bucket_col
    from arrow_experiments_spark.streaming.egress import (
        _merge_batch,
        derive_index_buckets,
        incremental_embedding_dedup_sink,
        read_snapshot,
    )
    from arrow_experiments_spark.tables import table

    emb = table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    # MAX_LEGS genuinely fresh 40-vector deltas (disjoint id slices) —
    # the window qualifier re-runs a contended leg with the NEXT fresh
    # delta, never a replay (a replay is an idempotent skip, not a
    # measurement).  The same slices serve both scales so per-delta
    # survivor counts are cross-scale comparable.
    head = emb.orderBy("vec_id").limit(DELTA_VECS * MAX_LEGS).collect()
    assert len(head) == DELTA_VECS * MAX_LEGS
    deltas = [
        spark.createDataFrame(
            head[i * DELTA_VECS:(i + 1) * DELTA_VECS], emb.schema
        ).persist()
        for i in range(MAX_LEGS)
    ]
    for d in deltas:
        d.count()
    delta = deltas[0]

    # sentinel window qualifier, ported from bench.py (r11 verdict #2):
    # each measured leg is bracketed by probes; contended legs re-run
    # on fresh deltas in-invocation; committed stat = min of CLEAN legs
    qual = bench.sweep_qualifier(spark)
    bw = bench.bw_sentinel()

    # warm-up: throwaway sink run (codegen + stream machinery)
    warm = os.path.join(WORK, "warm")
    os.makedirs(os.path.join(warm, "staged"))
    wdir = os.path.join(warm, "w")
    delta.coalesce(1).write.mode("overwrite").parquet(wdir)
    shutil.copy(
        glob.glob(os.path.join(wdir, "part-*.parquet"))[0],
        os.path.join(warm, "staged", "000.parquet"),
    )
    incremental_embedding_dedup_sink(
        spark.readStream.schema(delta.schema).parquet(
            os.path.join(warm, "staged")
        ),
        base_dir=os.path.join(warm, "base"),
        timeout_sec=3600,
        n_buckets=64,
        bits=10,
    )
    shutil.rmtree(warm, ignore_errors=True)

    results = {}
    surv_by_delta: dict[str, list[int]] = {}  # scale -> survivors per leg
    for scale, rows, buckets in (("1x", 2_000_000, 64), ("10x", 20_000_000, 640)):
        bits = derive_lsh_bits(rows, 2000)
        # conf-free index geometry (r10 verdict #4): the cell index's
        # bucket count comes from the same public derivation the sink
        # applies at attach — corpus postings / 50k-per-bucket, floored
        # at 4·bands·delta so the delta's touched set is a fraction of
        # the index even at 1x (the old pinned 64 made every commit
        # scan the WHOLE 6M-posting slice).  The sink then ADOPTS the
        # committed layout (index_buckets=None).
        idx_buckets = derive_index_buckets(
            BANDS * rows, bands=BANDS, delta_rows=DELTA_VECS
        )
        base = os.path.join(WORK, scale)
        os.makedirs(base)
        vecs_dir = os.path.join(base, "vecs")
        cells_dir = os.path.join(base, "cells")

        # synthetic vectors; one varying float slot keeps parquet honest-ish
        seed = spark.range(rows).select(
            (F.col("id") + 10_000_000).alias("vec_id"),
            F.array_repeat(
                (F.col("id") % 997).cast("float") / 7.0, 64
            ).alias("embedding"),
        )
        t0 = time.perf_counter()
        _merge_batch(
            spark, seed, vecs_dir,
            key_cols=["vec_id"], order_col="vec_id",
            n_buckets=buckets, bucket_cols=None, seq=0, committed=None,
        )
        # DISJOINT synthetic cells: >= 2^bits, so real probes never match
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
        t_seed = time.perf_counter() - t0
        print(
            f"{scale}: seeded {rows:,} vectors + {BANDS * rows:,} postings"
            f" / {buckets} vec buckets, {idx_buckets} index buckets at "
            f"{bits} bits: {t_seed:.2f}s",
            flush=True,
        )

        # reference: the UNPRUNED probe — delta cell rows vs the FULL
        # flattened SEED index (before the sink adds the delta's own
        # postings, which would self-match)
        dcells = delta.select(
            "vec_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            lsh_bucket_col(F.col("embedding"), b, bits).alias(
                                "cell"
                            ),
                        )
                        for b in range(BANDS)
                    ]
                )
            ).alias("_c"),
        ).select("vec_id", "_c.band", "_c.cell")
        seed_index = read_snapshot(spark, cells_dir)
        t0 = time.perf_counter()
        n_hits = dcells.join(
            seed_index.select("band", "cell"), ["band", "cell"]
        ).count()
        t_unpruned = time.perf_counter() - t0
        assert n_hits == 0  # disjoint by construction

        # window-qualified fresh-delta legs (r11 verdict #2): each leg
        # is sentinel-bracketed; a contended leg re-runs on the NEXT
        # fresh delta in-invocation; committed number = min of CLEAN
        # legs (min-of-2-clean replaces the hand-adjudicated
        # min-over-N of rounds 9-11).  Every leg exercises the full
        # gate + fused-merge path against the committed corpus.
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
                incremental_embedding_dedup_sink(
                    spark.readStream.schema(dfr.schema).parquet(staged_i),
                    base_dir=base,
                    timeout_sec=3600,
                    n_buckets=buckets,
                    bands=BANDS,
                    bits=bits,
                )
                dt = time.perf_counter() - t0
                now = read_snapshot(spark, vecs_dir).count()
                surv_progression.append(now - count_before[0])
                count_before[0] = now
                return dt

            return leg

        t_delta, window_tag, legs = bench.qualified_legs(
            qual, [make_leg(i, d) for i, d in enumerate(deltas)], bw=bw
        )
        surv_by_delta[scale] = surv_progression

        vecs = read_snapshot(spark, vecs_dir)
        n_final = vecs.count()
        survivors = n_final - rows
        assert survivors > 0, survivors
        index = read_snapshot(spark, cells_dir)
        n_postings = index.count()
        assert n_postings == BANDS * rows + BANDS * survivors, n_postings

        # idempotence: re-delivering BOTH deltas adds nothing
        staged_all = os.path.join(base, "staged_all")
        os.makedirs(staged_all)
        for i, src in enumerate(staged_files):
            shutil.copy(src, os.path.join(staged_all, f"{i:03d}.parquet"))
        incremental_embedding_dedup_sink(
            spark.readStream.schema(delta.schema).parquet(staged_all),
            base_dir=base,
            timeout_sec=3600,
            n_buckets=buckets,
            bands=BANDS,
            bits=bits,
        )
        assert read_snapshot(spark, vecs_dir).count() == n_final
        assert read_snapshot(spark, cells_dir).count() == n_postings

        print(
            f"{scale}: {len(legs)} deltas x {DELTA_VECS} vectors -> "
            f"{survivors} survivors: legs {legs} -> {t_delta:.2f}s "
            f"[{window_tag}] (unpruned full-index probe ref "
            f"{t_unpruned:.2f}s)",
            flush=True,
        )
        results[scale] = {
            "rows": rows,
            "postings": BANDS * rows,
            "buckets": buckets,
            "index_buckets": idx_buckets,
            "bits": bits,
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
    # same gate outcome per COMMON delta at both scales (scales may run
    # different leg counts when the qualifier retries a contended leg)
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
        "## Streaming embedding dedup gate: delta wall vs corpus scale (round 12, window-qualified)",
        "",
        "Same decade protocol as rounds 9-11 (synthetic disjoint-cell",
        "seeds, real 40-vector deltas, derived geometry) but the legs are",
        "now SENTINEL-QUALIFIED (r11 verdict #2 — the bench.py window",
        "qualifier ported into this sweep): every leg is bracketed by",
        "sentinel probes, a contended leg re-runs on the NEXT fresh delta",
        "in-invocation, and the committed number is the min of CLEAN legs",
        "only — the min-over-N + hand-discard adjudication of earlier",
        "rounds is mechanical now.  Per-leg window tags are recorded here",
        "and in the JSON line.",
        "",
        "| corpus | cell postings | index buckets | bits | delta leg (s) | window | legs | unpruned index probe alone (s) |",
        "|---|---|---|---|---|---|---|---|",
        f"| {r1['rows']:,} vectors | {r1['postings']:,} | {r1['index_buckets']} "
        f"| {r1['bits']} | {r1['delta_sec']} | {r1['window']} | {legfmt(r1)} "
        f"| {r1['unpruned_probe_sec']} |",
        f"| {r10['rows']:,} vectors (10×) | {r10['postings']:,} | {r10['index_buckets']} "
        f"| {r10['bits']} | **{r10['delta_sec']}** | {r10['window']} | {legfmt(r10)} "
        f"| {r10['unpruned_probe_sec']} |",
        "",
        f"Delta-leg ratio at 10× the corpus: "
        f"{r10['delta_sec'] / max(r1['delta_sec'], 1e-9):.2f}× (1.0 = flat).",
        "Same reading as the MinHash table: the unpruned probe scans every",
        "posting and grows with the corpus; the pruned probe reads at most",
        "min(bands·delta, n_buckets) index buckets regardless of corpus",
        "size.  (Synthetic embeddings compress better than real ones —",
        "absolute read costs are understated equally at both scales; the",
        "ratio is the claim.)",
        "",
    ]
    with open(Path(_REPO, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines))
    print(
        json.dumps(
            {
                "metric": "embdedup_delta_sweep",
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
