#!/usr/bin/env python
"""Composed curation sink: the FULL funnel (quality -> exact -> near-dup
-> benchmark decontamination) as one delta job, delta wall vs corpus
scale (round 10, r9 verdict #8 stretch).

Same protocol as the neardup sweep — synthetic 2M/20M-doc corpora with
their band indexes seeded a decade apart, the SAME 40-document real
delta runs the full sink leg — but with ALL FOUR gates active:
``incremental_neardup_sink(eval_docs=...)`` adds the benchmark
decontamination stage (broadcast eval shingle index, built once at
attach).  One delta doc's text is planted in the eval set, so exactly
one contamination rejection fires at BOTH scales (survivor equality
asserted); the decontamination cost is delta x broadcast — zero
corpus-sized structure is touched, so the decade ratio stays the
near-dup sink's.

Usage: python tools/curation_full_sweep.py
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

WORK = "/tmp/curation_full_sweep"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
DELTA_DOCS = 40


def main() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = build_session(app_name="curation_full_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    from arrow_experiments_spark.operators.dedup import _N_BANDS, _N_SIGS
    from arrow_experiments_spark.streaming.egress import (
        _merge_batch,
        derive_index_buckets,
        incremental_neardup_sink,
        read_snapshot,
    )
    from arrow_experiments_spark.tables import table

    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    delta = docs.orderBy("doc_id").limit(DELTA_DOCS).persist()
    delta.count()
    # a SECOND fresh delta (disjoint ids) for the min-of-two leg below
    delta_max = delta.agg(F.max("doc_id")).collect()[0][0]
    delta2 = (
        docs.filter(F.col("doc_id") > delta_max)
        .orderBy("doc_id")
        .limit(DELTA_DOCS)
        .persist()
    )
    delta2.count()
    sig_cols = [f"s{i}" for i in range(_N_SIGS)]

    # benchmark set: 20 real docs outside the delta, PLUS one delta
    # doc's text (the planted contamination — exactly one rejection)
    planted = delta.orderBy("doc_id").limit(1).select(
        (F.col("doc_id") + 900_000).alias("doc_id"), "text"
    )
    eval_docs = (
        docs.orderBy(F.desc("doc_id")).limit(20).unionByName(planted).persist()
    )
    eval_docs.count()

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

    # warm-up: throwaway sink run with the eval gate active
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
        eval_docs=eval_docs,
    )
    shutil.rmtree(warm, ignore_errors=True)

    results = {}
    survivors_seen = set()
    for scale, rows, buckets in (("1x", 2_000_000, 64), ("10x", 20_000_000, 640)):
        # conf-free band-index geometry (r10 verdict #4): the same
        # public derivation the sink applies at attach — corpus
        # postings / 50k-per-bucket floored at 4·bands·delta, so the
        # delta's ~bands·40 touched band values prune to a fraction of
        # the index at BOTH scales (the pinned-64 1x residual, the
        # measured 1.30x decade artifact, came from B < bands·delta).
        # The sink ADOPTS the committed layout (index_buckets=None).
        idx_buckets = derive_index_buckets(
            _N_BANDS * rows, bands=_N_BANDS, delta_rows=DELTA_DOCS
        )
        base = os.path.join(WORK, scale)
        os.makedirs(base)
        docs_dir = os.path.join(base, "docs")
        bands_dir = os.path.join(base, "bands")

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
        _merge_batch(
            spark, band_rows(seed, keep_sigs=True), bands_dir,
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

        # TWO fresh-delta legs, committed number = their MIN (the
        # bench.py window-qualification lesson: one sample per scale is
        # one co-tenant window away from garbage)
        t_legs = []
        for tag, dfr in (("d1", delta), ("d2", delta2)):
            staged = os.path.join(base, f"staged_{tag}")
            os.makedirs(staged)
            wdir = os.path.join(base, f"w_{tag}")
            dfr.coalesce(1).write.mode("overwrite").parquet(wdir)
            shutil.copy(
                glob.glob(os.path.join(wdir, "part-*.parquet"))[0],
                os.path.join(staged, "000.parquet"),
            )
            t0 = time.perf_counter()
            incremental_neardup_sink(
                spark.readStream.schema(dfr.schema).parquet(staged),
                base_dir=base,
                timeout_sec=3600,
                n_buckets=buckets,
                eval_docs=eval_docs,
            )
            t_legs.append(round(time.perf_counter() - t0, 2))
        t_delta = min(t_legs)

        corpus = read_snapshot(spark, docs_dir)
        n_final = corpus.count()
        survivors = n_final - rows
        assert survivors > 0, survivors
        survivors_seen.add(survivors)
        # the planted doc was rejected by decontamination
        planted_id = delta.orderBy("doc_id").limit(1).collect()[0]["doc_id"]
        assert (
            corpus.filter(F.col("doc_id") == planted_id).count() == 0
        ), "planted contaminated doc must be rejected"
        n_postings = read_snapshot(spark, bands_dir).count()
        assert n_postings == 4 * rows + 4 * survivors, (n_postings, survivors)

        print(
            f"{scale}: 2 deltas x {DELTA_DOCS} docs -> {survivors} "
            f"survivors (1 decontaminated): legs {t_legs} -> "
            f"{t_delta:.2f}s",
            flush=True,
        )
        results[scale] = {
            "rows": rows,
            "postings": 4 * rows,
            "buckets": buckets,
            "index_buckets": idx_buckets,
            "seed_sec": round(t_seed, 2),
            "delta_sec": round(t_delta, 2),
            "delta_legs": t_legs,
            "survivors": survivors,
        }
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)
    assert len(survivors_seen) == 1, survivors_seen  # same funnel outcome

    r1, r10 = results["1x"], results["10x"]
    ratio = round(r10["delta_sec"] / max(r1["delta_sec"], 1e-9), 2)
    section = f"""
## Composed curation sink: full funnel delta wall vs corpus scale (round 11)

incremental_neardup_sink with ALL FOUR funnel stages active — quality
gate, bucket-pruned exact seen-before anti-join, band-index near-dup
probe, and benchmark DECONTAMINATION — re-measured after the r10
verdict #2/#4 changes: the two append merges' write phases run
concurrently with pointers swapping in contract order, the band leg
derives from survivors ∪ re-delivered committed rows (pre-commit
frames), and the band index's bucket count is DERIVED conf-free
(derive_index_buckets — the B ≥ bands·delta rule that removes the
pinned-64 bucket-cap artifact behind round 10's 1.30x residual).
Same decade protocol (synthetic seeds, one planted contamination
asserted at both scales); the committed delta leg is the MIN over two
genuinely fresh 40-document deltas per scale (legs recorded in the
JSON line) — single samples are one co-tenant window away from
garbage.

| corpus | band postings | index buckets | delta leg (s) | survivors |
|---|---|---|---|---|
| {r1['rows']:,} docs | {r1['postings']:,} | {r1['index_buckets']} | {r1['delta_sec']} | {r1['survivors']} (1 decontaminated) |
| {r10['rows']:,} docs (10x) | {r10['postings']:,} | {r10['index_buckets']} | {r10['delta_sec']} | {r10['survivors']} (1 decontaminated) |

Delta-leg ratio at 10x the corpus: {ratio}x (1.0 = flat).  The
decontamination stage touches no corpus-sized structure (delta
shingles x broadcast eval index), so composing it costs O(delta) and
the decade ratio is the near-dup sink's own.  Bucket derivation is
enforced by the sink itself (egress.derive_index_buckets + the
adopt-committed-layout rule), not by this sweep's conf.
"""
    with open(Path(_REPO, "SCALE.md"), "a") as fh:
        fh.write(section)
    print(json.dumps({"metric": "curation_full_sweep", **results, "delta_ratio_10x": ratio}))


if __name__ == "__main__":
    main()
