#!/usr/bin/env python
"""Maintained IVF index artifact: delta maintenance vs full rebuild
(round 10, r9 verdict #5).

``incremental_ivf_index_sink`` exists so retrieval never re-derives the
codebook assignment over the corpus: the index is built once and
delta-maintained.  This sweep measures the claim — the SAME 40-vector
real delta (sf0.01 embeddings) is sunk into a 2M- and a 20M-posting
index (decade apart, buckets scaled 64 → 640 with the corpus), against
the full-rebuild wall for each.  Seeds use synthetic cells drawn from
the real codebook range, so the delta's insert-only append exercises
the true touched-bucket path.  Delta wall should be ~flat across the
decade and ≪ rebuild at both scales.

Usage: python tools/ivf_index_sweep.py
Appends a section to SCALE.md and prints one JSON line.
"""

from __future__ import annotations

import glob
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

WORK = "/tmp/ivf_index_sweep"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
DELTA_VECS = 40


def main() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = build_session(app_name="ivf_index_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "128")

    from arrow_experiments_spark.streaming.egress import (
        _merge_batch,
        incremental_ivf_index_sink,
        read_snapshot,
    )
    from arrow_experiments_spark.tables import table

    delta = (
        table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(DELTA_VECS)
        .persist()
    )
    delta.count()

    # warm-up: throwaway sink run (codegen + stream machinery)
    warm = os.path.join(WORK, "warm")
    os.makedirs(os.path.join(warm, "staged"))
    wdir = os.path.join(warm, "w")
    delta.coalesce(1).write.mode("overwrite").parquet(wdir)
    shutil.copy(
        glob.glob(os.path.join(wdir, "part-*.parquet"))[0],
        os.path.join(warm, "staged", "000.parquet"),
    )
    incremental_ivf_index_sink(
        spark.readStream.schema(delta.schema).parquet(
            os.path.join(warm, "staged")
        ),
        base_dir=os.path.join(warm, "base"),
        timeout_sec=3600,
        k=8,
    )
    shutil.rmtree(warm, ignore_errors=True)

    results = {}
    for scale, rows, buckets in (("1x", 2_000_000, 64), ("10x", 20_000_000, 640)):
        k = max(8, math.ceil(rows / 2000))  # the _ivf_k N/targetCellPop rule
        base = os.path.join(WORK, scale)
        cells_dir = os.path.join(base, "cells")
        os.makedirs(base)
        with open(os.path.join(base, "_GEOMETRY.json"), "w") as f:
            json.dump({"ivf_k": k}, f)

        # synthetic postings across the real cell range [0, k)
        seed = spark.range(rows).select(
            F.pmod(F.xxhash64("id"), F.lit(k)).cast("int").alias("cell"),
            (F.col("id") + 10_000_000).alias("vec_id"),
            F.array_repeat(
                (F.col("id") % 997).cast("float") / 7.0, 64
            ).alias("embedding"),
        )
        t0 = time.perf_counter()
        _merge_batch(
            spark, seed, cells_dir,
            key_cols=["cell", "vec_id"], order_col="vec_id",
            n_buckets=buckets, bucket_cols=["cell"], seq=0, committed=None,
        )
        t_rebuild = time.perf_counter() - t0
        print(
            f"{scale}: full build of {rows:,} postings / {buckets} buckets"
            f" at k={k}: {t_rebuild:.2f}s",
            flush=True,
        )

        staged = os.path.join(base, "staged")
        os.makedirs(staged)
        wdir = os.path.join(base, "w_delta")
        delta.coalesce(1).write.mode("overwrite").parquet(wdir)
        shutil.copy(
            glob.glob(os.path.join(wdir, "part-*.parquet"))[0],
            os.path.join(staged, "000.parquet"),
        )
        t0 = time.perf_counter()
        incremental_ivf_index_sink(
            spark.readStream.schema(delta.schema).parquet(staged),
            base_dir=base,
            timeout_sec=3600,
            n_buckets=buckets,
            k=k,
        )
        t_delta = time.perf_counter() - t0

        n_final = read_snapshot(spark, cells_dir).count()
        assert n_final == rows + DELTA_VECS, (n_final, rows)
        results[scale] = {
            "rows": rows,
            "buckets": buckets,
            "k": k,
            "rebuild_s": round(t_rebuild, 2),
            "delta_s": round(t_delta, 2),
        }
        print(f"{scale}: delta {DELTA_VECS} vectors: {t_delta:.2f}s", flush=True)
        shutil.rmtree(base, ignore_errors=True)

    r1, r10 = results["1x"], results["10x"]
    ratio = round(r10["delta_s"] / r1["delta_s"], 2)
    section = f"""
## Maintained IVF index: delta maintenance vs rebuild (round 10)

incremental_ivf_index_sink under the delta-vs-scale protocol: synthetic
(cell, vec_id, embedding) postings seed a 2M- and a 20M-row index
(k per the N/targetCellPop rule — {r1['k']} and {r10['k']} cells;
buckets {r1['buckets']} and {r10['buckets']}), then the SAME 40-vector
real delta (sf0.01 embeddings) runs the full sink leg: Arrow-batched
cell assignment, insert-only append merge (fresh files + hard-linked
committed files), one commit.  Rebuild = the full _merge_batch from
zero, the cost the artifact exists to avoid paying per query.

| corpus | k | buckets | full rebuild (s) | 40-vector delta (s) | delta/rebuild |
|---|---|---|---|---|---|
| {r1['rows']:,} postings | {r1['k']} | {r1['buckets']} | {r1['rebuild_s']} | {r1['delta_s']} | {round(r1['delta_s']/r1['rebuild_s'], 3)} |
| {r10['rows']:,} postings (10x) | {r10['k']} | {r10['buckets']} | {r10['rebuild_s']} | {r10['delta_s']} | {round(r10['delta_s']/r10['rebuild_s'], 3)} |

Delta-leg ratio at 10x the corpus: {ratio}x (1.0 = flat).  The probe
queries replay this artifact (ensure_ivf_index build-if-absent +
ann_ivf_index_probe's bucket-pruned lookup); maintenance is the sink's
O(delta) append.
"""
    with open(os.path.join(_REPO, "SCALE.md"), "a") as f:
        f.write(section)
    print(json.dumps({"metric": "ivf_index_sweep", "results": results, "delta_ratio_10x": ratio}))
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
