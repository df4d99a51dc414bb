#!/usr/bin/env python
"""Bucket-pruned seen-before anti-join: curation delta wall vs
snapshot scale (round 9, follow-on to the O(delta) write sweep).

``incremental_curation_sink``'s gate (3) — have-we-ingested-this —
anti-joins each delta's content hashes against the committed
snapshot's.  Since the snapshot is hash-bucketed on ``content_hash``
and equal hashes share a bucket, the sink prunes the snapshot side of
that join to the buckets the delta's hashes land in (touched set
computed from ALL raw hashes — a superset of the gated survivors').
The scale claim: with bucket count grown with the snapshot (constant
per-bucket size), a fixed-size delta's FULL curation leg — tokenize +
gate + anti-join + merge + version write — costs the same wall against
a 10x bigger fingerprint corpus.  Before the prune, the anti-join read
the whole hash column, so the delta leg's read floor grew with the
snapshot.

Protocol: two fingerprint snapshots (2M hashes / 64 buckets, 20M /
640 — same ~31k-row buckets) seeded through ``upsert_snapshot_sink``
under the curation schema; then the SAME 40-document delta (real
sf0.01 documents, so the quality gate does real work) runs through
``incremental_curation_sink`` against each.  A reference column times
the UNPRUNED anti-join (the delta's 40 hashed documents — ungated, a
superset of the survivors — vs the full flattened hash column, the
pre-round-9 read shape) on the same session.  Verified per
scale: final count = seed + gated survivors, survivors all present,
and a re-delivery of the same documents adds zero rows (the gate
actually dedups against the big snapshot).

Usage: python tools/curation_delta_sweep.py
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

WORK = "/tmp/curation_delta_sweep"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
DELTA_DOCS = 40


def main() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    spark = build_session(app_name="curation_delta_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    from arrow_experiments_spark.streaming.egress import (
        incremental_curation_sink,
        read_snapshot,
        upsert_snapshot_sink,
    )
    from arrow_experiments_spark.tables import table

    docs = table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    delta = docs.orderBy("doc_id").limit(DELTA_DOCS).persist()
    delta.count()

    results = {}
    for scale, rows, buckets in (("1x", 2_000_000, 64), ("10x", 20_000_000, 640)):
        base = os.path.join(WORK, scale)
        staged = os.path.join(base, "staged")
        snap = os.path.join(base, "snap")
        os.makedirs(staged)

        def stage(name: str, frame, mtime: int) -> None:
            wdir = os.path.join(base, f"w_{name}")
            frame.coalesce(1).write.mode("overwrite").parquet(wdir)
            (src,) = glob.glob(os.path.join(wdir, "part-*.parquet"))
            dst = os.path.join(staged, f"{name}.parquet")
            shutil.copy(src, dst)
            os.utime(dst, (mtime, mtime))

        # synthetic fingerprint corpus under the curation snapshot schema;
        # hashes are md5 of a seed-tagged id, disjoint from real doc hashes
        seed = spark.range(rows).select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.lit("seed").alias("text"),
            F.lit("en").alias("lang"),
            F.lit("seed").alias("source"),
            F.lit(4).cast("bigint").alias("n_chars"),
            F.md5(F.concat(F.lit("seed-"), F.col("id")).cast("binary")).alias(
                "content_hash"
            ),
        )
        seed_staged = os.path.join(base, "seed_staged")
        os.makedirs(seed_staged)
        wdir = os.path.join(base, "w_seed")
        seed.write.mode("overwrite").parquet(wdir)
        for i, src in enumerate(sorted(glob.glob(os.path.join(wdir, "part-*.parquet")))):
            shutil.copy(src, os.path.join(seed_staged, f"{i:04d}.parquet"))
        t0 = time.perf_counter()
        upsert_snapshot_sink(
            spark.readStream.schema(seed.schema).parquet(seed_staged),
            snap,
            key_cols=["content_hash"],
            order_col="doc_id",
            timeout_sec=3600,
            n_buckets=buckets,
        )
        t_seed = time.perf_counter() - t0
        print(f"{scale}: seeded {rows:,} hashes / {buckets} buckets: "
              f"{t_seed:.2f}s", flush=True)

        # the measured delta leg: the real sink end-to-end
        stage("delta", delta, 2_000_000)
        t0 = time.perf_counter()
        incremental_curation_sink(
            spark.readStream.schema(delta.schema).parquet(staged),
            snap,
            timeout_sec=3600,
            n_buckets=buckets,
        )
        t_delta = time.perf_counter() - t0

        final = read_snapshot(spark, snap)
        n_final = final.count()
        survivors = n_final - rows
        assert survivors > 0, survivors
        # every survivor is one of the delta's documents
        assert (
            final.filter(F.col("source") != "seed")
            .join(delta.select("doc_id"), "doc_id", "left_anti")
            .count()
            == 0
        )

        # reference: the UNPRUNED anti-join (pre-round-9 shape) — delta
        # the delta's hashed documents (ungated — a superset of the
        # survivors) vs the full flattened hash column
        from arrow_experiments_spark.functions.text import md5_str

        hashed = delta.withColumn("content_hash", md5_str(F.col("text")))
        t0 = time.perf_counter()
        n_unpruned = hashed.join(
            read_snapshot(spark, snap).select("content_hash"),
            "content_hash",
            "left_anti",
        ).count()
        t_unpruned = time.perf_counter() - t0

        # idempotence at scale: re-delivering the same documents adds 0 rows
        stage("redelivery", delta, 3_000_000)
        incremental_curation_sink(
            spark.readStream.schema(delta.schema).parquet(staged),
            snap,
            timeout_sec=3600,
            n_buckets=buckets,
        )
        assert read_snapshot(spark, snap).count() == n_final

        print(
            f"{scale}: delta {DELTA_DOCS} docs -> {survivors} survivors: "
            f"{t_delta:.2f}s (unpruned anti-join ref {t_unpruned:.2f}s, "
            f"{n_unpruned} rows)",
            flush=True,
        )
        results[scale] = {
            "rows": rows,
            "buckets": buckets,
            "seed_sec": round(t_seed, 2),
            "delta_sec": round(t_delta, 2),
            "survivors": survivors,
            "unpruned_antijoin_sec": round(t_unpruned, 2),
        }
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)

    r1, r10 = results["1x"], results["10x"]
    lines = [
        "",
        "## Bucket-pruned seen-before anti-join: curation delta vs snapshot scale (round 9)",
        "",
        "The incremental curation sink's gate (3) anti-joins the delta's",
        "content hashes against the committed snapshot.  Same hash => same",
        "bucket, so the snapshot side is pruned to the delta's touched",
        "buckets at the parquet read (partition pruning on the `_bucket=`",
        "layout); the touched set comes from a cheap md5+xxhash pass over",
        "the raw batch — a superset of the gated survivors'.  The SAME",
        f"{DELTA_DOCS}-document delta (real sf0.01 docs, live quality gate)",
        "runs the FULL leg — tokenize + gate + pruned anti-join + merge +",
        "version write — against fingerprint corpora a decade apart.",
        "Verified per scale: survivors merged, re-delivery adds 0 rows.",
        "",
        "| snapshot | buckets | delta leg (s) | unpruned anti-join alone (s) |",
        "|---|---|---|---|",
        f"| {r1['rows']:,} hashes | {r1['buckets']} | {r1['delta_sec']} "
        f"| {r1['unpruned_antijoin_sec']} |",
        f"| {r10['rows']:,} hashes (10×) | {r10['buckets']} | **{r10['delta_sec']}** "
        f"| {r10['unpruned_antijoin_sec']} |",
        "",
        f"Delta-leg ratio at 10× the corpus: "
        f"{r10['delta_sec'] / max(r1['delta_sec'], 1e-9):.2f}× "
        "(1.0 = flat).  The unpruned column is the pre-round-9 read shape:",
        "it scans every hash in the snapshot, so it grows with the corpus",
        "and at warehouse scale becomes the delta's floor — the pruned",
        "read touches at most `min(delta, n_buckets)` buckets regardless",
        "of corpus size.",
        "",
    ]
    with open(Path(_REPO, "SCALE.md"), "a") as fh:
        fh.write("\n".join(lines))
    print(json.dumps({"metric": "curation_delta_sweep", **results}))


if __name__ == "__main__":
    main()
