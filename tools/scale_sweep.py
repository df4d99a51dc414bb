#!/usr/bin/env python
"""Above-bench-scale evidence (round-2 verdict item 4): run the dedup /
ANN / text family at 1×, 10× and 100× the sf0.1 corpus and record how
each plan's wall-clock actually bends — measured scaling, not argued.

Corpus synthesis (the driver ships no sf≥1 testdata): each replica k>0
re-keys ids into a fresh range and perturbs the payload deterministically
so near-dup/bucket structure stays corpus-like instead of collapsing into
k-way exact duplicates:

* documents: ``doc_id += k * max_id``; a per-(k, doc_id) suffix token is
  appended so replicas are near-dups of their original (same shingle mass
  ± one shingle), not byte-identical copies.
* embeddings: ``vec_id += k * max_id``; every element gets hash-seeded
  noise (±1e-2 scale) so directions spread the way a larger real corpus
  would, rather than stacking identical vectors into one LSH bucket.
* events: ``event_id += k * max_id`` and ``user_id += k * max_users`` —
  replica users are NEW users in the same time range, so per-user event
  density (the partition-size invariant every events-family window keys
  on) stays constant while row count scales; ts/value/type are kept so
  window boundaries and value distributions are corpus-like.

The TPC-H tables are symlinked unchanged — the swept families read
documents, embeddings and events only.

Usage: python tools/scale_sweep.py [base_sf_dir] [out_md]
Writes SCALE.md (committed) and prints one JSON line for tooling.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from arrow_experiments_spark.registry import all_queries
from arrow_experiments_spark.session import build_session

FACTORS = [1, 10, 100]

SWEEP = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    # the exact scorers record "guarded" at clone-dense 100x (sample-only
    # pair-mass guard); their bounded siblings are the registered defaults
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_lsh",
    "dedup_embedding_cosine",
    "dedup_embedding_topk_grouped",
    "decontaminate_ngram_overlap",
    "knn_bruteforce_cosine",
    "ann_lsh_hyperplane",
    "ann_ivf_codebook",
    "text_language_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "text_tfidf_top_terms",
    "pipeline_global_shuffle",
]


def build_corpus(
    spark, base: str, factor: int, dest: str, max_family: int | None = None
) -> None:
    """``max_family=None`` (the default) reproduces the clone-dense
    recipe above: EVERY replica is a near-dup of its original, so
    near-dup families have ``factor`` members and candidate-pair mass
    grows ~quadratically in the factor — the output-sensitive upper
    bound.  ``max_family=m`` caps near-dup families at ``m`` members:
    replicas with rep >= m get hash-synthesized text (fresh tokens, zero
    shared shingles) / uniform hash-seeded vectors, so dup DENSITY stays
    constant as the corpus scales — the natural-corpus regime where the
    measured exponent reflects the plan, not obligated clone output."""
    import pyspark.sql.functions as F

    os.makedirs(dest, exist_ok=True)
    for name in "region nation customer supplier part orders lineitem".split():
        link = os.path.join(dest, f"{name}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(base, f"{name}.parquet"), link)
    # a stale events symlink from a pre-events-scaling corpus build must
    # not swallow the scaled write
    ev_path = os.path.join(dest, "events.parquet")
    if os.path.islink(ev_path):
        os.unlink(ev_path)

    docs = spark.read.parquet(f"{base}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    near_dup_text = F.concat(
        F.col("text"),
        F.lit(" zq"),
        F.conv(F.abs(F.hash("doc_id", "rep")).cast("string"), 10, 36),
    )
    # fresh-token synthesis: ~n_chars/9 pseudo-random 8-char tokens —
    # length distribution preserved, zero shingles shared with anything
    unique_text = F.array_join(
        F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(
                    (F.col("n_chars") / F.lit(9)).cast("int"), F.lit(20)
                ),
            ),
            lambda i: F.substring(
                F.md5(F.concat_ws("_", F.col("doc_id"), F.col("rep"), i)), 1, 8
            ),
        ),
        " ",
    )
    text_expr = F.when(F.col("rep") == 0, F.col("text"))
    if max_family is None:
        text_expr = text_expr.otherwise(near_dup_text)
    else:
        text_expr = text_expr.when(
            F.col("rep") < max_family, near_dup_text
        ).otherwise(unique_text)
    scaled_docs = (
        docs.select("*", reps)
        .select(
            (F.col("doc_id") + F.col("rep") * max_doc).alias("doc_id"),
            text_expr.alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    scaled_docs.repartition(max(1, factor // 4)).write.mode("overwrite").parquet(
        f"{dest}/documents.parquet"
    )

    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    max_vec = emb.agg(F.max("vec_id")).first()[0] + 1
    near_dup_vec = F.expr(
        "transform(embedding, (x, i) -> "
        "cast(x + (pmod(hash(vec_id, i), 2000) - 1000) * 1.0e-5 "
        "as float))"
    )
    # uniform hash-seeded direction — lands in its own LSH cell mix
    # instead of stacking onto the original's bucket
    unique_vec = F.expr(
        "transform(embedding, (x, i) -> "
        "cast((pmod(hash(vec_id, rep, i), 2000) - 1000) * 1.0e-3 as float))"
    )
    vec_expr = F.when(F.col("rep") == 0, F.col("embedding"))
    if max_family is None:
        vec_expr = vec_expr.otherwise(near_dup_vec)
    else:
        vec_expr = vec_expr.when(
            F.col("rep") < max_family, near_dup_vec
        ).otherwise(unique_vec)
    scaled_emb = (
        emb.select("*", reps)
        .select(
            (F.col("vec_id") + F.col("rep") * max_vec).alias("vec_id"),
            vec_expr.alias("embedding"),
            "label",
        )
    )
    scaled_emb.repartition(max(1, factor // 4)).write.mode("overwrite").parquet(
        f"{dest}/embeddings.parquet"
    )

    from arrow_experiments_spark.tables import table as _table

    ev = _table(spark, base, "events")
    max_eid = ev.agg(F.max("event_id")).first()[0] + 1
    max_uid = ev.agg(F.max("user_id")).first()[0] + 1
    scaled_ev = ev.select("*", reps).select(
        (F.col("event_id") + F.col("rep") * max_eid).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("rep") * max_uid).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    scaled_ev.repartition(max(1, factor // 4)).write.mode("overwrite").parquet(
        f"{dest}/events.parquet"
    )


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_md = sys.argv[2] if len(sys.argv) > 2 else str(Path(_REPO, "SCALE.md"))
    work = "/tmp/scale_sweep"
    spark = build_session(app_name="scale_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    dirs: dict[int, str] = {1: base}
    for k in FACTORS:
        if k == 1:
            continue
        dest = f"{work}/x{k}"
        build_corpus(spark, base, k, dest)
        dirs[k] = dest
        print(f"built x{k} corpus at {dest}", flush=True)

    def measure(name: str, sf_dir: str) -> float:
        from arrow_experiments_spark.operators.dedup import PairMassExceeded

        t0 = time.perf_counter()
        try:
            queries[name].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except PairMassExceeded:
            # the exact scorers refuse dup-dense corpora by design (the
            # sample-only guard) — record the refusal, not a crash
            spark.catalog.clearCache()
            return float("nan")
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    # warm the JVM once
    measure("dedup_exact", base)

    # two alternating passes per scale, per-item min (co-tenant noise
    # windows — see bench.py) — scales measured smallest-first so a noise
    # window hits the cheap end
    results: dict[str, dict[int, float]] = {n: {} for n in SWEEP}
    progress = Path(work, "progress.json")
    base_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    for k in FACTORS:
        # Partition count must scale with data volume or per-partition
        # state (pair-agg hash maps, sort runs) outgrows the heap — the
        # first 100× run OOMed at the sf0.1 default of 32.  Overprovision
        # data-proportionally; AQE coalesces what turns out to be excess.
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(min(base_parts * k, 1024))
        )
        for i in range(2):
            order = SWEEP if i == 0 else list(reversed(SWEEP))
            for name in order:
                dt = measure(name, dirs[k])
                cur = results[name].get(k)
                # nan = guard refusal; min() must not swallow a real time
                if cur is None or cur != cur:
                    results[name][k] = dt
                elif dt == dt:
                    results[name][k] = min(cur, dt)
                print(f"x{k} pass{i} {name} {dt:.2f}s", flush=True)
                progress.write_text(json.dumps(
                    {n: {str(kk): ("guarded" if vv != vv else vv)
                         for kk, vv in r.items()}
                     for n, r in results.items()}))
        print(f"x{k} done", flush=True)

    lines = [
        "# SCALE — measured scaling of the dedup/ANN/text family",
        "",
        f"Generated by `tools/scale_sweep.py` from `{base}` (5k docs / 2k",
        "embeddings at 1×) with deterministic perturbation-replication at",
        "10× and 100× (see the tool docstring for the synthesis rules).",
        "Per-item min of two alternating-order passes, local[32],",
    "shuffle partitions scaled data-proportionally per factor (the",
    "sf0.1 default of 32 OOMed the pair aggregation at 100× — partition",
    "count is part of the scale contract; AQE coalesces overprovision).",
        "",
        "`exp` = log(t100/t1)/log(100): 1.0 is perfectly linear; sub-linear",
        "values mean fixed overhead still dominates at 100×; anything",
        "clearly above 1 would flag a plan that bends super-linearly.",
        "",
        "Near-dup caveat: replication makes every document one of a",
        "100-clone near-dup cluster, so the candidate-pair mass the",
        "minhash/ngram/embedding dedup queries must score grows",
        "~quadratically in the factor BY CONSTRUCTION (clone pairs are",
        "real near-dups the query is obliged to emit).  Those exponents",
        "measure output-sensitive cost on a pathologically dup-dense",
        "corpus — an upper bound, not the plan's scaling on a natural",
        "corpus of the same size.",
        "",
        "| query | 1x (s) | 10x (s) | 100x (s) | exp |",
        "|---|---|---|---|---|",
    ]
    js: dict[str, dict[str, float]] = {}
    worst = None

    def fmt(v: float) -> str:
        return "guarded" if v != v else f"{v:.2f}"

    for name in SWEEP:
        r = results[name]
        import math

        finite = r[1] == r[1] and r[100] == r[100] and r[1] > 0
        exp = math.log(r[100] / r[1]) / math.log(100) if finite else float("nan")
        lines.append(
            f"| {name} | {fmt(r[1])} | {fmt(r[10])} | {fmt(r[100])} | {fmt(exp)} |"
        )
        # NaN (a guard refusal) is not valid JSON — serialize as the
        # string the table shows
        def _js(v: float):
            return "guarded" if v != v else round(v, 3)

        js[name] = {"x1": _js(r[1]), "x10": _js(r[10]),
                    "x100": _js(r[100]),
                    "exp": "guarded" if exp != exp else round(exp, 2)}
        if exp == exp and (worst is None or exp > worst[1]):
            worst = (name, exp)
    lines += [
        "",
        f"Steepest observed exponent: `{worst[0]}` at {worst[1]:.2f}.",
        "",
    ]
    # preserve every section below the main table (query_scale.py /
    # topk_scale.py and hand-written analyses append their measured rows
    # as "## ..." sections — a sweep rerun must not destroy that
    # evidence; the sweep owns only the preamble + main table)
    out_path = Path(out_md)
    tail = ""
    if out_path.exists():
        prev = out_path.read_text()
        idx = prev.find("\n## ")
        if idx != -1:
            tail = prev[idx:]
    out_path.write_text("\n".join(lines) + tail)
    print(json.dumps({"metric": "scale_sweep", "queries": js}))
    spark.stop()
    for k in FACTORS:
        if k != 1:
            shutil.rmtree(f"{work}/x{k}", ignore_errors=True)


if __name__ == "__main__":
    main()
