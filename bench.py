#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full compute, no
driver collect) — the measurement analog of the reference's client metrics
protocol (elapsed seconds, http/get_simple/README.md:37).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from arrow_experiments_spark.registry import all_queries
from arrow_experiments_spark.session import build_session

# Headline set: one representative per category plus the heavy hitters.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_profit_by_nation_year",
    "q18_large_volume_customer",
    "agg_count_distinct",
    "window_running_sum",
    "topk_per_group",
    "events_session_window",
    "asof_join",
    "dedup_exact",
    "dedup_minhash_lsh",
    # Bounded-output near-dup forms are the headline (the 100 TB defaults,
    # SCALE.md): LSH-candidate verify instead of the all-pair inverted
    # index, per-vector top-k instead of unbounded pair emission.  The
    # exact forms stay registered as oracle cross-checks.
    "dedup_ngram_jaccard_lsh",
    "dedup_embedding_topk",
    # bounded INTERMEDIATE state too: the bucket-grouped numpy form
    # (SCALE.md: completes 100x clone density where the windowed
    # form out-spills disk)
    "dedup_embedding_topk_grouped",
    "knn_bruteforce_cosine",
    "ann_lsh_hyperplane",
    "text_quality_score",
    "multimodal_image_features",
    "text_tfidf_top_terms",
    "events_retention_cohort",
    # round-5 additions: the bounded passage-overlap scorer (the cheap
    # pre-filter that runs before any pairwise near-dup join) and the
    # LSH-vs-exact recall evaluation (sample-tune-then-commit step)
    "text_shared_ngram_fraction",
    "ann_recall_eval",
    # round-6 additions: the two-level time-bucketed TWA (the events
    # family's scale re-key, exp 0.27 vs 0.68 — SCALE.md), the
    # signature-agreement Jaccard estimator (verify stage with zero
    # re-tokenization), and the end-to-end curation funnel (quality →
    # near-dup canonical → decontamination — the north-star pipeline as
    # one query)
    "events_time_weighted_avg_bucketed",
    "dedup_minhash_estimate",
    "pipeline_curate_end_to_end",
    # round-7 additions: the sketch-exchange storage pattern (independent
    # per-shard sketch jobs + rollup from the sketch table alone — its
    # time INCLUDES the nightly-half shard writes), and the SemDeDup-style
    # cluster-scoped semantic dedup (one cluster-keyed shuffle + in-core
    # blocked kernel).  NOTE: r7 total includes these new keys and
    # excludes s1_replay_100m_x4; adjust when comparing totals across
    # rounds.
    "agg_hll_sketch_exchange",
    "dedup_semantic_clusters",
    # round-8 additions: containment verify over the LSH candidates (the
    # wrapped-near-superset catch Jaccard misses) and multi-probe IVF
    # (the deployed-index recall lever).  NOTE for total comparisons:
    # r8 adds these keys; agg_hll_sketch_exchange became write-if-absent
    # (passes 2-3 measure the rollup alone); and the s2_serve_1m
    # br/gzip/zstd serves now replay the compress-once body cache
    # (DatasetRegistry.encoded_body), so those keys dropped by design.
    "dedup_minhash_containment",
    "ann_ivf_multiprobe",
    # round-9 additions: the incremental-ingest near-dup gates' batch
    # twins in both modalities (delta probes base candidates, verify by
    # signature agreement / snapped cosine — the streaming sinks'
    # registered semantics).  NOTE for total comparisons: r9 adds these
    # two keys.
    "pipeline_neardup_incremental",
    "dedup_embedding_incremental",
    "pipeline_curate_incremental_full",
]


def _bench_replay(spark) -> float:
    """BASELINE.md S1 shape at 1/10 scale: the flight-benchmark workload
    (4 random int64 columns, 4096-row batches) served uncompressed over
    HTTP and stream-decoded by the pyarrow client.  Generation is
    distributed (spark.range); serving replays pre-materialized batches,
    exactly the reference server's model."""
    import time as _time

    from arrow_experiments_spark.sources.generators import gen_flight_bench
    from arrow_experiments_spark.transport.client import fetch_arrow
    from arrow_experiments_spark.transport.server import DatasetRegistry, serve

    rows = 10_000_000
    base = gen_flight_bench(spark, rows=rows).toArrow()
    registry = DatasetRegistry()
    registry.register_table("flight", base)
    httpd = serve(registry)
    host, port = httpd.server_address
    try:
        best = float("inf")
        for _ in range(2):  # outer two-pass scheme decorrelates the rest
            t0 = _time.perf_counter()
            # identity encoding: the reference get_simple server serves
            # uncompressed (BASELINE.md S1); without the header the server's
            # HTTP/1.1 default of gzip would be negotiated instead.
            # collect_table=False = the reference client's own protocol
            # (count batches + elapsed, don't retain the stream).
            _, metrics = fetch_arrow(
                f"http://{host}:{port}/datasets/flight",
                accept_encoding="identity",
                collect_table=False,
            )
            best = min(best, _time.perf_counter() - t0)
            assert metrics.rows == rows
        return round(best, 3)
    finally:
        httpd.shutdown()


# Concurrent-fetch clients are SUBPROCESSES (own interpreters), as the
# reference's clients are separate processes — in-process client threads
# would measure the harness's GIL, not the server's concurrency.  A
# READY/GO barrier keeps interpreter startup + pyarrow import (~0.4 s
# per process) OUT of the timed window: each client signals READY, the
# parent releases all at once, and the wall-clock runs from the release
# to the last exit — the fetch phase only.
_X4_CLIENT_CODE = (
    "import sys, pyarrow as pa, urllib.request\n"
    "print('READY', flush=True)\n"
    "sys.stdin.readline()\n"
    "resp = urllib.request.urlopen(sys.argv[1])\n"
    "n = sum(b.num_rows for b in pa.ipc.open_stream(resp))\n"
    "print(n, flush=True)\n"
)


def _concurrent_fetch(url: str, n_clients: int, timeout: int = 600) -> tuple[float, list[int]]:
    """Barrier-synchronized concurrent fetch: returns (wall seconds of
    the fetch phase, per-client row counts)."""
    import subprocess
    import sys as _sys
    import time as _time

    procs = [
        subprocess.Popen(
            [_sys.executable, "-c", _X4_CLIENT_CODE, url],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
        )
        for _ in range(n_clients)
    ]
    try:
        for p in procs:
            assert p.stdout.readline().strip() == "READY"
        t0 = _time.perf_counter()
        for p in procs:
            p.stdin.write("go\n")
            p.stdin.flush()
        counts = []
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            counts.append(int(out.strip().splitlines()[-1]))
        return _time.perf_counter() - t0, counts
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()


def _bench_replay_10m_x4(spark) -> float:
    """The reference's Flight-comparison shape: its get_simple workload is
    benchmarked against flight_benchmark.cc, which uses 4 CONCURRENT
    streams (http/get_simple/README.md:30; SURVEY.md §4 parallel
    multi-stream fetch).  Serve the 10M-row table once, fetch it from 4
    concurrent clients, report the fetch-phase wall-clock for all 4 to
    finish — the threaded server + per-request replay model must scale
    across connections, not just per-stream."""
    from arrow_experiments_spark.sources.generators import gen_flight_bench
    from arrow_experiments_spark.transport.server import DatasetRegistry, serve

    rows = 10_000_000
    base = gen_flight_bench(spark, rows=rows).toArrow()
    registry = DatasetRegistry()
    registry.register_table("flight", base)
    httpd = serve(registry)
    host, port = httpd.server_address
    url = f"http://{host}:{port}/datasets/flight"
    try:
        _concurrent_fetch(url, 1)  # warm page caches + identity body once
        best = float("inf")
        for _ in range(2):
            wall, got = _concurrent_fetch(url, 4)
            best = min(best, wall)
            assert got == [rows] * 4
        return round(best, 3)
    finally:
        httpd.shutdown()


class WindowQualifier:
    """Self-qualifying measurement window (r10 verdict #3): the bench
    brackets every measurement block with sentinel probes (the fixed
    pure-serve ``s2_serve_1m_identity`` workload — CPU + localhost
    socket, no Spark jobs, no disk) and judges each block CLEAN when
    EITHER bracketing probe sits within ``band`` × the run floor —
    contended only when BOTH probes are elevated (the calibration
    paragraph below explains why).
    A key whose every sample landed in contended blocks is RE-RUN inside
    the same invocation between fresh probes; only if the retries also
    land contended does a flagged number get committed — and then it
    carries the ``contended`` tag, so the official file can never
    silently record a co-tenant phase again (the r10 adjudication, done
    by hand from the spread tables, becomes mechanical).

    Calibration (measured on this box): the sentinel runs ~9-14 ms, so
    a pure min-relative ratio band cannot separate ordinary jitter
    (±40% at these absolute times) from the 1.5-30× co-tenant windows —
    a first sanity run with ``1.4 × min`` flagged half the keys on a
    quiet box.  Three choices fix that: the floor is the 10th
    PERCENTILE of all probes (robust to one lucky outlier), the limit
    carries a small ABSOLUTE slack for ms-scale scheduler jitter, and a
    bracket counts as contended only when BOTH its probes are elevated
    — a co-tenant window is minutes long and shows on both sides of a
    sample, while a single-probe spike is the scheduler, not the box.
    A fully-contended run (no clean floor ever observed) self-reports
    via the committed sentinel level and the loopback ratio — both
    absolute signals the verdicts already track across rounds."""

    BAND = 1.4
    SLACK_SEC = 0.002

    def __init__(self, probe_fn):
        self.probe_fn = probe_fn
        self.samples: list[float] = []

    def probe(self) -> int:
        """Run one sentinel probe; returns its index."""
        self.samples.append(self.probe_fn())
        return len(self.samples) - 1

    @property
    def floor(self) -> float:
        s = sorted(self.samples)
        return s[len(s) // 10] if len(s) >= 10 else s[0]

    @property
    def limit(self) -> float:
        return self.BAND * self.floor + self.SLACK_SEC

    def clean(self, before: int, after: int) -> bool:
        lim = self.limit
        return self.samples[before] <= lim or self.samples[after] <= lim

    def window_ok(self) -> bool:
        """One fresh probe, judged against the run floor — the cheap
        in-function retry gate for the reference-scale serves."""
        i = self.probe()
        return self.samples[i] <= self.limit


class BandwidthSentinel:
    """IN-LEG sentinel (r12 verdict Wrong #2): the loopback sentinel is
    cache-resident CPU + socket, so the box's co-tenant phases —
    memory-bandwidth-like, minutes long, inflating Spark walls 2-10× —
    are INVISIBLE to it even when probed during them (measured r12:
    46-138 s outlier batches with clean brackets on 6-12 s code).  This
    probe measures what those phases actually steal: a 128 MiB int64
    copy (256 MiB of DRAM traffic — far beyond LLC), timed as GB/s, run
    at ~1 Hz on a background thread DURING each leg.

    Calibration (measured r13, quiet box): idle 16-20 GB/s; during
    busy Spark compute legs the per-probe series stays 14-16 GB/s with
    ISOLATED dips to 3.7-7.1 (the engine's own shuffle/Arrow bursts),
    so the per-leg statistic is the MEDIAN — engine self-use never
    depresses the median below ~14 while a minutes-long co-tenant
    phase depresses every probe in the window.  A leg is flagged when
    its median falls under ``REL_BAND`` × the run reference (p90 of
    all probes); legs with fewer than ``MIN_SAMPLES`` probes
    (sub-second legs) stay governed by the bracketing loopback
    sentinel alone.  A run contended END-TO-END self-reports through
    the committed absolute reference (GB/s), the same posture as the
    loopback sentinel's committed floor."""

    BUF_MB = 128
    GATHER_MB = 32
    REL_BAND = 0.5
    # gather promotion band — None = recorded-only, and FINAL (r14).
    # Promotion was evaluated on two independent correlation datasets
    # and rejected twice, for opposite failure modes: r13 (67 points,
    # one mixed-runtime leg) — half the QUIET legs showed collapsed
    # gather, so any useful band false-flags 32-53% of commit-worthy
    # legs; r14 (67 points, a JVM-only leg and a Python-only leg per
    # cycle, tools/data_gather_correlation_r14.jsonl) — quiet cycles
    # never collapsed but even the best band missed half the inflated
    # cycles (9/17 under 0.25x), and the "phase steals Python latency
    # without slowing the JVM" hypothesis was refuted outright (zero
    # cycles of Python-only inflation; the JVM leg inflates at least
    # as often).  The signal is inconsistent across legs and days —
    # closed as a verdict input; the series stays recorded as a
    # post-hoc diagnostic (SCALE.md "Gather promotion: closed").
    GATHER_BAND: float | None = None
    MIN_SAMPLES = 2
    INTERVAL_SEC = 1.0

    def __init__(self):
        import numpy as np

        n = self.BUF_MB * 1024 * 1024 // 8
        self._src = np.ones(n, dtype=np.int64)
        self._dst = np.empty_like(self._src)
        # second, RECORDED-ONLY series (r13): a random-gather probe —
        # memory-LATENCY-sensitive where the sequential copy is
        # bandwidth-sensitive.  Observed r13: 10-30 s batches on 6-7 s
        # code passed both the loopback brackets AND the copy-median
        # band, so whatever those phases steal is not plain DRAM
        # bandwidth; the gather series is recorded alongside to test
        # (post-hoc, across rounds) whether latency contention is the
        # missing signal before promoting it to a verdict input.
        gn = self.GATHER_MB * 1024 * 1024 // 8
        rng = np.random.default_rng(7)
        self._gidx = rng.permutation(gn).astype(np.int64)
        self._gout = np.empty_like(self._gidx)
        # (monotonic, copy GB/s, gather GB/s)
        self.samples: list[tuple[float, float, float]] = []
        # env floors read at CONSTRUCTION, not import (r13 ADVICE): a
        # sweep tool that sets SPARK_GRAFT_BW_REF_FLOOR after importing
        # bench must still see it at sentinel build time.  The class
        # attributes below remain the documented defaults.
        self.REF_FLOOR_GBS = float(
            os.environ.get("SPARK_GRAFT_BW_REF_FLOOR", str(self.REF_FLOOR_GBS))
        )
        self.GATHER_REF_FLOOR_GBS = float(
            os.environ.get(
                "SPARK_GRAFT_GATHER_REF_FLOOR", str(self.GATHER_REF_FLOOR_GBS)
            )
        )
        self.probe()  # fault in all buffers' pages (first touch ~50× slow)
        self.samples.clear()

    def probe(self) -> float:
        import numpy as np

        t0 = time.perf_counter()
        np.copyto(self._dst, self._src)
        dt = time.perf_counter() - t0
        bw = self._src.nbytes * 2 / 1e9 / max(dt, 1e-9)
        t1 = time.perf_counter()
        np.take(self._gidx, self._gidx, out=self._gout)
        gdt = time.perf_counter() - t1
        gbw = self._gidx.nbytes * 2 / 1e9 / max(gdt, 1e-9)
        self.samples.append((time.monotonic(), bw, gbw))
        return bw

    # Calibrated ANCHOR for the run reference (this box copies 16-20
    # GB/s quiet; the anchor is set conservatively below that).  A run
    # that STARTS inside a co-tenant phase would otherwise
    # self-normalize — every early probe depressed, p90 ≈ the phase
    # level, contaminated legs judged clean against it.  Anchoring the
    # reference means such legs flag "contended" (loudly visible)
    # instead of committing silently.  On permanently slower hardware
    # everything would flag until SPARK_GRAFT_BW_REF_FLOOR is
    # recalibrated — the intended failure direction (flagged, never
    # silently trusted), same posture as the loopback band constants
    # above, which are equally box-calibrated.  The class value is the
    # default; __init__ overrides from the env at construction time.
    REF_FLOOR_GBS = 12.0

    @property
    def reference(self) -> float:
        """p90 of all copy probes this run, anchored from below by the
        calibrated floor — the quiet-box bandwidth."""
        vals = sorted(s[1] for s in self.samples)
        p90 = vals[int(len(vals) * 0.9)] if vals else 0.0
        return max(p90, self.REF_FLOOR_GBS)

    # gather anchor, same self-normalization rationale as REF_FLOOR_GBS
    # (this box gathers ~1.5-2.2 GB/s-equivalent quiet at 32 MiB);
    # default here, env override in __init__
    GATHER_REF_FLOOR_GBS = 1.0

    @property
    def gather_reference(self) -> float:
        """p90 of the gather series, anchored from below."""
        vals = sorted(s[2] for s in self.samples)
        p90 = vals[int(len(vals) * 0.9)] if vals else 0.0
        return max(p90, self.GATHER_REF_FLOOR_GBS)

    def leg_clean(self, bws: list[float]):
        """True/False verdict for a leg's in-leg series; None when the
        leg was too short to judge (defer to the bracketing sentinel).
        The statistic is statistics.median — the same one the leg
        records display, so a committed diagnostic can never look
        in-band on a leg this verdict flagged."""
        import statistics

        if len(bws) < self.MIN_SAMPLES:
            return None
        return statistics.median(bws) >= self.REL_BAND * self.reference

    def leg_clean_full(self, bws: list[float], gathers: list[float]):
        """Copy verdict AND (when promoted) the gather verdict: a leg
        is contended if either series' median falls under its band.
        ``GATHER_BAND = None`` keeps the gather series recorded-only
        (the r13 default while the correlation dataset accrues);
        setting a number promotes it."""
        import statistics

        copy_verdict = self.leg_clean(bws)
        if self.GATHER_BAND is None:
            return copy_verdict
        if len(gathers) < self.MIN_SAMPLES:
            return copy_verdict
        gather_ok = statistics.median(gathers) >= (
            self.GATHER_BAND * self.gather_reference
        )
        if copy_verdict is None:
            return gather_ok
        return copy_verdict and gather_ok

    def between(self, t0: float, t1: float) -> list[float]:
        """Copy probes recorded in the monotonic interval [t0, t1]."""
        return [s[1] for s in self.samples if t0 <= s[0] <= t1]

    def gather_between(self, t0: float, t1: float) -> list[float]:
        """Gather probes (the recorded-only latency series) in the
        monotonic interval [t0, t1]."""
        return [s[2] for s in self.samples if t0 <= s[0] <= t1]

    def window(self) -> "_BwWindow":
        return _BwWindow(self)


class _BwWindow:
    """Context manager: background ~1 Hz bandwidth probes for one leg."""

    def __init__(self, sentinel: BandwidthSentinel):
        self.sentinel = sentinel
        self.bws: list[float] = []

    def __enter__(self):
        import threading

        self.t0 = time.monotonic()
        self._stop = threading.Event()

        def run():
            while not self._stop.is_set():
                self.bws.append(self.sentinel.probe())
                self._stop.wait(self.sentinel.INTERVAL_SEC)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join()
        self.t1 = time.monotonic()
        return False

    def clean(self):
        return self.sentinel.leg_clean(self.bws)

    def gathers(self) -> list[float]:
        """The recorded-only gather series for this window (post-hoc
        correlation diagnostics — not a verdict input)."""
        return self.sentinel.gather_between(self.t0, self.t1)


def bw_sentinel() -> BandwidthSentinel:
    """The in-leg sentinel packaged for the sweep tools (r12 verdict
    Wrong #2), like sweep_qualifier packages the loopback sentinel.
    Three seed probes anchor the run reference before the first leg."""
    s = BandwidthSentinel()
    for _ in range(3):
        s.probe()
    return s


# 15/round (was 10 through r13): 90 registered non-headline keys had
# no wall-clock series entering r14 and 10/round would not close the
# gap by r20 — 15 exactly does.  Tail keys are mostly sub-second plans
# at sf0.1, so the extra 5 cost ~1 min/round of budget.
TAIL_COUNT = 15


def _tail_rotation(queries) -> list[str]:
    """r11 verdict #6: ~110 of the 154 registered queries have plan
    audits but no wall-clock series.  Each round, the TAIL_COUNT
    non-headline queries that were least recently benched get one
    window-qualified sample; the ledger is the committed
    ``BENCH_r*.json`` files' ``tail_queries`` sections (the driver
    stores the printed JSON line under ``parsed``), never-benched keys
    first, lexicographic tie-break — the same exactly-predictable LRV
    total order the oracle rotation uses (registry.all_queries)."""
    import glob
    import re

    root = os.path.dirname(os.path.abspath(__file__))
    led: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "BENCH_r*.json")):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rec, dict):
            continue
        parsed = rec.get("parsed", rec)
        section = parsed.get("tail_queries", {}) if isinstance(parsed, dict) else {}
        for k in section:
            led[k] = max(led.get(k, 0), rnd)
    cands = [n for n in queries if n not in HEADLINE]
    cands.sort(key=lambda n: (led.get(n, 0), n))
    return cands[:TAIL_COUNT]


def sweep_qualifier(spark) -> "WindowQualifier":
    """The bench's window qualifier packaged for the SCALE sweep tools
    (r11 verdict #2): same sentinel workload (s2_serve_1m_identity —
    CPU + loopback socket, no Spark jobs, no disk), same BAND/floor
    rules.  Three warm probes seed the floor (the first also pays the
    lazy 1M-row server materialization, which is why it is discarded
    by re-probing rather than special-cased)."""
    qual = WindowQualifier(
        lambda: _bench_transport(spark, "s2_serve_1m_identity")
    )
    for _ in range(3):
        qual.probe()
    return qual


def commit_stat(samples: list[float]) -> float:
    """The COMMITTED statistic: MIN of the (window-qualified clean)
    samples.  r14 (verdict #1): the box's co-tenant phases inflate
    mildly (1.5-1.9×) below every probe's detection threshold, so any
    order statistic above the min embeds phase inflation — the box-noise
    protocol's conclusion (SCALE.md gather rejection; three rounds of
    paired A/Bs) is that min over clean legs is the only load-bearing
    statistic on this box.  Round-over-round DRIFT is watched via
    drift_stat in BENCH_DETAIL instead, where r11-r13's committed
    lower-middle keeps its series."""
    return round(min(samples), 3)


def drift_stat(samples: list[float]) -> float:
    """The drift-watch statistic (BENCH_DETAIL ``drift_watch``): the
    lower-middle of the sorted samples — r11-r13's committed statistic,
    kept as a series so a real level shift (tight spread, higher
    middle) still separates from a lucky-min mask."""
    s = sorted(samples)
    return round(s[(len(s) - 1) // 2], 3)


def drift_anchors(
    base: str | None = None,
) -> tuple[dict[str, float], dict[str, float]]:
    """Per-key drift anchors (r14 verdict #5): the CERTIFIED floors from
    BENCH_QUIET.json (quiet-window provenance — the formal anchor) and
    the best-ever committed values across all BENCH_r*.json (headline +
    tail sections — the fallback for never-certified keys)."""
    base = base or os.path.dirname(os.path.abspath(__file__))
    certified: dict[str, float] = {}
    # BENCH_QUIET (headline, strongest provenance) wins over BENCH_BULK
    # (registry-wide r15 bulk pass) on overlap — ordered reads + setdefault
    for name in ("BENCH_QUIET.json", "BENCH_BULK.json"):
        try:
            with open(os.path.join(base, name)) as fh:
                rec = json.load(fh)
        except (OSError, ValueError):
            continue
        keys = rec.get("keys", {}) if isinstance(rec, dict) else {}
        for k, r in keys.items():
            if (
                isinstance(r, dict)
                and r.get("certified")
                and isinstance(r.get("sec"), (int, float))
            ):
                certified.setdefault(k, float(r["sec"]))
    best: dict[str, float] = {}
    for path in sorted(glob.glob(os.path.join(base, "BENCH_r*.json"))):
        try:
            rec = json.load(open(path))
        except (OSError, ValueError):
            continue
        parsed = rec.get("parsed") if isinstance(rec, dict) else None
        if not isinstance(parsed, dict):
            continue
        for section in ("queries", "tail_queries"):
            sec = parsed.get(section)
            for k, v in (sec.items() if isinstance(sec, dict) else ()):
                if isinstance(v, (int, float)):
                    best[k] = min(best.get(k, float("inf")), float(v))
    return certified, best


# Core-count provenance default for floor records that predate r17:
# every committed certification/bulk/bench run before round 17 was taken
# at the driver's main config, local[32] (BENCH_QUIET/BULK/r01..r16 —
# verified against their gitignored-nothing history; the one 8-core run,
# BENCH_r16_c8.json, is excluded from anchors below by its own recorded
# cpus).  New records carry an explicit "cpus" field.
_FLOOR_DEFAULT_CPUS = 32


def _rec_cpus(rec: dict, default: int = _FLOOR_DEFAULT_CPUS) -> int:
    """Best-effort int cpus from a bench/ledger record's top level."""
    try:
        return int(rec.get("cpus") or default)
    except (TypeError, ValueError):
        return default


def anchor_cpus(
    base: str | None = None,
) -> tuple[dict[str, int], dict[str, int]]:
    """Per-key core-count provenance for the drift anchors (r16 verdict
    #2: floors certified at 32 cores false-fire the 2x gate on any
    well-scaling key in an 8-core run — agg_hll_sketch_exchange's genuine
    8/32 ratio is 2.46).  Mirrors :func:`drift_anchors` precedence
    exactly: QUIET wins over BULK per key; the best-ever map records the
    cpus of the run that produced each key's winning minimum.  Records
    without a cpus field default to ``_FLOOR_DEFAULT_CPUS``."""
    base = base or os.path.dirname(os.path.abspath(__file__))
    certified: dict[str, int] = {}
    for name in ("BENCH_QUIET.json", "BENCH_BULK.json"):
        try:
            with open(os.path.join(base, name)) as fh:
                rec = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rec, dict):
            continue
        file_cpus = _rec_cpus(rec)
        keys = rec.get("keys", {})
        for k, r in (keys.items() if isinstance(keys, dict) else ()):
            if (
                isinstance(r, dict)
                and r.get("certified")
                and isinstance(r.get("sec"), (int, float))
            ):
                certified.setdefault(k, _rec_cpus(r, file_cpus))
    best_sec: dict[str, float] = {}
    best_cpus: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(base, "BENCH_r*.json"))):
        try:
            rec = json.load(open(path))
        except (OSError, ValueError):
            continue
        parsed = rec.get("parsed") if isinstance(rec, dict) else None
        if not isinstance(parsed, dict):
            continue
        file_cpus = _rec_cpus(rec)
        for section in ("queries", "tail_queries"):
            sec = parsed.get(section)
            for k, v in (sec.items() if isinstance(sec, dict) else ()):
                if isinstance(v, (int, float)) and float(v) < best_sec.get(
                    k, float("inf")
                ):
                    best_sec[k] = float(v)
                    best_cpus[k] = file_cpus
    return certified, best_cpus


def vs_floor(
    vals: dict[str, float],
    certified: dict[str, float],
    best: dict[str, float],
    run_cpus: int | None = None,
    certified_cpus: dict[str, int] | None = None,
    best_cpus: dict[str, int] | None = None,
) -> dict[str, dict]:
    """Each key's committed value vs its drift anchor: the certified
    floor when one exists, else best-ever committed, else no anchor
    (first-ever timing — the next round's anchor is this value).

    With ``run_cpus`` (plus the provenance maps from
    :func:`anchor_cpus`), each anchored record also carries
    ``anchor_cpus`` and ``cpus_match`` — the drift gate only fires on
    same-cpus anchors (r16 verdict #2: a 32-core floor is not a valid
    2x bound for an 8-core run on a key that actually scales)."""
    out: dict[str, dict] = {}
    for k, v in vals.items():
        if k in certified:
            anchor, src = certified[k], "certified"
            a_cpus = (certified_cpus or {}).get(k, _FLOOR_DEFAULT_CPUS)
        elif k in best:
            anchor, src = best[k], "best_ever"
            a_cpus = (best_cpus or {}).get(k, _FLOOR_DEFAULT_CPUS)
        else:
            out[k] = {"ratio": None, "anchor": "none"}
            continue
        rec = {
            "ratio": round(v / anchor, 3) if anchor > 0 else None,
            "anchor": src,
            "floor_sec": round(anchor, 3),
        }
        if run_cpus is not None:
            rec["anchor_cpus"] = a_cpus
            rec["cpus_match"] = a_cpus == run_cpus
        out[k] = rec
    return out


def drift_breaches(vs_floor_all: dict[str, dict]) -> list[str]:
    """Keys whose committed value breached the 2x drift gate vs their
    anchor.  Only SAME-CPUS anchors gate (r16 verdict #2): a floor
    certified at 32 cores is not a valid 2x bound for a lower-core run —
    any well-scaling key (agg_hll_sketch_exchange's genuine 8/32 ratio is
    2.46) would false-breach on a healthy engine.  Records without a
    cpus_match field (legacy callers) gate as before."""
    return sorted(
        k
        for k, r in vs_floor_all.items()
        if r.get("ratio") is not None
        and r["ratio"] > 2.0
        and r.get("cpus_match", True)
    )


def drift_gate_rc(breaches: list[str], env=None) -> int:
    """r15 verdict #7: the 2x-vs-certified-floor clause, machine-enforced
    per run (the way explain_audit exits nonzero on plan violations)
    instead of judge-enforced per round.  Returns the process exit code:
    2 when any key breached, 0 otherwise.  The compact stdout JSON line
    and BENCH_DETAIL.json are always written BEFORE this gate runs, so a
    breach never costs the round its committed numbers — it only makes
    the run loudly red.  ``SPARK_GRAFT_DRIFT_GATE=0`` disables the
    nonzero exit (the breach list still prints) for harnesses that must
    not see a failing status."""
    env = os.environ if env is None else env
    if breaches and env.get("SPARK_GRAFT_DRIFT_GATE", "1") != "0":
        return 2
    return 0


def accrue_certified(
    keys: dict[str, dict],
    prev: dict[str, dict],
    stale_limit: int = 3,
) -> dict[str, dict]:
    """Merge a certification run's per-key records with a prior ledger
    (shared by tools/certify_bench.py and tools/bulk_bench.py).
    Semantics (r14 accrual + r15 staleness, ADVICE r14):

    - a key certified by ANY run keeps its LOWEST certified floor;
    - when the current run certifies slower than the kept floor, the
      carry is fresh (carried_runs resets to 0) and the current result
      is recorded alongside;
    - when the current run MEASURED a previously-certified key and
      FAILED it, the carry records the failing result and survives at
      most ``stale_limit`` consecutive measured failures — a permanently-
      regressed key must not stay certified forever at a stale floor.
      A key the current run did not measure at all carries UNCHANGED
      (no counter increment): targeted single-key runs must not expire
      the floors of keys they never touched;
    - an uncertified prior record is kept visible only if the current
      run did not re-measure the key.

    Mutates and returns ``keys``.
    """
    for k, old in prev.items():
        new = keys.get(k)
        if not old.get("certified"):
            if new is None:
                keys[k] = old
            continue
        if new is not None and new.get("certified"):
            if new["sec"] > old["sec"]:
                kept = dict(old)
                kept["carried_from_prior_run"] = True
                if new["sec"] > 2.0 * old["sec"]:
                    # ADVICE r15: a certified result beyond the 2x drift
                    # band is evidence the floor no longer tracks
                    # reality — it AGES the carry like a measured
                    # failure instead of refreshing it, so a key that
                    # only ever re-certifies at arbitrarily slower
                    # values still expires after stale_limit such runs.
                    kept["carried_runs"] = old.get("carried_runs", 0) + 1
                else:
                    kept["carried_runs"] = 0
                kept["current_run"] = {
                    "sec": new["sec"], "quality": new.get("quality"),
                    "spread": new.get("spread"), "certified": True,
                }
                if kept["carried_runs"] > stale_limit:
                    kept["certified"] = False
                    kept["stale_floor"] = True
                keys[k] = kept
            continue  # else: new run set a lower floor — keep it
        kept = dict(old)
        kept["carried_from_prior_run"] = True
        if new is None:  # not measured this run: carry without aging
            kept["current_run"] = None
        else:
            kept["carried_runs"] = old.get("carried_runs", 0) + 1
            kept["current_run"] = {
                "sec": new["sec"], "quality": new.get("quality"),
                "spread": new.get("spread"), "certified": False,
            }
            if kept["carried_runs"] > stale_limit:
                kept["certified"] = False
                kept["stale_floor"] = True
        keys[k] = kept
    return keys


def qualified_legs(qual, leg_fns, min_clean: int = 2, bw=None):
    """Sentinel-bracket a sweep's measurement legs (r11 verdict #2 —
    the SCALE sweeps used to commit min-over-N-legs and adjudicate
    9-69 s spreads by hand).  ``leg_fns`` are zero-arg callables that
    each run ONE genuinely fresh leg and return its wall seconds
    (legs must not be replays of each other — the caller stages a
    fresh delta per leg).  Legs run in order until ``min_clean`` of
    them were bracketed by a clean sentinel window, or the supply is
    exhausted.  Returns ``(committed_sec, tag, legs)`` where ``legs``
    is ``[{"sec": s, "window": "clean"|"contended"}, ...]``; the
    committed number is the MIN of clean legs ("clean"), else the min
    of everything ("contended" — flagged, never silently trusted).

    Pass ``bw`` (a ``BandwidthSentinel``) to also sample memory
    bandwidth INSIDE each leg (r12 verdict Wrong #2: a co-tenant
    window that opens and closes inside one leg is invisible to the
    bracketing probes); a leg whose in-leg bandwidth median falls
    below the band is contended regardless of its brackets."""
    import statistics

    legs: list[dict] = []
    inlegs: list[tuple[list[float], list[float]]] = []
    brackets: list[tuple[int, int]] = []
    fns = iter(leg_fns)

    def run_leg(fn) -> bool:
        """Run one leg; record it; return the PROVISIONAL verdict."""
        b = qual.probe()
        if bw is not None:
            with bw.window() as w:
                sec = fn()
            inleg = w.bws
            gathers = getattr(w, "gathers", lambda: [])()
        else:
            sec = fn()
            inleg, gathers = [], []
        a = qual.probe()
        ok = qual.clean(b, a) and (
            bw is None or bw.leg_clean_full(inleg, gathers) is not False
        )
        leg = {"sec": round(sec, 2)}
        if inleg:
            leg["bw_med_gbs"] = round(statistics.median(inleg), 1)
            if gathers:
                leg["gather_med_gbs"] = round(statistics.median(gathers), 2)
        legs.append(leg)
        inlegs.append((inleg, gathers))
        brackets.append((b, a))
        return ok

    def finalize() -> int:
        """Re-derive every leg's verdict with the CURRENT (end-of-run)
        bandwidth reference and rewrite the tags; returns the clean
        count.  A run whose start falls inside a co-tenant phase would
        otherwise self-normalize (the reference p90 is phase-depressed
        when the early legs are judged, so contaminated legs tag clean
        and the early-break stops the run); re-deriving after all legs
        means a later quiet probe raises the reference and
        retroactively flags them."""
        n = 0
        for leg, (inleg, gathers), (b, a) in zip(legs, inlegs, brackets):
            ok = qual.clean(b, a) and (
                bw is None or bw.leg_clean_full(inleg, gathers) is not False
            )
            leg["window"] = "clean" if ok else "contended"
            n += ok
        return n

    # the in-flight verdicts only steer the early-break; the COMMITTED
    # verdicts are re-derived by finalize()
    n_clean = 0
    for fn in fns:
        n_clean += run_leg(fn)
        if n_clean >= min_clean:
            break
    # r13 ADVICE: the re-derivation can only get STRICTER (the
    # reference rises as quiet probes accrue), so a retro-flagged leg
    # can leave fewer than min_clean survivors — keep consuming the
    # remaining leg supply until the FINAL verdicts hold min_clean
    # clean legs or the supply is exhausted.
    while finalize() < min_clean:
        fn = next(fns, None)
        if fn is None:
            break
        run_leg(fn)
    clean_vals = [g["sec"] for g in legs if g["window"] == "clean"]
    if clean_vals:
        # supply exhausted below the promised sample count: still a
        # min-over-clean commit, but tagged so consumers know the
        # sample was thinner than asked (r13 ADVICE)
        tag = "clean" if len(clean_vals) >= min_clean else "clean_partial"
        return min(clean_vals), tag, legs
    return min(g["sec"] for g in legs), "contended", legs


# x4 band factor: committed aggregate GiB/s must reach this share of the
# paired 4-stream probe ceiling (r16; calibration series in SCALE.md —
# quiet-window x4 runs measure 1.2-1.5x the userspace probe because the
# serve path is mmap splice, so 0.95 still leaves headroom while a
# phase-halved run falls clearly below)
_X4_BAND = float(os.environ.get("SPARK_GRAFT_X4_BAND", "0.95"))


def _bench_replay_100m(
    spark,
    qual: "WindowQualifier | None" = None,
    qualify=None,
) -> dict[str, object]:
    """BASELINE.md S1 at REFERENCE scale: 100,000,000 rows × 4 int64
    (~3 GiB + framing) in 4096-row batches (≈24,415 batches — the
    get_simple workload, http/get_simple/python/server/http.server/
    server.py:33-36), served uncompressed over chunked HTTP and
    stream-decoded.  Generation and spill are distributed (spark.range →
    mapInArrow spill files, rebatched to 4096 ON the executors); serving
    replays the spill artifacts' bytes zero-copy via the spliced raw
    stream (raw_spill_stream — the spill files already ARE encoded IPC,
    so the per-request cost is mmap + sendall, no per-batch writer loop;
    VERDICT r5 #1).  Pre-materialize once, then time the fetch — the
    reference's measurement protocol (client elapsed seconds,
    get_simple/README.md:37).

    Returns the single-client attempts plus the 4-concurrent-client run
    at the same full scale (the reference's Flight comparison uses 4
    streams, get_simple/README.md:30).  Attempt 1 reads the spill from a
    colder page cache than attempt 2; attempt 3 runs AFTER the ×4 pass
    (VERDICT r6 #2) — by then the concurrent streams have pulled every
    spill byte through the page cache and ~35 s have elapsed, so a noise
    window that caught the early attempts has decorrelated.  All attempts
    are recorded; the committed number is their min, the cold ones stay
    visible in the spread."""
    import shutil
    import time as _time

    from arrow_experiments_spark.sources.arrow_ipc import (
        register_spilled_files,
        spill_dataframe,
    )
    from arrow_experiments_spark.sources.generators import gen_flight_bench
    from arrow_experiments_spark.transport.client import fetch_arrow
    from arrow_experiments_spark.transport.server import DatasetRegistry, serve

    rows = 100_000_000
    d, files, schema = spill_dataframe(
        gen_flight_bench(spark, rows=rows), batch_rows=4096
    )
    registry = DatasetRegistry()
    raw_active = register_spilled_files(
        registry, "flight100m", files, schema, batch_rows=4096
    )
    assert raw_active, "spill files not splice-eligible — raw serve path inactive"
    httpd = serve(registry)
    host, port = httpd.server_address
    url = f"http://{host}:{port}/datasets/flight100m"
    try:
        def one_fetch() -> float:
            t0 = _time.perf_counter()
            _, metrics = fetch_arrow(
                url, accept_encoding="identity", collect_table=False
            )
            dt = round(_time.perf_counter() - t0, 3)
            assert metrics.rows == rows
            # 100M rows in 4096-row batches: global ceil = 24,415; the
            # splice replays per-file bytes verbatim, so each spill
            # file's partial tail batch stays unmerged → up to one extra
            # batch per file.
            assert 24_415 <= metrics.batches <= 24_415 + len(files), metrics.batches
            return dt

        # two recorded fetches: the r5-vs-r4 comparison caught a
        # single-shot fetch landing in a co-tenant noise window (30.1 s
        # vs 7.0 s re-measured minutes later) — one repeat bounds that,
        # and the spill (the expensive half) still happens once.
        attempts = [one_fetch() for _ in range(2)]

        # ×4 concurrent clients at FULL reference scale (VERDICT r5 #5):
        # barrier-synchronized subprocesses — measures the threaded
        # server's GIL-released mmap-splice sendall path under 4
        # concurrent 3 GiB streams, fetch phase only.
        #
        # r15 verdict Wrong #3 (third consecutive self-exclusion): the
        # x4 key was measured ONCE per run and wore the single-stream
        # key's quality tag, whose loopback band compares single-stream
        # throughput to a single-stream ceiling — a 4-stream aggregate
        # can never window-qualify through that proxy.  The r16
        # protocol gives x4 its own legs: two recorded attempts
        # (min committed, both in the spread), its own SAME-SHAPE
        # ceiling (_loopback_gibs_nstream — 4 concurrent streams,
        # threaded sender, subprocess receivers) probed adjacent to the
        # attempts, a band vs that paired ceiling, and retries under
        # the same sentinel+band rules as the single-stream key.
        def one_x4() -> float:
            wall, got = _concurrent_fetch(url, 4)
            assert got == [rows] * 4
            return round(wall, 3)

        x4_ceilings = [_loopback_gibs_nstream()]
        x4_attempts = [one_x4(), one_x4()]

        # third single-client attempt, warm + window-decorrelated
        # (VERDICT r6 #2: r6's two attempts both landed in one noise
        # window — attempt 2 slower than attempt 1 — while the ×4 run
        # seconds later streamed 12 GiB in 1.5 s)
        attempts.append(one_fetch())
        # self-qualification (r10 verdict #3): while the server + spill
        # are still alive a retry costs one ~1 s fetch.  Two gates, both
        # must pass: the sentinel probe (general co-tenant phase) AND
        # ``qualify`` — the loopback-ratio check (r8 lesson: a 1M
        # cache-resident sentinel does NOT see the memory-bandwidth
        # contention a 3 GiB stream does; the replay's share of the
        # same-run raw-socket ceiling is the signal that does).
        quality = "clean"
        if qual is not None or qualify is not None:

            def ok_now() -> tuple[bool, bool]:
                sentinel_ok = qual.window_ok() if qual is not None else True
                band_ok = (
                    qualify(min(attempts)) if qualify is not None else True
                )
                return sentinel_ok, band_ok

            retries = 0
            sentinel_ok, band_ok = ok_now()
            while not (sentinel_ok and band_ok) and retries < 3:
                _time.sleep(3)  # windows are minutes; still worth a nudge
                attempts.append(one_fetch())
                retries += 1
                sentinel_ok, band_ok = ok_now()
            if retries:
                if sentinel_ok and band_ok:
                    quality = "rerun_clean"
                elif sentinel_ok:
                    # below the loopback band WITH clean sentinel
                    # brackets: a real throughput regression, not a
                    # co-tenant phase — tagged distinctly so
                    # cross-round comparisons don't discount it as
                    # noise (r11 ADVICE)
                    quality = "below_band"
                else:
                    quality = "contended"

        # x4 qualification against its OWN paired ceiling (see the x4
        # note above): aggregate effective GiB/s vs the most recent
        # 4-stream probe.  The band factor is calibrated to the splice
        # path: the server replays mmap'd bytes while the probe's
        # sender pushes from userspace, so a clean x4 run typically
        # EXCEEDS the probe ceiling (measured ~1.2-1.5x in quiet
        # windows) — the band is about catching the runs that fall far
        # below the paired probe, not about a 0.7 share of it.
        payload_gib = rows * 4 * 8 / 1024**3
        x4_quality = "clean"

        def x4_ok() -> tuple[bool, bool]:
            sentinel_ok = qual.window_ok() if qual is not None else True
            band_ok = (
                4 * payload_gib / min(x4_attempts)
                >= _X4_BAND * x4_ceilings[-1]
            )
            return sentinel_ok, band_ok

        x4_retries = 0
        sentinel_ok, band_ok = x4_ok()
        while not (sentinel_ok and band_ok) and x4_retries < 3:
            _time.sleep(3)
            x4_ceilings.append(_loopback_gibs_nstream())
            x4_attempts.append(one_x4())
            x4_retries += 1
            sentinel_ok, band_ok = x4_ok()
        if x4_retries:
            if sentinel_ok and band_ok:
                x4_quality = "rerun_clean"
            elif sentinel_ok:
                x4_quality = "below_band"
            else:
                x4_quality = "contended"
        return {
            "s1_replay_100m": min(attempts),
            "s1_replay_100m_attempts": attempts,
            "s1_replay_100m_x4": min(x4_attempts),
            "s1_replay_100m_x4_attempts": x4_attempts,
            "s1_replay_100m_x4_quality": x4_quality,
            "s1_replay_100m_x4_ceilings": x4_ceilings,
            "s1_replay_100m_quality": quality,
        }
    finally:
        httpd.shutdown()
        shutil.rmtree(d, ignore_errors=True)


# BASELINE.md S2 is a per-strategy matrix: HTTP content codings
# (identity/gzip/br/zstd) and transparent IPC buffer codecs
# (identity+zstd, identity+lz4).  (accept, accept_encoding) per key; the
# IPC-codec rows pin the HTTP coding to identity so exactly one layer
# compresses (the reference's don't-double-compress rule).
def _bench_serve_42m(spark, qual: "WindowQualifier | None" = None) -> float:
    """BASELINE.md S2 at REFERENCE scale: 42,000,000 trading rows
    (ticker/price/volume, get_compressed server.py:81) in 6,144-row
    batches, ticker dictionary-encoded at the egress boundary with
    APPEND-ONLY per-stream dictionaries (IPC delta messages — the
    streaming form of the reference's dict-encoded ticker column), zstd
    HTTP coding (the server's preferred codec), stream-decoded.
    Generation and spill are distributed; serving holds O(batch).  Run
    once per round."""
    import shutil
    import time as _time

    from arrow_experiments_spark.sources.arrow_ipc import (
        dictionary_encode_reader,
        maybe_prefetch_reader,
        spill_dataframe,
        spilled_files_reader,
    )
    from arrow_experiments_spark.sources.generators import gen_trading
    from arrow_experiments_spark.transport.client import fetch_arrow
    from arrow_experiments_spark.transport.server import DatasetRegistry, serve

    rows = 42_000_000
    d, files, schema = spill_dataframe(gen_trading(spark, rows=rows))
    registry = DatasetRegistry()
    # per-batch payload estimate: 6144 rows × (8 B price + 8 B volume +
    # 8 B dict index) ≈ 144 KiB — above the prefetch gate's floor, and the
    # serve codec is real (zstd), so read-ahead engages here (and ONLY on
    # shapes like this: the gate keeps identity/small-batch serves
    # single-threaded — VERDICT r5 #4).
    batch_bytes = 6144 * 24
    registry.register(
        "trading42m",
        # prefetch: spill-file read + dictionary encode overlap the zstd
        # compression + socket writes downstream (ordered, O(depth) memory)
        lambda: maybe_prefetch_reader(
            dictionary_encode_reader(
                spilled_files_reader(files, schema, batch_rows=6144), ["ticker"]
            ),
            per_batch_bytes=batch_bytes,
            codec="zstd",
        ),
    )
    # the spilled source is immutable and the dict+zstd encode
    # deterministic, so the serve qualifies for disk-backed encode-once
    # (r8 verdict flagged this as the compress-once gap at spill scale):
    # attempt 1 pays the encode while teeing the bytes, attempt 2 replays
    # the artifact — the reference's pre-materialize-then-replay model
    # applied to the ENCODED form.  Both attempts are recorded; the
    # artifact lives in the spill tempdir and dies with it.
    registry.enable_encoded_artifact(
        "trading42m", cache_dir=os.path.join(d, "artifact")
    )
    httpd = serve(registry)
    host, port = httpd.server_address
    try:
        # best-of-2, same noise-window rationale as _bench_replay_100m;
        # every attempt is recorded (r8: this key drifted 2.9 → ~4 s with
        # a CLEAN sentinel — the 1M sentinel does not see memory-bandwidth
        # contention that a 42M encode does, so the attempts themselves
        # are the diagnostic)
        attempts: list[float] = []

        def one_fetch() -> None:
            t0 = _time.perf_counter()
            tbl, metrics = fetch_arrow(
                f"http://{host}:{port}/datasets/trading42m",
                accept_encoding="zstd",
                collect_table=False,
            )
            attempts.append(round(_time.perf_counter() - t0, 3))
            assert metrics.rows == rows

        for _ in range(2):
            one_fetch()
        # self-qualification: artifact replays cost ~1.7 s — retry while
        # the window is contended instead of committing it (r10 #3)
        if qual is not None:
            retries = 0
            while not qual.window_ok() and retries < 3:
                _time.sleep(3)
                one_fetch()
                retries += 1
            _SERVE_42M_QUALITY.append(
                "clean" if retries == 0
                else ("rerun_clean" if qual.samples[-1] <= qual.limit
                      else "contended")
            )
        _SERVE_42M_ATTEMPTS.extend(attempts)
        return min(attempts)
    finally:
        httpd.shutdown()
        shutil.rmtree(d, ignore_errors=True)


_SERVE_42M_ATTEMPTS: list[float] = []
_SERVE_42M_QUALITY: list[str] = []


_S2_STRATEGIES: dict[str, tuple[str | None, str]] = {
    "s2_serve_1m_identity": (None, "identity"),
    "s2_serve_1m_gzip": (None, "gzip"),
    "s2_serve_1m_br": (None, "br"),
    "s2_serve_1m_zstd": (None, "zstd"),
    "s2_serve_1m_ipc_zstd": (
        'application/vnd.apache.arrow.stream; codecs="zstd"',
        "identity",
    ),
    "s2_serve_1m_ipc_lz4": (
        'application/vnd.apache.arrow.stream; codecs="lz4"',
        "identity",
    ),
}

_S2_SERVER = None


def _s2_server(spark):
    """Lazily start ONE trading server shared by all S2 strategy items —
    pre-materialize once, serve many (the reference's serving model:
    get_simple server.py:144).  Ticker is dictionary-encoded at the egress
    boundary, as the reference's get_compressed server does
    (server.py:70-74)."""
    global _S2_SERVER
    if _S2_SERVER is None:
        from arrow_experiments_spark.sources.arrow_ipc import (
            dictionary_encode_columns,
        )
        from arrow_experiments_spark.sources.generators import gen_trading
        from arrow_experiments_spark.transport.server import DatasetRegistry, serve

        base = dictionary_encode_columns(
            gen_trading(spark, rows=1_000_000).toArrow(), ["ticker"]
        )
        registry = DatasetRegistry()
        registry.register_table("trading", base)
        _S2_SERVER = serve(registry)
    return _S2_SERVER


def _bench_transport(spark, name: str) -> float:
    """Reference-faithful serve-and-consume scenario (BASELINE.md S2 at
    reduced scale): serve trading batches over HTTP with the named
    negotiation strategy, stream-decode with the pyarrow client, report
    elapsed seconds (the reference's client metrics protocol).  The timed
    section is transport only."""
    import time as _time

    from arrow_experiments_spark.transport.client import fetch_arrow

    accept, accept_encoding = _S2_STRATEGIES[name]
    httpd = _s2_server(spark)
    host, port = httpd.server_address
    best = float("inf")
    for _ in range(2):  # outer two-pass scheme decorrelates the rest
        t0 = _time.perf_counter()
        tbl, _metrics = fetch_arrow(
            f"http://{host}:{port}/datasets/trading",
            accept=accept,
            accept_encoding=accept_encoding,
        )
        best = min(best, _time.perf_counter() - t0)
        assert tbl.num_rows == 1_000_000
    return round(best, 3)


def _loopback_gibs(n_bytes: int = 1 * 1024**3) -> float:
    """Raw localhost-socket bandwidth (GiB/s): 1 MiB sendall chunks,
    sender thread → recv loop, no Spark, no Arrow, no disk.  This is the
    PHYSICAL ceiling of every serve-family key: the 100M replay's splice
    path is mmap + sendall of pre-encoded bytes, so its effective GiB/s
    divided by this number is the engine's share of the machine limit —
    drift in the ceiling is the box, a drop in the RATIO is the engine.
    r9: replay 2.4-2.6 GiB/s against ceilings of 2.69-3.22 measured
    minutes apart (75-97%, the gap being HTTP chunk framing + client
    Arrow decode); the r7-era 0.90 s floor implies a ≳3.4 GiB/s era."""
    import os as _os
    import socket
    import threading
    import time as _time

    chunk = bytearray(_os.urandom(1 << 20))
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def sender() -> None:
        c = socket.socket()
        c.connect(("127.0.0.1", port))
        sent = 0
        while sent < n_bytes:
            c.sendall(chunk)
            sent += len(chunk)
        c.close()

    # t0 BEFORE the sender starts: connect() lands in the listen backlog
    # and sendall() fills kernel socket buffers before accept() returns,
    # so a post-accept t0 would credit those pre-buffered bytes to a
    # shorter window and inflate the ceiling (~1% at 1 GiB) — the thread
    # startup microseconds bias the other way, negligibly
    t = threading.Thread(target=sender)
    t0 = _time.perf_counter()
    t.start()
    conn, _ = srv.accept()
    got = 0
    while got < n_bytes:
        b = conn.recv(1 << 20)
        if not b:
            break
        got += len(b)
    dt = _time.perf_counter() - t0
    t.join()
    conn.close()
    srv.close()
    return round(got / 1024**3 / dt, 2)


_NSTREAM_RECV_CODE = (
    "import socket, sys\n"
    "n = int(sys.argv[2])\n"
    "c = socket.socket()\n"
    "c.connect(('127.0.0.1', int(sys.argv[1])))\n"
    "print('READY', flush=True)\n"
    "sys.stdin.readline()\n"
    "got = 0\n"
    "while got < n:\n"
    "    b = c.recv(1 << 20)\n"
    "    if not b:\n"
    "        break\n"
    "    got += len(b)\n"
    "print(got, flush=True)\n"
)


def _loopback_gibs_nstream(
    n_streams: int = 4, n_bytes_per: int = 1 * 1024**3
) -> float:
    """AGGREGATE localhost-socket bandwidth over ``n_streams`` concurrent
    streams (GiB/s): one threaded sender process (sendall releases the
    GIL — the real server's topology) feeding one RECEIVER SUBPROCESS
    per stream (own GIL each — the real x4 clients' topology).  This is
    the physical ceiling of the 4-concurrent-client replay, which the
    single-stream ``_loopback_gibs`` ceiling cannot stand in for: on
    this box 4 streams aggregate ~3-4x the single-stream number, and a
    co-tenant phase moves the two DIFFERENTLY (r15 verdict Wrong #3 —
    the x4 key could never window-qualify against single-stream
    brackets).  Pairing the x4 measurement with ITS OWN same-shape
    ceiling, probed adjacent to each attempt, is what makes the band
    self-normalizing under box drift."""
    import socket
    import subprocess as _sp
    import threading
    import time as _time

    chunk = bytearray(os.urandom(1 << 20))
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(n_streams)
    port = srv.getsockname()[1]
    procs = [
        _sp.Popen(
            [sys.executable, "-c", _NSTREAM_RECV_CODE,
             str(port), str(n_bytes_per)],
            stdin=_sp.PIPE, stdout=_sp.PIPE, text=True,
        )
        for _ in range(n_streams)
    ]
    try:
        conns = []
        for _ in range(n_streams):
            conn, _addr = srv.accept()
            conns.append(conn)
        for p in procs:
            assert p.stdout.readline().strip() == "READY"

        def sender(conn) -> None:
            sent = 0
            while sent < n_bytes_per:
                conn.sendall(chunk)
                sent += len(chunk)
            conn.close()

        threads = [threading.Thread(target=sender, args=(c,)) for c in conns]
        t0 = _time.perf_counter()
        for p in procs:
            p.stdin.write("go\n")
            p.stdin.flush()
        for t in threads:
            t.start()
        got = 0
        for p in procs:
            out, _ = p.communicate(timeout=120)
            got += int(out.strip().splitlines()[-1])
        dt = _time.perf_counter() - t0
        for t in threads:
            t.join()
        return round(got / 1024**3 / dt, 2)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        srv.close()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = build_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]

    # Warm the JVM/parquet footers once so per-query numbers measure the
    # queries, not session startup.
    queries["q1_pricing_summary"].build(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # The bench machine sees recurring co-tenant contention: contiguous
    # ~2-4 min windows (roughly every ~10 min) where everything measured
    # inside runs 5-30× slower (wall≈CPU, loadavg low — a neighbor
    # stealing memory bandwidth, invisible to /proc/loadavg).  Back-to-back
    # repeats land both runs inside one window; and because a full pass
    # lasts about one window period, the SAME tail items can hit windows
    # in consecutive passes.  So: THREE full passes, alternating order
    # (an item at the tail of one pass runs at the head of the next), and
    # per-item MEDIAN — robust when at most one pass hits a window, and
    # unlike min it doesn't reward a lucky cache-warm outlier, making
    # round-over-round regression signal real (round-2 verdict item 5).
    def measure(name: str) -> float:
        if name == "s1_replay_10m":
            return _bench_replay(spark)
        if name == "s1_replay_10m_x4":
            return _bench_replay_10m_x4(spark)
        if name in _S2_STRATEGIES:
            return _bench_transport(spark, name)
        t0 = time.perf_counter()
        queries[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    # Machine-noise sentinel (round-4 verdict item 5, upgraded to a
    # SELF-QUALIFYING window r10 verdict #3): the same fixed pure-serve
    # workload (s2_serve_1m_identity — CPU + localhost socket, no Spark
    # jobs, no disk) probed between EVERY measured item, so each sample
    # carries its own bracket.  Spread between probes IS the co-tenant
    # noise floor; a sample whose brackets exceed BAND × the run's best
    # probe was measured in a contended phase and is excluded from the
    # committed statistic (see WindowQualifier).
    qual = WindowQualifier(
        lambda: _bench_transport(spark, "s2_serve_1m_identity")
    )
    # in-leg bandwidth sentinel (r12 verdict Wrong #2): the loopback
    # sentinel brackets each leg but cannot see a memory-bandwidth
    # co-tenant phase that opens and closes INSIDE one — these probes
    # run at ~1 Hz during every measured leg and flag it directly
    bw = bw_sentinel()

    gather_meds: dict[str, list] = {}

    # keys needing a per-leg re-warm (r15 — rationale at the warm-pass
    # note below): count = untimed executions immediately before every
    # recorded sample
    _pre_warm = {"events_session_window": 2}

    def measure_inleg(name: str):
        import statistics

        # per-leg re-warm (r15, see the _pre_warm note below): applied
        # HERE so every recorded sample — pass legs, contended re-runs,
        # floor_watch extras — is steady-state, not just the pass loop's
        for _ in range(_pre_warm.get(name, 0)):
            measure(name)
        with bw.window() as w:
            v = measure(name)
        # latency diagnostics (r13): per-leg gather medians accumulate
        # per key so a cross-round adjudication of any odd BENCH number
        # can check the latency-phase signature without re-running
        g = w.gathers()
        gather_meds.setdefault(name, []).append(
            round(statistics.median(g), 2) if g else None
        )
        return v, (w.bws, g)

    items = ["s1_replay_10m", "s1_replay_10m_x4", *_S2_STRATEGIES, *names]
    # WARM PASS (r14): run every item once, untimed, before the three
    # recorded passes.  The r14 certification data showed pass-1
    # samples structurally slower on the heavier keys (per-session
    # codegen + parquet page cache — e.g. dedup_minhash_lsh spread
    # [1.22, 3.97] on an otherwise idle box, and re-running with a
    # warm page cache did not close it, so it is codegen, not IO).
    # Those cold samples never win the min (the committed statistic)
    # but they pollute the spread/drift series and block spread-based
    # certification.  The bench's declared object is STEADY-STATE
    # timings — the reference's own protocol pre-materializes before
    # timing (get_simple server.py:144) — so the warm pass aligns the
    # measurement with the declaration at ~25% extra wall.
    # r15 (verdict #3, the last uncertified headline floor): measured
    # decay series for events_session_window at sf0.1 on a quiet box —
    # 1.51, 0.71, 0.60, 0.58, 0.56, 0.60, 0.54, 0.54, 0.52, 0.52 — with
    # BYTE-IDENTICAL executed AQE plans (ids normalized) on the slow and
    # fast runs, so the r14 quiet-run spread ([0.46, 0.79] / [0.53, 1.15])
    # was the JVM C2 compiler promoting the key's large generated-code
    # span across its first ~6 executions, not plan variance or box
    # state.  A deeper one-time warm is NOT enough in the full bench:
    # with 43 other keys' generated classes compiled between passes, the
    # key's code is evicted from the bounded codegen/JIT caches and every
    # pass restarts the decay slope (an r15 certify run with a 6-deep
    # initial warm still spread [0.47, 1.14]).  The fix that matches the
    # steady-state declaration is PER-LEG: re-warm the key immediately
    # before each recorded sample (2 untimed executions, ~1.2 s/pass —
    # applied inside measure_inleg so contended re-runs and floor_watch
    # extras are covered too).
    for name in items:
        measure(name)
    passes: list[dict[str, float]] = []
    brackets: list[dict[str, tuple[int, int]]] = []
    inlegs: list[dict[str, list[float]]] = []
    for i in range(3):
        order = items if i % 2 == 0 else list(reversed(items))
        p: dict[str, float] = {}
        br: dict[str, tuple[int, int]] = {}
        il: dict[str, list[float]] = {}
        last = qual.probe()
        for name in order:
            p[name], il[name] = measure_inleg(name)
            nxt = qual.probe()
            br[name] = (last, nxt)
            last = nxt
        passes.append(p)
        brackets.append(br)
        inlegs.append(il)

    def leg_ok(p: int, k: str) -> bool:
        """Bracket-clean AND in-leg-clean (None = leg too short for an
        in-leg verdict — the brackets govern, as before)."""
        return qual.clean(*brackets[p][k]) and (
            bw.leg_clean_full(*inlegs[p][k]) is not False
        )

    timings: dict[str, float] = {}
    quality: dict[str, str] = {}
    drift_watch: dict[str, float] = {}
    for k in items:
        clean = [
            passes[p][k] for p in range(len(passes)) if leg_ok(p, k)
        ]
        if clean:
            timings[k] = commit_stat(clean)
            drift_watch[k] = drift_stat(clean)
            quality[k] = "clean"
            continue
        # every pass's sample was bracketed by a contended window (or
        # in-leg flagged): re-run between fresh probes instead of
        # committing any of them
        rerun_vals: list[float] = []
        tag = "contended"
        for _ in range(2):
            b = qual.probe()
            v, il = measure_inleg(k)
            a = qual.probe()
            rerun_vals.append(v)
            if qual.clean(b, a) and bw.leg_clean_full(*il) is not False:
                timings[k] = round(v, 3)
                drift_watch[k] = round(v, 3)
                tag = "rerun_clean"
                break
        if tag != "rerun_clean":
            all_vals = [p[k] for p in passes] + rerun_vals
            timings[k] = commit_stat(all_vals)
            drift_watch[k] = drift_stat(all_vals)
        quality[k] = tag
    # reference-scale S1 (single run, after the passes so its 3 GiB of
    # I/O doesn't perturb the small-query timings).  r8 verdict #2: the
    # serve family drifted beyond what the sentinel model explains — pin
    # sentinel samples IMMEDIATELY adjacent to each reference-scale run
    # so a noise-window hit shows in the bracketing sentinel values; the
    # per-attempt lists land in floor_watch below.
    qual.probe()
    loopback_gibs = [_loopback_gibs()]
    # the replay's committed number must hold >= 70% of the same-run
    # raw-socket ceiling (the declared 70-97% band, BENCH_DETAIL notes):
    # payload/sec vs loopback — computed with the framing-free payload
    # size, so the ratio is slightly understated (conservative)
    payload_gib_100m = 100_000_000 * 4 * 8 / 1024**3

    def replay_in_band(best_sec: float) -> bool:
        return payload_gib_100m / best_sec >= 0.70 * loopback_gibs[0]

    r100 = _bench_replay_100m(spark, qual=qual, qualify=replay_in_band)
    loopback_gibs.append(_loopback_gibs())
    qual.probe()
    timings["s1_replay_100m"] = r100["s1_replay_100m"]
    timings["s1_replay_100m_x4"] = r100["s1_replay_100m_x4"]
    quality["s1_replay_100m"] = r100["s1_replay_100m_quality"]
    # r16 (r15 verdict Wrong #3): x4 wears ITS OWN quality tag, earned
    # against its own 4-stream paired ceiling — no longer the
    # single-stream tag by proxy
    quality["s1_replay_100m_x4"] = r100["s1_replay_100m_x4_quality"]
    timings["s2_serve_42m_zstd"] = _bench_serve_42m(spark, qual=qual)
    quality["s2_serve_42m_zstd"] = (
        _SERVE_42M_QUALITY[-1] if _SERVE_42M_QUALITY else "clean"
    )
    qual.probe()
    # per-query [min, max] across the 3 passes — separates a real
    # regression (tight spread, higher level) from a noise-window hit
    # (one wild pass); for the 100M replay the two recorded attempts are
    # the spread (attempt 1 colder page cache than attempt 2, ADVICE r5)
    spread = {
        k: [
            round(min(p[k] for p in passes), 3),
            round(max(p[k] for p in passes), 3),
        ]
        for k in items
    }
    attempts = r100["s1_replay_100m_attempts"]
    spread["s1_replay_100m"] = [min(attempts), max(attempts)]
    x4_attempts = r100["s1_replay_100m_x4_attempts"]
    spread["s1_replay_100m_x4"] = [min(x4_attempts), max(x4_attempts)]

    # r6 verdict #4: agg_count_distinct / window_running_sum per-pass
    # FLOORS rose 1.3-1.7× while the sentinel improved — re-measure with
    # extra passes pinned adjacent to sentinel samples, so a window hit
    # is visible in the bracketing sentinel numbers.  Median over all 5
    # samples becomes the committed figure; every sample is recorded.
    floor_watch: dict[str, list[float]] = {}
    # r8 verdict #2: the r8 TPC-H watch closed (floors recovered to r6
    # levels); r9 watches the serve family — the two IPC-codec keys whose
    # r8 brackets did not overlap r7's (now cache-served; the watch
    # verifies the new floor) — plus the CPU-bound keys that drifted
    # 1.4-1.7× against a 1.15× sentinel (asof_join, events_session_window,
    # s1_replay_10m, topk_per_group, dedup_exact).
    for name in (
        "s2_serve_1m_ipc_zstd",
        "s2_serve_1m_ipc_lz4",
        "asof_join",
        "events_session_window",
        "s1_replay_10m",
        "topk_per_group",
        "dedup_exact",
    ):
        if name not in items:
            continue
        extra: list[tuple[float, bool]] = []
        for _ in range(2):
            b = qual.probe()
            v, il = measure_inleg(name)
            a = qual.probe()
            extra.append(
                (v, qual.clean(b, a) and bw.leg_clean_full(*il) is not False)
            )
        samples = [p[name] for p in passes] + [v for v, _ in extra]
        floor_watch[name] = [round(s, 3) for s in samples]
        clean_samples = [
            passes[p][name] for p in range(len(passes)) if leg_ok(p, name)
        ] + [v for v, ok in extra if ok]
        if quality.get(name) == "rerun_clean":
            # the commit loop already replaced this key's contended
            # pass samples with a freshly-bracketed clean re-run; that
            # value is a clean sample too.  Without it, two contended
            # watch samples would fall through to the else branch and
            # overwrite the clean number with a contended median
            # (r11 ADVICE)
            clean_samples.append(timings[name])
            samples.append(timings[name])
            floor_watch[name] = [round(s, 3) for s in samples]
        if clean_samples:
            timings[name] = commit_stat(clean_samples)
            drift_watch[name] = drift_stat(clean_samples)
            # the extra bracketed samples refine, not degrade, the tag
            if quality.get(name) != "rerun_clean":
                quality[name] = "clean"
        else:
            timings[name] = commit_stat(samples)
            drift_watch[name] = drift_stat(samples)
            quality[name] = "contended"
        spread[name] = [
            round(min(samples), 3), round(max(samples), 3)
        ]
    # the reference-scale pair can't re-run cheaply (each invocation
    # regenerates a multi-GiB spill) — their recorded attempts, taken
    # between pinned sentinels above, are the watch samples
    floor_watch["s1_replay_100m"] = list(attempts)
    floor_watch["s2_serve_42m_zstd"] = list(_SERVE_42M_ATTEMPTS)

    # r11 verdict #6: rotating TAIL — TAIL_COUNT registered queries
    # outside the headline get one window-qualified wall-clock sample
    # per round, least-recently-benched first (_tail_rotation), so
    # every registered query accrues a time series across rounds
    # without growing the headline budget.  One bracketed sample per
    # key, one in-invocation retry if contended, tags like the
    # headline's.  Kept OUT of `queries`/total so round-over-round
    # total_sec comparisons are unaffected.
    tail: dict[str, float] = {}
    tail_quality: dict[str, str] = {}
    for name in _tail_rotation(queries):
        measure(name)  # warm (codegen/footers) — same r14 warm-pass rule
        b = qual.probe()
        v, il = measure_inleg(name)
        a = qual.probe()
        if qual.clean(b, a) and bw.leg_clean_full(*il) is not False:
            tail[name] = round(v, 3)
            tail_quality[name] = "clean"
            continue
        b2 = qual.probe()
        v2, il2 = measure_inleg(name)
        a2 = qual.probe()
        if qual.clean(b2, a2) and bw.leg_clean_full(*il2) is not False:
            tail[name] = round(v2, 3)
            tail_quality[name] = "rerun_clean"
        else:
            tail[name] = round(min(v, v2), 3)
            tail_quality[name] = "contended"

    # The x4 entry is a different metric (4-client aggregate wall), not a
    # fifth headline query — keep it OUT of the total so the
    # round-over-round total_sec comparison isn't conflated (ADVICE r6).
    # NOTE for cross-round comparison: the r6 total INCLUDED
    # s1_replay_100m_x4; drop that key from r6's sum before comparing.
    total_excludes = {"s1_replay_100m_x4"}
    total = round(
        sum(v for k, v in timings.items() if k not in total_excludes), 3
    )
    sentinel_samples = qual.samples
    med = sorted(sentinel_samples)[len(sentinel_samples) // 2]
    # r7 verdict #1: the driver's stdout capture window truncated the r6/r7
    # bench lines (spread + floor_watch + sentinel pushed the one-liner past
    # the window, losing the headline value and early query medians).  The
    # stdout line stays COMPACT — {metric, value, unit, queries, sf} only —
    # and everything diagnostic goes to BENCH_DETAIL.json next to bench.py.
    _certified, _best = drift_anchors()
    _cert_cpus, _best_cpus = anchor_cpus()
    try:
        _run_cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or 32)
    except ValueError:
        _run_cpus = 32
    # ADVICE r15: the merge below would silently let a tail ratio shadow
    # a headline ratio if a key ever appeared in both sections — they are
    # disjoint by construction (tail = registry minus headline), so pin it
    _overlap = set(timings) & set(tail)
    assert not _overlap, f"headline/tail key overlap: {sorted(_overlap)}"
    _vs_kw = dict(
        run_cpus=_run_cpus,
        certified_cpus=_cert_cpus,
        best_cpus=_best_cpus,
    )
    _vs_floor_all = {
        **vs_floor(timings, _certified, _best, **_vs_kw),
        **vs_floor(tail, _certified, _best, **_vs_kw),
    }
    detail = {
        "spread": spread,
        "total_excludes": sorted(total_excludes),
        # r14 verdict #5: the formal drift anchor — committed value vs the
        # CERTIFIED floor (BENCH_QUIET.json, quiet-window provenance),
        # falling back to best-ever committed only for never-certified
        # keys, for headline AND tail keys, so the 2x adjudication reads
        # one field instead of reconstructing the anchor per round
        "vs_certified_floor": _vs_floor_all,
        # keys whose committed value breached the 2x drift gate vs their
        # anchor this run — the adjudication's one-glance field (only
        # same-cpus anchors gate; cross-cpus ratios stay visible in
        # vs_certified_floor with cpus_match=false — see drift_breaches)
        "drift_breaches": drift_breaches(_vs_floor_all),
        "drift_gate_cpus": _run_cpus,
        # r14 (verdict #1): the committed statistic moved to MIN over
        # clean samples (see commit_stat); this series keeps r11-r13's
        # lower-middle per key, so cross-round drift comparisons against
        # r11-r13 committed numbers stay apples-to-apples
        "drift_watch": drift_watch,
        # comparability notes vs earlier rounds' keys
        "notes": [
            "r14: a WARM PASS (every item once, untimed) precedes the"
            " three recorded passes, so all recorded samples are"
            " steady-state — pass-1 codegen/page-cache cost no longer"
            " widens the spread/drift series (it never affected the"
            " committed min)",
            "r14: committed statistic is the MIN of the CLEAN samples"
            " (commit_stat) — the box-noise protocol's load-bearing"
            " statistic (mild 1.5-1.9x phase inflation is invisible to"
            " every probe tried, so any higher order statistic embeds"
            " it); r11-r13 committed the lower-middle, which continues"
            " as BENCH_DETAIL drift_watch — compare r14+ values to"
            " earlier rounds via that series, not the headline",
            "r11 (superseded r14): committed statistic was the lower-middle"
            " of the CLEAN samples (window-qualified per key; see 'window'),"
            " replacing the unconditional median-of-3 — in a fully-quiet"
            " run the two coincide for 3 clean samples and differ by at"
            " most the min-vs-median gap when one pass was excluded",
            "q1/q5 decomposition (r10 verdict #8, measured r11 at sf0.1):"
            " q1 is AGGREGATION-bound, not scan-bound — the filtered 6-col"
            " lineitem scan alone is 0.24 s of the 1.05 s total; the cost"
            " is the DECIMAL(18,2) sums + the revenue multiply.  An exact"
            " integer-cents variant measured 0.597 s with hash-identical"
            " output at this SF and was REJECTED: revenue sums in 1e-4-"
            " dollar units exceed int64 (and double's 2^53 exactness) at"
            " 100 TB scale factors, so the decimal formulation is the"
            " deliberate scale-safe choice and q1's level is its price."
            " q5: AQE's final plan runs all five joins as"
            " BroadcastHashJoin at this SF (every non-lineitem side fits"
            " the threshold); join-side scans alone are 0.52 s of the"
            " 1.12 s total — the declared shuffle-join plan only"
            " materializes at scale factors where broadcasting would be"
            " wrong anyway.  Neither query has a same-semantics,"
            " same-scale-posture improvement left at sf0.1; both drift"
            " with page-cache/box state.",
            "agg_hll_sketch_exchange now emits (exact_users, within_bound)"
            " — the rollup reads the manifest's exact anchor so the sketch"
            " family is DuckDB-oracle-checkable; ~+0.15-0.25 s vs the r8"
            " estimate-only form, a deliberate trade",
            "s2_serve_42m_zstd: attempt 1 encodes + fills the disk"
            " artifact cache, attempt 2 replays it (client-decode-bound);"
            " committed min measures the replay steady state",
            "s2_serve_1m_ipc_zstd / ipc_lz4 serve the encode-once"
            " IPC-codec body cache (r8 verdict #2)",
            "s1_replay_100m tracks loopback_gibs (r8 verdict #2 watch):"
            " the committed r9 final attempts were 0.914-0.965 s"
            " = ~3.1-3.3 GiB/s effective against a raw ceiling measured"
            " 3.6-3.87 GiB/s on the same code — the splice serve holds"
            " ~70-97% of raw sendall (the gap is HTTP chunk framing +"
            " client Arrow decode), so absolute floors track box state;"
            " the RATIO vs loopback_gibs is the regression signal",
            "s2_serve_42m_zstd COLD leg decomposition (r9 verdict #6,"
            " measured r10 in one window): reader-chain drain alone"
            " (spill read + per-batch append-only dict encode,"
            " prefetch-overlapped) 2.89-3.0 s; chain + parallel-zstd"
            " encode 5.01 s at the default 4 workers and 5.32 s at 8 —"
            " the fill already routes through _encode_parallel_frames"
            " and is chain-bound, not compression-bound; full HTTP"
            " attempt-1 (encode+tee+serve) 5.03 s == encode alone;"
            " attempt-2 artifact replay 1.65 s.  The ~3 s floor is the"
            " 6,836-batch dict-encode loop at the reference's 6144-row"
            " serve shape; both attempts stay in floor_watch",
        ],
        "floor_watch": floor_watch,
        # r10 verdict #3: per-key window quality.  "clean" = committed
        # from samples whose bracketing sentinel probes sat within
        # BAND × the run's best probe; "rerun_clean" = the pass samples
        # were all contended and a freshly-bracketed re-run replaced
        # them; "contended" = retries exhausted inside a contended
        # phase — the number is the best available and FLAGGED, so a
        # cross-round comparison knows to discount it; "below_band"
        # (replay only, r11 ADVICE) = throughput under 70% of the
        # same-run loopback ceiling WITH clean sentinel brackets — a
        # real regression, flagged so it is NOT discounted as noise.
        "window": {
            "band": WindowQualifier.BAND,
            "slack_sec": WindowQualifier.SLACK_SEC,
            "probe_floor_p10": round(qual.floor, 4),
            "limit": round(qual.limit, 4),
            "replay_band_vs_loopback": 0.70,
            "replay_ratio": round(
                payload_gib_100m
                / timings["s1_replay_100m"]
                / max(loopback_gibs[0], 1e-9),
                3,
            ),
            "quality": quality,
            "flagged": sorted(
                k
                for k, q in quality.items()
                if q in ("contended", "below_band")
            ),
            # r12 verdict Wrong #2: the in-leg bandwidth sentinel — a
            # leg is clean only if its brackets are quiet AND its
            # in-leg DRAM-copy bandwidth median stays in band, so a
            # co-tenant window inside one leg can no longer commit a
            # clean-tagged outlier
            "inleg": {
                "buf_mb": BandwidthSentinel.BUF_MB,
                "rel_band": BandwidthSentinel.REL_BAND,
                "gather_band": BandwidthSentinel.GATHER_BAND,
                "interval_sec": BandwidthSentinel.INTERVAL_SEC,
                "min_samples": BandwidthSentinel.MIN_SAMPLES,
                "reference_gbs": round(bw.reference, 1),
                "gather_reference_gbs": round(bw.gather_reference, 2),
                "n_probes": len(bw.samples),
                # per-key per-leg gather medians (recorded-only latency
                # series; None = leg too short for a probe)
                "gather_med_by_key": gather_meds,
                "bracket_clean_but_inleg_flagged": sorted(
                    {
                        k
                        for p in range(len(passes))
                        for k in items
                        if qual.clean(*brackets[p][k])
                        and bw.leg_clean_full(*inlegs[p][k]) is False
                    }
                ),
            },
        },
        # r11 verdict #6: the rotating tail's per-key window tags; the
        # rotation ledger is the committed BENCH_r*.json tail_queries
        # sections (see _tail_rotation) — never-benched first, then
        # least-recently-benched, lexicographic tie-break
        "tail_quality": tail_quality,
        "sentinel": {
            "name": "s2_serve_1m_identity",
            "samples": [round(s, 3) for s in sentinel_samples],
            "median": round(med, 3),
        },
        # raw socket bandwidth bracketing the 100M replay: the serve
        # family's physical ceiling (see _loopback_gibs) — divide the
        # replay's ~3.1 GiB by its wall and compare
        "loopback_gibs": loopback_gibs,
        "s1_replay_100m_attempts": attempts,
        # x4's own evidence (r16, verdict Wrong #3): every attempt and
        # every paired 4-stream ceiling probe, so a certification or an
        # adjudication can read the aggregate-GiB/s-vs-ceiling ratio
        # per attempt without re-running
        "s1_replay_100m_x4_attempts": x4_attempts,
        "s1_replay_100m_x4_ceilings_gibs": r100["s1_replay_100m_x4_ceilings"],
        "s2_serve_42m_attempts": list(_SERVE_42M_ATTEMPTS),
        "sf": sf,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", ""),
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                # rotating non-headline segment (r11 verdict #6) —
                # separate from `queries` so total comparisons hold
                "tail_queries": tail,
                "sf": sf,
            }
        )
    )
    spark.stop()
    rc = drift_gate_rc(detail["drift_breaches"])
    if rc:
        print(
            "DRIFT BREACH: committed value >2x certified floor for "
            f"{detail['drift_breaches']} (anchors in BENCH_DETAIL.json "
            "vs_certified_floor; adjudicate per BASELINE.md protocol)",
            file=sys.stderr,
        )
    sys.exit(rc)


if __name__ == "__main__":
    main()
