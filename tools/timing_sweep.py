#!/usr/bin/env python
"""Per-query Spark-vs-DuckDB timing sweep over the FULL registry.

The bench headline set is curated; this sweep times every registered
query (noop sink, cache cleared between queries) and its DuckDB oracle at
the given sf_dir, sorted slowest-Spark-first.  It exists because
headline-only timing misses pathologies in the long tail — it found the
countDistinct+percentile_approx Expand blowup (41 s -> 2 s fix in
``agg_approx``).  Run once per round:

    python tools/timing_sweep.py /root/testdata/sf0.1

Queries slower than --flag seconds (default 3.0) are listed in a FLAGGED
section; known-inherent entries (iterative clustering, Python-exchange
stateful ops) are annotated, not silenced.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

# Spark times above the flag threshold that are inherent to the operator's
# semantics, with the reason — reviewed each round, never auto-extended.
KNOWN_SLOW = {
    "stateful_user_stats": "applyInPandasWithState: Python exchange + "
    "per-group state calls are the operator's point",
    "dedup_clusters": "iterative min-label propagation (beats the "
    "recursive-CTE oracle ~6x)",
    "dedup_clusters_twophase": "iterative large-star/small-star (beats "
    "the oracle ~4x)",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    flag = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0

    from arrow_experiments_spark.oracle import duck_connection
    from arrow_experiments_spark.registry import all_queries
    from arrow_experiments_spark.session import build_session

    spark = build_session(app_name="timing_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)

    queries = all_queries()
    # Warm the JVM / parquet footers once (mirrors bench.py) so the first
    # query timed doesn't absorb session startup.
    queries["q1_pricing_summary"].build(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    rows = []
    for name, q in queries.items():
        spark.catalog.clearCache()
        t0 = time.monotonic()
        try:
            q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            s = time.monotonic() - t0
        except Exception as e:  # noqa: BLE001 — sweep must finish
            rows.append((name, float("inf"), None, f"SPARK ERROR {e}"))
            continue
        d = None
        if q.oracle:
            t0 = time.monotonic()
            try:
                con.execute(q.oracle_sql(spark, sf_dir)).fetchall()
                d = time.monotonic() - t0
            except Exception as e:  # noqa: BLE001
                rows.append((name, s, None, f"ORACLE ERROR {e}"))
                continue
        rows.append((name, s, d, ""))

    rows.sort(key=lambda r: -r[1])
    for name, s, d, err in rows:
        dtxt = f"{d:7.2f}s" if d is not None else "   --  "
        print(f"{name:35s} spark {s:7.2f}s duck {dtxt} {err}")

    flagged = [
        (name, s, err)
        for name, s, d, err in rows
        if (s > flag or err) and name not in KNOWN_SLOW
    ]
    print(f"\nFLAGGED (> {flag:.1f}s and not known-inherent): {len(flagged)}")
    for name, s, err in flagged:
        print(f"  {name} {s:.2f}s {err}")
    for name in KNOWN_SLOW:
        hit = next((r for r in rows if r[0] == name), None)
        if hit and hit[1] > flag:
            print(f"  known-inherent: {name} {hit[1]:.2f}s — {KNOWN_SLOW[name]}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
