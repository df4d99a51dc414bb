#!/usr/bin/env python
"""Decade sweep for the TPC-H / stateful tail (r15 verdict #6): the bulk
pass surfaced ``q21_last_shipper_waiting``, ``q16_supplier_part_counts``
and ``stateful_user_stats`` as the most expensive non-demonstrator keys,
and they are the one operator family never scale-swept.  One 10x
synthetic run confirms their join/window/state plans hold a ~linear
decade exponent the way the dedup family's do (SCALE.md round-7 table).

Scaling recipe (the 100 TB growth pattern, not naive duplication):

- ``lineitem`` / ``orders`` x10: ten copies with the ORDER KEY shifted
  by a decade-aligned offset per copy — order multiplicity, per-order
  line structure, and join selectivity are preserved while the fact
  row count grows 10x.  Part/supplier/nation (the dims) stay fixed:
  warehouse catalogs grow sublinearly against facts, and this keeps
  q16's distinct-pair semantics meaningful (more lineitems over the
  same catalog).
- ``events`` x10: ten copies with USER_ID shifted per copy — state
  cardinality (distinct users) and event volume both grow 10x, the
  worst case for the stateful operator's store; written as 10x the
  base file count so the availableNow stream sees proportionally more
  micro-batches (per-batch cost constancy is exactly the claim under
  test).

Decade exponent = log10(t_10x / t_1x); 1.0 is linear.  Protocol matches
tools/decade_sweep.py: warm pass + min of 2 recorded runs, shuffle
partitions scaled with the factor.  Appends a section to SCALE.md and
prints one JSON line.

Usage: python tools/tpch_decade_sweep.py [base_sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from arrow_experiments_spark.registry import all_queries
from arrow_experiments_spark.session import build_session
from arrow_experiments_spark.tables import table

FACTOR = 10
QUERIES = [
    "q16_supplier_part_counts",
    "q21_last_shipper_waiting",
    "stateful_user_stats",
]
LINKED = ["region", "nation", "customer", "supplier", "part"]


def _offset_for(df, col: str) -> int:
    """Decade-aligned shift that keeps copies' key spaces disjoint."""
    hi = df.agg(F.max(col)).collect()[0][0] or 0
    return 10 ** (len(str(int(hi))) + 1)


def _scale_keyshift(df, key: str, factor: int, out: str, n_files: int) -> None:
    off = _offset_for(df, key)
    copies = [
        df.withColumn(key, (F.col(key) + F.lit(i * off)).cast("long"))
        for i in range(factor)
    ]
    scaled = copies[0]
    for c in copies[1:]:
        scaled = scaled.unionByName(c)
    scaled.repartition(n_files).write.mode("overwrite").parquet(out)


def build_tpch_x10(spark, base: str, dest: str) -> None:
    Path(dest).mkdir(parents=True, exist_ok=True)
    for name in LINKED:
        link = Path(dest, f"{name}.parquet")
        if not link.exists():
            link.symlink_to(Path(base, f"{name}.parquet"))
    n_li = max(
        1, len(list(Path(base, "lineitem.parquet").glob("*.parquet")))
    )
    _scale_keyshift(
        table(spark, base, "lineitem"), "l_orderkey", FACTOR,
        f"{dest}/lineitem.parquet", FACTOR * n_li,
    )
    _scale_keyshift(
        table(spark, base, "orders"), "o_orderkey", FACTOR,
        f"{dest}/orders.parquet", FACTOR,
    )
    n_ev = max(1, len(list(Path(base, "events.parquet").glob("*.parquet"))))
    _scale_keyshift(
        table(spark, base, "events"), "user_id", FACTOR,
        f"{dest}/events.parquet", FACTOR * n_ev,
    )


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = "/tmp/tpch_decade/x10"
    spark = build_session(app_name="tpch_decade_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    if os.path.exists(f"{work}/lineitem.parquet"):
        print(f"reusing x10 tables at {work}", flush=True)
    else:
        build_tpch_x10(spark, base, work)
        print(f"built x10 tables at {work}", flush=True)

    def measure(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        registry[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    base_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    results: dict[str, dict[int, list[float]]] = {}
    for name in QUERIES:
        results[name] = {}
        for k, sf_dir in ((1, base), (FACTOR, work)):
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(min(base_parts * k, 1024)),
            )
            measure(name, sf_dir)  # warm (codegen, footers, state store)
            runs = [measure(name, sf_dir) for _ in range(2)]
            results[name][k] = [round(r, 2) for r in runs]
            print(f"x{k} {name} {results[name][k]}", flush=True)

    # Trigger-knob leg (r16): the default stateful row scales BOTH the
    # volume and the trigger count (x10 = 10 part files = 10 micro-
    # batches, each touching the full 10x state), so its exponent folds
    # per-trigger fixed cost (state store load/commit per partition)
    # into the decade.  Batch size is an operational knob, not a data
    # property — this leg re-runs the x10 corpus with all files in ONE
    # trigger (max_files_per_trigger=FACTOR·n_files), isolating pure
    # volume scaling against the 1x single-batch baseline.
    from arrow_experiments_spark.streaming.stateful import run_user_stats

    knob = "stateful_user_stats@one_trigger"
    results[knob] = {1: results["stateful_user_stats"][1]}

    def measure_one_trigger() -> float:
        t0 = time.perf_counter()
        run_user_stats(
            spark, work, query_name="tds_one_trigger",
            max_files_per_trigger=1024,
        ).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    measure_one_trigger()  # warm
    results[knob][FACTOR] = [round(measure_one_trigger(), 2) for _ in range(2)]
    print(f"x{FACTOR} {knob} {results[knob][FACTOR]}", flush=True)
    spark.conf.set("spark.sql.shuffle.partitions", str(base_parts))

    rows = []
    out: dict[str, float] = {}
    for name in [*QUERIES, knob]:
        t1 = min(results[name][1])
        t10 = min(results[name][FACTOR])
        exp = math.log(t10 / t1) / math.log(10)
        out[name] = round(exp, 2)
        rows.append(
            f"| {name} | {t1:.2f} | {t10:.2f} | {exp:.2f} | "
            f"{results[name][1]} / {results[name][FACTOR]} |"
        )

    section = (
        "\n## TPC-H / stateful tail at 10x: decade exponents "
        "(round 16)\n"
        "\n"
        "The one operator family never scale-swept (r15 verdict #6).\n"
        "Key-shifted synthetic x10 (order keys / user ids shifted per\n"
        "copy; dims fixed — catalogs grow sublinearly against facts), so\n"
        "join selectivity, per-order structure, and state cardinality\n"
        "scale the way a warehouse's do.  `exp` = log10(t10/t1); 1.0 is\n"
        "linear in the decade.  Warm pass + min of 2; shuffle partitions\n"
        "x10 for the scaled legs.\n"
        "\n"
        "| query | 1x (s) | 10x (s) | decade exp | runs |\n"
        "|---|---|---|---|---|\n" + "\n".join(rows) + "\n"
    )
    with open(Path(_REPO, "SCALE.md"), "a") as f:
        f.write(section)
    print(json.dumps({"metric": "tpch_decade_sweep", "exponents": out}))
    spark.stop()


if __name__ == "__main__":
    main()
