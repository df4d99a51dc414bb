#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to individual files —
the r16 optimization round's before/after plan evidence
(plans/r16/<query>_<tag>.txt).

Usage: python tools/dump_plans.py <tag> <query> [query ...]
       python tools/dump_plans.py <tag> --all-headline

Expression IDs (#123) are normalized away so a before/after diff shows
structural changes only, same normalization as tools/explain_audit.
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from arrow_experiments_spark.registry import all_queries
from arrow_experiments_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# round-parameterized output dir (r17): PLANS_ROUND=r17 python tools/...
OUT_DIR = Path(_REPO) / "plans" / os.environ.get("PLANS_ROUND", "r17")


def _normalize(plan: str) -> str:
    plan = re.sub(r"#\d+L?", "#x", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=x", plan)
    plan = re.sub(r"\[id=#?\d+\]", "[id=x]", plan)
    return plan


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    tag = sys.argv[1]
    queries = all_queries()
    if sys.argv[2] == "--all-headline":
        import bench

        names = [n for n in bench.HEADLINE if n in queries]
    else:
        names = sys.argv[2:]
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    spark = build_session(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = queries[name].build(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = OUT_DIR / f"{name}_{tag}.txt"
        out.write_text(_normalize(plan))
        print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
