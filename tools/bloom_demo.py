#!/usr/bin/env python
"""Runtime Bloom-filter join pruning demo — the remaining Catalyst
runtime-filtering capability after dynamic partition pruning (tested in
tests/test_scale.py) and stats-fed CBO reordering (tools/cbo_demo.py).

Protocol: plan a selective dimension-filtered fact join twice — once with
``spark.sql.optimizer.runtime.bloomFilter.enabled=false``, once with it
on (application-side scan threshold zeroed so the bench-scale fact table
qualifies; at 100 TB the default 10 GB threshold passes on its own) —
and record the injected ``might_contain(...)`` probe-side filter in
PLANS.md.

Why it matters at 100 TB: a shuffle join whose build side is filtered to
a sliver still shuffles the ENTIRE probe side without runtime filtering.
The bloom filter built from the dimension's surviving join keys is
pushed into the fact scan as a semi-join reduction — probe rows that
cannot match are dropped before the exchange, shrinking the big
shuffle by the dimension filter's selectivity.

Usage: python tools/bloom_demo.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from arrow_experiments_spark.session import build_session
from arrow_experiments_spark.tables import table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="bloom_demo")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        # force the shuffle-join shape the filter exists for (at real
        # scale neither side broadcasts)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )

        def plan() -> str:
            li = table(spark, sf_dir, "lineitem")
            orders = table(spark, sf_dir, "orders").filter(
                "o_orderpriority = '1-URGENT'"
            )
            j = (
                li.join(orders, li.l_orderkey == orders.o_orderkey)
                .groupBy("o_orderpriority")
                .agg({"l_extendedprice": "sum"})
            )
            return j._jdf.queryExecution().executedPlan().toString()

        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        before = plan()
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        after = plan()

        assert "might_contain" not in before
        injected = "might_contain" in after
        probe_line = next(
            (l.strip() for l in after.splitlines() if "might_contain" in l), ""
        )

        section = f"""
## Runtime Bloom-filter join pruning — before/after

Demonstration (`tools/bloom_demo.py`, {sf_dir}): lineitem ⋈ orders with
a selective dimension filter (`o_orderpriority = '1-URGENT'`, 1-of-5
rows), broadcast disabled to force the shuffle-join shape of a
fact-fact join at scale.

Without runtime filtering the probe side scans and shuffles every
lineitem row.  With `spark.sql.optimizer.runtime.bloomFilter.enabled`
(and the application-side scan threshold zeroed — at 100 TB the default
10 GB threshold passes on its own), Catalyst builds a Bloom filter from
the filtered dimension's join keys and injects it into the fact side as
a semi-join reduction.  Injected: **{injected}** — the probe-side scan
now carries:

```
{probe_line}
```

Probe rows that cannot match are dropped BEFORE the exchange, so the
big shuffle shrinks by the dimension filter's selectivity.  Together
with dynamic partition pruning (partition-routed tables,
tests/test_scale.py) and stats-fed join reordering (CBO section above),
this completes the engine's use of Catalyst's runtime/stats-driven
pruning surface.
"""
        plans = Path(_REPO, "PLANS.md")
        text = plans.read_text()
        marker = "\n## Runtime Bloom-filter join pruning — before/after\n"
        if marker in text:
            text = text[: text.index(marker)]
        plans.write_text(text + section)
        print("PLANS.md updated; bloom filter injected:", injected)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
