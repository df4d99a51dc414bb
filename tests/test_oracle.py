"""Every registered query vs the DuckDB oracle at sf0.01 — the same gate
the driver runs (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from arrow_experiments_spark.oracle import compare, duck_connection
from arrow_experiments_spark.registry import all_queries

from conftest import SF_DIR_T2

_QUERIES = all_queries()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR_T2)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, duck, name):
    q = _QUERIES[name]
    df = q.build(spark, SF_DIR_T2)
    if q.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        rows = df.count()
        assert rows >= 0
        assert len(df.columns) > 0
        return
    res = compare(name, df, duck, q.oracle_sql(spark, SF_DIR_T2))
    assert res.ok, f"{name}: {res.detail}"
    assert res.spark_rows > 0, f"{name}: empty result — weak test"
