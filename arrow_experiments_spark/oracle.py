"""DuckDB oracle harness — mirrors the driver's t2 correctness gate
(SURVEY.md §5 item 3): run the Spark query and the oracle SQL over the same
parquet tables, compare row count, column names, and order-insensitive
canonicalized values (floats bit-exact, which the operator modules
guarantee by construction).
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass
from datetime import date, datetime

import duckdb
import numpy as np
import pandas as pd

from arrow_experiments_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_value(v):
    if v is None or v is pd.NaT:
        return ("null",)
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("nan",)
        return ("f", struct.pack("<d", f))
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, pd.Timestamp):
        return ("ts", v.isoformat())
    if isinstance(v, datetime):
        return ("ts", pd.Timestamp(v).isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    if isinstance(v, bytes):
        return ("bin", v)
    if isinstance(v, str):
        return ("s", v)
    return ("o", repr(v))


def canonicalize(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    df = df.reindex(cols, axis=1)
    rows = sorted(
        (tuple(_norm_value(v) for v in row) for row in df.itertuples(index=False, name=None)),
        key=repr,
    )
    return cols, rows


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> CompareResult:
    sp = spark_df.toPandas()
    du = con.execute(sql).df()
    sp_cols, sp_rows = canonicalize(sp)
    du_cols, du_rows = canonicalize(du)
    if sp_cols != du_cols:
        return CompareResult(
            name, False, len(sp), len(du), f"columns differ: spark={sp_cols} duck={du_cols}"
        )
    if len(sp_rows) != len(du_rows):
        return CompareResult(
            name, False, len(sp), len(du), f"row counts differ: {len(sp_rows)} vs {len(du_rows)}"
        )
    for i, (a, b) in enumerate(zip(sp_rows, du_rows)):
        if a != b:
            return CompareResult(
                name,
                False,
                len(sp),
                len(du),
                f"first diff at sorted row {i}:\n  spark={a}\n  duck ={b}",
            )
    return CompareResult(name, True, len(sp), len(du))
