"""Query registry — the single source of truth for the declared query
surface (SURVEY.md §2.6) and the north-star pipeline operators.

Each entry pairs a PySpark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with an equivalent DuckDB oracle SQL string (or ``None`` for operators that
are not SQL-expressible; the driver then records a rows-only check).

Exactness rules used throughout the operator modules so that Spark and
DuckDB results hash-identically:
  * Sums over double columns go through exact DECIMAL casts on BOTH sides
    (float summation order is engine-dependent; decimal addition is not),
    then cast back to DOUBLE.
  * Timestamps are emitted as timestamp_ntz or formatted strings — never
    session-timezone-dependent TIMESTAMP.
  * Every LIMIT/window sits on a total order (unique-key tiebreakers).
  * Transcendental results (ln, pow) are snapped to DECIMAL(28,6) before
    the final DOUBLE cast to absorb last-ulp libm differences.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    category: str
    doc: str
    build: QueryFn
    oracle: str | None = None


_REGISTRY: dict[str, Query] = {}

_OPERATOR_MODULES = (
    "arrow_experiments_spark.operators.relational",
    "arrow_experiments_spark.operators.scalar",
    "arrow_experiments_spark.operators.events",
    "arrow_experiments_spark.operators.dedup",
    "arrow_experiments_spark.operators.similarity",
    "arrow_experiments_spark.operators.text",
    "arrow_experiments_spark.operators.multimodal",
    "arrow_experiments_spark.operators.asof",
    "arrow_experiments_spark.operators.tpch",
    "arrow_experiments_spark.operators.udfs",
    "arrow_experiments_spark.operators.scale",
    "arrow_experiments_spark.streaming.stateful",
)


def register(
    name: str, category: str, doc: str = "", oracle: str | None = None
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, category, doc, fn, oracle)
        return fn

    return deco


def _load_operators() -> None:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, Query]:
    _load_operators()
    return dict(_REGISTRY)


def get_query(name: str) -> Query:
    _load_operators()
    return _REGISTRY[name]
