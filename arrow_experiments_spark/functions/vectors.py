"""Vector (embedding) column builders: dot product, norm, cosine over
``array<float>`` columns (SURVEY.md §7 similarity-search plan).

The Spark fold starts at 0.0, so its addition order over array elements is
exactly left-to-right — matched in oracle SQL by ``list_reduce`` (seeded
with the first element; 0.0 + x1 == x1).  Final cosines are snapped to six
decimals (functions.numeric.snap6) to absorb any residual last-ulp noise.

Two implementations of the same fold:

* :func:`dot` — the in-plan ``zip_with``/``aggregate`` expression.  Right
  for bit-decision uses embedded in larger expressions (the LSH sign
  bits), for plans whose shape tests assert on the expression form, and
  for BOUNDED candidate sets: measured A/B at a 2M-vector corpus, the
  bucket-restricted retrievers (LSH bucket / IVF cell joins, ~1M pair
  rows) run ~1.3× FASTER on the expression — the kernel's Arrow transfer
  of both embedding arrays per pair costs more than the fold it saves.
* :func:`dot_kernel` — an Arrow-batched numpy twin for BRUTE-FORCE pair
  scoring (probe x full corpus: exact knn, the recall evals' reference
  side).  There the pair mass is corpus-sized (2M vectors x 10 probes x
  64 dims ≈ 1.3e9 interpreted lambda evals) and the same A/B measures
  the kernel 3.4× faster end-to-end (ann_recall_eval_ivf 34.9 → 10.4 s
  at 1000×).  The kernel accumulates dim-by-dim in index order (np.sum's
  pairwise summation is deliberately avoided), so every double it
  produces is bit-identical to the expression form and the oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def dot_expr(a: str, b: str) -> str:
    """Spark-SQL string twin of :func:`dot` — canonically plan-identical
    to the Column/lambda form (verified optimizedPlan().canonicalized()
    equality), but ONE expression parse instead of ~30 py4j round-trips
    of lambda construction (r16: driver plan-build time is a real cost —
    every bench leg and every streaming micro-batch rebuilds the plan)."""
    return (
        f"aggregate(zip_with({a}, {b},"
        " (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )


def norm_expr(a: str) -> str:
    """Spark-SQL string twin of :func:`norm` (see :func:`dot_expr`)."""
    return f"sqrt({dot_expr(a, a)})"


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in double precision, element order preserved.

    Pass both operands by NAME where possible: the string form parses
    one JVM-side expression (see :func:`dot_expr`) where the
    Column/lambda form pays ~30 py4j round-trips."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(dot_expr(a, b))
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


@F.pandas_udf(DoubleType())
def _dot_pd(a: pd.Series, b: pd.Series) -> pd.Series:
    import numpy as np

    av = np.array(a.tolist(), dtype=np.float64)  # f32 -> f64 is exact
    bv = np.array(b.tolist(), dtype=np.float64)
    acc = np.zeros(av.shape[0])
    for i in range(av.shape[1]):  # same ((0+p0)+p1)+... left fold
        acc = acc + av[:, i] * bv[:, i]
    return pd.Series(acc)


def dot_kernel(a: Column, b: Column) -> Column:
    """Arrow-batched Σ aᵢ·bᵢ, bit-identical to :func:`dot` (module
    docstring).  Use on BRUTE-FORCE pair-scoring paths — on bounded
    candidate sets the expression form measures faster (module
    docstring).  Assumes rectangular fixed-dimension embeddings (ragged
    input raises in the kernel, where the expression form would yield
    NULL)."""
    return _dot_pd(a, b)


def norm(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(norm_expr(a))
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}),"
        " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),"
        " (acc, x) -> acc + x)"
    )


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"
