"""Vector (embedding) column builders: dot product, norm, cosine over
``array<float>`` columns (SURVEY.md §7 similarity-search plan).

The Spark fold starts at 0.0, so its addition order over array elements is
exactly left-to-right — matched in oracle SQL by ``list_reduce`` (seeded
with the first element; 0.0 + x1 == x1).  Final cosines are snapped to six
decimals (functions.numeric.snap6) to absorb any residual last-ulp noise.

Two implementations of the same fold:

* :func:`dot` — the in-plan ``zip_with``/``aggregate`` expression.  Right
  for bit-decision uses embedded in larger expressions (the LSH sign
  bits), and for plans whose shape tests assert on the expression form.
* :func:`dot_kernel` — an Arrow-batched numpy twin for the PAIR-SCORING
  hot paths (probe x candidate cosine).  Interpreted HOF-lambda
  evaluation costs ~0.6 us per element; a brute-force recall reference at
  2M vectors x 10 probes x 64 dims is ~1.3e9 lambda evals — minutes of
  CPU the vectorized kernel does in seconds.  The kernel accumulates
  dim-by-dim in index order (np.sum's pairwise summation is deliberately
  avoided), so every double it produces is bit-identical to the
  expression form and the oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, element order preserved."""
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
    docstring).  Use on pair-scoring hot paths; assumes rectangular
    fixed-dimension embeddings (ragged input raises in the kernel, where
    the expression form would yield NULL)."""
    return _dot_pd(a, b)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
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
