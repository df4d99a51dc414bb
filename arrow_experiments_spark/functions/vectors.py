"""Vector (embedding) column builders: dot product, norm, cosine — all
JVM-side ``zip_with``/``aggregate`` folds over ``array<float>`` columns
(SURVEY.md §7 similarity-search plan).

The Spark fold starts at 0.0, so its addition order over array elements is
exactly left-to-right — matched in oracle SQL by ``list_reduce`` (seeded
with the first element; 0.0 + x1 == x1).  Final cosines are snapped to six
decimals (functions.numeric.snap6) to absorb any residual last-ulp noise.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, element order preserved."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


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
