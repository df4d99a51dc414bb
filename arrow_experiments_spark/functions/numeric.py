"""Decimal-exact aggregate helpers.

Floating-point summation is order-dependent, and Spark (partial aggregation
across partitions) and DuckDB (its own parallel aggregation) will not add
doubles in the same order.  Casting to DECIMAL before summing makes the
arithmetic exact and therefore order-independent; both engines then produce
bit-identical DOUBLE results after the final cast.  The matching oracle-SQL
idioms live next to each query in the operator modules.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Order-independent SUM over a double column via exact decimals.

    Oracle equivalent: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum divided by count in DOUBLE.

    Oracle: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double") / F.count(c)


def snap6(col: Column) -> Column:
    """Snap a double to 6 decimal places via decimal, returning double.

    Used after transcendental functions (ln, pow) whose last-ulp behavior
    differs between the JVM and C libm.  Oracle:
    ``CAST(CAST(x AS DECIMAL(28,6)) AS DOUBLE)``.
    """
    return col.cast("decimal(28,6)").cast("double")
