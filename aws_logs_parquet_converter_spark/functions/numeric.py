"""Cross-engine-deterministic numeric aggregation helpers.

Floating-point sums depend on summation order (differs between Spark
partitionings and DuckDB), and double->DECIMAL casts hit engine-specific
rounding on .xx5 boundaries (Spark routes through BigDecimal.valueOf's
shortest-string + HALF_UP; DuckDB converts the exact binary value). The
portable scheme used by every oracle-checked aggregate here:

    sum(x)  ==  sum(cast(round(x * 100) as bigint)) / 100.0

* ``x * 100`` is the same IEEE double in both engines;
* ``round`` to integral is half-away-from-zero in both for every
  representable boundary case;
* the integer (cent) sum is exact and order-independent;
* the final long->double conversion and division by 100.0 are IEEE-exact.

Result: bit-identical aggregates regardless of partitioning, at 2-decimal
(cent) input granularity — matching the money-typed columns of the testdata.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Double -> exact integer cents (bigint)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent, cross-engine-exact sum of a money-like double."""
    out = F.sum(cents(col)).cast("double") / F.lit(100.0)
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Deterministic average matching :func:`sql_davg` division order."""
    c = F.col(col) if isinstance(col, str) else col
    out = (F.sum(cents(c)).cast("double") / F.lit(100.0)) / F.count(c)
    return out.alias(alias) if alias else out


def sql_cents(expr: str) -> str:
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def sql_dsum(expr: str) -> str:
    """DuckDB oracle fragment matching :func:`dsum`."""
    return f"(CAST(SUM({sql_cents(expr)}) AS DOUBLE) / 100.0)"


def sql_davg(expr: str) -> str:
    """DuckDB oracle fragment matching :func:`davg`."""
    return f"((CAST(SUM({sql_cents(expr)}) AS DOUBLE) / 100.0) / COUNT({expr}))"
