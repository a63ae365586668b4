"""Cross-engine FP determinism helpers.

Problem: ``sum(double)`` accumulates in partition/engine-dependent
order, so Spark and DuckDB can disagree in the last ulp — and a
post-hoc ``round`` then flips at digit boundaries (money values are
exact 2-decimal quantities, so avg/4-decimal boundaries are COMMON,
not rare).

Policy: sums over fixed-decimal data go through an exact decimal cast
(``decimal(18,s)``) — the per-row cast is deterministic (the double is
within 1e-12 of the true s-decimal value, far from any s-decimal
boundary), the decimal sum is exact, and the final cast back to double
is identical on both engines. Ratios are then computed in double from
bitwise-identical operands, making every IEEE op — and the final
round — deterministic too. Oracles mirror the exact same expression
shape.

This also scales: decimal(18+,2) hash aggregation is still one
map-side-partial + final HashAggregate; Tungsten stores small decimals
as longs, so the cost over double sums is marginal.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact sum of fixed-decimal money values, returned as double.

    Oracle mirror: ``CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``.
    """
    return F.sum(_c(col).cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Exact-numerator average: decimal sum / non-null count, divided
    in double. Oracle mirror: ``CAST(sum(CAST(x AS ...)) AS DOUBLE) /
    count(x)``."""
    return dsum(col, scale) / F.count(_c(col))


def dsum_expr(expr: Column, scale: int = 6) -> Column:
    """Exact sum for a per-row product/derived money expression whose
    true value has < ``scale`` decimals (e.g. price*(1-disc): 2dp×2dp
    → exactly 4dp). The double→decimal cast recovers the exact value
    on both engines."""
    return F.sum(expr.cast(f"decimal(18,{scale})")).cast("double")
