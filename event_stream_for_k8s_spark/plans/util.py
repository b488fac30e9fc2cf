"""Determinism helpers for oracle-checked queries.

Floating-point sums are order-dependent (Spark's partial-aggregation
merge order differs from DuckDB's sequential scan), and DuckDB's
decimal->double cast rounds differently from the JVM's (off by one
ulp: int128/10^scale is two roundings, not one). Both pitfalls vanish
with scaled-integer aggregation: the input columns carry a fixed
number of decimal digits, so ``round(x * 10^d)`` is an exact int64 on
both engines, the int64 sum is exact and order-insensitive, and the
final ``cast(sum as double) / 10^d`` is a correctly-rounded identical
double everywhere.

``dec`` is the decimal-digit count of the (possibly computed) input:
2 for money/value columns, 0 for integral quantities, 6 for products
of two 2-dp columns, etc. Sums must stay under 2^63 / 10^dec — at
100 TB pick ``dec`` accordingly or fall back to decimal output.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _scaled(col: Column | str, dec: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(10**dec)).cast("long")


def dsum(col: Column | str, dec: int = 2) -> Column:
    """Order-insensitive sum of a fixed-decimal column, as double."""
    return F.sum(_scaled(col, dec)).cast("double") / F.lit(float(10**dec))


def davg(col: Column | str, dec: int = 2) -> Column:
    """Order-insensitive mean of a fixed-decimal column, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(_scaled(col, dec)).cast("double")
        / F.lit(float(10**dec))
        / F.count(c)
    )


def sql_dsum(expr: str, dec: int = 2) -> str:
    """DuckDB twin of ``dsum``."""
    return (
        f"cast(sum(cast(round(({expr}) * {10**dec}) as bigint)) as double)"
        f" / {float(10**dec)}"
    )


def sql_davg(expr: str, dec: int = 2) -> str:
    """DuckDB twin of ``davg``."""
    return f"{sql_dsum(expr, dec)} / count({expr})"


def ewma_fir(value, order_window, alpha: float = 0.5, taps: int = 8):
    """Truncated-FIR exponentially-weighted moving average.

    ``y_n = sum_k alpha^k x_{n-k} / sum_k alpha^k`` over the ``taps``
    most recent rows of ``order_window``, renormalized over the
    weights actually present at partition starts. With ``alpha`` a
    power of two every product is an exact mantissa shift, so the
    result is bit-identical across engines summing in the same order.
    """
    c = F.col(value) if isinstance(value, str) else value
    num, den = c, F.lit(1.0)
    for k in range(1, taps):
        lagged = F.lag(c, k).over(order_window)
        wt = alpha**k
        num = num + F.coalesce(lagged, F.lit(0.0)) * wt
        den = den + F.when(lagged.isNull(), 0.0).otherwise(wt)
    return num / den
