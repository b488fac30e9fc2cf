"""Determinism helpers for oracle-checked queries.

Floating-point sums are order-dependent; Spark's partial aggregation
order differs from DuckDB's sequential scan. Both engines, however,
compute DECIMAL sums exactly (order-insensitive). So every checked
aggregate over a double column goes through decimal(38,10) and is cast
back to double at the end — bit-identical on both sides. Averages are
computed as exact-decimal-sum / count, divided in double space with the
same expression shape on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,10)"


def dsum(col: Column | str) -> Column:
    """Order-insensitive sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-insensitive mean: exact decimal sum / count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB twin of ``dsum``."""
    return f"cast(sum(cast(({expr}) as decimal(38,10))) as double)"


def sql_davg(expr: str) -> str:
    """DuckDB twin of ``davg``."""
    return (
        f"cast(sum(cast(({expr}) as decimal(38,10))) as double)"
        f" / count({expr})"
    )
