"""Query registry.

Each entry pairs a PySpark DataFrame program with (where
SQL-expressible) an equivalent DuckDB oracle SQL string. The driver
runs both on the same parquet at sf=0.01 and compares row count,
schema, and an order-insensitive value hash — so every computed column
must carry the SAME alias on both sides, and every float-producing
aggregate must be order-insensitive (decimal-sum discipline, see
``plans.util``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "Query"] = {}


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL, None => rows-only check
    section: str  # SURVEY.md §2 table id (e.g. "B.4")
    notes: str = ""


def query(
    name: str, oracle: str | None = None, section: str = "", notes: str = ""
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator registering a named query (and optional oracle SQL)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name, spark=fn, oracle=oracle, section=section, notes=notes
        )
        return fn

    return deco
