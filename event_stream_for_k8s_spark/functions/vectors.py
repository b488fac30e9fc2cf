"""Vector math over ``array<float>`` columns as pure SQL expressions.

Everything here compiles to Catalyst higher-order functions
(``zip_with`` + ``aggregate``): JVM-side, whole-stage-codegen, no
Python in the hot path. The fold accumulates left-to-right in double —
the same element order DuckDB's ``list_dot_product`` uses — so
similarity scores are bit-comparable against the oracle.

At 100 TB scale these expressions are the inner kernel of the
brute-force scan path; the sub-linear paths (LSH / IVF) live in
``operators/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold double dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; formula shape must match the oracle SQL
    (dot / (sqrt(dot aa) * sqrt(dot bb))) for bit-stable comparison.

    ``try_divide``, not ``/``: a zero-norm vector makes the
    denominator 0 and ANSI ``/`` THROWS where DuckDB's ``/`` yields
    NULL — try_divide restores the NULL-on-zero parity (found by
    tests/test_degenerate_embeddings.py round 6)."""
    return F.try_divide(dot(a, b), l2norm(a) * l2norm(b))


def cosine_with_norms(
    a: Column, b: Column, na: Column, nb: Column
) -> Column:
    """:func:`cosine` with the two norms PRECOMPUTED per side (r15):
    on a pair relation (Q x N scan, candidate join) the plain form
    folds three 64-element aggregates per PAIR, but each vector's norm
    is a per-ROW quantity — computing it once per side before the join
    leaves one fold per pair (3x less interpreted-HOF work in the
    exact kernels). Bit-identical: ``l2norm`` yields the same double
    whether evaluated per pair or per row, and the denominator is the
    same ``sqrt(aa) * sqrt(bb)`` product in the same order, so the
    oracle comparison is unchanged. Same try_divide zero-norm
    semantics."""
    return F.try_divide(dot(a, b), na * nb)


def sql_dot(a: str, b: str) -> str:
    """DuckDB twin of ``dot`` (cast to DOUBLE[] => double accumulation
    in the same element order)."""
    return f"list_dot_product(({a})::DOUBLE[], ({b})::DOUBLE[])"


def sql_cosine(a: str, b: str) -> str:
    return (
        f"{sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)}))"
    )
