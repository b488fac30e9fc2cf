"""Table-maintenance operators: MERGE upsert and SCD-type-2 builds.

Generic forms of the shapes ``plans/maintenance.py`` registers on the
fixture tables (reference parity: none — cisco-open/event-stream-for-k8s
has no table maintenance; this is §2 Part B/C surface). Extracted so
property-based differentials can drive them with adversarial inputs
(NULL keys, duplicate keys, NULL ordering values) the fixtures never
produce — the round-7 as-of NULL-payload bug was found exactly this
way.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame, changes: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """MERGE INTO (upsert) on plain relations: full-outer join on
    ``keys`` + per-column coalesce — matched rows take the change
    side, unmatched changes insert, unmatched base carries over. The
    rewrite Delta/Iceberg run under the hood; on partitioned layouts
    only partitions containing matches are rewritten.

    Contract fine print (property-tested):
    - NULL join keys never match (SQL equi-join semantics): a
      NULL-key base row carries over unchanged and a NULL-key change
      row inserts — both survive, same as DuckDB's FULL JOIN.
    - Duplicate keys on either side produce the full join's pair
      expansion, exactly as the SQL rewrite does (SQL MERGE would
      raise on multiple source matches; callers wanting last-wins
      dedup the change side first, e.g. ``dedup_first_agg``).
    - A matched change's NULL in a non-key column falls through to
      the base value (coalesce) — MERGE UPDATE SET with explicit
      NULL is NOT expressible in this form; use a sentinel.

    Both sides must share a schema; output column order follows
    ``base``.
    """
    cols = base.columns
    b, c = base.alias("b"), changes.alias("c")
    cond = None
    for k in keys:
        eq = F.col(f"b.{k}") == F.col(f"c.{k}")
        cond = eq if cond is None else (cond & eq)
    return b.join(c, cond, "full").select(
        *[
            F.coalesce(F.col(f"c.{col}"), F.col(f"b.{col}")).alias(col)
            for col in cols
        ]
    )


def scd2(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """SCD-type-2 dimension build: change rows → effective-dated
    ranges via ``lead()`` per key; the open-ended row is flagged
    current. One window shuffle on the dimension key — the standard
    way a 100 TB fact side gets point-in-time joins.

    Ordering contract (property-tested): ``(ts_col, tiebreak)``
    ascending with NULLS FIRST on both — a NULL effective-date sorts
    as "before all time" (its valid_to is the first real date), NOT
    as an open current row. Spark's default ASC ordering is already
    nulls-first; the explicit form pins it because SQL engines
    default differently (DuckDB/Postgres ASC is NULLS LAST) and a
    silent default-following port would flip which row is current.

    NULL keys group together (window PARTITION BY treats NULL as one
    group in both Spark and the SQL spec).

    Output: ``keys + [valid_from, valid_to, is_current]`` plus every
    other column of ``df`` except ``ts_col``.
    """
    others = [
        col for col in df.columns if col != ts_col and col not in keys
    ]
    w = Window.partitionBy(*keys).orderBy(
        F.asc_nulls_first(ts_col), F.asc_nulls_first(tiebreak)
    )
    nxt = F.lead(ts_col).over(w)
    return df.select(
        *keys,
        *others,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
