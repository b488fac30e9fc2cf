"""Local twin of the driver's DuckDB-oracle differential check.

For a registered query: run the PySpark program and the oracle SQL on
the same parquet directory, then compare (row count, sorted column
names, order-insensitive canonicalized rows). Strictness matches the
worst case of the driver's value-hash: values must match EXACTLY after
canonicalization — no float tolerance — which is why checked queries
follow the decimal-sum discipline (plans/util.py).
"""

from __future__ import annotations

import datetime
import math
from dataclasses import dataclass, field
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from event_stream_for_k8s_spark.catalog import TABLES

NULL = "∅"


def connect_oracle(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon_value(v) -> str:
    if v is None:
        return NULL
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return NULL if math.isnan(f) else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return "T" if v else "F"
    if isinstance(v, (int, np.integer)):
        return repr(int(v))
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        return str(v.value) if v is not pd.NaT else NULL
    if isinstance(v, datetime.datetime):
        return str(pd.Timestamp(v).value)
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((str(k), canon_value(x)) for k, x in v.items())
        return "{" + ",".join(f"{k}:{x}" for k, x in items) + "}"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if v is pd.NaT:
        return NULL
    return repr(v)


def canon_rows(pdf: pd.DataFrame) -> tuple[list[str], list[str]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        "|".join(canon_value(v) for v in rec)
        for rec in pdf.itertuples(index=False, name=None)
    )
    return cols, rows


@dataclass
class CheckResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int | None
    mismatches: list[str] = field(default_factory=list)
    seconds: float = 0.0

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        extra = "" if self.ok else " :: " + "; ".join(self.mismatches[:4])
        return (
            f"[{status}] {self.name} spark={self.spark_rows}"
            f" oracle={self.oracle_rows} {self.seconds:.1f}s{extra}"
        )


DRIVER_UNSAFE = "driver-unsafe cell type"


def assert_driver_safe(pdf: pd.DataFrame, name: str) -> list[str]:
    """The driver's comparator (pandas sort_values/factorize over raw
    cells) dies on list/dict/ndarray cells and hash-diverges on Decimal
    (Spark Decimal object vs DuckDB float64). Flag any such cell so the
    local gate is at least as strict as the driver's."""
    bad = []
    for col in pdf.columns:
        for v in pdf[col].head(5):
            if isinstance(v, (list, tuple, dict, np.ndarray, Decimal)):
                bad.append(f"{DRIVER_UNSAFE}: {col} holds {type(v).__name__}")
                break
    return bad


def check_query(spark, con, q, sf_dir: str) -> CheckResult:
    import time

    t0 = time.time()
    try:
        sdf = q.spark(spark, sf_dir).toPandas()
    finally:
        # plans persist() intermediates for multi-consumer reuse within
        # one materialization; drop them so a 200-query sweep doesn't
        # accumulate every query's cached blocks (ADVICE r02)
        spark.catalog.clearCache()
    res = CheckResult(q.name, True, len(sdf), None)
    unsafe = assert_driver_safe(sdf, q.name)
    if unsafe:
        res.ok = False
        res.mismatches.extend(unsafe)
    if q.oracle is None:
        res.seconds = time.time() - t0
        return res
    odf = con.execute(q.oracle).df()
    res.oracle_rows = len(odf)
    s_cols, s_rows = canon_rows(sdf)
    o_cols, o_rows = canon_rows(odf)
    if s_cols != o_cols:
        res.ok = False
        res.mismatches.append(f"schema: spark={s_cols} oracle={o_cols}")
    if len(sdf) != len(odf):
        res.ok = False
        res.mismatches.append(f"rowcount: {len(sdf)} vs {len(odf)}")
    if res.ok and s_rows != o_rows:
        res.ok = False
        diff_s = [r for r in s_rows if r not in set(o_rows)][:3]
        diff_o = [r for r in o_rows if r not in set(s_rows)][:3]
        res.mismatches.append(f"values: spark-only={diff_s} oracle-only={diff_o}")
    res.seconds = time.time() - t0
    return res
