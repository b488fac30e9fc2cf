"""catalog.load schema-inference memo (r16 O8).

A bare spark.read.parquet() runs a schema-inference job on every call;
load() memoizes the inferred StructType per (path, mtime, size) so
repeated loads — every registry query build — skip that driver round
trip. These tests pin that the memo changes METADATA handling only:
identical schema, identical rows, and staleness safety on file change.
"""

from __future__ import annotations

import os
import shutil

from event_stream_for_k8s_spark import catalog
from event_stream_for_k8s_spark.catalog import TABLES, load

SF = "/root/testdata/sf0.001"


def test_cached_load_schema_and_rows_identical(spark):
    """Second load (cache hit) yields the same schema and rows as the
    first (cache miss) for every table, including the dtype-dispatched
    events loader."""
    for name in TABLES:
        first = load(spark, SF, name)
        second = load(spark, SF, name)
        assert first.schema == second.schema, name
        # row-level parity on the two smallest + events (dtype dispatch)
        if name in ("region", "nation", "events"):
            a = sorted(map(tuple, first.collect()))
            b = sorted(map(tuple, second.collect()))
            assert a == b, name


def test_cache_key_includes_mtime(tmp_path, spark):
    """A regenerated file re-infers: the memo must not serve a schema
    for a path whose stat() changed."""
    src = f"{SF}/region.parquet"
    dst = str(tmp_path / "t.parquet")
    shutil.copyfile(src, dst)
    load_a = catalog._read_parquet(spark, dst)
    key_count = len(catalog._SCHEMA_CACHE)
    # same stat -> hit, no new entry
    catalog._read_parquet(spark, dst)
    assert len(catalog._SCHEMA_CACHE) == key_count
    # touch the file -> new key -> re-infer
    st = os.stat(dst)
    os.utime(dst, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    catalog._read_parquet(spark, dst)
    assert len(catalog._SCHEMA_CACHE) == key_count + 1
    assert load_a.schema is not None


def test_missing_path_still_raises(spark):
    """The memo must not swallow the reader's missing-path error."""
    import pytest
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        catalog._read_parquet(spark, "/nonexistent/nowhere.parquet").collect()
