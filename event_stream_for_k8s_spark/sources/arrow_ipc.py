"""A batch Python Data Source with BOTH a writer and a reader over
Arrow IPC files — the engine-side model for "custom sink" parity.

The reference ships bespoke sinks behind one interface (README
"exporters"; the parquet/long-term-store path in its storage tier);
Spark's equivalent extension point is the Python Data Source API
(pyspark >= 4.0), and this module demonstrates the WRITE half that
``k8s_datasource.py`` (read half) left out:

- ``DataSourceArrowWriter``: executors hand the writer PyArrow
  ``RecordBatch``es — the columnar fast path, no per-row pickling —
  and each task streams them to ONE IPC file. File-per-task is the
  same layout contract as parquet writes, so a 1000-executor job
  writes 1000 files with zero coordination.
- A real two-phase commit: tasks write to ``*.tmp`` names and return
  the name in a ``WriterCommitMessage``; only the driver's
  ``commit()`` renames them to visible names and stamps ``_SUCCESS``.
  A failed/straggler task attempt leaves only ``*.tmp`` litter that
  ``abort()`` (or the next overwrite) clears — readers can never
  observe a partial job. This is the FileOutputCommitter v2 protocol
  in ~30 lines of Python.
- The reader side lists committed files (one ``InputPartition`` per
  file, so reads parallelize file-per-task) and yields the stored
  batches; schema is recovered from the first file's IPC footer, so
  the format is self-describing like parquet.

Arrow IPC round-trips types bit-exactly (int64 stays int64, no JSON
float/date mangling), which is what makes a write-then-read query
oracle-checkable against the original table.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    WriterCommitMessage,
)

_SUFFIX = ".arrow"


@dataclass
class _Commit(WriterCommitMessage):
    tmp_name: str | None  # None => empty partition, no file written
    rows: int


def _part_files(path: str) -> list[str]:
    return sorted(
        f for f in os.listdir(path) if f.endswith(_SUFFIX)
    )


class ArrowIpcWriter(DataSourceArrowWriter):
    def __init__(self, options, overwrite: bool, schema=None) -> None:
        self.path = options["path"]
        self.schema = schema  # Spark schema, for the empty-job file
        # Driver-side, before any task launches: overwrite truncates
        # the previous committed generation (and stale tmp litter).
        os.makedirs(self.path, exist_ok=True)
        if overwrite:
            for f in os.listdir(self.path):
                if f.endswith((_SUFFIX, ".tmp")) or f == "_SUCCESS":
                    os.remove(os.path.join(self.path, f))

    def write(self, iterator) -> _Commit:
        from pyspark import TaskContext

        tc = TaskContext.get()
        name = f"part-{tc.partitionId():05d}-{tc.taskAttemptId()}"
        tmp = f"{name}{_SUFFIX}.tmp"
        writer = None
        rows = 0
        try:
            for batch in iterator:
                if writer is None:
                    writer = pa.ipc.new_file(
                        os.path.join(self.path, tmp), batch.schema
                    )
                writer.write_batch(batch)
                rows += batch.num_rows
        finally:
            if writer is not None:
                writer.close()
        if rows == 0 and writer is None:
            return _Commit(tmp_name=None, rows=0)
        return _Commit(tmp_name=tmp, rows=rows)

    def commit(self, messages) -> None:
        total = 0
        committed = 0
        for m in messages:
            if m is None or m.tmp_name is None:
                continue
            final = m.tmp_name[: -len(".tmp")]
            os.replace(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, final),
            )
            total += m.rows
            committed += 1
        if committed == 0 and self.schema is not None:
            # all partitions empty: still commit ONE schema-bearing
            # empty file, exactly like parquet, so the self-describing
            # read-back works on an empty dataset instead of failing
            # with "no committed files" (tests/test_empty_inputs.py)
            from pyspark.sql.pandas.types import to_arrow_schema

            with pa.ipc.new_file(
                os.path.join(self.path, f"part-empty-00000{_SUFFIX}"),
                to_arrow_schema(self.schema),
            ):
                pass
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(str(total))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and m.tmp_name is not None:
                try:
                    os.remove(os.path.join(self.path, m.tmp_name))
                except FileNotFoundError:
                    pass


class ArrowIpcReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options["path"]

    def partitions(self):
        # One partition per committed file: reads scale out exactly
        # like the write did, and tmp litter is invisible.
        return [
            InputPartition(os.path.join(self.path, f))
            for f in _part_files(self.path)
        ]

    def read(self, partition):
        with pa.ipc.open_file(partition.value) as rd:
            for i in range(rd.num_record_batches):
                yield rd.get_batch(i)


class ArrowIpcDataSource(DataSource):
    """df.write.format("arrow-ipc").option("path", p) / spark.read."""

    @classmethod
    def name(cls) -> str:
        return "arrow-ipc"

    def schema(self):
        # Self-describing like parquet: recover the Spark schema from
        # the first committed file's IPC footer (driver-side).
        from pyspark.sql.pandas.types import from_arrow_schema

        files = _part_files(self.options["path"])
        if not files:
            raise FileNotFoundError(
                f"no committed {_SUFFIX} files under {self.options['path']}"
            )
        with pa.ipc.open_file(
            os.path.join(self.options["path"], files[0])
        ) as rd:
            return from_arrow_schema(rd.schema)

    def writer(self, schema, overwrite: bool) -> ArrowIpcWriter:
        return ArrowIpcWriter(self.options, overwrite, schema)

    def reader(self, schema) -> ArrowIpcReader:
        return ArrowIpcReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(ArrowIpcDataSource)
