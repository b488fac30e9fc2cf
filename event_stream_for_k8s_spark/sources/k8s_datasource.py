"""A DataSource-v2-style streaming source for Kubernetes Events,
via Spark's Python Data Source API (pyspark >= 4.0).

SURVEY.md §2 A1 marks a native k8s source as the stretch goal beyond
the out-of-band collector. This implements the engine-side contract:
a replayable, offset-tracked stream of Event JSON. The transport here
tails an NDJSON file (what a sidecar collector writes); swapping the
``_fetch`` body for an HTTP list-then-watch against the k8s API
(kube-apiserver watch bookmarks ARE resume offsets) changes nothing
in the Spark-facing surface.

Offsets are line counts — monotonic, replayable, checkpointable: a
restart re-reads from the committed offset, and the downstream
watermark dedup absorbs re-delivery exactly like the reference's sled
state absorbs the startup re-list (tasks.rs:159-163).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

K8S_DS_SCHEMA = (
    "uid string, resource_version string, type string, reason string,"
    " kind string, namespace string, message string,"
    " last_timestamp string, first_timestamp string, creation_timestamp string"
)


class K8sEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("k8s-events source requires option 'path'")
        self.max_batch = int(options.get("maxeventsperbatch", 1024))

    def initialOffset(self) -> dict:
        return {"line": 0}

    def _lines(self) -> list[str]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return f.readlines()

    @staticmethod
    def _parse(line: str) -> tuple:
        ev = json.loads(line)
        meta = ev.get("metadata") or {}
        obj = ev.get("involvedObject") or {}
        return (
            meta.get("uid"),
            meta.get("resourceVersion"),
            ev.get("type"),
            ev.get("reason"),
            obj.get("kind"),
            obj.get("namespace"),
            ev.get("message"),
            ev.get("lastTimestamp"),
            ev.get("firstTimestamp"),
            meta.get("creationTimestamp"),
        )

    def read(self, start: dict):
        lines = self._lines()
        lo = start["line"]
        hi = min(len(lines), lo + self.max_batch)
        rows = [self._parse(ln) for ln in lines[lo:hi] if ln.strip()]
        return iter(rows), {"line": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay path (failure recovery): deterministic re-read
        lines = self._lines()
        return iter(
            self._parse(ln)
            for ln in lines[start["line"] : end["line"]]
            if ln.strip()
        )


class K8sEventsDataSource(DataSource):
    """spark.readStream.format("k8s-events").option("path", ...)"""

    @classmethod
    def name(cls) -> str:
        return "k8s-events"

    def schema(self) -> str:
        return K8S_DS_SCHEMA

    def simpleStreamReader(self, schema) -> K8sEventsStreamReader:
        return K8sEventsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(K8sEventsDataSource)
