"""Daemon assembly (event_stream_for_k8s_spark/daemon.py) — the full
main.rs twin: live watch transport -> spool -> k8s-events source ->
watermark dedup -> NDJSON emit + Prometheus scrape, bounded run."""

from __future__ import annotations

import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, HTTPServer

from event_stream_for_k8s_spark.daemon import DaemonConfig, run_daemon


def m_samples(metrics):
    return dict(metrics.processed.samples)


def _event(uid, rv, reason, ns):
    return {
        "metadata": {
            "uid": uid,
            "resourceVersion": str(rv),
            "namespace": ns,
            "creationTimestamp": "2024-03-01T10:00:00Z",
        },
        "type": "Warning",
        "reason": reason,
        "involvedObject": {"kind": "Pod", "namespace": ns, "name": "p"},
        "lastTimestamp": "2024-03-01T10:00:05Z",
        "count": 1,
        "source": {"component": "kubelet"},
    }


def test_daemon_end_to_end(spark, tmp_path):
    # LIST returns u1,u2; WATCH redelivers u2 (same uid:rv -> dedup
    # must drop it) and adds u3
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            self.send_response(200)
            self.end_headers()
            if "watch=true" in self.path:
                for ev in (_event("u2", 2, "BackOff", "ns-a"),
                           _event("u3", 3, "Failed", "ns-b")):
                    self.wfile.write(
                        (json.dumps({"type": "ADDED", "object": ev})
                         + "\n").encode()
                    )
            else:
                self.wfile.write(
                    json.dumps(
                        {
                            "kind": "EventList",
                            "metadata": {"resourceVersion": "2"},
                            "items": [
                                _event("u1", 1, "BackOff", "ns-a"),
                                _event("u2", 2, "BackOff", "ns-a"),
                            ],
                        }
                    ).encode()
                )

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    cfg = DaemonConfig(
        env={
            "CACHE_TTL": "3600",
            "CACHE_DB": str(tmp_path / "ck"),
            "KES_SPOOL": str(tmp_path / "spool"),
            "KES_API_URL": f"http://127.0.0.1:{srv.server_port}",
            "METRICS_PORT": "0",
        }
    )
    lines: list[str] = []
    sink_dir = str(tmp_path / "ndjson_out")
    try:
        query, metrics, mserver = run_daemon(
            spark,
            cfg,
            emit=lines.append,
            sink_dir=sink_dir,
            available_now=True,
            spool_max_events=4,
        )
        query.awaitTermination()
        try:
            # 4 spooled (u1, u2, u2-again, u3) -> 3 unique after dedup
            objs = [json.loads(ln) for ln in lines]
            assert len(objs) == 3
            # envelope shape: A4 time + the NESTED k8s Event object
            # (types.rs:10-18: metadata.uid / involvedObject.kind),
            # so reference NDJSON consumers parse ours unchanged
            assert all("time" in o and "kubernetes_event" in o
                       for o in objs)
            assert {o["kubernetes_event"]["metadata"]["uid"]
                    for o in objs} == {"u1", "u2", "u3"}
            assert all(
                o["kubernetes_event"]["involvedObject"]["kind"] == "Pod"
                for o in objs
            )
            # consumers keying on involvedObject.name, count or
            # source.component (ADVICE r05) see them intact and TYPED
            # (count back to int through the all-string projection)
            assert all(
                o["kubernetes_event"]["involvedObject"]["name"] == "p"
                and o["kubernetes_event"]["count"] == 1
                and o["kubernetes_event"]["source"]["component"]
                == "kubelet"
                for o in objs
            )
            # metadata.namespace comes from the Event's OWN metadata,
            # not from involvedObject (they coincide in this fixture,
            # but each is sourced from its own JSON path)
            assert all(
                o["kubernetes_event"]["metadata"]["namespace"]
                == o["kubernetes_event"]["involvedObject"]["namespace"]
                for o in objs
            )
            # the executor-side NDJSON sink got the same 3 lines
            sunk = spark.read.text(sink_dir).count()
            assert sunk == 3
            # reference writer semantics (tasks.rs:132-140): total
            # counts every RECEIVED event (4, duplicates included);
            # the u2 redelivery the dedup state absorbed is a hit
            metrics.sync_from_query(query)
            fam = metrics.processed.samples
            assert fam[("cache_misses",)] == 3
            assert fam[("total",)] == 4
            assert fam[("cache_hits",)] == 1
            # cachedb_size{items} mirrors the LIVE dedup state store
            # (the cache db): 3 unique keys resident, none evicted yet
            assert metrics.size.samples[("items",)] == 3
            assert metrics.size.samples[("bytes",)] > 0
            # 4-dim counters with real label values
            assert metrics.events.samples[
                ("Warning", "BackOff", "Pod", "ns-a")
            ] == 2
            assert metrics.events.samples[
                ("Warning", "Failed", "Pod", "ns-b")
            ] == 1
            # live scrape
            with urllib.request.urlopen(
                f"http://127.0.0.1:{mserver.port}/metrics"
            ) as resp:
                body = resp.read().decode()
            assert 'event_namespace="ns-b"} 1' in body
        finally:
            mserver.stop()
    finally:
        srv.shutdown()
        srv.server_close()


def test_daemon_continuous_sigterm_graceful(spark, tmp_path):
    """Continuous (non-availableNow) mode: the daemon processes what
    the collector appends, a SIGTERM triggers the installed handler,
    the in-flight batch commits, and the query ends without error —
    main.rs:70-80 parity."""
    import os
    import signal as _signal
    import time

    prev_term = _signal.getsignal(_signal.SIGTERM)
    cfg = DaemonConfig(
        env={
            "CACHE_TTL": "3600",
            "CACHE_DB": str(tmp_path / "ck"),
            "KES_SPOOL": str(tmp_path / "spool"),
            "METRICS_PORT": "0",
        }
    )
    # file-tail mode: pre-append two events, like a collector would
    os.makedirs(cfg.spool_dir, exist_ok=True)
    with open(os.path.join(cfg.spool_dir, "watch.jsonl"), "w") as f:
        for uid in ("a", "b"):
            f.write(json.dumps(_event(uid, 1, "BackOff", "ns")) + "\n")

    lines: list[str] = []
    query, metrics, mserver = run_daemon(
        spark, cfg, emit=lines.append, available_now=False
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and len(lines) < 2:
            time.sleep(0.5)
        assert len(lines) == 2
        # the background sync loop reconciles received counts from
        # query progress while the daemon runs (reference total/hit
        # semantics without caller involvement)
        deadline = time.time() + 30
        while (
            time.time() < deadline
            and m_samples(metrics).get(("total",), 0) < 2
        ):
            time.sleep(0.5)
        s = m_samples(metrics)
        assert s[("total",)] == 2
        assert s[("cache_misses",)] == 2
        assert s[("cache_hits",)] == 0
        os.kill(os.getpid(), _signal.SIGTERM)
        deadline = time.time() + 30
        while time.time() < deadline and query.isActive:
            time.sleep(0.5)
        assert not query.isActive
        assert query.exception() is None  # graceful, not crashed
    finally:
        mserver.stop()
        if query.isActive:
            query.stop()
        _signal.signal(_signal.SIGTERM, prev_term)


def test_daemon_restart_resumes_from_checkpoint(spark, tmp_path):
    """A15 parity at the daemon level: a restart over the same
    CACHE_DB (checkpoint) and spool re-emits NOTHING — the file
    source's offsets and the dedup state both survive the restart,
    like the reference's sled db. New spool lines after the restart
    emit exactly once."""
    import json as _json
    import os

    cfg_env = {
        "CACHE_TTL": "3600",
        "CACHE_DB": str(tmp_path / "ck"),
        "KES_SPOOL": str(tmp_path / "spool"),
        "METRICS_PORT": "0",
    }
    spool = os.path.join(cfg_env["KES_SPOOL"], "watch.jsonl")
    os.makedirs(cfg_env["KES_SPOOL"], exist_ok=True)
    with open(spool, "w") as f:
        for uid in ("a", "b"):
            f.write(_json.dumps(_event(uid, 1, "BackOff", "ns")) + "\n")

    def bounded_run():
        lines: list[str] = []
        q, m, srv = run_daemon(
            spark,
            DaemonConfig(env=cfg_env),
            emit=lines.append,
            available_now=True,
        )
        q.awaitTermination()
        srv.stop()
        return lines

    first = bounded_run()
    assert len(first) == 2
    # restart, same checkpoint + unchanged spool: nothing re-emits
    second = bounded_run()
    assert second == []
    # append one NEW event and one REDELIVERY of a committed key:
    # only the new key emits (offsets resume past old bytes; the
    # dedup state still holds 'a')
    with open(spool, "a") as f:
        f.write(_json.dumps(_event("a", 1, "BackOff", "ns")) + "\n")
        f.write(_json.dumps(_event("c", 3, "Failed", "ns")) + "\n")
    third = bounded_run()
    assert len(third) == 1
    ev = _json.loads(third[0])["kubernetes_event"]
    assert ev["metadata"]["uid"] == "c"


def test_daemon_stops_when_watch_dies_fatally(spark, tmp_path):
    """main.rs:75 parity (select_all): any task ending stops the
    daemon. A fatal 401 from the apiserver kills the watch loop, which
    must stop the streaming query rather than leave a daemon that
    looks healthy while spooling nothing (ADVICE r04)."""
    import time

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            self.send_response(401)
            self.end_headers()

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    cfg = DaemonConfig(
        env={
            "CACHE_TTL": "3600",
            "CACHE_DB": str(tmp_path / "ck"),
            "KES_SPOOL": str(tmp_path / "spool"),
            "KES_API_URL": f"http://127.0.0.1:{srv.server_port}",
            "METRICS_PORT": "0",
        }
    )
    try:
        query, metrics, mserver = run_daemon(
            spark,
            cfg,
            emit=lambda s: None,
            available_now=False,
            install_signal_handlers=False,
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline and query.isActive:
                time.sleep(0.5)
            assert not query.isActive  # daemon shut down, not zombied
        finally:
            mserver.stop()
            if query.isActive:
                query.stop()
    finally:
        srv.shutdown()
        srv.server_close()


def test_daemon_executor_sink_only(spark, tmp_path):
    """The cluster deployment shape: emit=None + sink_dir — NDJSON is
    written from executors, nothing streams through the driver."""
    import os

    cfg = DaemonConfig(
        env={
            "CACHE_TTL": "3600",
            "CACHE_DB": str(tmp_path / "ck"),
            "KES_SPOOL": str(tmp_path / "spool"),
            "METRICS_PORT": "0",
        }
    )
    os.makedirs(cfg.spool_dir, exist_ok=True)
    with open(os.path.join(cfg.spool_dir, "watch.jsonl"), "w") as f:
        for uid in ("a", "b", "a"):  # one duplicate
            f.write(json.dumps(_event(uid, 1, "BackOff", "ns")) + "\n")
    sink_dir = str(tmp_path / "out")
    query, metrics, mserver = run_daemon(
        spark, cfg, emit=None, sink_dir=sink_dir, available_now=True
    )
    query.awaitTermination()
    mserver.stop()
    lines = [json.loads(r["value"])
             for r in spark.read.text(sink_dir).collect()]
    assert {ln["kubernetes_event"]["metadata"]["uid"]
            for ln in lines} == {"a", "b"}
    assert len(lines) == 2
    metrics.sync_from_query(query)
    s = metrics.processed.samples
    assert s[("total",)] == 3
    assert s[("cache_hits",)] == 1
    assert s[("cache_misses",)] == 2


def test_in_cluster_https_self_signed_ca(tmp_path):
    """K8sWatchSpooler.in_cluster against a localhost HTTPS server
    whose cert chains to a SELF-SIGNED CA (the in-pod reality: the
    apiserver cert chains to the cluster CA, not a system root) —
    VERDICT r06 #4. Asserts: custom-CA TLS verification succeeds, the
    bearer token is read from the SA dir and SENT, the token file is
    RE-read per connection (rotation), and a default-context client
    (no cluster CA) is rejected."""
    import os
    import ssl
    import subprocess
    import urllib.error

    import pytest as _pytest

    from event_stream_for_k8s_spark.sources.k8s_watch_http import (
        K8sWatchSpooler,
    )

    # self-signed CA == server cert (one hop), SAN for 127.0.0.1
    cert = str(tmp_path / "ca.crt")
    key = str(tmp_path / "ca.key")
    gen = subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", key, "-out", cert, "-days", "1",
         "-subj", "/CN=kubernetes",
         "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1"],
        capture_output=True, text=True,
    )
    if gen.returncode != 0:
        _pytest.skip(f"openssl unavailable: {gen.stderr[-200:]}")

    # pod-style service-account dir
    sa = tmp_path / "serviceaccount"
    sa.mkdir()
    (sa / "token").write_text("tok-one\n")
    (sa / "namespace").write_text("kube-probe\n")
    import shutil as _sh

    _sh.copy(cert, sa / "ca.crt")

    seen_auth: list[str] = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            seen_auth.append(self.headers.get("Authorization", ""))
            self.send_response(200)
            self.end_headers()
            if "watch=true" in self.path:
                self.wfile.write(
                    (json.dumps({
                        "type": "ADDED",
                        "object": _event("u9", 9, "Pulled", "kube-probe"),
                    }) + "\n").encode()
                )
            else:
                self.wfile.write(json.dumps({
                    "kind": "EventList",
                    "metadata": {"resourceVersion": "8"},
                    "items": [_event("u8", 8, "Created", "kube-probe")],
                }).encode())

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(certfile=cert, keyfile=key)
    srv.socket = ctx.wrap_socket(srv.socket, server_side=True)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    old_env = dict(os.environ)
    os.environ["KUBERNETES_SERVICE_HOST"] = "127.0.0.1"
    os.environ["KUBERNETES_SERVICE_PORT"] = str(srv.server_port)
    try:
        spool = str(tmp_path / "spool.jsonl")
        sp = K8sWatchSpooler.in_cluster(
            spool, pod_namespace=True, sa_dir=str(sa)
        )
        # pod-namespace scoping came from the SA dir
        assert sp.namespace == "kube-probe"
        n = sp.run()
        assert n == 2  # 1 listed + 1 watched over verified TLS
        assert seen_auth[0] == "Bearer tok-one"

        # token rotation: the file is re-read on the next connection
        (sa / "token").write_text("tok-two\n")
        sp.run()
        assert seen_auth[-1] == "Bearer tok-two"

        # and the custom CA is LOAD-BEARING: a spooler without it
        # (system trust roots) must fail TLS verification
        bad = K8sWatchSpooler(
            f"https://127.0.0.1:{srv.server_port}", spool
        )
        with _pytest.raises(urllib.error.URLError, match="certificate|CERTIFICATE"):
            bad.list_once()

        # IPv6 single-stack clusters export a BARE IPv6 address in
        # KUBERNETES_SERVICE_HOST — the URL authority must bracket it
        os.environ["KUBERNETES_SERVICE_HOST"] = "fd00::1"
        sp6 = K8sWatchSpooler.in_cluster(spool, sa_dir=str(sa))
        assert sp6.base_url == f"https://[fd00::1]:{srv.server_port}"
    finally:
        os.environ.clear()
        os.environ.update(old_env)
        srv.shutdown()
