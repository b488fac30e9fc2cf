"""Guard against silently-shadowed module-level definitions.

Round-8 ADVICE found a real instance: two tests named
``test_connected_components_matches_union_find`` in
tests/test_properties.py — Python binds the later ``def``, so pytest
silently stopped collecting the earlier one and its hypothesis
strategy became dead code.  There is no flake8 in this environment,
so this is a minimal F811 stand-in: parse every repo .py file and
fail on duplicate module-level ``def``/``async def``/``class`` names.

Conditional definitions (a ``def`` nested under ``if``/``try`` at
module level, the usual import-fallback pattern) are exempt — only
two unconditional top-level bindings of the same name are a bug.
"""

from __future__ import annotations

import ast
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent
SCAN_DIRS = ["tests", "event_stream_for_k8s_spark", "tools"]
SCAN_FILES = ["bench.py", "__spark_entry__.py"]


def _iter_py_files():
    for d in SCAN_DIRS:
        root = REPO / d
        if root.is_dir():
            yield from sorted(root.rglob("*.py"))
    for f in SCAN_FILES:
        p = REPO / f
        if p.is_file():
            yield p


def test_no_duplicate_toplevel_defs():
    offenders: list[str] = []
    for path in _iter_py_files():
        tree = ast.parse(path.read_text(), filename=str(path))
        seen: dict[str, int] = {}
        # only direct children of the Module node: nested/conditional
        # defs (if/try fallbacks) are legitimate redefinitions
        for node in tree.body:
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                if node.name in seen:
                    offenders.append(
                        f"{path.relative_to(REPO)}:{node.lineno} "
                        f"redefines {node.name!r} "
                        f"(first bound at line {seen[node.name]})"
                    )
                else:
                    seen[node.name] = node.lineno
    assert not offenders, "shadowed module-level defs:\n" + "\n".join(
        offenders
    )
