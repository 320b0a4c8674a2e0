"""tools/stale_rows.py: the pre-commit freshness gate's import mapping
and span logic — pinned so the tool can't silently stop finding stale
rows (an under-reporting freshness gate is worse than none)."""

from __future__ import annotations

import ast
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import stale_rows  # noqa: E402

PKG = "kafka_streams_dead_letter_publishing_spark"


def test_imports_of_handles_both_styles():
    src = (
        f"from {PKG}.operators.bm25 import bm25_append, bm25_serve\n"
        f"import {PKG}.operators.pca\n"
        "import os\n"
        f"from {PKG}.functions.similarity import (\n    dot,\n    cosine,\n)\n"
    )
    mods = stale_rows._imports_of(ast.parse(src))
    assert f"{PKG}.operators.bm25" in mods
    assert f"{PKG}.operators.bm25.bm25_append" in mods
    assert f"{PKG}.operators.pca" in mods
    assert f"{PKG}.functions.similarity.dot" in mods
    assert "os" not in mods


def test_module_import_map_separates_top_level_from_helpers():
    src = (
        f"from {PKG}.operators.kmv import kmv_sketch\n"
        "def helper():\n"
        f"    from {PKG}.operators.bm25 import bm25_topk\n"
        "    return bm25_topk\n"
        "def other():\n"
        "    return 1\n"
    )
    top, per_fn = stale_rows._module_import_map(src)
    assert f"{PKG}.operators.kmv" in top
    assert all("bm25" not in m for m in top)
    assert f"{PKG}.operators.bm25.bm25_topk" in per_fn["helper"]
    assert "other" not in per_fn


def test_changed_spans_parses_hunk_headers():
    # synthesize a diff-shaped text through the regex path
    import re

    diff = "@@ -10,2 +12,3 @@ def f():\n@@ -1 +5 @@\n"
    spans = []
    for m in re.finditer(r"^@@ [^+]*\+(\d+)(?:,(\d+))? @@", diff, re.M):
        start = int(m.group(1))
        n = int(m.group(2)) if m.group(2) is not None else 1
        spans.append((start, start + max(n, 1) - 1))
    assert spans == [(12, 14), (5, 5)]


def test_clean_tree_vs_head_reports_nothing():
    """With base=HEAD and no working-tree edits, nothing is stale.  Run
    only when the tree is actually clean — during development the test
    degrades to checking the tool RUNS without raising."""
    out = subprocess.run(
        [sys.executable, "tools/stale_rows.py", "--base", "HEAD", "--list-only"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-500:]
    dirty = subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()
    if not dirty:
        assert "no stale rows" in out.stdout
