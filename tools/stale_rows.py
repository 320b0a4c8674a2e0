"""Close the driver-rotation freshness gap mechanically (r11 verdict #3).

The driver's CORRECTNESS window re-verifies each registry row at most
every other round, so a row whose implementing code changes AFTER its
window slot carries a stale green verdict until the rotation comes back
around (r11: the bm25/nbayes rows were changed post-window and only a
manual re-run proved them).  This tool derives the stale set from git
and re-runs exactly those rows through the local oracle gate:

1. BASE = the newest commit that touched a ``CORRECTNESS_r*.json``
   (the round boundary the driver wrote; override with ``--base REF``).
2. Changed files = ``git diff --name-only BASE`` (committed AND
   working-tree edits — this is a pre-commit habit, not a CI gate).
3. A registry row is STALE when
   - a changed engine module is imported anywhere in its plan module or
     referenced in its query function's source (operators/, functions/,
     sources/, streaming/ — one textual hop, which matches the repo
     convention of importing operators inside the query function), or
   - its own plan module changed inside the function's line span, or
   - its plan module changed OUTSIDE every query function span
     (module-level constants/helpers feed oracles and literals — be
     conservative and mark the whole module's rows).
4. With a scale-factor dir (default ``/root/testdata/sf0.01``) it execs
   ``tools/check_oracle.py <sf_dir> <stale rows...>`` and exits with its
   status; ``--list-only`` prints the stale set and exits 0/0.

Usage: python tools/stale_rows.py [sf_dir] [--base REF] [--list-only]
                                  [--json PATH]

``--json PATH`` additionally records the sweep as a round artifact
(r14 verdict #5): the derived stale set, the per-row check_oracle
verdicts, and the exact (base, head) commit pair — so the recorded
board covers code-changed-after-window rows without a judge having to
re-derive the sweep.  ``tests/test_stale_sweep.py`` pins the newest
artifact's freshness against the git round boundary.
"""

from __future__ import annotations

import inspect
import pathlib
import re
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PKG = "kafka_streams_dead_letter_publishing_spark"


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def default_base() -> str:
    """Newest commit touching any driver CORRECTNESS file — the round
    boundary; everything after it is this round's unverified churn."""
    out = _git("log", "-1", "--format=%H", "--", "CORRECTNESS_r*.json").strip()
    return out or "HEAD"


def changed_files(base: str) -> set[str]:
    lines = _git("diff", "--name-only", base).splitlines()
    # a brand-new untracked module is invisible to `git diff` — union in
    # untracked files so a not-yet-committed operator still flags its rows
    lines += _git("ls-files", "--others", "--exclude-standard").splitlines()
    return {ln.strip() for ln in lines if ln.strip().endswith(".py")}


def changed_spans(base: str, path: str) -> list[tuple[int, int]]:
    """(start, end) new-file line ranges touched since ``base``."""
    try:
        diff = _git("diff", "-U0", base, "--", path)
    except subprocess.CalledProcessError:
        return []
    spans = []
    for m in re.finditer(r"^@@ [^+]*\+(\d+)(?:,(\d+))? @@", diff, re.M):
        start = int(m.group(1))
        n = int(m.group(2)) if m.group(2) is not None else 1
        spans.append((start, start + max(n, 1) - 1))
    return spans


def _imports_of(node) -> set[str]:
    """Engine modules an AST subtree imports — the named module and, for
    ``from X import a, b``, the X.a / X.b sub-modules (the repo imports
    operators either way)."""
    import ast

    mods: set[str] = set()
    for n in ast.walk(node):
        if isinstance(n, ast.Import):
            mods.update(a.name for a in n.names if a.name.startswith(PKG))
        elif isinstance(n, ast.ImportFrom) and (n.module or "").startswith(PKG):
            mods.add(n.module)
            mods.update(f"{n.module}.{a.name}" for a in n.names)
    return mods


def _module_import_map(mod_src: str) -> tuple[set[str], dict[str, set[str]]]:
    """(top-level imports, {function name: imports inside it}) for a plan
    module — top-level imports taint every row of the module; a helper's
    imports taint only the rows whose source references the helper."""
    import ast

    tree = ast.parse(mod_src)
    top: set[str] = set()
    per_fn: dict[str, set[str]] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            got = _imports_of(node)
            if got:
                per_fn[node.name] = got
        else:
            top |= _imports_of(node)
    return top, per_fn


def stale_rows(base: str) -> dict[str, str]:
    """{row name: reason} for every registry row needing a local re-run."""
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES

    changed = changed_files(base)
    changed_mods = {
        f[:-3].replace("/", ".") for f in changed if f.startswith(f"{PKG}/")
    }
    if not changed_mods:
        return {}

    stale: dict[str, str] = {}
    plan_rows: dict[str, list[str]] = {}
    for name, q in QUERIES.items():
        plan_rows.setdefault(q.spark.__module__, []).append(name)

    for mod, names in plan_rows.items():
        mod_path = mod.replace(".", "/") + ".py"
        mod_src = (REPO / mod_path).read_text()
        spans = changed_spans(base, mod_path) if mod_path in changed else []
        fns = {n: QUERIES[n].spark for n in names}
        fn_spans: dict[str, tuple[int, int] | None] = {}
        for n, fn in fns.items():
            try:
                lines, start = inspect.getsourcelines(fn)
                fn_spans[n] = (start, start + len(lines) - 1)
            except (OSError, TypeError):
                fn_spans[n] = None
        top_imports, helper_imports = _module_import_map(mod_src)
        top_hit = sorted(top_imports & changed_mods)
        # did the plan module change OUTSIDE every query function span?
        outside = any(
            not any(
                s is not None and s[0] <= a and b <= s[1]
                for s in fn_spans.values()
            )
            for (a, b) in spans
        )
        for n, fn in fns.items():
            src = inspect.getsource(fn)
            fn_hit = set(_imports_of(__import__("ast").parse(src)))
            # one textual hop: a helper this row's source references
            # taints the row with the helper's own imports
            for helper, mods_h in helper_imports.items():
                if helper != n and re.search(rf"\b{re.escape(helper)}\b", src):
                    fn_hit |= mods_h
            fn_hit = sorted(fn_hit & changed_mods)
            span = fn_spans[n]
            in_span = span is not None and any(
                not (b < span[0] or a > span[1]) for (a, b) in spans
            )
            if in_span:
                stale[n] = f"query function changed in {mod_path}"
            elif outside and spans:
                stale[n] = f"{mod_path} changed outside query spans"
            elif fn_hit:
                stale[n] = f"imports changed module(s): {', '.join(fn_hit)}"
            elif top_hit:
                stale[n] = (
                    f"plan module top-level imports changed module(s): "
                    f"{', '.join(top_hit)}"
                )
    return stale


def run_sweep_artifact(base: str, sf_dir: str, json_path: str) -> int:
    """Run the sweep and record it as a round artifact (exit 1 on FAIL)."""
    import json

    stale = stale_rows(base)
    results: dict[str, str] = {}
    failed: list[str] = []
    out_lines: list[str] = []
    if stale:
        proc = subprocess.run(
            [sys.executable, str(REPO / "tools" / "check_oracle.py"), sf_dir]
            + sorted(stale),
            capture_output=True,
            text=True,
        )
        out_lines = proc.stdout.splitlines()
        for line in out_lines:
            m = re.match(r"(PASS|FAIL|rows-only) (\S+?):", line)
            if m:
                results[m.group(2)] = m.group(1)
        failed = sorted(n for n, v in results.items() if v == "FAIL")
        # rows the subprocess never reported (a crash mid-run) count as
        # failures — an artifact must never under-report
        failed += sorted(set(stale) - set(results))
    artifact = {
        "base": base,
        "head": _git("rev-parse", "HEAD").strip(),
        "dirty": bool(_git("status", "--porcelain").strip()),
        "sf_dir": sf_dir,
        "stale": dict(sorted(stale.items())),
        "results": dict(sorted(results.items())),
        "failed": failed,
    }
    pathlib.Path(json_path).write_text(json.dumps(artifact, indent=1) + "\n")
    for line in out_lines:
        print(line)
    print(
        f"sweep artifact {json_path}: {len(stale)} stale, "
        f"{len(failed)} failed (base {base[:12]})"
    )
    return 1 if failed else 0


def main(argv: list[str]) -> int:
    base = None
    list_only = False
    json_path = None
    sf_dir = "/root/testdata/sf0.01"
    args = list(argv)
    while args:
        a = args.pop(0)
        if a == "--base":
            base = args.pop(0)
        elif a == "--list-only":
            list_only = True
        elif a == "--json":
            json_path = args.pop(0)
        else:
            sf_dir = a
    base = base or default_base()
    if json_path:
        return run_sweep_artifact(base, sf_dir, json_path)
    stale = stale_rows(base)
    if not stale:
        print(f"no stale rows since {base[:12]}")
        return 0
    for n, why in sorted(stale.items()):
        print(f"STALE {n}: {why}")
    if list_only:
        return 0
    return subprocess.call(
        [sys.executable, str(REPO / "tools" / "check_oracle.py"), sf_dir]
        + sorted(stale)
    )


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
