"""Repo-wide plan lint (tools/audit_plans.py): EVERY registry query's
executed plan must be free of scale anti-patterns — SinglePartition
serial stages (scalar-agg finals above partials are structurally
exempted), cartesian products, keyless joins, Python evaluation, and
sort-merge joins — except the five DOCUMENTED exceptions in the tool's
allowlist.  Per-family plan gates pin specific shapes; this catches the
query nobody wrote a gate for."""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_every_registry_plan_passes_the_audit():
    out = subprocess.run(
        [sys.executable, "tools/audit_plans.py"],
        cwd=REPO,
        env=dict(os.environ),
        capture_output=True,
        text=True,
        timeout=900,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, out.stderr[-2000:]
    summary = json.loads(lines[-1])
    findings = [json.loads(l) for l in lines[:-1]]
    not_allowed = [f for f in findings if not f.get("allowed")]
    assert summary["violations"] == 0 and not not_allowed, not_allowed
    assert out.returncode == 0
    # the allowlist must not silently rot: every documented exception is
    # still exercised by the plan it excuses
    exercised = {(f["query"], f["pattern"]) for f in findings if f.get("allowed")}
    sys.path.insert(0, str(REPO))
    from tools.audit_plans import ALLOWLIST  # noqa: E402

    assert exercised == set(ALLOWLIST), (exercised, set(ALLOWLIST))
