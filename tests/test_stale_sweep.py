"""STALE_SWEEP round artifact (r14 verdict #5): the rotation-freshness
sweep `tools/stale_rows.py --json` records which registry rows changed
after their driver-CORRECTNESS window slot and whether they still pass
their oracle.  This test pins the newest artifact's freshness against the
git round boundary, so a recorded sweep can't silently go stale."""

from __future__ import annotations

import json
import pathlib
import re
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.stale_rows import (  # noqa: E402
    changed_files,
    default_base,
    stale_rows,
)


def _current_round() -> int:
    rounds = [
        int(m.group(1))
        for f in REPO.iterdir()
        if (m := re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f.name))
    ]
    return max(rounds, default=0) + 1


def _newest_artifact() -> tuple[int, pathlib.Path] | None:
    arts = [
        (int(m.group(1)), f)
        for f in REPO.iterdir()
        if (m := re.fullmatch(r"STALE_SWEEP_r(\d+)\.json", f.name))
    ]
    return max(arts, default=None)


def test_stale_sweep_artifact_is_fresh_and_green():
    newest = _newest_artifact()
    if newest is None:
        pytest.skip("no STALE_SWEEP artifact recorded yet (first use is r15)")
    rnd, path = newest
    art = json.loads(path.read_text())
    # structural contract, regardless of round
    for key in ("base", "head", "stale", "results", "failed"):
        assert key in art, key
    assert art["failed"] == [], f"{path.name} records oracle FAILs"
    assert set(art["results"]) == set(art["stale"]), (
        f"{path.name} under-reports: swept set != derived stale set"
    )
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES

    assert set(art["stale"]) <= set(QUERIES), "sweep names unknown rows"
    if rnd != _current_round():
        pytest.skip(
            f"{path.name} belongs to round {rnd} (current {_current_round()})"
            " — the boundary moved; a fresh sweep is due at this round's end"
        )
    # THIS round's artifact: its base must be the current round boundary
    assert art["base"] == default_base(), (
        f"{path.name} was generated against a different round boundary"
    )
    # freshness: if no engine module changed since the artifact's head,
    # the recorded stale set must equal the currently-derived one (the
    # artifact covers ALL of this round's churn); if engine code DID
    # change after the artifact, it is outdated — regenerate it at round
    # end (the failure message says exactly that).
    try:
        since_head = changed_files(art["head"])
    except subprocess.CalledProcessError:
        pytest.skip("artifact head commit not reachable in this checkout")
    engine_churn = {
        f
        for f in since_head
        if f.startswith("kafka_streams_dead_letter_publishing_spark/")
    }
    assert not engine_churn or set(art["stale"]) >= set(
        stale_rows(art["base"])
    ), (
        f"{path.name} predates engine churn {sorted(engine_churn)[:5]} — "
        "regenerate with tools/stale_rows.py --json at round end"
    )
    if not engine_churn:
        assert set(art["stale"]) == set(stale_rows(art["base"]))
