"""BENCH_FULL round artifact (r15 verdict #4): the driver's BENCH_r{N}
captures only a 2,000-char stdout tail, which truncates the per-query
median dict once the registry grew past ~100 entries — so bench.py also
writes the COMPLETE result to ``BENCH_FULL_r{N}.json`` at the repo root.
This test pins the newest artifact's structure and (for the current
round) its coverage against the live registry, the STALE_SWEEP pattern:
a recorded artifact can't silently under-report the bench surface."""

from __future__ import annotations

import json
import pathlib
import re

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


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
        if (m := re.fullmatch(r"BENCH_FULL_r(\d+)\.json", f.name))
    ]
    return max(arts, default=None)


def test_bench_full_artifact_is_complete_and_fresh():
    newest = _newest_artifact()
    if newest is None:
        pytest.skip("no BENCH_FULL artifact recorded yet (first use is r16)")
    rnd, path = newest
    art = json.loads(path.read_text())
    # structural contract, regardless of round
    for key in ("metric", "value", "queries", "samples", "env", "rows_per_sec"):
        assert key in art, key
    assert art["metric"] == "bench_total_sec"
    assert art["value"] > 0
    assert not art["env"]["smoke"], "smoke runs must never be recorded"
    n_runs = art["runs_per_query"]
    for name, runs in art["samples"].items():
        assert len(runs) == n_runs, (name, runs)
        assert name in art["queries"], f"sample {name} lacks a median"
    # every median is the median of its recorded samples (self-consistent)
    import statistics

    for name, med in art["queries"].items():
        assert med == round(statistics.median(art["samples"][name]), 3), name
    if rnd != _current_round():
        pytest.skip(
            f"{path.name} belongs to round {rnd} (current {_current_round()})"
            " — the boundary moved; a fresh bench run is due this round"
        )
    # THIS round's artifact must cover the CURRENT bench surface: every
    # bench-tagged registry row, both dlt streaming entries, every
    # ingest-filter entry, and every streamed *_drive entry.
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES

    bench_rows = {n for n, q in QUERIES.items() if "bench" in q.tags}
    missing = bench_rows - set(art["queries"])
    assert not missing, (
        f"{path.name} predates bench-tagged rows {sorted(missing)} — "
        "re-run bench.py to regenerate the round artifact"
    )
    assert "dlt_streaming_roundtrip" in art["queries"]
    assert "dlt_streaming_4batches" in art["queries"]
    drives = {n for n in art["queries"] if n.endswith("_drive")}
    assert drives == set(art["streamed_drives"]), (drives, art["streamed_drives"])
    for n in drives:
        assert art["rows_per_sec"].get(n) is not None, n
