"""The driver-contract guards that round 1 lacked: bench.py's LAST stdout
line must be a compact, parseable headline JSON with the agreed keys.

r6 shipped a single fat JSON line (medians + all samples + streaming
detail) that outgrew the driver's tail-capture buffer — BENCH_r06 recorded
``parsed: null``.  The contract is now two lines: a ``detail`` line first
(unbounded: per-pass samples, per-batch streaming progress), then a
size-bounded headline LAST so tail capture can never truncate its front.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_bench_prints_headline_last():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_RUNS="2",  # contract run: shape, not statistics
        # r12 verdict "what's wrong" #2: the full 39-entry sweep under a
        # loaded box blew the 420 s margin; smoke mode runs the four
        # throughput entries + an 8-query representative subset and skips
        # the load-gate wait, so the always-run suite test holds its
        # timeout even under a parallel CPU burn
        SPARK_GRAFT_BENCH_SMOKE="1",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
        check=True,
    ).stdout
    json_lines = [l for l in out.splitlines() if l.startswith("{")]
    assert len(json_lines) == 2, out
    detail = json.loads(json_lines[0])
    assert "samples" in detail["detail"]

    # the headline is the LAST stdout line, full stop — tail capture of any
    # size that includes one whole line gets a parseable artifact
    assert out.splitlines()[-1] == json_lines[1]
    parsed = json.loads(json_lines[1])
    assert len(json_lines[1]) < 4096, len(json_lines[1])
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.001
    assert parsed["value"] > 0
    assert len(parsed["queries"]) >= 10
    assert all(v >= 0 for v in parsed["queries"].values())
    # the streaming + ingest entries are interleaved into the same passes
    # and every entry carries one sample per pass (r6 verdict #2)
    assert all(len(v) == 2 for v in detail["detail"]["samples"].values())
    for entry in (
        "dlt_streaming_roundtrip",
        "dlt_streaming_4batches",
        "docs_neardup_ingest_filter",
        "emb_ann_ingest_filter",
    ):
        assert entry in parsed["queries"], entry
    # throughput signal (r6 verdict #4): rows/sec for the operators a
    # training-data pipeline runs continuously, plus the streaming rate
    for entry in (
        "dlt_streaming_4batches",
        "docs_neardup_ingest_filter",
        "emb_ann_ingest_filter",
    ):
        assert parsed["rows_per_sec"][entry] is None or parsed["rows_per_sec"][entry] > 0
    # load-average capture: the r5 "weak bench" class is diagnosable only
    # if ambient box load is recorded with the numbers it contaminates
    assert len(parsed["env"]["load_avg_start"]) == 3
    assert len(parsed["env"]["load_avg_end"]) == 3
    assert parsed["env"]["cpus"] == 4


def test_bench_survives_non_integer_cpus():
    """SPARK_GRAFT_CPUS='*' is valid for Spark's master string (local[*]);
    the r6 ADVICE caught that int(cpus) at JSON-emit time would crash AFTER
    the whole run and discard every measurement."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="*",
        SPARK_GRAFT_BENCH_RUNS="1",
        SPARK_GRAFT_BENCH_SMOKE="1",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
        check=True,
    ).stdout
    parsed = json.loads(out.splitlines()[-1])
    assert parsed["env"]["cpus"] == "*"
    assert parsed["value"] > 0


def test_smoke_query_list_stays_registered():
    """Rot gate for the contract-mode subset: every _SMOKE_QUERIES name
    must be a bench-tagged registry row — a retirement that forgets this
    list would KeyError the always-run suite test in a confusing place."""
    import sys

    sys.path.insert(0, str(REPO))
    import bench

    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES

    bench_tagged = {n for n, q in QUERIES.items() if "bench" in q.tags}
    missing = set(bench._SMOKE_QUERIES) - bench_tagged
    assert not missing, missing
    assert len(bench._SMOKE_QUERIES) + 4 >= 10  # the headline-count contract
