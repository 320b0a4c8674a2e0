"""The driver-contract guards that round 1 lacked: bench.py must print one
parseable JSON line with the agreed keys, whatever else happens."""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_bench_prints_one_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
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
    assert len(json_lines) == 1, out
    parsed = json.loads(json_lines[0])
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.001
    assert parsed["value"] > 0
    assert len(parsed["queries"]) >= 10
    assert all(v >= 0 for v in parsed["queries"].values())
    # load-average capture: the r5 "weak bench" class is diagnosable only
    # if ambient box load is recorded with the numbers it contaminates
    assert len(parsed["env"]["load_avg_start"]) == 3
    assert len(parsed["env"]["load_avg_end"]) == 3
    assert parsed["env"]["cpus"] == 4
