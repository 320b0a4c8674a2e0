"""r17 drive-source staging (plans/registry.stage_drive_slices /
deliver_slice): staged slices are written once per process, delivered by
hardlink with identical rows, and re-delivery gets a fresh name so a
file-stream source sees it as a new file."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.plans.registry import (
    _DRIVE_SRC_STAGE,
    deliver_slice,
    stage_drive_slices,
)


def test_stage_once_and_deliver_identical_rows(spark, tmp_path):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10).select(F.col("id").alias("v")).coalesce(1)

    key = "test-stage-once"
    try:
        base = stage_drive_slices("sfX", key, {"s0": build})
        assert calls["n"] == 1
        # second call: same base, builder NOT re-run
        assert stage_drive_slices("sfX", key, {"s0": build}) == base
        assert calls["n"] == 1

        dst = str(tmp_path / "src")
        deliver_slice(base, "s0", dst)
        files = [f for f in os.listdir(dst) if not f.startswith(("_", "."))]
        assert len(files) == 1
        got = sorted(r.v for r in spark.read.parquet(dst).collect())
        assert got == list(range(10))

        # re-delivery into the same dir: fresh name, rows double
        deliver_slice(base, "s0", dst)
        files = [f for f in os.listdir(dst) if not f.startswith(("_", "."))]
        assert len(files) == 2 and len(set(files)) == 2
        got = sorted(r.v for r in spark.read.parquet(dst).collect())
        assert got == sorted(list(range(10)) * 2)
    finally:
        _DRIVE_SRC_STAGE.pop((key, "sfX"), None)
