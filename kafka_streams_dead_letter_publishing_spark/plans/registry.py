"""Query registry machinery.

Each entry pairs a Spark implementation (DataFrame code — the engine surface)
with an equivalent ANSI-SQL oracle string DuckDB can run over the same
parquet tables.  Column names are aligned on both sides because the driver's
comparator sorts columns by name before hashing values.

Determinism policy (so order-insensitive value hashes match across engines):

* no raw ``sum()`` over doubles — every monetary/double aggregate goes
  through an exact DECIMAL cast, is summed exactly, and only then cast back
  to double (both engines produce the *same* exact decimal, so the same
  IEEE double);
* top-k always carries a unique tie-break key in its ordering;
* random content is never hashed — the dead-letter family checks lengths,
  counts and error messages, not generated string bytes (the reference's own
  tests do the same: ``ErrorHandlingTopologyTest.java:42-48``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None
    doc: str
    tags: tuple[str, ...] = field(default=())


QUERIES: dict[str, Query] = {}

#: rows retired from the driver registry at the 100-row hygiene cap but
#: whose (spark, oracle) pair stays test-pinned — the edge-case batteries
#: keep exercising them without consuming a rotation slot (r15; the r14
#: retirements predate this and live as plain functions)
RETIRED: dict[str, Query] = {}


def query(name: str, oracle: str | None, doc: str, tags: tuple[str, ...] = ()):
    """Register a Spark query implementation with its DuckDB oracle."""

    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def retired_query(name: str, oracle: str | None, doc: str, tags: tuple[str, ...] = ()):
    """Register into RETIRED: dropped from the driver rotation, kept
    runnable against its oracle by the test harness."""

    def deco(fn: SparkQuery) -> SparkQuery:
        RETIRED[name] = Query(name=name, spark=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


#: per-trigger progress of the LAST streamed drive, keyed (row, sf_dir) —
#: bench.py pops the per-row drive caches to force fresh drives and reads
#: these to report the REAL multi-batch drive throughput (r14 verdict #6:
#: the cached sink re-read understates what the streamed rows cost)
STREAM_DRIVE_STATS: dict[tuple[str, str], list[dict]] = {}


def _capture_drive_stats(row: str, sf_dir: str, q) -> None:
    """Record a finished StreamingQuery's per-trigger progress (input
    rows + trigger wall) for the bench's drive-throughput entries."""
    STREAM_DRIVE_STATS[(row, sf_dir)] = [
        {
            "input_rows": int(p.numInputRows or 0),
            "trigger_ms": int(
                dict(p.durationMs or {}).get("triggerExecution") or 0
            ),
        }
        for p in q.recentProgress
    ]


# ── streamed-drive source staging (r17 optimization) ─────────────────────
#
# Every *_drive bench entry times a FULL fresh drive (bench.py pops the
# row's sink cache).  Before r17, each fresh drive also re-ran the
# fixture-slicing Spark jobs (scan → pmod filter → coalesce(1) → parquet
# write, 3-8 jobs per drive) INSIDE the timed region — harness input
# preparation, not operator cost, and the exact thing bench.py already
# stages untimed for dlt_streaming_4batches ("Streaming source files are
# written once (untimed)").  These helpers write each slice ONCE per
# (process, sf_dir) into a staging dir, and the drive delivers a slice by
# HARDLINKING its data files into the watched source dir — a filesystem
# operation, so the timed drive measures the streaming machinery (trigger
# scheduling, state stores, sink commits) plus the operator's real work.
#
# The staging caches are deliberately NOT the sink caches bench.py pops:
# staged slices are pure pmod partitions of the immutable testdata inputs
# (the same contract as the bench's persisted ingest-filter indexes), not
# results of the computation being timed.

_DRIVE_SRC_STAGE: dict[tuple[str, str], str] = {}

_STAGE_CLEANUP_REGISTERED = False


def _cleanup_drive_stages() -> None:
    """atexit: remove every staging tree this process created (r17 advice:
    mkdtemp dirs were cached for the process lifetime and never removed)."""
    import shutil

    for base in _DRIVE_SRC_STAGE.values():
        shutil.rmtree(base, ignore_errors=True)
    _DRIVE_SRC_STAGE.clear()


def stage_drive_slices(
    sf_dir: str, key: str, builders: dict[str, Callable[[], DataFrame]]
) -> str:
    """Write each builder's parquet slice under a per-process staging dir,
    once per (row-family ``key``, ``sf_dir``); returns the staging base.
    Builders run only on the first drive of the process — later drives
    (bench passes 2..N) deliver the already-staged files.  Staging trees
    are reclaimed at interpreter exit (atexit), not leaked to the OS
    reaper."""
    import atexit
    import tempfile

    global _STAGE_CLEANUP_REGISTERED
    if not _STAGE_CLEANUP_REGISTERED:
        atexit.register(_cleanup_drive_stages)
        _STAGE_CLEANUP_REGISTERED = True
    base = _DRIVE_SRC_STAGE.get((key, sf_dir))
    if base is None:
        base = tempfile.mkdtemp(prefix=f"drive-stage-{key}-")
        for name, build in builders.items():
            build().write.mode("overwrite").parquet(f"{base}/{name}")
        _DRIVE_SRC_STAGE[(key, sf_dir)] = base
    return base


#: target input volume per state partition for the streamed drives —
#: keep each partition's store in the 10s-of-MB class so it fits memory
#: with headroom (guide §2/§5: size state partitions to DATA volume,
#: never to cores; r15/r17 measured that at fixture scale per-store
#: maintenance dominates, so the floor below is the measured optimum)
_STATE_PARTITION_TARGET_BYTES = 64 << 20

#: measured fixture-scale floor (r17 probe_stream_scale `parts`: 8 parts
#: 14.7 s, 2 parts 11.8-13.0 s on the as-of shape; r18 re-measured the
#: downward step — see OPTIMIZATION_r18.md)
_STATE_PARTITION_FLOOR = 2


def derive_state_partitions(spark, stage_base: str) -> int:
    """Volume-derived state-partition count for a streamed drive (r17
    verdict #9: the drives pinned a hardcoded fixture constant; a fresh
    checkpoint FREEZES numShufflePartitions, so a production-sized input
    driven through that code would run 2-partition state stores).  The
    staged source bytes are a filesystem-metadata read — no Spark job in
    the timed drive — and the result is clamped to [measured floor,
    session shuffle partitions] so a cluster-sized session keeps its
    configured parallelism once data volume warrants it."""
    import os

    total = 0
    for root, _dirs, files in os.walk(stage_base):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    try:
        session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        session_parts = _STATE_PARTITION_FLOOR
    derived = -(-total // _STATE_PARTITION_TARGET_BYTES)  # ceil
    return max(
        _STATE_PARTITION_FLOOR,
        min(derived, max(session_parts, _STATE_PARTITION_FLOOR)),
    )


def deliver_slice(stage_base: str, name: str, dst_dir: str) -> None:
    """Make a staged slice's data files visible in a watched file-stream
    source dir (hardlink; copy if the link fails).  Hidden files
    (``_SUCCESS``, CRCs) are skipped — the file-stream source ignores
    them anyway.  Re-delivery into the same dir gets a fresh name so the
    source sees it as a new file."""
    import os
    import shutil

    os.makedirs(dst_dir, exist_ok=True)
    src = os.path.join(stage_base, name)
    for f in sorted(os.listdir(src)):
        if f.startswith(("_", ".")):
            continue
        dst = os.path.join(dst_dir, f)
        n = 0
        while os.path.exists(dst):
            n += 1
            dst = os.path.join(dst_dir, f"redeliver-{n}-{f}")
        try:
            os.link(os.path.join(src, f), dst)
        except OSError:
            shutil.copy(os.path.join(src, f), dst)
