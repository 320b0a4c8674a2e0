"""Measure the streamed-drive scale levers the BENCH notes assert.

The `*_drive` bench entries run ~12 triggers of `maxFilesPerTrigger=1`
single-file batches at 8 state partitions — a fixture-scale layout whose
wall is claimed (BENCH_r15 notes, SCALE.md) to be trigger scheduling and
state-store overhead, with "source partitions and trigger batch size"
as the scale levers.  This probe MEASURES that claim on the as-of drive
shape (`streaming.joins.stream_asof_join`, how='left', the
events_asof_streamed fixture): same total rows, varying

* ``files``    — how many files each source batch is written as (the
  Kafka-partition stand-in: files per trigger = intra-trigger read
  parallelism),
* ``batches``  — how many trigger rounds the stream arrives over
  (inverse of trigger batch size),
* ``parts``    — ``spark.sql.shuffle.partitions`` at first run = the
  frozen state-store layout,
* ``store``    — the state-store PROVIDER (r16, the r15 verdict's #3):
  ``hdfs`` = the default JVM-heap HDFSBackedStateStoreProvider every
  drive runs on, ``rocksdb`` = RocksDBStateStoreProvider, the provider
  production uses when state outgrows executor heap (frozen per
  checkpoint, like the partition layout),
* ``scale``    — state-size multiplier: the sources are unioned with
  ``scale - 1`` id-shifted copies (disjoint user_id spaces, so join
  cardinality stays linear and state grows exactly ``scale``×).

Prints one JSON line per config: drive wall, per-trigger input rows and
execution time from StreamingQueryProgress, and rows/sec.  SCALE.md
cites the resulting table.

Usage: python tools/probe_stream_scale.py [sf_dir] [mode]

``mode`` (default ``asof``) selects the sweep:

* ``asof``    — the original as-of-drive lever matrix above.
* ``rocksdb`` — r17 (the r16 verdict's #5): the RocksDB MITIGATION
  knobs on the 12-trigger as-of drive, where the measured ~57 ms
  per-store-per-commit premium is at its most visible.  Rows: heap
  baseline, RocksDB default, RocksDB + changelog checkpointing
  (``rocksdb.changelogCheckpointing.enabled`` — commits upload a small
  changelog instead of snapshotting the store), RocksDB + eager
  snapshots (``minDeltasForSnapshot=2``) as the contrast direction.
* ``dlt``     — r17 (the r16 verdict's #4): the reference DLT runner's
  batch-size lever.  Same derived-records stream
  (``plans.dead_letter.derived_records``), constant total rows, split
  into {16, 4, 1} single-file triggers through the 4-sink
  ``DeadLetterStream.process_batch`` — the ``maxOffsetsPerTrigger``
  backpressure-equivalent for the parquet stand-in source.  Isolates
  per-trigger overhead from per-row throughput for the runner's
  backpressure-knob documentation.
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kafka_streams_dead_letter_publishing_spark.streaming.joins import (
        stream_asof_join,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("stream-scale-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    n_rows = purchases.count() + clicks.count()

    _STORES = {
        "hdfs": "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider",
        "rocksdb": "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    }
    _STORE_CONF = "spark.sql.streaming.stateStore.providerClass"

    def _scaled(df, id_col: str, scale: int):
        """``scale``× the rows via id-shifted copies in DISJOINT user_id
        spaces — every copy joins only within itself, so output and join
        work scale linearly while the state stores hold scale× rows."""
        out = df
        for k in range(1, scale):
            shift = F.lit(k * 10_000_000)
            out = out.unionByName(
                df.select(
                    (F.col(id_col) + shift).alias(id_col),
                    (F.col("user_id") + shift).alias("user_id"),
                    *[c for c in df.columns if c not in (id_col, "user_id")],
                )
            )
        return out

    _ROCKS_CHANGELOG = (
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    )
    _MIN_DELTAS = "spark.sql.streaming.stateStore.minDeltasForSnapshot"

    def _steal_ticks() -> int:
        """Cumulative hypervisor-steal ticks (/proc/stat field 9) — this
        VM suffers steal bursts on tens-of-minutes timescales (measured
        r16/r17: identical configs swinging 2×), so every timed drive
        records its own steal delta and a contaminated row
        self-identifies instead of silently poisoning the table."""
        with open("/proc/stat") as fh:
            return int(fh.readline().split()[8])

    def drive(
        files: int, batches: int, parts: int,
        store: str = "hdfs", scale: int = 1,
        rocks_changelog: bool = False, min_deltas: int | None = None,
    ) -> dict:
        base = tempfile.mkdtemp(prefix="stream-scale-")
        psrc, csrc = f"{base}/p", f"{base}/c"
        sp = _scaled(purchases, "purchase_id", scale)
        sc = _scaled(clicks, "click_id", scale)

        def _slice(df, col, b):
            return df.filter(
                F.pmod(F.coalesce(F.col(col), F.lit(0)), F.lit(batches)) == b
            ).repartition(files)

        _slice(sp, "purchase_id", 0).write.mode("append").parquet(psrc)
        _slice(sc, "click_id", 0).write.mode("append").parquet(csrc)
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        prev_store = spark.conf.get(_STORE_CONF, None)
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        spark.conf.set(_STORE_CONF, _STORES[store])
        spark.conf.set(_ROCKS_CHANGELOG, "true" if rocks_changelog else "false")
        if min_deltas is not None:
            spark.conf.set(_MIN_DELTAS, str(min_deltas))
        lt = (
            spark.readStream.schema("purchase_id long, user_id long, ts timestamp")
            .option("maxFilesPerTrigger", str(files))
            .parquet(psrc)
            .withWatermark("ts", "45 days")
        )
        rt = (
            spark.readStream.schema("user_id long, click_id long, click_ts timestamp")
            .option("maxFilesPerTrigger", str(files))
            .parquet(csrc)
            .withWatermark("click_ts", "45 days")
        )
        joined = stream_asof_join(
            lt,
            rt,
            on=["user_id"],
            left_ts="ts",
            right_ts="click_ts",
            right_payload=["click_id", "click_ts"],
            tolerance="INTERVAL 2 HOURS",
            how="left",
        )
        st0 = _steal_ticks()
        t0 = time.time()
        q = (
            joined.writeStream.format("parquet")
            .option("path", f"{base}/out")
            .option("checkpointLocation", f"{base}/ckpt")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            for b in range(1, batches):
                _slice(sp, "purchase_id", b).write.mode("append").parquet(psrc)
                _slice(sc, "click_id", b).write.mode("append").parquet(csrc)
                q.processAllAvailable()
            far = "2025-07-01 00:00:00"
            spark.sql(
                f"SELECT CAST(-1 AS LONG) purchase_id, CAST(-1 AS LONG) user_id,"
                f" TIMESTAMP '{far}' ts"
            ).coalesce(1).write.mode("append").parquet(psrc)
            spark.sql(
                f"SELECT CAST(-2 AS LONG) user_id, CAST(-1 AS LONG) click_id,"
                f" TIMESTAMP '{far}' click_ts"
            ).coalesce(1).write.mode("append").parquet(csrc)
            q.processAllAvailable()
            q.processAllAvailable()
            wall = round(time.time() - t0, 2)
            steal_sec = round((_steal_ticks() - st0) / os.sysconf("SC_CLK_TCK"), 1)
            trig = [
                {
                    "rows": int(p.numInputRows or 0),
                    "ms": int(dict(p.durationMs or {}).get("triggerExecution") or 0),
                }
                for p in q.recentProgress
            ]
        finally:
            q.stop()
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            if prev_store is None:
                spark.conf.unset(_STORE_CONF)
            else:
                spark.conf.set(_STORE_CONF, prev_store)
            spark.conf.unset(_ROCKS_CHANGELOG)
            if min_deltas is not None:
                spark.conf.unset(_MIN_DELTAS)
            shutil.rmtree(base, ignore_errors=True)
        rows = sum(t["rows"] for t in trig)
        ms = sum(t["ms"] for t in trig)
        return {
            "files_per_trigger": files,
            "batches": batches,
            "state_partitions": parts,
            "store": store,
            "state_scale": scale,
            "rocks_changelog": rocks_changelog,
            "min_deltas_for_snapshot": min_deltas,
            "steal_sec": steal_sec,
            "wall_sec": wall,
            "n_triggers": len(trig),
            "input_rows": rows,
            "trigger_ms": ms,
            "rows_per_sec": round(rows / (ms / 1000.0), 1) if ms else None,
        }

    def dlt_drive(batches: int) -> dict:
        """One full 4-sink DLT drive: the derived-records stream written
        as ``batches`` single-row-group files, consumed one file per
        trigger (the parquet stand-in for ``maxOffsetsPerTrigger``).
        Constant total rows across configs, so rows/s differences are
        pure per-trigger overhead."""
        from kafka_streams_dead_letter_publishing_spark.config import EngineConfig
        from kafka_streams_dead_letter_publishing_spark.plans.dead_letter import (
            derived_records,
        )
        from kafka_streams_dead_letter_publishing_spark.streaming.runner import (
            DeadLetterStream,
            parquet_sink_writer,
        )

        base = tempfile.mkdtemp(prefix="dlt-batch-lever-")
        derived = derived_records(spark, sf_dir)
        derived.repartition(batches).write.mode("overwrite").parquet(f"{base}/src")
        stream = DeadLetterStream(EngineConfig(), parquet_sink_writer(f"{base}/sinks"))
        st0 = _steal_ticks()
        t0 = time.time()
        q = (
            spark.readStream.schema(derived.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/src")
            .writeStream.option("checkpointLocation", f"{base}/ck")
            .foreachBatch(stream.process_batch)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            wall = round(time.time() - t0, 2)
            steal_sec = round((_steal_ticks() - st0) / os.sysconf("SC_CLK_TCK"), 1)
            trig = [
                {
                    "rows": int(p.numInputRows or 0),
                    "ms": int(dict(p.durationMs or {}).get("triggerExecution") or 0),
                }
                for p in q.recentProgress
                if int(p.numInputRows or 0) or
                int(dict(p.durationMs or {}).get("triggerExecution") or 0)
            ]
        finally:
            shutil.rmtree(base, ignore_errors=True)
        rows = sum(t["rows"] for t in trig)
        ms = sum(t["ms"] for t in trig)
        return {
            "dlt_batches": batches,
            "wall_sec": wall,
            "steal_sec": steal_sec,
            "n_triggers": len(trig),
            "input_rows": rows,
            "trigger_ms": ms,
            "rows_per_batch": rows // max(1, batches),
            "rows_per_sec": round(rows / (ms / 1000.0), 1) if ms else None,
        }

    mode = sys.argv[2] if len(sys.argv) > 2 else "asof"
    if mode == "dlt":
        dlt_drive(2)  # warm the JVM/streaming machinery (untimed config)
        for batches in (16, 4, 1):
            print(json.dumps(dlt_drive(batches)), flush=True)
        print(json.dumps({"mode": "dlt", "sf_dir": sf_dir}), flush=True)
    elif mode == "rocksdb":
        drive(1, 2, 8)  # warm-ups, one per provider (untimed config)
        drive(1, 2, 8, store="rocksdb")
        for store, changelog, min_deltas in (
            ("hdfs", False, None),      # heap baseline
            ("rocksdb", False, None),   # RocksDB default (snapshot commits)
            ("rocksdb", True, None),    # + changelog checkpointing
            ("rocksdb", False, 2),      # eager snapshots: the contrast
        ):
            print(
                json.dumps(
                    drive(
                        1, 12, 8, store, 1,
                        rocks_changelog=changelog, min_deltas=min_deltas,
                    )
                ),
                flush=True,
            )
        print(json.dumps({"mode": "rocksdb", "sf_dir": sf_dir}), flush=True)
    elif mode == "parts":
        # r17 optimization round: the r15 table measured 8 vs 32 state
        # partitions (8 won decisively) but never the DOWNWARD direction —
        # if per-store maintenance dominates at fixture scale, 4 or 2
        # stores per stateful operator should shave the floor further,
        # bounded by losing intra-trigger parallelism.  Each config runs
        # twice (steal bursts hit single rows; see steal_sec).
        drive(1, 2, 8)  # warm (untimed)
        for parts in (8, 4, 2):
            for _ in range(2):
                print(json.dumps(drive(1, 3, parts)), flush=True)
        print(json.dumps({"mode": "parts", "sf_dir": sf_dir}), flush=True)
    else:
        # warm the JVM/streaming machinery once per provider (untimed config)
        drive(1, 2, 8)
        drive(1, 2, 8, store="rocksdb")
        for files, batches, parts, store, scale in (
            (1, 3, 8, "hdfs", 1),     # the bench drive's layout
            (1, 12, 8, "hdfs", 1),    # 4x the triggers: trigger-overhead axis
            (4, 3, 8, "hdfs", 1),     # intra-trigger read parallelism axis
            (8, 3, 8, "hdfs", 1),
            (8, 3, 32, "hdfs", 1),    # + state-partition axis
            # state-store provider axis (r16): same layouts, RocksDB stores,
            # and both providers at 4x state so the per-row vs per-store-
            # instance cost split is visible
            (1, 3, 8, "rocksdb", 1),
            (1, 12, 8, "rocksdb", 1),
            (1, 3, 32, "rocksdb", 1),
            (1, 3, 8, "hdfs", 4),
            (1, 3, 8, "rocksdb", 4),
        ):
            print(json.dumps(drive(files, batches, parts, store, scale)), flush=True)
    print(json.dumps({"total_rows": n_rows, "sf_dir": sf_dir}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
