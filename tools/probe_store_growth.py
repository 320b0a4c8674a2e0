"""Epoch-SET store growth study (r13 verdict #4): measure what an
append-only sketch store costs as micro-batches accumulate, and what the
automated compaction cadence (``EventIngest(auto_compact_epochs=K)``)
buys back.

Two drives over the same deterministic batch stream:

* **plain** — no cadence: every ``process_batch`` appends one epoch
  row-set per store; readers re-merge ALL of them, file listings grow
  one write's worth of part files per batch.
* **cadence K** — the sketch stores fold to one epoch at a new
  generation dir whenever the epoch count passes K (swap-by-repoint;
  the events sink is never rewritten).

Every ``SAMPLE_EVERY`` batches both drives record: epoch count, part-file
count under the KMV mins dir, and the wall time of a full
``kmv_estimate(...).collect()`` read.  Prints a markdown table for
SCALE.md.

Run: ``python tools/probe_store_growth.py [N_BATCHES] [CADENCE]``
(defaults 100, 10).  Not part of pytest — the suite pins the bounded-
growth CONTRACT in
tests/test_ingest_pipeline.py::test_event_ingest_auto_compaction_bounds_store_growth;
this probe records the measured CURVE.
"""

from __future__ import annotations

import glob
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cadence = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sample_every = max(1, n_batches // 10)

    from pyspark.sql import SparkSession

    from kafka_streams_dead_letter_publishing_spark.operators.kmv import kmv_estimate
    from kafka_streams_dead_letter_publishing_spark.streaming.ingest_pipeline import (
        EventIngest,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("store-growth-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="store-growth-")
    drives = {
        "plain": EventIngest(f"{base}/plain", k=64),
        f"cadence{cadence}": EventIngest(
            f"{base}/auto", k=64, auto_compact_epochs=cadence
        ),
    }
    rows_per_batch = 200
    samples: dict[str, list[tuple[int, int, int, float]]] = {n: [] for n in drives}
    for b in range(1, n_batches + 1):
        rows = [
            (f"t{(b + i) % 4}", (b * 31 + i * 7) % 5000)
            for i in range(rows_per_batch)
        ]
        batch = spark.createDataFrame(rows, "event_type string, user_id long")
        for name, ing in drives.items():
            ing.process_batch(batch, b)
        if b % sample_every == 0 or b == n_batches:
            for name, ing in drives.items():
                epochs = (
                    spark.read.parquet(f"{ing.kmv_path}/stats")
                    .select("epoch").distinct().count()
                )
                files = len(glob.glob(f"{ing.kmv_path}/mins/*.parquet"))
                t0 = time.time()
                kmv_estimate(spark, ing.kmv_path, 64).collect()
                samples[name].append((b, epochs, files, time.time() - t0))

    print(f"\nStore growth: {n_batches} micro-batches x {rows_per_batch} rows, "
          f"KMV k=64, cadence {cadence} (gauge store: kmv/mins)\n")
    print("| batches | plain epochs | plain files | plain read s | "
          f"cadence{cadence} epochs | files | read s |")
    print("|---|---|---|---|---|---|---|")
    plain_key, auto_key = "plain", f"cadence{cadence}"
    for (b, e1, f1, t1), (_, e2, f2, t2) in zip(samples[plain_key], samples[auto_key]):
        print(f"| {b} | {e1} | {f1} | {t1:.2f} | {e2} | {f2} | {t2:.2f} |")
    gens = drives[auto_key]._sketch_gen
    print(f"\ngenerations rolled by the cadence drive: {gens}")
    spark.stop()


if __name__ == "__main__":
    main()
