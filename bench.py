"""Benchmark harness: run the bench-tagged registry queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line.

Each query is fully materialized through the noop sink (forces complete
execution of every partition — no collect, no driver materialization).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dead-letter-engine-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES
    from kafka_streams_dead_letter_publishing_spark.sources.tables import TABLES, load_table

    # Warm-up outside the timed region: JVM/codegen spin-up and parquet
    # footer reads otherwise land entirely on the first measured query.
    from pyspark.sql import functions as F

    spark.range(1_000_000).select(F.sum("id")).collect()
    for t in TABLES:
        load_table(spark, sf_dir, t).limit(1).count()

    timings: dict[str, float] = {}
    for name, q in QUERIES.items():
        if "bench" not in q.tags:
            continue
        t0 = time.time()
        q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)

    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
