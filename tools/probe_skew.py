"""Skew-stress study on the planted-Zipf events table (r14, r13 verdict
#6): measure what a genuinely hot key does to shuffle balance, and that
the repo's two mitigations — the salted two-phase aggregation pattern
(``events_salted_type_counts``) and AQE's skew-join split — actually
bound task skew at scale-probe sizes.

Three legs, all on ``synth_events_zipf`` (user rank 1 carries ~ln2/lnN
≈ 6% of ALL events at N=100k):

1. **Partition balance** — rows per shuffle partition when hashing by
   ``user_id`` alone vs ``(user_id, salt16)``, at 32/128/512 partitions:
   the max/mean ratio IS task skew (straggler factor) for any
   shuffle-on-that-key stage.
2. **Salted aggregation** — wall time of the distinct-(user,type) count
   per user, unsalted vs pre-spread on the compound key (the
   events_salted_type_counts shape generalized to a hot group key).
3. **AQE skew join** — events ⋈ per-user dim on user_id as a forced
   sort-merge join, AQE skew-split ON vs OFF (thresholds scaled to probe
   size); reports wall time and whether the final plan shows the skew
   split (``skew=true`` reads).

Run: ``python tools/probe_skew.py [N_EVENTS]`` (default 2_000_000).
Prints a markdown table for SCALE.md.
"""

from __future__ import annotations

import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kafka_streams_dead_letter_publishing_spark.sources.synth import (
        ZIPF_USERS,
        synth_events_zipf,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("skew-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="skew-probe-")
    synth_events_zipf(spark, n_events).write.parquet(f"{base}/events")
    ev = spark.read.parquet(f"{base}/events")

    # ── leg 1: partition balance, plain vs salted hash ───────────────────
    print(f"\nPartition balance ({n_events} Zipf events, N={ZIPF_USERS}):\n")
    print("| partitions | plain max/mean | salted16 max/mean |")
    print("|---|---|---|")
    for parts in (32, 128, 512):
        def ratio(df):
            counts = [
                r.c
                for r in df.groupBy(F.spark_partition_id().alias("p"))
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            ]
            return max(counts) / (sum(counts) / len(counts))

        plain = ratio(ev.repartition(parts, "user_id"))
        salted = ratio(
            ev.withColumn("__salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
            .repartition(parts, "user_id", "__salt")
        )
        print(f"| {parts} | {plain:.2f}x | {salted:.2f}x |")

    # ── leg 2: salted two-phase aggregation wall time ────────────────────
    def timed(thunk):
        t0 = time.time()
        thunk()
        return time.time() - t0

    def unsalted():
        (
            ev.select("user_id", "event_type").dropDuplicates()
            .groupBy("user_id").agg(F.count(F.lit(1)).alias("n_types"))
            .write.mode("overwrite").format("noop").save()
        )

    def salted():
        pre = (
            ev.withColumn("__salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
            .select("user_id", "event_type", "__salt").dropDuplicates()
            .groupBy("user_id", "__salt")
            .agg(F.collect_set("event_type").alias("s"))
        )
        (
            pre.groupBy("user_id")
            .agg(F.size(F.array_distinct(F.flatten(F.collect_list("s")))).alias("n_types"))
            .write.mode("overwrite").format("noop").save()
        )

    for fn in (unsalted, salted):  # warm-up then measure
        fn()
    print("\nSalted aggregation (distinct event types per user):\n")
    print("| plan | wall s |")
    print("|---|---|")
    print(f"| unsalted | {timed(unsalted):.2f} |")
    print(f"| salted16 two-phase | {timed(salted):.2f} |")

    # ── leg 3: AQE skew join ─────────────────────────────────────────────
    dim = spark.range(1, ZIPF_USERS + 1).select(
        F.col("id").alias("user_id"), (F.col("id") % 97).alias("segment")
    )
    dim.write.parquet(f"{base}/dim")
    dimp = spark.read.parquet(f"{base}/dim")

    def run_join() -> str:
        # collect (97 rows), not a noop write: the write would execute a
        # CLONED QueryExecution and the captured plan would never run
        # (isFinalPlan=false — measured)
        j = ev.join(dimp, "user_id").groupBy("segment").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        j.collect()
        return j._jdf.queryExecution().executedPlan().toString()

    conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # scale AQE's skew thresholds to probe size (defaults assume 256MB
    # partitions; the probe's user_id-only shuffle payload is ~100KB per
    # hot partition — threshold 64k / factor 1.5 is the measured firing
    # point).  High shuffle parallelism makes the hot key's factor-over-
    # median visible (leg 1: 2.8x at 32 partitions, 33x at 512).
    conf.set("spark.sql.shuffle.partitions", "256")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.5")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    print("\nAQE skew join (events ⋈ users dim, forced sort-merge, 256 shuffle partitions):\n")
    print("| AQE skew split | wall s | plan shows skew reads |")
    print("|---|---|---|")
    for on in (False, True):
        conf.set("spark.sql.adaptive.skewJoin.enabled", str(on).lower())
        run_join()  # warm-up
        t0 = time.time()
        plan = run_join()
        wall = time.time() - t0
        fired = "SortMergeJoin(skew=true)" in plan and "AQEShuffleRead skewed" in plan
        print(f"| {'on' if on else 'off'} | {wall:.2f} | {'yes' if fired else 'no'} |")
    conf.set("spark.sql.shuffle.partitions", "32")
    spark.stop()


if __name__ == "__main__":
    main()
