"""KMV (k-minimum-values) distinct sketch with a streamed store ([EXT]).

The registry row ``events_kmv_distinct_users`` (plans/relational.py) pins
the one-shot estimator — Bar-Yossef et al. 2002: the K smallest md5
values of a key column are a deterministic SET, the estimate
``(K-1) * 2^52 DIV kth_min`` is exact integer arithmetic, and groups
below capacity report their exact distinct count.  This module adds the
STREAMED store the r11 verdict asked for (#4): per-batch sketches append
under the repo's epoch contract so approximate-distinct stays current on
a growing event stream with zero re-scans, exactly like the BM25
postings (operators/bm25.py) and PCA moments (operators/pca.py) stores.

Merge law (what makes streaming correct): the union of two KMV sketches,
deduplicated and cut back to its K smallest, IS the KMV sketch of the
union of their inputs — so per-batch local sketches are sufficient
partials, and the streamed read is bit-identical to a one-shot sketch of
everything appended (test-pinned).  Exactness below capacity survives
batching: a group's merged sketch holds fewer than K hashes only if no
batch ever truncated it, i.e. every distinct key's hash is present.

Epoch contract (the r12 epoch-SET form, crash-retry safe): per-batch
mins land FIRST stamped with an epoch allocated ABOVE both the newest
stats epoch and any epoch already present in the mins files, the stats
row lands LAST, and readers fold only epochs that HAVE a stats row —
a crashed append leaves invisible orphans and a retry can never collide
with them.  Single serialized writer (the foreachBatch contract).
Re-sending the same keys is HARMLESS here, unlike bm25/moments: the
sketch is a set, duplicates vanish in the merge — at-least-once
delivery needs no reader-side compensation.

Scale shape: a batch sketch is one hash-shuffle (distinct) plus the
repo's two-phase top-K (partition-local window on (pid, group), global
rank over <= P*K survivors); the store grows by <= groups*K rows per
epoch — sketch metadata, never event data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.bm25 import _store_exists

KMV_K = 64
KMV_SCALE = 1 << 52  # 13 hex chars


def kmv_sketch(
    df: DataFrame, group_col: str, key_col: str, k: int = KMV_K
) -> DataFrame:
    """(group, h): the <= k smallest distinct 13-hex-char md5 values of
    ``key_col`` per ``group_col`` — fixed-width lowercase hex compares
    identically as a STRING in every engine, so the sketch itself is
    the cross-engine artifact.  Two-phase top-K: any global minimum is
    necessarily a partition-local minimum."""
    # NULL keys hash to NULL and are dropped — COUNT(DISTINCT key)
    # semantics (SQL distinct-count never counts NULL), and it removes a
    # latent cross-engine ordering divergence: Spark windows sort NULLs
    # FIRST, DuckDB's ROW_NUMBER sorts them LAST, so a NULL h surviving
    # into the top-K would shift kth/nh differently per engine
    h = (
        df.select(
            F.col(group_col).alias("group"),
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 13).alias("h"),
        )
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    staged = h.withColumn("pid", F.spark_partition_id())
    w_local = Window.partitionBy("pid", "group").orderBy(F.asc("h"))
    local = (
        staged.withColumn("rn", F.row_number().over(w_local))
        .filter(F.col("rn") <= k)
        .drop("pid", "rn")
    )
    w_global = Window.partitionBy("group").orderBy(F.asc("h"))
    return (
        local.withColumn("rn", F.row_number().over(w_global))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_append(
    batch_df: DataFrame,
    path: str,
    group_col: str,
    key_col: str,
    k: int = KMV_K,
) -> int:
    """Append one micro-batch's per-group KMV partials to the persisted
    store and advance the epoch (returned; unchanged for an empty
    batch).  Layout: ``{path}/mins`` (group, h, epoch) per-batch local
    sketches, ``{path}/stats`` one (epoch) row per completed append
    written LAST."""
    spark = batch_df.sparkSession
    epoch = -1
    if _store_exists(spark, f"{path}/stats"):
        epoch = (
            spark.read.parquet(f"{path}/stats").agg(F.max("epoch")).first()[0]
        )
    new_epoch = epoch + 1
    if _store_exists(spark, f"{path}/mins"):
        omax = (
            spark.read.parquet(f"{path}/mins").agg(F.max("epoch")).first()[0]
        )
        if omax is not None and omax >= new_epoch:
            new_epoch = omax + 1
    # one materialization: the sketch is <= groups*k rows of metadata
    sk = kmv_sketch(batch_df, group_col, key_col, k).localCheckpoint(
        eager=True
    )
    if not sk.count():
        return epoch
    sk.withColumn("epoch", F.lit(new_epoch).cast("long")).write.mode(
        "append"
    ).parquet(f"{path}/mins")
    spark.createDataFrame([(new_epoch,)], "epoch bigint").write.mode(
        "append"
    ).parquet(f"{path}/stats")
    return new_epoch


def kmv_read_mins(spark, path: str, k: int = KMV_K) -> DataFrame:
    """(group, h): the merged sketch over every COMPLETE epoch — union,
    dedup, retake the k smallest per group.  Bit-identical to
    ``kmv_sketch`` over everything appended (the KMV merge law,
    test-pinned)."""
    stats_df = spark.read.parquet(f"{path}/stats")
    if not stats_df.take(1):
        raise ValueError(
            f"kmv_read_mins: {path}/stats holds no rows — no append ever "
            "completed (stats are the completion gate)"
        )
    merged = (
        spark.read.parquet(f"{path}/mins")
        .join(
            F.broadcast(stats_df.select("epoch").distinct()),
            "epoch",
            "left_semi",
        )
        .select("group", "h")
        .distinct()
    )
    staged = merged.withColumn("pid", F.spark_partition_id())
    w_local = Window.partitionBy("pid", "group").orderBy(F.asc("h"))
    local = (
        staged.withColumn("rn", F.row_number().over(w_local))
        .filter(F.col("rn") <= k)
        .drop("pid", "rn")
    )
    w_global = Window.partitionBy("group").orderBy(F.asc("h"))
    return (
        local.withColumn("rn", F.row_number().over(w_global))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_estimate(spark, path: str, k: int = KMV_K) -> DataFrame:
    """(group, nh, est): the distinct-count estimate from the streamed
    store — exact (= nh) below capacity, else the Bar-Yossef
    ``(k-1)*2^52 DIV kth`` exact-integer form shared with the oracled
    registry row."""
    mins = kmv_read_mins(spark, path, k)
    km = mins.groupBy("group").agg(
        F.max("h").alias("kth"), F.count(F.lit(1)).alias("nh")
    )
    # GREATEST(.., 1): an all-zero-hex kth (md5 prefix collision at
    # h='0'*13, astronomically unlikely but possible) must yield a huge
    # estimate, not NULL/divide-by-zero — the power-iteration rescale
    # convention (r12 ADVICE)
    est = F.when(F.col("nh") < k, F.col("nh")).otherwise(
        F.expr(
            f"({k - 1}L * {KMV_SCALE}L) DIV "
            "GREATEST(CAST(conv(kth, 16, 10) AS BIGINT), 1L)"
        )
    )
    return km.select(
        "group", F.col("nh").cast("long").alias("nh"),
        est.cast("long").alias("est"),
    )


def kmv_compact(spark, src_path: str, dst_path: str, k: int = KMV_K) -> None:
    """Fold the per-epoch partials to ONE epoch-0 sketch at a NEW path
    (swap by repoint — a concurrent reader always sees a complete
    store); orphans from a crashed append are dropped by the epoch-SET
    read.  The merged sketch is preserved bit for bit (merge law)."""
    kmv_read_mins(spark, src_path, k).withColumn(
        "epoch", F.lit(0).cast("long")
    ).write.mode("errorifexists").parquet(f"{dst_path}/mins")
    spark.createDataFrame([(0,)], "epoch bigint").write.mode(
        "errorifexists"
    ).parquet(f"{dst_path}/stats")
