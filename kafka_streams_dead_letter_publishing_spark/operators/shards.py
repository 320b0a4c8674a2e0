"""Training-shard delivery ([EXT]): write the packed-sequence segment map
(`operators/packing.py`) as size-bounded, deterministically-numbered
parquet shards with a verifiable manifest — the hand-off format a training
job consumes (fixed shard sizes for balanced data loading; a manifest so
the consumer can verify completeness and integrity BEFORE burning GPU
hours on a truncated corpus).

Shard assignment is pure arithmetic on the packer's contiguous ``seq_id``
(``seq_id DIV seqs_per_shard``) — no shuffle beyond the one
``repartition`` that routes rows to their shard file, perfectly balanced
by construction (every shard except the last holds exactly
``seqs_per_shard`` sequences).  The manifest is one partial-agg pass:
per shard, the sequence count, row count, token sum, and an
order-insensitive content fingerprint (sum + xor of row hashes — commutes,
so it is partition-order independent; the same trick as a Merkle-less
checksum, computable identically at verify time).

``verify_shards`` re-derives the manifest from what is actually on disk
and diffs — the consumer-side completeness check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifest"


#: the segment-map columns both content fingerprints hash — ONE constant
#: so fp_sum and fp_xor can never silently diverge onto different bases
_FP_COLS = ("seq_id", "doc_id", "tok_start", "n_toks")


def _row_fp() -> F.Column:
    """64-bit row fingerprint over ``_FP_COLS`` (stable column order;
    xxhash64 is fine here — the fingerprint never crosses engines, it is
    written and verified by this module alone)."""
    return F.xxhash64(*_FP_COLS)


def _shard_stats(seg: DataFrame) -> DataFrame:
    return seg.groupBy("shard_id").agg(
        F.countDistinct("seq_id").alias("n_seqs"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        # order-insensitive content fingerprint: sum and xor of row hashes
        # (both commutative/associative => partition-order independent);
        # the sum accumulates in DECIMAL(38,0) — a long sum of 2^63-scale
        # hashes overflows under ANSI arithmetic
        F.sum(_row_fp().cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("fp_sum"),
        F.expr(
            f"CAST(bit_xor(xxhash64({', '.join(_FP_COLS)})) AS BIGINT)"
        ).alias("fp_xor"),
    )


def write_training_shards(
    segments: DataFrame,
    path: str,
    seqs_per_shard: int,
) -> None:
    """Write the segment map as ``shard_id=K`` parquet partitions plus a
    manifest.  ``segments`` is the `pack_corpus_segments` output
    ``(seq_id, doc_id, tok_start, n_toks)``; sequence ids start at 0 and
    are contiguous, so shards are balanced by construction."""
    if seqs_per_shard <= 0:
        raise ValueError(f"need seqs_per_shard > 0, got {seqs_per_shard}")
    sharded = segments.withColumn(
        "shard_id", F.expr(f"seq_id DIV {int(seqs_per_shard)}")
    )
    (
        sharded.repartition("shard_id")
        .sortWithinPartitions("seq_id", "doc_id")
        .write.mode("errorifexists")
        .partitionBy("shard_id")
        .parquet(path)
    )
    # manifest LAST: its presence marks the shard write complete (the same
    # gate-written-last crash ordering as the ingest stores)
    _shard_stats(sharded).write.mode("errorifexists").parquet(
        f"{path}/{MANIFEST_DIR}"
    )


def read_manifest(spark, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/{MANIFEST_DIR}")


def verify_shards(spark, path: str) -> DataFrame:
    """Diff the on-disk shards against the manifest: returns the frame of
    mismatching shard rows (empty == verified).  Missing shards appear as
    manifest rows with NULL actuals; corrupt/extra content as value
    mismatches."""
    actual = _shard_stats(
        spark.read.parquet(path).select(
            "seq_id", "doc_id", "tok_start", "n_toks", "shard_id"
        )
    )
    man = read_manifest(spark, path)
    joined = man.alias("m").join(
        actual.alias("a"), F.col("m.shard_id") == F.col("a.shard_id"), "full"
    )
    mismatch = (
        F.col("m.shard_id").isNull()
        | F.col("a.shard_id").isNull()
        | (F.col("m.n_seqs") != F.col("a.n_seqs"))
        | (F.col("m.n_rows") != F.col("a.n_rows"))
        | (F.col("m.n_tokens") != F.col("a.n_tokens"))
        | (F.col("m.fp_sum") != F.col("a.fp_sum"))
        | (F.col("m.fp_xor") != F.col("a.fp_xor"))
    )
    return joined.filter(mismatch).select(
        F.coalesce(F.col("m.shard_id"), F.col("a.shard_id")).alias("shard_id"),
        F.col("m.n_rows").alias("manifest_rows"),
        F.col("a.n_rows").alias("actual_rows"),
    )
