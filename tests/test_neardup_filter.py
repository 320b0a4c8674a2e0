"""Corpus-incremental near-dup filter (`operators/neardup_filter.py`):
ingest-time fuzzy rejection against a reference corpus, batch and
streaming (foreachBatch) tiers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.neardup_filter import (
    build_neardup_index,
    neardup_filter,
)

BASE = "the quick brown fox jumps over the lazy dog again and again " * 3


def corpus_df(spark):
    return spark.createDataFrame(
        [
            (1, BASE),
            (2, "completely different reference text about spark engines " * 4),
        ],
        "doc_id bigint, text string",
    )


def batch_df(spark):
    return spark.createDataFrame(
        [
            (10, BASE),  # exact dup of corpus doc 1
            (11, BASE.replace("lazy", "sleepy")),  # near-dup of corpus doc 1
            (12, "entirely novel document with its own vocabulary " * 5),
            (13, "too short"),  # below shingle length: always passes
        ],
        "doc_id bigint, text string",
    )


def test_batch_filter_drops_corpus_dups_keeps_novel(spark):
    idx = build_neardup_index(corpus_df(spark))
    kept = sorted(
        r.doc_id for r in neardup_filter(batch_df(spark), idx).collect()
    )
    assert kept == [12, 13]


def test_threshold_is_respected(spark):
    """At threshold 100 only the EXACT dup (Jaccard == 1) is rejected."""
    idx = build_neardup_index(corpus_df(spark))
    kept = sorted(
        r.doc_id
        for r in neardup_filter(batch_df(spark), idx, threshold_pct=100).collect()
    )
    assert kept == [11, 12, 13]


def test_empty_batch_and_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    idx_empty = build_neardup_index(empty)
    # empty corpus: everything passes
    assert neardup_filter(batch_df(spark), idx_empty).count() == 4
    # empty batch: nothing out, schema preserved
    idx = build_neardup_index(corpus_df(spark))
    out = neardup_filter(empty, idx)
    assert out.count() == 0 and out.columns == ["doc_id", "text"]


def test_candidate_join_is_equi_join(spark):
    """Scale gate: band-key candidates via equi-join, no cartesian/BNLJ,
    and the anti-reject is a physical LeftAnti."""
    idx = build_neardup_index(corpus_df(spark))
    plan = (
        neardup_filter(batch_df(spark), idx)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_streaming_foreachbatch_matches_batch(spark, tmp_path):
    """The foreachBatch tier: the same filter over a 2-file stream equals
    the batch run over the union — the engine's batch==streaming
    contract, now for fuzzy ingest dedup."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    b = batch_df(spark)
    b.filter(F.col("doc_id") <= 11).coalesce(1).write.parquet(f"{src}/f1")
    b.filter(F.col("doc_id") >= 12).coalesce(1).write.parquet(f"{src}/f2")

    idx = build_neardup_index(corpus_df(spark))
    idx.bands.persist()
    idx.shingles.persist()

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        stream.writeStream.option("checkpointLocation", ck)
        .foreachBatch(
            lambda batch, _id: neardup_filter(batch, idx)
            .write.mode("append")
            .parquet(out)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    batch_kept = sorted(r.doc_id for r in neardup_filter(b, idx).collect())
    assert streamed == batch_kept == [12, 13]
    idx.bands.unpersist()
    idx.shingles.unpersist()
