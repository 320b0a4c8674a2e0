"""Corpus-incremental near-dup filter (`operators/neardup_filter.py`):
ingest-time fuzzy rejection against a reference corpus, batch and
streaming (foreachBatch) tiers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


def test_filter_is_idempotent_and_a_subset(spark):
    """Algebra: output ⊆ input, and filtering an already-filtered batch is
    a no-op (survivors are by construction non-dups of the corpus)."""
    idx = build_neardup_index(corpus_df(spark))
    once = neardup_filter(batch_df(spark), idx)
    twice = neardup_filter(once, idx)
    kept_once = sorted(r.doc_id for r in once.collect())
    kept_twice = sorted(r.doc_id for r in twice.collect())
    assert kept_once == kept_twice
    all_ids = {r.doc_id for r in batch_df(spark).collect()}
    assert set(kept_once) <= all_ids


def test_full_ingest_pipeline_foreachbatch(spark, tmp_path):
    """The complete LLM-ingest flow in one foreachBatch body: per-row
    quality filter → exact dedup WITHIN the batch → fuzzy reject vs the
    reference corpus — each stage drops its own class of row."""
    from kafka_streams_dead_letter_publishing_spark.functions.text import fingerprint

    idx = build_neardup_index(corpus_df(spark))
    rows = [
        (20, "fresh document with plenty of distinct words to pass quality " * 2),
        (21, "FRESH  document with plenty of distinct words to pass quality " * 2),  # exact dup of 20 mod formatting
        (22, BASE.replace("dog", "cat")),  # near-dup of corpus doc 1
        (23, "junk"),  # fails quality
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(1).write.parquet(src)
    out = str(tmp_path / "out")

    def clean(batch, _id):
        staged = batch.filter(
            F.size(F.split(F.col("text"), r"\s+")) >= 10
        ).withColumn("fp", fingerprint(F.col("text")))
        exact = (
            staged.withColumn(
                "rk", F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
            )
            .filter(F.col("rk") == 1)
            .drop("rk", "fp")
        )
        neardup_filter(exact, idx).write.mode("append").parquet(out)

    q = (
        spark.readStream.schema("doc_id bigint, text string")
        .parquet(src)
        .writeStream.option("checkpointLocation", str(tmp_path / "ck"))
        .foreachBatch(clean)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    survivors = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert survivors == [20]  # 21 exact-dup'd, 22 corpus-rejected, 23 junk


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


def test_band_occupancy_cap_defuses_hot_keys_and_keeps_normal_recall(spark):
    """The boilerplate hot-key guard (r7): a phrase shared by many corpus
    docs puts them all in the same band buckets, whose candidate join is
    quadratic in the bucket.  With max_band_occupancy the hot keys drop
    from the index — candidates through them vanish — while dups of
    NORMAL docs keep their (non-hot) bands and are still rejected.  The
    documented trade: a dup reachable only through dropped keys passes."""
    from pyspark.sql import functions as F

    from kafka_streams_dead_letter_publishing_spark.sources.synth import synth_documents

    normal = synth_documents(spark, 40, planted_every=10**9)  # no planted dups
    boiler = spark.range(100, 140).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon zeta eta theta").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.lit(46).alias("n_chars"),
    )
    corpus = normal.unionByName(boiler).persist()

    batch = spark.createDataFrame(
        [
            # near-dup of normal doc 7 (its text + one word)
            (1000, [r.text for r in normal.filter(F.col("doc_id") == 7).collect()][0] + " wx"),
            # near-dup of the boilerplate
            (1001, "alpha beta gamma delta epsilon zeta eta theta iota"),
            # fresh document, no relation to the corpus
            (1002, "totally unrelated words nothing shared here at all ok"),
        ],
        "doc_id long, text string",
    )

    uncapped = build_neardup_index(corpus)
    kept_ids = {r.doc_id for r in neardup_filter(batch, uncapped).collect()}
    assert kept_ids == {1002}  # both dups rejected without the cap

    capped = build_neardup_index(corpus, max_band_occupancy=10)
    kept_capped = {r.doc_id for r in neardup_filter(batch, capped).collect()}
    # boilerplate dup now passes (its only bands were hot), normal dup
    # still rejected, fresh doc still passes
    assert kept_capped == {1001, 1002}
    # and the hot keys really left the index
    occ = capped.bands.groupBy("bk").count().agg(F.max("count")).collect()[0][0]
    assert occ <= 10
    corpus.unpersist()
