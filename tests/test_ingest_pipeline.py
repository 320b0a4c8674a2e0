"""End-to-end tests for the composed self-growing ingest pipelines
(``streaming/ingest_pipeline.py``): real ``readStream``/``foreachBatch``
drives over multi-batch synthetic corpora, asserting cross-batch dedup
(against the growing store), greedy intra-batch dedup, and — for the
embedding twin — that the surviving corpus is immediately servable from
the partitioned IVF index it maintains.

Keeper identity is FIRST-ACCEPTED (stream arrival order), so with the
source repartitioned into unordered micro-batches the tests assert the
dedup INVARIANT — exactly one member of each planted dup pair survives —
rather than which member."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.sources.synth import (
    synth_documents,
    synth_embeddings,
)


def _stream_batches(spark, src_df, src_dir, ck_dir, body, n_files=3):
    src_df.repartition(n_files).write.mode("overwrite").parquet(src_dir)
    q = (
        spark.readStream.schema(src_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.option("checkpointLocation", ck_dir)
        .foreachBatch(body)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_embedding_ingest_grows_a_deduped_servable_index(spark, tmp_path):
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        ivf_search_batch,
        kmeans_fit_quantized,
    )
    from kafka_streams_dead_letter_publishing_spark.streaming.ingest_pipeline import (
        EmbeddingIngest,
    )

    # synth: every 10th vector is a near-parallel dup of its predecessor
    emb = synth_embeddings(spark, 300, planted_every=10).persist()
    cents = kmeans_fit_quantized(emb, k=4, iters=2)
    base = str(tmp_path / "emb_ingest")
    ingest = EmbeddingIngest(base, cents, min_cos=0.9)

    _stream_batches(
        spark, emb, str(tmp_path / "src"), str(tmp_path / "ck"), ingest.process_batch
    )

    accepted = {r.ref_id for r in spark.read.parquet(ingest.vectors_path).collect()}
    planted = set(range(10, 300, 10))
    bases = {v - 1 for v in planted}
    loners = set(range(300)) - planted - bases
    # parallel planted pairs collide in every table whatever their batch
    # placement: EXACTLY one member of each pair survives; every
    # unpaired vector survives (exact verify => precision 1.0)
    assert loners <= accepted
    for v in sorted(planted):
        assert len({v - 1, v} & accepted) == 1, (v - 1, v)
    assert len(accepted) == len(loners) + len(planted)

    # the IVF index holds exactly the accepted corpus and serves directly
    idx = spark.read.parquet(ingest.ivf_path)
    assert {r.vec_id for r in idx.select("vec_id").collect()} == accepted
    q7 = [list(map(float, r.embedding)) for r in emb.filter(F.col("vec_id") == 7).collect()][0]
    served = ivf_search_batch(idx, cents, [q7], nprobe=4, k=1).collect()
    assert served and served[0].vec_id == 7  # the vector finds itself
    emb.unpersist()


def test_document_ingest_grows_a_deduped_corpus(spark, tmp_path):
    from kafka_streams_dead_letter_publishing_spark.streaming.ingest_pipeline import (
        DocumentIngest,
    )

    docs = synth_documents(spark, 200, planted_every=5).persist()
    base = str(tmp_path / "doc_ingest")
    ingest = DocumentIngest(base, threshold_pct=60)

    _stream_batches(
        spark, docs, str(tmp_path / "src"), str(tmp_path / "ck"), ingest.process_batch
    )

    accepted = {r.doc_id for r in spark.read.parquet(ingest.corpus_path).collect()}
    planted = set(range(5, 200, 5))
    bases = {d - 1 for d in planted}
    loners = set(range(200)) - planted - bases
    # precision 1.0: no unpaired doc is ever dropped (verify is exact)
    assert loners <= accepted
    # banding recall on planted doc dups is probabilistic-but-near-1
    # (J ~ 0.95 ⇒ per-band collision ~0.9, 8 bands): at least one member
    # of every pair survives, and the both-survive (LSH miss) sliver is
    # bounded
    both = [d for d in planted if {d - 1, d} <= accepted]
    assert all({d - 1, d} & accepted for d in planted)
    assert len(both) <= max(1, len(planted) // 10), both
    docs.unpersist()


def test_embedding_ingest_is_incremental_not_restart(spark, tmp_path):
    """Feeding two corpus halves through two separate driver runs (new
    streaming query, same base_dir) must behave like one continuous run:
    the second run's batches dedup against the FIRST run's accepted
    store, including exact re-sends of already-accepted rows."""
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        kmeans_fit_quantized,
    )
    from kafka_streams_dead_letter_publishing_spark.streaming.ingest_pipeline import (
        EmbeddingIngest,
    )

    emb = synth_embeddings(spark, 100, planted_every=10).persist()
    cents = kmeans_fit_quantized(emb, k=3, iters=1)
    base = str(tmp_path / "emb2")
    first = emb.filter(F.col("vec_id") < 50)
    # second run re-sends ALL of the first half (late duplicates) plus new rows
    second = emb

    ingest = EmbeddingIngest(base, cents, min_cos=0.9)
    _stream_batches(spark, first, str(tmp_path / "s1"), str(tmp_path / "c1"), ingest.process_batch, n_files=2)
    _stream_batches(spark, second, str(tmp_path / "s2"), str(tmp_path / "c2"), ingest.process_batch, n_files=2)

    rows = spark.read.parquet(ingest.vectors_path).groupBy("ref_id").count().collect()
    accepted = {r.ref_id for r in rows}
    planted = set(range(10, 100, 10))
    bases = {v - 1 for v in planted}
    loners = set(range(100)) - planted - bases
    assert loners <= accepted
    for v in sorted(planted):
        assert len({v - 1, v} & accepted) == 1, (v - 1, v)
    # re-sent first-half rows were rejected as exact cosine-dups of the
    # store — nothing is double-accepted
    assert all(r["count"] == 1 for r in rows), [r for r in rows if r["count"] > 1][:3]
    emb.unpersist()
