"""Training-shard writer (operators/shards.py): balanced deterministic
sharding of the packer's segment map, manifest integrity, and the
consumer-side verify catching truncation and corruption."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.packing import (
    pack_corpus_segments,
)
from kafka_streams_dead_letter_publishing_spark.operators.shards import (
    read_manifest,
    verify_shards,
    write_training_shards,
)


@pytest.fixture(scope="module")
def segments(spark):
    docs = spark.createDataFrame(
        [(i, 7 + (i * 13) % 23) for i in range(200)], "doc_id long, n long"
    )
    return pack_corpus_segments(docs, "n", seq_len=64).persist()


def test_shards_are_balanced_and_complete(spark, segments, tmp_path):
    path = str(tmp_path / "shards")
    write_training_shards(segments, path, seqs_per_shard=10)

    man = read_manifest(spark, path).orderBy("shard_id").collect()
    n_seqs_total = segments.select("seq_id").distinct().count()
    assert sum(r.n_seqs for r in man) == n_seqs_total
    # every shard but the last holds exactly seqs_per_shard sequences
    assert all(r.n_seqs == 10 for r in man[:-1])
    assert 0 < man[-1].n_seqs <= 10
    # round-trip: on-disk rows == input rows, token totals preserved
    disk = spark.read.parquet(path)
    assert disk.count() == segments.count()
    assert (
        disk.agg(F.sum("n_toks")).first()[0]
        == segments.agg(F.sum("n_toks")).first()[0]
    )
    # a sequence never straddles shards
    straddle = (
        disk.select("seq_id", "shard_id").distinct()
        .groupBy("seq_id").count().filter("count > 1").count()
    )
    assert straddle == 0


def test_verify_passes_on_intact_shards(spark, segments, tmp_path):
    path = str(tmp_path / "ok")
    write_training_shards(segments, path, seqs_per_shard=16)
    assert verify_shards(spark, path).count() == 0


def test_verify_catches_missing_shard(spark, segments, tmp_path):
    path = str(tmp_path / "truncated")
    write_training_shards(segments, path, seqs_per_shard=16)
    victim = os.path.join(path, "shard_id=1")
    shutil.rmtree(victim)
    bad = verify_shards(spark, path).collect()
    assert [r.shard_id for r in bad] == [1]
    assert bad[0].actual_rows is None


def test_verify_catches_corrupt_shard(spark, segments, tmp_path):
    path = str(tmp_path / "corrupt")
    write_training_shards(segments, path, seqs_per_shard=16)
    # overwrite shard 0's parquet with one bogus row (valid parquet, wrong
    # content — exactly what the fingerprint must catch)
    victim = os.path.join(path, "shard_id=0")
    shutil.rmtree(victim)
    spark.createDataFrame(
        [(0, 999, 0, 1)], "seq_id long, doc_id long, tok_start long, n_toks long"
    ).write.parquet(victim)
    bad = verify_shards(spark, path).collect()
    assert [r.shard_id for r in bad] == [0]


def test_existing_path_refused(spark, segments, tmp_path):
    path = str(tmp_path / "dup")
    write_training_shards(segments, path, seqs_per_shard=16)
    with pytest.raises(Exception):
        write_training_shards(segments, path, seqs_per_shard=16)


def test_bad_args(segments):
    with pytest.raises(ValueError):
        write_training_shards(segments, "/tmp/never", seqs_per_shard=0)
