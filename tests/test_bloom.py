"""Bloom-filter membership gate (operators/bloom.py).

Pins the three contracts the dedup gate rests on: zero false negatives,
a deterministic (hash-replayable) false-positive path, and associative
merge — plus hash parity with a pure-Python md5 reference so the DuckDB
oracle's bit-for-bit replay is guaranteed by construction.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.bloom import (
    WORD_BITS,
    bloom_build,
    bloom_maybe_contains,
    bloom_merge,
    key_positions,
)


def _py_positions(key: str, n_hashes: int, m_bits: int) -> list[int]:
    return [
        int(hashlib.md5(f"{key}:{j}".encode()).hexdigest()[:15], 16) % m_bits
        for j in range(1, n_hashes + 1)
    ]


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


def test_positions_match_python_reference(spark):
    keys = [f"key-{i}" for i in range(20)]
    got = {
        (r["k"], r["word_idx"] * WORD_BITS + r["bit"])
        for r in key_positions(_keys_df(spark, keys), "k", 4, 997).collect()
    }
    want = {(k, p) for k in keys for p in _py_positions(k, 4, 997)}
    assert got == want


def test_no_false_negatives(spark):
    keys = [f"doc-{i}" for i in range(200)]
    df = _keys_df(spark, keys)
    words = bloom_build(df, "k", n_hashes=5, m_bits=1 << 12)
    flags = bloom_maybe_contains(df, "k", words, n_hashes=5, m_bits=1 << 12)
    assert flags.filter(~F.col("maybe_seen")).count() == 0


def test_false_positive_path_is_deterministic(spark):
    # 64-bit filter + 50 keys saturates it: non-members MUST collide.
    members = [f"m-{i}" for i in range(50)]
    probes = [f"p-{i}" for i in range(50)]
    words = bloom_build(_keys_df(spark, members), "k", n_hashes=3, m_bits=64)
    flags = bloom_maybe_contains(
        _keys_df(spark, probes), "k", words, n_hashes=3, m_bits=64
    )
    flagged = {r["k"] for r in flags.filter("maybe_seen").collect()}
    assert flagged  # saturation forces false positives...
    # ...and they are exactly the keys whose md5 positions all collide
    set_bits = set()
    for k in members:
        set_bits.update(_py_positions(k, 3, 64))
    expect = {k for k in probes if set(_py_positions(k, 3, 64)) <= set_bits}
    assert flagged == expect


def test_merge_equals_joint_build(spark):
    a = _keys_df(spark, [f"a-{i}" for i in range(40)])
    b = _keys_df(spark, [f"b-{i}" for i in range(40)])
    joint = bloom_build(a.unionByName(b), "k", n_hashes=4, m_bits=1 << 10)
    merged = bloom_merge(
        bloom_build(a, "k", n_hashes=4, m_bits=1 << 10),
        bloom_build(b, "k", n_hashes=4, m_bits=1 << 10),
    )
    assert {tuple(r) for r in joint.collect()} == {tuple(r) for r in merged.collect()}


def test_build_is_partial_agg_no_window(spark):
    # the build must partial-aggregate (map-side bit_or) — per-partition-
    # bounded shuffle is the whole point of the sketch
    words = bloom_build(_keys_df(spark, ["x", "y"]), "k")
    plan = words._jdf.queryExecution().executedPlan().toString()
    assert "partial_bit_or" in plan, plan
    assert "Window" not in plan, plan


def test_bloom_streamed_store_equals_one_shot_replay_immune_and_heals(
    spark, tmp_path
):
    """bloom_append batch-by-batch must reconstruct EXACTLY the one-shot
    filter (bit_or is associative AND idempotent — so a replayed batch
    is a no-op, the kmv-style replay-immune member of the store family);
    orphan words from a crashed append stay invisible and the retry
    allocates past them (epoch-SET)."""
    from pyspark.sql import functions as F

    from kafka_streams_dead_letter_publishing_spark.operators.bloom import (
        bloom_append,
        bloom_build,
        bloom_compact,
        bloom_maybe_contains,
        bloom_read,
    )

    rows = [(f"fp{i}",) for i in range(200)]
    df = lambda lo, hi: spark.createDataFrame(rows[lo:hi], "key string")  # noqa: E731
    path = str(tmp_path / "bloom")
    assert bloom_append(df(0, 80), path, "key") == 0
    assert bloom_append(df(80, 81), path, "key") == 1

    # crashed append: words at epoch 2 land, stats write lost
    bloom_build(df(81, 200), "key").withColumn(
        "epoch", F.lit(2).cast("long")
    ).write.mode("append").parquet(f"{path}/words")
    partial = {(r.word_idx, r.word) for r in bloom_read(spark, path).collect()}
    assert partial == {
        (r.word_idx, r.word) for r in bloom_build(df(0, 81), "key").collect()
    }

    # retry heals past the orphan; merged filter == one-shot of the lot
    assert bloom_append(df(81, 200), path, "key") == 3
    want = {(r.word_idx, r.word) for r in bloom_build(df(0, 200), "key").collect()}
    assert {(r.word_idx, r.word) for r in bloom_read(spark, path).collect()} == want

    # replayed batch is a no-op (idempotent ORs)
    bloom_append(df(0, 100), path, "key")
    assert {(r.word_idx, r.word) for r in bloom_read(spark, path).collect()} == want

    # membership composes unchanged: every inserted key maybe_seen
    probe = spark.createDataFrame(rows[:20], "key string")
    got = {
        r.key: r.maybe_seen
        for r in bloom_maybe_contains(
            probe, "key", bloom_read(spark, path)
        ).collect()
    }
    assert all(got.values())

    # empty batch no-op; compact folds to one epoch, answers preserved
    assert bloom_append(
        spark.createDataFrame([], "key string"), path, "key"
    ) == 4
    dst = str(tmp_path / "dst")
    bloom_compact(spark, path, dst)
    assert {(r.word_idx, r.word) for r in bloom_read(spark, dst).collect()} == want
    assert spark.read.parquet(f"{dst}/stats").count() == 1
