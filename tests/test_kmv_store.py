"""KMV streamed store (operators/kmv.py): the merge law (streamed ==
one-shot bit-for-bit), epoch-SET crash safety, exactness below capacity
across batches, and the Python-reference estimate."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.kmv import (
    kmv_set_ops,
    KMV_K,
    KMV_SCALE,
    kmv_append,
    kmv_compact,
    kmv_estimate,
    kmv_read_mins,
    kmv_sketch,
)

K = 8  # small capacity so truncation paths exercise on tiny fixtures


def _rows(n_types: int = 3, n: int = 120):
    # user ids collide across types on purpose (distinct is per group)
    return [(f"t{i % n_types}", (i * 7) % 40) for i in range(n)]


def _df(spark, rows):
    return spark.createDataFrame(rows, "event_type string, user_id long")


def _py_sketch(rows, k):
    by_g: dict[str, set[str]] = {}
    for g, u in rows:
        by_g.setdefault(g, set()).add(
            hashlib.md5(str(u).encode()).hexdigest()[:13]
        )
    return {
        (g, h) for g, hs in by_g.items() for h in sorted(hs)[:k]
    }


def _mins_set(df):
    return {(r.group, r.h) for r in df.collect()}


def test_sketch_matches_python_reference(spark):
    rows = _rows()
    got = _mins_set(kmv_sketch(_df(spark, rows), "event_type", "user_id", K))
    assert got == _py_sketch(rows, K)


def test_streamed_equals_one_shot_bit_for_bit(spark, tmp_path):
    rows = _rows()
    path = str(tmp_path / "kmv")
    epochs = []
    for lo, hi in ((0, 40), (40, 41), (41, 120)):
        epochs.append(
            kmv_append(_df(spark, rows[lo:hi]), path, "event_type", "user_id", K)
        )
    assert epochs == [0, 1, 2]
    merged = _mins_set(kmv_read_mins(spark, path, K))
    oneshot = _mins_set(kmv_sketch(_df(spark, rows), "event_type", "user_id", K))
    assert merged == oneshot == _py_sketch(rows, K)


def test_exact_below_capacity_across_batches(spark, tmp_path):
    """A group whose distinct count stays under K must report the EXACT
    count no matter how the stream was batched (no batch ever
    truncated, so every hash survives the merge)."""
    rows = [("a", u) for u in range(K - 2)] + [("b", u) for u in range(3 * K)]
    path = str(tmp_path / "kmv")
    for lo, hi in ((0, 10), (10, len(rows))):
        kmv_append(_df(spark, rows[lo:hi]), path, "event_type", "user_id", K)
    est = {r.group: (r.nh, r.est) for r in kmv_estimate(spark, path, K).collect()}
    assert est["a"] == (K - 2, K - 2)  # exact below capacity
    nh_b, est_b = est["b"]
    assert nh_b == K  # at capacity: estimator path
    kth = max(h for g, h in _py_sketch(rows, K) if g == "b")
    assert est_b == ((K - 1) * KMV_SCALE) // int(kth, 16)


def test_replayed_batch_is_harmless(spark, tmp_path):
    """At-least-once replay needs no compensation: the sketch is a SET,
    so re-appending the same batch changes nothing in the merge."""
    rows = _rows()
    path = str(tmp_path / "kmv")
    kmv_append(_df(spark, rows), path, "event_type", "user_id", K)
    before = _mins_set(kmv_read_mins(spark, path, K))
    kmv_append(_df(spark, rows[:50]), path, "event_type", "user_id", K)
    assert _mins_set(kmv_read_mins(spark, path, K)) == before


def test_orphan_epochs_invisible_and_retry_heals(spark, tmp_path):
    """Crash-between-writes: mins at epoch E+1 land, stats write lost —
    the epoch-SET gate hides them; the retry allocates PAST the orphan
    and the healed store equals a one-shot sketch of the full stream."""
    rows = _rows()
    path = str(tmp_path / "kmv")
    epoch = kmv_append(_df(spark, rows[:60]), path, "event_type", "user_id", K)
    before = _mins_set(kmv_read_mins(spark, path, K))

    orphan = kmv_sketch(
        _df(spark, rows[60:]), "event_type", "user_id", K
    ).withColumn("epoch", F.lit(epoch + 1).cast("long"))
    orphan.write.mode("append").parquet(f"{path}/mins")
    assert _mins_set(kmv_read_mins(spark, path, K)) == before

    healed = kmv_append(_df(spark, rows[60:]), path, "event_type", "user_id", K)
    assert healed == epoch + 2
    assert _mins_set(kmv_read_mins(spark, path, K)) == _py_sketch(rows, K)


def test_empty_batch_is_a_noop_and_empty_store_raises(spark, tmp_path):
    path = str(tmp_path / "kmv")
    empty = _df(spark, [])
    with pytest.raises(Exception):
        kmv_read_mins(spark, path, K)
    e = kmv_append(_df(spark, _rows()), path, "event_type", "user_id", K)
    assert kmv_append(empty, path, "event_type", "user_id", K) == e


def test_compact_preserves_sketch_and_drops_orphans(spark, tmp_path):
    rows = _rows()
    src = str(tmp_path / "src")
    for lo, hi in ((0, 50), (50, 120)):
        kmv_append(_df(spark, rows[lo:hi]), src, "event_type", "user_id", K)
    orphan = kmv_sketch(
        _df(spark, [("zz", 1)]), "event_type", "user_id", K
    ).withColumn("epoch", F.lit(99).cast("long"))
    orphan.write.mode("append").parquet(f"{src}/mins")

    dst = str(tmp_path / "dst")
    kmv_compact(spark, src, dst, K)
    assert _mins_set(kmv_read_mins(spark, dst, K)) == _py_sketch(rows, K)
    assert spark.read.parquet(f"{dst}/stats").count() == 1
    assert (
        spark.read.parquet(f"{dst}/mins").filter(F.col("group") == "zz").count()
        == 0
    )


def test_streamed_registry_row_matches_one_shot_row(spark):
    """events_kmv_streamed_distinct (built through three kmv_append
    micro-batches) must report the same estimates as the one-shot
    events_kmv_distinct_users row on the same corpus — the merge law,
    proven at the registry surface."""
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    streamed = {
        (r.event_type, r.est_users)
        for r in QUERIES["events_kmv_streamed_distinct"].spark(spark, sf).collect()
    }
    # the one-shot row was retired from the registry r14 (its streamed
    # twin oracles the same SQL) — the function itself stays pinned here
    from kafka_streams_dead_letter_publishing_spark.plans.relational import (
        events_kmv_distinct_users,
    )

    oneshot = {
        (r.event_type, r.est_users)
        for r in events_kmv_distinct_users(spark, sf).collect()
    }
    assert streamed == oneshot and streamed


def test_streamed_registry_row_empty_corpus_is_typed_empty(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES

    pq_.write_table(
        pa.table({"event_type": pa.array([], pa.string()),
                  "user_id": pa.array([], pa.int64()),
                  # load_table's events branch inspects ts — keep the
                  # real table's column present even when empty
                  "ts": pa.array([], pa.timestamp("us"))}),
        str(tmp_path / "events.parquet"),
    )
    df = QUERIES["events_kmv_streamed_distinct"].spark(spark, str(tmp_path))
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "event_type", "n_sketch", "est_users",
    ]


def test_null_and_negative_keys_across_batches(spark, tmp_path):
    """r13 (r12 ADVICE hardening): NULL keys never enter the sketch
    (COUNT DISTINCT semantics — and a NULL h would sort differently per
    engine), negative keys do; the streamed store over a pmod batch
    split still equals the one-shot sketch of the same rows."""
    from pyspark.sql import functions as F

    from kafka_streams_dead_letter_publishing_spark.operators.kmv import (
    kmv_set_ops,
        kmv_append,
        kmv_read_mins,
        kmv_sketch,
    )

    rows = [("a", None), ("a", -7), ("a", -7), ("a", 3), ("b", None), ("b", -1)]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    sk = kmv_sketch(df, "event_type", "user_id", K)
    got = _mins_set(sk)
    # NULL keys absent; distinct non-null keys all present (below capacity)
    assert len([1 for g, _ in got if g == "a"]) == 2
    assert len([1 for g, _ in got if g == "b"]) == 1

    path = str(tmp_path / "kmv")
    for b in range(3):
        kmv_append(
            df.filter(F.pmod(F.coalesce(F.col("user_id"), F.lit(0)), F.lit(3)) == b),
            path,
            "event_type",
            "user_id",
            K,
        )
    assert _mins_set(kmv_read_mins(spark, path, K)) == got


# ── kmv_set_ops: theta-sketch union/intersection estimates ──────────────


def _py_set_ops(a_keys, b_keys, k):
    """Python reference of the exact-integer estimator in kmv_set_ops."""

    def hs(keys):
        return {
            hashlib.md5(str(x).encode()).hexdigest()[:13]
            for x in keys
            if x is not None
        }

    full_a, full_b = hs(a_keys), hs(b_keys)
    mins_a, mins_b = set(sorted(full_a)[:k]), set(sorted(full_b)[:k])
    u = sorted(mins_a | mins_b)[:k]
    nu = len(u)
    n_both = sum(1 for h in u if h in mins_a and h in mins_b)
    n_a_only = sum(1 for h in u if h in mins_a and h not in mins_b)
    n_b_only = sum(1 for h in u if h in mins_b and h not in mins_a)

    def est(nh, kth):
        return nh if nh < k else (k - 1) * KMV_SCALE // max(int(kth, 16), 1)

    est_union = est(nu, u[-1]) if u else 0

    def scaled(cnt):
        return cnt if nu < k else cnt * (est_union // k)

    sa = {x for x in a_keys if x is not None}
    sb = {x for x in b_keys if x is not None}
    return {
        "exact_a": len(sa),
        "exact_b": len(sb),
        "exact_union": len(sa | sb),
        "exact_intersection": len(sa & sb),
        "exact_a_minus_b": len(sa - sb),
        "exact_b_minus_a": len(sb - sa),
        "nh_a": len(mins_a),
        "nh_b": len(mins_b),
        "est_a": est(len(mins_a), max(mins_a) if mins_a else "0"),
        "est_b": est(len(mins_b), max(mins_b) if mins_b else "0"),
        "n_both": n_both,
        "est_union": est_union,
        "est_intersection": scaled(n_both),
        "est_a_minus_b": scaled(n_a_only),
        "est_b_minus_a": scaled(n_b_only),
    }


def _keys_df(spark, keys):
    return spark.createDataFrame([(x,) for x in keys], "user_id long")


def _setops_row(spark, a_keys, b_keys, k, **kw):
    row = kmv_set_ops(
        _keys_df(spark, a_keys), _keys_df(spark, b_keys), "user_id", k, **kw
    ).collect()
    assert len(row) == 1
    return row[0].asDict()


def test_set_ops_matches_python_reference_above_capacity(spark):
    # partial overlap, both sides well above K=8 capacity
    a = [i * 3 for i in range(40)]
    b = [i * 3 for i in range(20, 60)]
    got = _setops_row(spark, a, b, K)
    assert got == _py_set_ops(a, b, K)


def test_set_ops_exact_below_capacity(spark):
    a, b = [1, 2, 3, 4], [3, 4, 5]
    got = _setops_row(spark, a, b, K)
    assert got["est_union"] == got["exact_union"] == 5
    assert got["est_intersection"] == got["exact_intersection"] == 2
    assert got["est_a"] == 4 and got["est_b"] == 3
    assert got == _py_set_ops(a, b, K)


def test_set_ops_disjoint_and_identical(spark):
    a = list(range(30))
    b = list(range(100, 130))
    d = _setops_row(spark, a, b, K)
    assert d["n_both"] == 0 and d["est_intersection"] == 0
    assert d["exact_intersection"] == 0
    # disjoint: the union sample is all exclusive members
    assert d["est_a_minus_b"] + d["est_b_minus_a"] == K * (d["est_union"] // K)
    i = _setops_row(spark, a, a, K)
    # identical sets: every retained union hash is in both sketches, so
    # n_both == nu == K and est_intersection == K * (est_union DIV K)
    assert i["n_both"] == K
    assert i["est_union"] == i["est_a"] == i["est_b"]
    assert i["est_intersection"] == K * (i["est_union"] // K)
    assert i["est_a_minus_b"] == 0 and i["est_b_minus_a"] == 0
    assert i == _py_set_ops(a, a, K)


def test_set_ops_nulls_and_empty_sides(spark):
    a = [1, None, 2, None, 3]
    b = [None, 3]
    got = _setops_row(spark, a, b, K)
    assert got == _py_set_ops(a, b, K)
    assert got["exact_a"] == 3 and got["exact_b"] == 1

    e = _setops_row(spark, [None], [None], K)
    assert e["exact_union"] == 0 and e["est_union"] == 0
    assert e["n_both"] == 0 and e["est_intersection"] == 0


def test_set_ops_without_exact_skips_truth_columns(spark):
    got = _setops_row(spark, [1, 2], [2, 3], K, with_exact=False)
    assert set(got) == {
        "nh_a", "nh_b", "est_a", "est_b", "n_both", "est_union",
        "est_intersection", "est_a_minus_b", "est_b_minus_a",
    }


def test_set_ops_hypothesis_random_sets(spark):
    """Randomized parity sweep: arbitrary overlap shapes, sizes straddling
    the K=8 capacity on either side, negative keys — Spark must equal
    the Python reference on every column (hypothesis-lite: a seeded
    batch of shapes rather than @given, because each case spins Spark
    jobs and the deadline would dominate)."""
    import random

    rng = random.Random(41)
    for trial in range(8):
        na, nb = rng.randrange(0, 30), rng.randrange(0, 30)
        overlap = rng.randrange(0, min(na, nb) + 1)
        pool = rng.sample(range(-50, 200), na + nb - overlap) if na + nb else []
        a = pool[:na]
        b = pool[na - overlap : na - overlap + nb]
        got = _setops_row(spark, a or [None], b or [None], K)
        assert got == _py_set_ops(a or [None], b or [None], K), (trial, a, b)
