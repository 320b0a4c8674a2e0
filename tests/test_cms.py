"""Count-min sketch (operators/cms.py).

Pins the contracts the heavy-hitter query rests on: the one-sided error
guarantee (estimate >= true count, always), exactness when the sketch is
wide enough that no cells collide, associative merge, hash parity with a
pure-Python md5 reference (so the DuckDB oracle's bit-for-bit replay is
guaranteed by construction), and the partial-agg build plan.
"""

from __future__ import annotations

import hashlib
from collections import Counter

from kafka_streams_dead_letter_publishing_spark.operators.cms import (
    cms_build,
    cms_estimate,
    cms_merge,
    _cells,
)


def _py_cell(key: str, row: int, width: int) -> int:
    return int(hashlib.md5(f"{key}#{row}".encode()).hexdigest()[:15], 16) % width


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


def _est_map(spark, keys, depth, width):
    df = _keys_df(spark, keys)
    sketch = cms_build(df, "k", depth=depth, width=width)
    est = cms_estimate(df, "k", sketch, depth=depth, width=width)
    return {r["k"]: r["est_count"] for r in est.collect()}


def test_cells_match_python_reference(spark):
    keys = [f"key-{i}" for i in range(20)]
    got = {
        (r["k"], r["j"], r["col"])
        for r in _cells(_keys_df(spark, keys), "k", 4, 509).collect()
    }
    want = {(k, j, _py_cell(k, j, 509)) for k in keys for j in range(1, 5)}
    assert got == want


def test_never_underestimates_and_exact_when_wide(spark):
    # Zipf-ish multiset: key-0 appears 64 times, key-1 32, ...
    keys = [f"key-{i}" for i in range(8) for _ in range(64 >> i)]
    truth = Counter(keys)
    # narrow sketch (collisions likely): overestimate-only
    for k, est in _est_map(spark, keys, depth=3, width=16).items():
        assert est >= truth[k], (k, est, truth[k])
    # wide sketch: with 8 distinct keys in 4x4096 cells, any collision in
    # ALL 4 rows is md5-deterministic; verify exactness via the Python ref
    cells = {
        j: Counter(_py_cell(k, j, 4096) for k in truth) for j in range(1, 5)
    }
    collision_free = all(
        max(cells[j][_py_cell(k, j, 4096)] for k in truth) >= 1 for j in cells
    )
    assert collision_free
    wide = _est_map(spark, keys, depth=4, width=4096)
    for k, n in truth.items():
        # exact unless some OTHER key shares this key's cell in every row
        colliders = [
            any(
                _py_cell(o, j, 4096) == _py_cell(k, j, 4096)
                for o in truth
                if o != k
            )
            for j in range(1, 5)
        ]
        if not all(colliders):
            assert wide[k] == n, (k, wide[k], n)


def test_merge_equals_joint_build(spark):
    a = _keys_df(spark, [f"a-{i % 7}" for i in range(40)])
    b = _keys_df(spark, [f"b-{i % 5}" for i in range(40)])
    joint = cms_build(a.unionByName(b), "k", depth=3, width=64)
    merged = cms_merge(
        cms_build(a, "k", depth=3, width=64),
        cms_build(b, "k", depth=3, width=64),
    )
    assert {tuple(r) for r in joint.collect()} == {tuple(r) for r in merged.collect()}


def test_build_is_partial_agg_no_window(spark):
    # the build must partial-aggregate (map-side partial_count) — the
    # shuffle carrying <= d*w pre-summed cells per partition is the point
    sketch = cms_build(_keys_df(spark, ["x", "y", "x"]), "k")
    plan = sketch._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, plan
    assert "Window" not in plan, plan


# ── KMV distinct sketch (plans/relational.events_kmv_distinct_users) ─────


def _kmv_py(keys, k=64):
    hs = sorted({hashlib.md5(str(u).encode()).hexdigest()[:13] for u in keys})
    mins = hs[:k]
    if len(mins) < k:
        return len(mins), mins
    return (k - 1) * (1 << 52) // int(mins[-1], 16), mins


def test_kmv_merge_is_union_then_retake_k():
    """Two partial sketches merge by unioning their min-sets and
    re-taking the K smallest — the result is EXACTLY the sketch of the
    combined stream (KMV's defining property; what makes per-partition /
    per-batch builds composable like CMS cells)."""
    a = [f"user{i}" for i in range(500)]
    b = [f"user{i}" for i in range(300, 900)]  # overlapping
    _, mins_a = _kmv_py(a)
    _, mins_b = _kmv_py(b)
    merged = sorted(set(mins_a) | set(mins_b))[:64]
    _, mins_ab = _kmv_py(a + b)
    assert merged == mins_ab


def test_kmv_estimator_error_and_exact_below_capacity():
    est, _ = _kmv_py([f"u{i}" for i in range(2000)])
    assert abs(est - 2000) / 2000 < 0.4  # ~1/sqrt(62) expected, bound loose
    est_small, mins = _kmv_py(["x", "y", "z"])
    assert est_small == 3 and len(mins) == 3  # exact below capacity


def test_kmv_registry_row_matches_python_reference(spark):
    """The Spark two-phase top-K + integer estimate must equal the pure
    Python KMV on the same rows, per event type (the same construction
    the DuckDB oracle replays — three-way agreement by transitivity)."""
    from kafka_streams_dead_letter_publishing_spark.plans.relational import (
        events_kmv_distinct_users,
    )

    got = {
        r.event_type: (r.exact_users, r.est_users)
        for r in events_kmv_distinct_users(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    import duckdb

    rows = duckdb.sql(
        "SELECT event_type, user_id FROM "
        "'/root/testdata/sf0.001/events.parquet'"
    ).fetchall()
    by_type: dict = {}
    for t, u in rows:
        by_type.setdefault(t, []).append(u)
    for t, users in by_type.items():
        est, _ = _kmv_py(users)
        exact = len(set(users))
        assert got[t] == (exact, est), t


def test_cms_streamed_store_equals_one_shot_and_heals(spark, tmp_path):
    """cms_append batch-by-batch must reconstruct EXACTLY the one-shot
    sketch (cell sums are associative); orphan cells from a crashed
    append stay invisible and the retry allocates PAST them (epoch-SET,
    same contract as the bm25/moments/kmv stores)."""
    from kafka_streams_dead_letter_publishing_spark.operators.cms import (
        cms_append,
        cms_build,
        cms_compact,
        cms_estimate,
        cms_read,
    )

    from pyspark.sql import functions as F

    rows = [(f"k{i % 17}",) for i in range(300)]
    df = lambda lo, hi: spark.createDataFrame(rows[lo:hi], "key string")  # noqa: E731
    path = str(tmp_path / "cms")
    assert cms_append(df(0, 120), path, "key") == 0
    assert cms_append(df(120, 121), path, "key") == 1

    # crashed append: cells at epoch 2 land, stats write lost
    orphan = cms_build(df(121, 300), "key").withColumn(
        "epoch", F.lit(2).cast("long")
    )
    orphan.write.mode("append").parquet(f"{path}/cells")
    partial = {(r.j, r.col, r.cnt) for r in cms_read(spark, path).collect()}
    want_partial = {
        (r.j, r.col, r.cnt) for r in cms_build(df(0, 121), "key").collect()
    }
    assert partial == want_partial  # orphan invisible

    # retry heals past the orphan; merged sketch == one-shot of the lot
    assert cms_append(df(121, 300), path, "key") == 3
    got = {(r.j, r.col, r.cnt) for r in cms_read(spark, path).collect()}
    want = {(r.j, r.col, r.cnt) for r in cms_build(df(0, 300), "key").collect()}
    assert got == want

    # estimates compose unchanged; empty batch is a noop
    probe = spark.createDataFrame([("k3",), ("k9",), ("nope",)], "key string")
    est = {
        r.key: r.est_count
        for r in cms_estimate(probe, "key", cms_read(spark, path)).collect()
    }
    true_counts = {"k3": sum(1 for (k,) in rows if k == "k3"),
                   "k9": sum(1 for (k,) in rows if k == "k9")}
    assert est["k3"] >= true_counts["k3"] and est["k9"] >= true_counts["k9"]
    assert est["nope"] >= 0
    empty = spark.createDataFrame([], "key string")
    assert cms_append(empty, path, "key") == 3

    # compact folds to one epoch at a new path, estimates preserved
    dst = str(tmp_path / "dst")
    cms_compact(spark, path, dst)
    assert {
        (r.j, r.col, r.cnt) for r in cms_read(spark, dst).collect()
    } == want
    assert spark.read.parquet(f"{dst}/stats").count() == 1


def test_event_ingest_cms_store_lockstep(spark, tmp_path):
    from kafka_streams_dead_letter_publishing_spark.operators.cms import (
        cms_build,
        cms_read,
    )
    from kafka_streams_dead_letter_publishing_spark.streaming.ingest_pipeline import (
        EventIngest,
    )

    rows = [(f"t{i % 2}", (i * 3) % 25) for i in range(120)]
    ingest = EventIngest(str(tmp_path / "ev"), k=8, cms_store=True)
    for bid, (lo, hi) in enumerate(((0, 50), (50, 120))):
        ingest.process_batch(
            spark.createDataFrame(rows[lo:hi], "event_type string, user_id long"),
            bid,
        )
    got = {
        (r.j, r.col, r.cnt)
        for r in cms_read(spark, ingest.cms_path).collect()
    }
    full = spark.createDataFrame(rows, "event_type string, user_id long")
    want = {(r.j, r.col, r.cnt) for r in cms_build(full, "user_id").collect()}
    assert got == want

    compacted = ingest.compact(str(tmp_path / "ev2"))
    assert {
        (r.j, r.col, r.cnt)
        for r in cms_read(spark, compacted.cms_path).collect()
    } == want
