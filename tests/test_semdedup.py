"""SemDeDup (operators/semdedup.py): planted-twin ground truth on the
registry row, Python-reference parity on a synthetic clustered corpus,
the zero-norm/NULL-cosine contract, and plan shape (equi-join on the
cluster id — never a cartesian pair search)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
    kmeans_fit_quantized,
)
from kafka_streams_dead_letter_publishing_spark.operators.semdedup import (
    semdedup_flags,
)

DIM = 8


@pytest.fixture(scope="module")
def clustered(spark):
    """Vectors near 4 well-separated anchors plus exact-perturbation twins
    of a known subset."""
    rng = random.Random(3)
    anchors = [
        [(1 if (i >> j) & 1 else -1) * 2.0 for j in range(DIM)] for i in range(4)
    ]
    rows = [
        (i, [a + rng.uniform(-0.05, 0.05) for a in anchors[i % 4]])
        for i in range(60)
    ]
    twins = [
        (i + 1000, [x + (0.01 if j == 0 else 0.0) for j, x in enumerate(v)])
        for i, v in rows
        if i % 10 == 0
    ]
    df = spark.createDataFrame(
        rows + twins, "vec_id long, embedding array<double>"
    )
    return df, rows + twins


def _py_reference(rows, assign, tau):
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        if na == 0 or nb == 0:
            return None
        return d / (na * nb)

    by_id = dict(rows)
    out = {}
    for i, v in rows:
        dup = any(
            assign[j] == assign[i]
            and j < i
            and (c := cos(by_id[j], v)) is not None
            and c >= tau
            for j, _ in rows
        )
        out[i] = not dup
    return out


def test_matches_python_reference_and_drops_only_twins(spark, clustered):
    df, rows = clustered
    cents = kmeans_fit_quantized(df, k=4, iters=2)
    flags = semdedup_flags(df, cents, tau=0.95)
    got = {r.vec_id: (r.cluster, r.kept) for r in flags.collect()}
    assign = {i: got[i][0] for i, _ in rows}
    expect = _py_reference(rows, assign, 0.95)
    assert {i: k for i, (_, k) in got.items()} == expect
    # every twin (higher id, same cell, cos~0.99996) drops.  Same-anchor
    # ORIGINALS also legitimately dedup against each other at this tau
    # (2.5% noise around one anchor ⇒ cos~0.999 — they ARE semantic dups,
    # which is the method's point); the reference parity above governs
    # those, plus the anchor-minimum invariant below.
    for i, _ in rows:
        if i >= 1000:
            assert not got[i][1], i
    # the lowest-id vector of each anchor family can have no lower-id
    # cell-mate from its own family: ids 0..3 are one-per-anchor
    for i in range(4):
        assert got[i][1], i


def test_zero_norm_vectors_are_always_kept(spark):
    df = spark.createDataFrame(
        [(0, [1.0] * DIM), (1, [0.0] * DIM), (2, [0.0] * DIM)],
        "vec_id long, embedding array<double>",
    )
    cents = [[0] * DIM]  # one cell: everything is a cell-mate
    flags = {r.vec_id: r.kept for r in semdedup_flags(df, cents, 0.5).collect()}
    # cosine against a zero-norm vector is NULL -> never >= tau
    assert flags == {0: True, 1: True, 2: True}


def test_pair_search_is_equi_join_no_cartesian(spark, clustered):
    df, _ = clustered
    cents = kmeans_fit_quantized(df, k=4, iters=2)
    plan = (
        semdedup_flags(df, cents, 0.95)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" not in plan, plan


def test_registry_row_drops_exactly_the_planted_twins(spark):
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES
    from kafka_streams_dead_letter_publishing_spark.plans.similarity import (
        SEMDEDUP_PLANT_EVERY,
        SEMDEDUP_TWIN_OFFSET,
    )

    rows = QUERIES["emb_semdedup_keepers"].spark(
        spark, "/root/testdata/sf0.01"
    ).collect()
    dropped = {r.vec_id for r in rows if not r.kept}
    planted = {
        r.vec_id
        for r in rows
        if r.vec_id >= SEMDEDUP_TWIN_OFFSET
    }
    assert planted and dropped == planted
    assert all(
        v - SEMDEDUP_TWIN_OFFSET == 0 or (v - SEMDEDUP_TWIN_OFFSET) % SEMDEDUP_PLANT_EVERY == 0
        for v in planted
    )


def test_preassigned_cluster_col_equals_inline_assignment(spark, clustered):
    """The production path: SemDeDup over a persisted IVF index reuses its
    cluster column — results must equal inline assignment with the same
    frozen centroids, row for row; passing both/neither routing source is
    an error."""
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        nearest_cluster_quantized,
        quantize_embedding,
    )
    from pyspark.sql import functions as F

    df, _ = clustered
    cents = kmeans_fit_quantized(df, k=4, iters=2)
    preassigned = df.select(
        "vec_id",
        "embedding",
        nearest_cluster_quantized(
            cents, quantize_embedding(F.col("embedding"))
        ).alias("cell"),
    )
    inline = {
        (r.vec_id, r.cluster, r.kept)
        for r in semdedup_flags(df, cents, 0.95).collect()
    }
    reused = {
        (r.vec_id, r.cluster, r.kept)
        for r in semdedup_flags(
            preassigned, None, 0.95, cluster_col="cell"
        ).collect()
    }
    assert inline == reused

    import pytest as _pytest

    with _pytest.raises(ValueError, match="exactly one"):
        semdedup_flags(preassigned, cents, 0.95, cluster_col="cell")
    with _pytest.raises(ValueError, match="exactly one"):
        semdedup_flags(df, None, 0.95)


def _py_two_level(centroids, q):
    """Driver-side replay of nearest_cluster_two_level for one quantized
    vector — the exactness oracle for the Spark fold."""
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        two_level_groups,
    )

    reps, members, ids = two_level_groups(centroids)

    def argmin(mat):
        best, bd = 0, None
        for i, c in enumerate(mat):
            d2 = sum((a - b) * (a - b) for a, b in zip(c, q))
            if bd is None or d2 < bd:
                best, bd = i, d2
        return best

    g = argmin(reps)
    return ids[g][argmin(members[g])]


def test_two_level_routing_matches_python_replay(spark, clustered):
    """The Spark two-level fold must equal the driver-side exact-integer
    replay on every vector (the cross-engine determinism contract that
    lets an oracle or a rebuild reproduce the same cells)."""
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        nearest_cluster_two_level,
        quantize_embedding,
    )

    df, rows = clustered
    cents = kmeans_fit_quantized(df, k=9, iters=2)
    got = {
        r.vec_id: r.c
        for r in df.select(
            "vec_id",
            nearest_cluster_two_level(
                cents, quantize_embedding(F.col("embedding"))
            ).alias("c"),
        ).collect()
    }
    by_id = dict(rows)
    for vid, v in rows:
        q = [math.floor(x * 1_000_000) for x in by_id[vid]]
        assert got[vid] == _py_two_level(cents, q), vid


def test_two_level_routing_agrees_with_flat_on_separated_clusters(
    spark, clustered
):
    """On well-separated clusters the approximation is near-exact: the
    overwhelming majority of vectors route to the same fine cell as the
    flat argmin (boundary vectors may differ — that is the documented
    trade)."""
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        nearest_cluster_quantized,
        nearest_cluster_two_level,
        quantize_embedding,
    )

    df, rows = clustered
    cents = kmeans_fit_quantized(df, k=4, iters=3)
    qe = quantize_embedding(F.col("embedding"))
    both = df.select(
        nearest_cluster_quantized(cents, qe).alias("flat"),
        nearest_cluster_two_level(cents, qe).alias("two"),
    ).collect()
    agree = sum(1 for r in both if r.flat == r.two)
    assert agree / len(both) >= 0.9, agree / len(both)


def test_two_level_keeps_the_dedup_invariant(spark, clustered):
    """routing='two_level' must (a) still drop every planted twin — a
    twin is a tiny perturbation of its base, so it routes with it — and
    (b) match the Python reference exactly under its OWN assignment (the
    dedup semantics are routing-independent once cells are fixed)."""
    df, rows = clustered
    cents = kmeans_fit_quantized(df, k=9, iters=2)
    got = {
        r.vec_id: (r.cluster, r.kept)
        for r in semdedup_flags(df, cents, 0.95, routing="two_level").collect()
    }
    assign = {i: got[i][0] for i, _ in rows}
    expect = _py_reference(rows, assign, 0.95)
    assert {i: k for i, (_, k) in got.items()} == expect
    for i, _ in rows:
        if i >= 1000:
            assert not got[i][1], i  # every planted twin drops


def test_flat_routing_refused_past_max_k(spark, clustered):
    """The cost guard: silent O(N*k) flat folds past SEMDEDUP_FLAT_MAX_K
    are a refusal, not a slow surprise; auto picks two_level instead."""
    from kafka_streams_dead_letter_publishing_spark.operators.semdedup import (
        SEMDEDUP_FLAT_MAX_K,
    )

    df, _ = clustered
    k = SEMDEDUP_FLAT_MAX_K + 1
    fake_cents = [[i] * DIM for i in range(k)]
    with pytest.raises(ValueError, match="two_level"):
        semdedup_flags(df, fake_cents, 0.9, routing="flat")
    with pytest.raises(ValueError, match="unknown routing"):
        semdedup_flags(df, fake_cents, 0.9, routing="nope")


def test_two_level_groups_partition_the_centroids():
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        two_level_groups,
    )

    cents = [[i * 7 % 13, i * 3 % 11] for i in range(25)]
    reps, members, ids = two_level_groups(cents)
    flat = sorted(i for g in ids for i in g)
    assert flat == list(range(25))  # exact partition, nothing lost
    assert len(reps) == len(members) == len(ids) <= 5
    for g, m in zip(ids, members):
        assert [cents[i] for i in g] == m


def _py_two_level_p2(centroids, q):
    """Driver-side replay of nearest_cluster_two_level(probes=2): top-2
    coarse groups by the strict-< double-argmin, group-local argmins,
    cross-group winner by lexicographic (d2, global id)."""
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        two_level_groups,
    )

    reps, members, ids = two_level_groups(centroids)

    def d2(c):
        return sum((a - b) * (a - b) for a, b in zip(c, q))

    c1 = c2 = -1
    d1 = dd2 = None
    for i, r in enumerate(reps):
        d = d2(r)
        if d1 is None or d < d1:
            c2, dd2 = c1, d1
            c1, d1 = i, d
        elif dd2 is None or d < dd2:
            c2, dd2 = i, d
    if c2 < 0:
        c2 = c1

    def local_best(g):
        best, bd = 0, None
        for i, c in enumerate(members[g]):
            d = d2(c)
            if bd is None or d < bd:
                best, bd = i, d
        return bd, ids[g][best]

    cand1, cand2 = local_best(c1), local_best(c2)
    return min(cand1, cand2)[1]


def test_two_level_multiprobe_matches_python_replay(spark, clustered):
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        nearest_cluster_two_level,
        quantize_embedding,
    )

    df, rows = clustered
    cents = kmeans_fit_quantized(df, k=9, iters=2)
    got = {
        r.vec_id: r.c
        for r in df.select(
            "vec_id",
            nearest_cluster_two_level(
                cents, quantize_embedding(F.col("embedding")), probes=2
            ).alias("c"),
        ).collect()
    }
    by_id = dict(rows)
    for vid, _v in rows:
        q = [math.floor(x * 1_000_000) for x in by_id[vid]]
        assert got[vid] == _py_two_level_p2(cents, q), vid


def test_two_level_multiprobe_recovers_boundary_misses(spark, clustered):
    """probes=2 must agree with the flat argmin at least as often as
    probes=1, and near-perfectly on the separated fixture — a miss now
    needs the true cell excluded from BOTH nearest coarse groups."""
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        nearest_cluster_quantized,
        nearest_cluster_two_level,
        quantize_embedding,
    )

    df, _rows = clustered
    cents = kmeans_fit_quantized(df, k=9, iters=2)
    qe = quantize_embedding(F.col("embedding"))
    all3 = df.select(
        nearest_cluster_quantized(cents, qe).alias("flat"),
        nearest_cluster_two_level(cents, qe).alias("p1"),
        nearest_cluster_two_level(cents, qe, probes=2).alias("p2"),
    ).collect()
    a1 = sum(1 for r in all3 if r.flat == r.p1) / len(all3)
    a2 = sum(1 for r in all3 if r.flat == r.p2) / len(all3)
    assert a2 >= a1, (a1, a2)
    assert a2 >= 0.98, (a1, a2)


def test_two_level_probes_validation(spark, clustered):
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        nearest_cluster_two_level,
        quantize_embedding,
    )

    df, _ = clustered
    cents = kmeans_fit_quantized(df, k=9, iters=1)
    with pytest.raises(ValueError, match="probes=3"):
        nearest_cluster_two_level(
            cents, quantize_embedding(F.col("embedding")), probes=3
        )
    # probes=2 with a single coarse group degrades to single-probe
    one = kmeans_fit_quantized(df, k=1, iters=1)
    got = df.select(
        nearest_cluster_two_level(
            one, quantize_embedding(F.col("embedding")), probes=2
        ).alias("c")
    ).collect()
    assert {r.c for r in got} == {0}


def test_hot_cell_cap_noop_when_no_cell_is_hot(spark, clustered):
    df, _ = clustered
    cents = kmeans_fit_quantized(df, k=4, iters=2)
    base = {
        (r.vec_id, r.cluster, r.kept)
        for r in semdedup_flags(df, cents, 0.95).collect()
    }
    capped = {
        (r.vec_id, r.cluster, r.kept)
        for r in semdedup_flags(
            df, cents, 0.95, max_cell_occupancy=10**6
        ).collect()
    }
    assert base == capped


def test_hot_cell_cap_skips_the_hot_cell_fail_open(spark, clustered):
    """A cell past the cap contributes NO pairs: its twins are missed
    (kept — the safe direction), while every other cell still dedups
    exactly as uncapped."""
    df, rows = clustered
    cents = kmeans_fit_quantized(df, k=4, iters=2)
    uncapped = {
        r.vec_id: (r.cluster, r.kept)
        for r in semdedup_flags(df, cents, 0.95).collect()
    }
    by_cell: dict[int, int] = {}
    for _vid, (c, _k) in uncapped.items():
        by_cell[c] = by_cell.get(c, 0) + 1
    sizes = sorted(by_cell.values())
    cap = sizes[-1] - 1  # only the largest cell(s) go hot
    hot_cells = {c for c, n in by_cell.items() if n > cap}
    assert hot_cells and len(hot_cells) < len(by_cell)
    capped = {
        r.vec_id: (r.cluster, r.kept)
        for r in semdedup_flags(
            df, cents, 0.95, max_cell_occupancy=cap
        ).collect()
    }
    for vid, (c, kept) in capped.items():
        if c in hot_cells:
            assert kept  # fail-open: nothing dropped in a skipped cell
        else:
            assert (c, kept) == uncapped[vid]  # untouched elsewhere


def test_two_level_p2_routing_keeps_the_dedup_invariant(spark, clustered):
    """routing='two_level_p2' (multi-probe) must still drop every
    planted twin (a twin routes with its base under any deterministic
    assignment) and keep the lowest-id-survivor contract under its own
    cells."""
    df, rows = clustered
    cents = kmeans_fit_quantized(df, k=9, iters=2)
    got = {
        r.vec_id: (r.cluster, r.kept)
        for r in semdedup_flags(
            df, cents, 0.95, routing="two_level_p2"
        ).collect()
    }
    assign = {vid: c for vid, (c, _k) in got.items()}
    want = _py_reference(rows, assign, 0.95)
    assert {v: k for v, (_c, k) in got.items()} == want
    # every planted twin (base id + 1000) must be dropped
    for vid, _ in rows:
        if vid >= 1000:
            assert got[vid][1] is False, vid
