"""PCA projection (operators/pca.py): numpy cross-check of the integer
moment build, eigen invariants of the fitted model, projection variance,
and plan quality of the distributed pass."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.kmeans import QUANT_SCALE
from kafka_streams_dead_letter_publishing_spark.operators.pca import (
    pca_fit,
    pca_project,
    scaled_covariance,
    second_moments,
)

D, N, R = 8, 200, 3


def _corpus():
    rng = np.random.RandomState(7)
    # anisotropic: 3 strong directions + noise, so top-3 is meaningful
    basis = np.linalg.qr(rng.randn(D, D))[0]
    scales = np.array([5.0, 3.0, 2.0] + [0.1] * (D - 3))
    x = rng.randn(N, D) @ np.diag(scales) @ basis.T + rng.randn(D)
    return x.astype(np.float32)


@pytest.fixture(scope="module")
def emb(spark):
    x = _corpus()
    rows = [(i, [float(v) for v in x[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_moments_match_numpy_exactly(emb):
    x = _corpus()
    qx = np.floor(x.astype(np.float64) * QUANT_SCALE).astype(np.int64)
    rows = second_moments(emb).collect()
    assert len(rows) == D * (D + 1) // 2
    for r in rows:
        assert r.n == N
        assert r.gram == int((qx[:, r.i] * qx[:, r.j]).sum())
        assert r.s_i == int(qx[:, r.i].sum())
        assert r.s_j == int(qx[:, r.j].sum())
    cov = {(r.i, r.j): r.cov_scaled for r in scaled_covariance(second_moments(emb)).collect()}
    for (i, j), v in cov.items():
        want = N * int((qx[:, i] * qx[:, j]).sum()) - int(qx[:, i].sum()) * int(
            qx[:, j].sum()
        )
        assert int(v) == want


def test_fit_invariants(emb):
    m = pca_fit(emb, R)
    comps = np.array(m.components)
    # orthonormal rows
    assert np.allclose(comps @ comps.T, np.eye(R), atol=1e-9)
    # eigenvalues descending, positive, and the strong directions dominate
    assert all(
        a >= b for a, b in zip(m.eigenvalues, m.eigenvalues[1:])
    ) and m.eigenvalues[-1] > 0
    assert m.eigenvalues[0] > 10 * 0.1**2
    # deterministic sign convention: pivot loading positive
    for v in comps:
        assert v[int(np.argmax(np.abs(v)))] > 0
    # mean matches numpy to quantization resolution
    x = _corpus().astype(np.float64)
    assert np.allclose(m.mean, x.mean(axis=0), atol=2.0 / QUANT_SCALE)


def test_projection_variance_matches_eigenvalues(emb):
    m = pca_fit(emb, R)
    proj = pca_project(emb, m).select("projected").collect()
    y = np.array([r.projected for r in proj])
    # per-component variance == eigenvalue (up to quantization + float32)
    got = y.var(axis=0)
    assert np.allclose(got, m.eigenvalues, rtol=1e-3)
    # components decorrelated
    c = np.cov(y.T)
    off = c - np.diag(np.diag(c))
    assert np.abs(off).max() < 1e-2 * m.eigenvalues[0]


def test_projection_beats_random_reconstruction(emb):
    """Top-R PCA reconstruction error must be far below a random-R basis —
    the operator actually concentrates variance."""
    m = pca_fit(emb, R)
    x = _corpus().astype(np.float64)
    xc = x - np.array(m.mean)
    v = np.array(m.components).T  # d x r
    err_pca = ((xc - (xc @ v) @ v.T) ** 2).sum()
    rng = np.random.RandomState(0)
    q = np.linalg.qr(rng.randn(D, R))[0]
    err_rand = ((xc - (xc @ q) @ q.T) ** 2).sum()
    assert err_pca < 0.25 * err_rand


def test_empty_corpus_raises(spark):
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        pca_fit(empty, 2)


def test_plan_quality(emb):
    df = scaled_covariance(second_moments(emb))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # partial aggregation before the shuffle (d^2-bounded shuffle payload)
    assert "partial_sum" in plan
    proj = pca_project(emb, pca_fit(emb, R))
    pplan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in pplan  # projection is per-row narrow
    assert "Python" not in pplan


def test_projected_space_preserves_neighbors(emb):
    """The composition the operator exists for: brute-force cosine top-k
    in the r-dim projected space must recover most of the full-space
    top-k on an anisotropic corpus (the SemDeDup/ANN pre-step contract)."""
    m = pca_fit(emb, R)
    proj = pca_project(emb, m).select("vec_id", "projected").collect()
    y = {r.vec_id: np.array(r.projected) for r in proj}
    x = _corpus().astype(np.float64)

    def topk(vecs, qid, k=10):
        q = vecs[qid]
        scores = {}
        for i, v in vecs.items() if isinstance(vecs, dict) else enumerate(vecs):
            if i == qid:
                continue
            denom = np.linalg.norm(q) * np.linalg.norm(v)
            scores[i] = (v @ q) / denom if denom else -2
        return set(sorted(scores, key=lambda i: (-scores[i], i))[:k])

    recalls = []
    for qid in (0, 17, 42, 99):
        full = topk({i: x[i] for i in range(N)}, qid)
        low = topk(y, qid)
        recalls.append(len(full & low) / 10)
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_power_direction_tracks_dominant_eigenvector(emb):
    """The exact-integer power iteration (the ORACLED composition path —
    pca_fit's LAPACK solve is not cross-engine replayable) must land
    near the true top eigenvector of the quantized covariance on the
    anisotropic corpus: |cos| >= 0.98 after K=4 rescaled iterations."""
    from kafka_streams_dead_letter_publishing_spark.operators.pca import (
        power_direction,
    )

    rows = scaled_covariance(second_moments(emb)).collect()
    v = np.array(power_direction(rows), dtype=np.float64)
    assert len(v) == D and np.abs(v).max() == 2**20  # fixed-point rescale

    cov = np.zeros((D, D))
    for r in rows:
        cov[r.i, r.j] = cov[r.j, r.i] = float(r.cov_scaled)
    vals, vecs = np.linalg.eigh(cov)
    top = vecs[:, int(np.argmax(vals))]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos >= 0.98, cos


def test_power_direction_sign_split_division_matches_trunc_semantics():
    """Python // floors, Spark DIV / DuckDB // truncate toward zero —
    the iteration's rescale must use the sign-split form everywhere or
    engines diverge on the first negative component.  Pin the Python
    side against explicit truncating division."""
    from kafka_streams_dead_letter_publishing_spark.operators.pca import (
        power_direction,
    )
    from pyspark.sql import Row

    # 2x2 covariance with a negative off-diagonal forces negative
    # components mid-iteration
    rows = [
        Row(i=0, j=0, cov_scaled=7),
        Row(i=0, j=1, cov_scaled=-5),
        Row(i=1, j=1, cov_scaled=3),
    ]
    v = power_direction(rows, iters=3, scale_bits=8)

    def trunc_div(a, b):
        q = abs(a) // b
        return -q if a < 0 else q

    w = [1, 1]
    for _ in range(3):
        nxt = [7 * w[0] - 5 * w[1], -5 * w[0] + 3 * w[1]]
        mx = max(max(abs(x) for x in nxt), 1)
        w = [trunc_div(x * 256, mx) for x in nxt]
    assert v == w


def test_power_direction_empty_is_empty():
    from kafka_streams_dead_letter_publishing_spark.operators.pca import (
        power_direction,
    )

    assert power_direction([]) == []


def test_power_project_plan_is_narrow(emb):
    from kafka_streams_dead_letter_publishing_spark.operators.pca import (
        power_direction,
        power_project,
    )

    rows = scaled_covariance(second_moments(emb)).collect()
    df = power_project(emb, power_direction(rows))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def _rows_key(rows):
    return sorted((r.i, r.j, int(r.gram), r.s_i, r.s_j, r.n) for r in rows)


def test_moments_store_appends_equal_one_shot(spark, tmp_path):
    """Batch-by-batch moments_append must reconstruct EXACTLY the
    one-shot second_moments frame (integer sums are associative and
    order-free), so pca_fit / power_direction compose unchanged from
    the streamed store."""
    from kafka_streams_dead_letter_publishing_spark.operators.pca import (
        moments_append,
        moments_read,
        pca_fit_from_store,
        power_direction,
        scaled_covariance,
    )

    x = _corpus()
    path = str(tmp_path / "mom")
    epochs = []
    for lo, hi in ((0, 70), (70, 71), (71, N)):
        rows = [(i, [float(v) for v in x[i]]) for i in range(lo, hi)]
        batch = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        epochs.append(moments_append(batch, path))
    assert epochs == [0, 1, 2]

    full = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(N)],
        "vec_id bigint, embedding array<float>",
    )
    got = moments_read(spark, path).collect()
    want = second_moments(full).collect()
    assert _rows_key(got) == _rows_key(want)

    assert power_direction(
        scaled_covariance(moments_read(spark, path)).collect()
    ) == power_direction(scaled_covariance(second_moments(full)).collect())
    m_store = pca_fit_from_store(spark, path, R)
    m_full = pca_fit(full, R)
    assert m_store.mean == m_full.mean
    assert m_store.components == m_full.components
    assert m_store.eigenvalues == m_full.eigenvalues


def test_moments_store_orphans_invisible_and_empty_noop(spark, tmp_path):
    from kafka_streams_dead_letter_publishing_spark.operators.pca import (
        moments_append,
        moments_read,
    )

    x = _corpus()
    path = str(tmp_path / "mom")
    batch = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(50)],
        "vec_id bigint, embedding array<float>",
    )
    epoch = moments_append(batch, path)
    before = _rows_key(moments_read(spark, path).collect())

    # crashed-append shape: cells land at epoch+1, stats write lost
    import decimal

    orphan = spark.createDataFrame(
        [(0, 0, decimal.Decimal(999999), 7, epoch + 1)],
        "i int, j int, gram decimal(38,0), n bigint, epoch bigint",
    )
    orphan.write.mode("append").parquet(f"{path}/cells")
    assert _rows_key(moments_read(spark, path).collect()) == before

    # crash-then-RETRY: the retried append must allocate an epoch PAST
    # the orphan's (with a threshold gate it would land ON it and the
    # reader would double-count the orphan's partial cells, silently
    # corrupting the covariance), and the healed store must equal a
    # one-shot second_moments of everything actually appended
    tail = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(50, 60)],
        "vec_id bigint, embedding array<float>",
    )
    assert moments_append(tail, path) == epoch + 2
    full = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(60)],
        "vec_id bigint, embedding array<float>",
    )
    assert _rows_key(moments_read(spark, path).collect()) == _rows_key(
        second_moments(full).collect()
    )

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    assert moments_append(empty, path) == epoch + 2  # no epoch advance

    import pytest as _pytest

    with _pytest.raises(Exception):
        moments_read(spark, str(tmp_path / "nope"))


def test_power_directions_t0_is_power_direction_bit_for_bit(emb):
    """power_directions is the r-dim extension: its first column must be
    EXACTLY power_direction (empty ortho loop + identity second rescale),
    so the oracled single-direction row and the deflated row share one
    arithmetic contract."""
    from kafka_streams_dead_letter_publishing_spark.operators.pca import (
        power_direction,
        power_directions,
    )

    rows = scaled_covariance(second_moments(emb)).collect()
    dirs = power_directions(rows, 3)
    assert len(dirs) == 3
    assert dirs[0] == power_direction(rows)


def test_power_directions_track_top_r_eigenvectors(emb):
    """Deflated directions must approximate the top-r eigenvectors of
    the quantized covariance on the anisotropic corpus (eigengaps
    5/3/2 vs 0.1 noise): per-direction |cos| against the matching
    LAPACK eigenvector, and near-orthogonality between directions."""
    from kafka_streams_dead_letter_publishing_spark.operators.pca import (
        power_directions,
    )

    rows = scaled_covariance(second_moments(emb)).collect()
    dirs = [
        np.array(v, dtype=np.float64) for v in power_directions(rows, 3)
    ]

    cov = np.zeros((D, D))
    for r in rows:
        cov[r.i, r.j] = cov[r.j, r.i] = float(r.cov_scaled)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    for t, v in enumerate(dirs):
        top = vecs[:, order[t]]
        cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
        assert cos >= 0.9, (t, cos)
    for a in range(3):
        for b in range(a + 1, 3):
            c = abs(dirs[a] @ dirs[b]) / (
                np.linalg.norm(dirs[a]) * np.linalg.norm(dirs[b])
            )
            assert c <= 0.1, (a, b, c)


def test_power_directions_empty_and_zero_r():
    from kafka_streams_dead_letter_publishing_spark.operators.pca import (
        power_directions,
    )

    assert power_directions([], 3) == []
    from pyspark.sql import Row

    rows = [Row(i=0, j=0, cov_scaled=7)]
    assert power_directions(rows, 0) == []


def test_power_project_multi_single_pass_narrow_plan(emb):
    """All r projections must come from ONE scan: no Exchange, no
    Python in the executed plan, and each column equals the
    single-direction power_project output."""
    from kafka_streams_dead_letter_publishing_spark.operators.pca import (
        power_directions,
        power_project,
        power_project_multi,
    )

    rows = scaled_covariance(second_moments(emb)).collect()
    dirs = power_directions(rows, 2)
    df = power_project_multi(emb, dirs)
    got = {r.vec_id: (r.p0, r.p1) for r in df.collect()}
    for t in range(2):
        want = {
            r.vec_id: r.proj for r in power_project(emb, dirs[t]).collect()
        }
        assert {k: v[t] for k, v in got.items()} == want
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_power_directions_compose_from_streamed_moments(spark, tmp_path):
    """The streamed moments store feeds the r-dim deflation unchanged:
    directions derived from moments_read equal directions from a
    one-shot second_moments pass bit for bit (the store equality is
    already pinned; this pins the COMPOSITION the similarity stack
    actually runs on a growing corpus)."""
    from kafka_streams_dead_letter_publishing_spark.operators.pca import (
        moments_append,
        moments_read,
        power_directions,
    )

    x = _corpus()
    path = str(tmp_path / "mom")
    for lo, hi in ((0, 90), (90, N)):
        moments_append(
            spark.createDataFrame(
                [(i, [float(v) for v in x[i]]) for i in range(lo, hi)],
                "vec_id bigint, embedding array<float>",
            ),
            path,
        )
    full = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(N)],
        "vec_id bigint, embedding array<float>",
    )
    from_store = power_directions(
        scaled_covariance(moments_read(spark, path)).collect(), 3
    )
    one_shot = power_directions(
        scaled_covariance(second_moments(full)).collect(), 3
    )
    assert from_store == one_shot and len(from_store) == 3


def test_second_moments_arrow_parity_odd_shapes(spark):
    """r17: second_moments runs as a mapInArrow integer-gram pass — pin
    its parity with the posexplode formulation it replaced on the shapes
    the fast path cannot take: NULL rows and empty vectors contribute
    nothing; NULL elements contribute 0 to gram/s but still count in n;
    ragged lengths give cell (i, j) an n of rows-with-length > j."""
    rows = [
        (1, [1.0, None, 3.0]),
        (2, None),
        (3, []),
        (4, [2.0, 2.0]),
        (5, [0.5, -1.5, 2.5]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = {(r.i, r.j): r for r in second_moments(emb).collect()}
    q = {
        1: [1_000_000, None, 3_000_000],
        4: [2_000_000, 2_000_000],
        5: [500_000, -1_500_000, 2_500_000],
    }

    def cell(i, j):
        gram = s_i = s_j = n = 0
        for vec in q.values():
            if len(vec) > j:
                n += 1
                a = vec[i] if vec[i] is not None else 0
                b = vec[j] if vec[j] is not None else 0
                gram += a * b
        for vec in q.values():
            if len(vec) > i and vec[i] is not None:
                s_i += vec[i]
            if len(vec) > j and vec[j] is not None:
                s_j += vec[j]
        return gram, s_i, s_j, n

    assert set(got) == {(i, j) for i in range(3) for j in range(i, 3)}
    for (i, j), r in got.items():
        gram, s_i, s_j, n = cell(i, j)
        assert int(r.gram) == gram, (i, j)
        assert r.s_i == s_i and r.s_j == s_j and r.n == n, (i, j)
