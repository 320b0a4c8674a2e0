"""Product quantization (operators/pq.py): encoding/ADC parity with a
sequential Python reference, the normalization contract, a recall floor
for the two-stage serve on real testdata, and plan shape (broadcast
tables, no corpus-wide single-partition stage)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
    QUANT_SCALE,
)
from kafka_streams_dead_letter_publishing_spark.operators.pq import (
    adc_table,
    l2_normalize,
    pq_encode,
    pq_fit,
    pq_search_batch,
)

DIM, M, K = 8, 4, 4  # tiny geometry for the reference fixtures


def _quant(v):
    return [math.floor(x * QUANT_SCALE) for x in v]


def _d2(a, b):
    return sum((x - y) ** 2 for x, y in zip(a, b))


@pytest.fixture(scope="module")
def clustered(spark):
    """Vectors drawn near 4 well-separated anchors, so sub-quantizers have
    real structure to learn and the Python reference is unambiguous."""
    rng = random.Random(5)
    anchors = [[(1 if (i >> j) & 1 else -1) * 2.0 for j in range(DIM)] for i in range(4)]
    rows = [
        (i, [a + rng.uniform(-0.05, 0.05) for a in anchors[i % 4]])
        for i in range(80)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), rows


def test_encode_assigns_nearest_subcentroid(clustered):
    df, rows = clustered
    books = pq_fit(df, DIM, M, K, iters=2, sample_mod=1)
    codes = {r.vec_id: list(r.codes) for r in pq_encode(df, books, DIM).collect()}
    sub = DIM // M
    for vid, vec in rows:
        q = _quant(vec)
        for j in range(M):
            qs = q[j * sub : (j + 1) * sub]
            dists = [_d2(qs, c) for c in books[j]]
            assert codes[vid][j] == dists.index(min(dists)), (vid, j)


def test_adc_table_is_exact_subspace_distances(clustered):
    _, rows = clustered
    df, _ = clustered
    books = pq_fit(df, DIM, M, K, iters=2, sample_mod=1)
    q = rows[3][1]
    qm = _quant(q)
    tables = adc_table(books, qm)
    sub = DIM // M
    for j in range(M):
        for c in range(len(books[j])):
            assert tables[j][c] == _d2(qm[j * sub : (j + 1) * sub], books[j][c])


def test_search_matches_python_adc_reference(clustered):
    df, rows = clustered
    books = pq_fit(df, DIM, M, K, iters=2, sample_mod=1)
    codes = {r.vec_id: list(r.codes) for r in pq_encode(df, books, DIM).collect()}
    queries = [rows[0][1], rows[1][1]]
    got = pq_search_batch(
        pq_encode(df, books, DIM), books, queries, k_top=5
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rnk, r.vec_id, r.ad2))
    for qi, q in enumerate(queries):
        tables = adc_table(books, _quant(q))
        ref = sorted(
            (sum(tables[j][codes[v][j]] for j in range(M)), v) for v in codes
        )[:5]
        expect = [(i + 1, v, d) for i, (d, v) in enumerate(ref)]
        assert sorted(by_q[qi]) == expect, qi


def test_l2_normalize_units_and_drops_zero(spark):
    df = spark.createDataFrame(
        [(0, [3.0, 4.0]), (1, [0.0, 0.0]), (2, [0.0, -2.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r.embedding for r in l2_normalize(df).collect()}
    assert set(out) == {0, 2}
    assert out[0] == [0.6, 0.8] and out[2] == [0.0, -1.0]


def test_two_stage_recall_floor_on_real_data(spark):
    """The registry row's two-stage serve must keep ≥0.5 average recall@10
    vs the exact cosine top-10 at sf0.01 (measured 0.7–0.9; isotropic
    vectors are PQ's hardest case)."""
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES
    from kafka_streams_dead_letter_publishing_spark.plans.similarity import (
        emb_multi_query_topk,  # retired registry row, kept as the exact reference
    )

    sf = "/root/testdata/sf0.01"
    pq = QUERIES["emb_pq_batch_topk"].spark(spark, sf).collect()
    exact = emb_multi_query_topk(spark, sf).collect()
    recalls = []
    for qi in range(4):
        p = {r.vec_id for r in pq if r.query_id == qi}
        e = {r.vec_id for r in exact if r.query_id == qi}
        recalls.append(len(p & e) / len(e))
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_serving_plan_shape(clustered):
    df, rows = clustered
    books = pq_fit(df, DIM, M, K, iters=2, sample_mod=1)
    codes = pq_encode(df, books, DIM)
    plan = (
        pq_search_batch(codes, books, [rows[0][1]], k_top=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the Q-row table broadcast; the scan side never exchanges before scoring
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # two-phase top-k: the global per-query window sees only ≤ k·partitions
    # rows, never the full scored corpus
    assert "SinglePartition" not in plan


def test_ivfpq_with_full_probe_equals_plain_pq(clustered, spark):
    """Probing every cell makes IVF-PQ's candidate set the whole corpus,
    so its shortlist must equal plain PQ's exactly."""
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        kmeans_fit_quantized,
        nearest_cluster_quantized,
        quantize_embedding,
    )
    from kafka_streams_dead_letter_publishing_spark.operators.pq import (
        ivfpq_search_batch,
    )

    df, rows = clustered
    books = pq_fit(df, DIM, M, K, iters=2, sample_mod=1)
    codes = pq_encode(df, books, DIM)
    nlist = 3
    coarse = kmeans_fit_quantized(df, nlist, 2)
    idx = codes.join(
        df.select(
            "vec_id",
            nearest_cluster_quantized(
                coarse, quantize_embedding(F.col("embedding"))
            ).alias("cluster"),
        ),
        "vec_id",
    )
    queries = [rows[0][1], rows[5][1]]
    full = ivfpq_search_batch(idx, books, coarse, queries, nprobe=nlist, k_top=7)
    plain = pq_search_batch(codes, books, queries, k_top=7)
    got = sorted((r.query_id, r.vec_id, r.ad2, r.rnk) for r in full.collect())
    want = sorted((r.query_id, r.vec_id, r.ad2, r.rnk) for r in plain.collect())
    assert got == want


def test_ivfpq_probed_results_come_from_probed_cells(clustered, spark):
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        kmeans_fit_quantized,
        nearest_cluster_quantized,
        quantize_embedding,
        route_query,
    )
    from kafka_streams_dead_letter_publishing_spark.operators.pq import (
        ivfpq_search_batch,
    )

    df, rows = clustered
    books = pq_fit(df, DIM, M, K, iters=2, sample_mod=1)
    codes = pq_encode(df, books, DIM)
    coarse = kmeans_fit_quantized(df, 4, 2)
    assign = df.select(
        "vec_id",
        nearest_cluster_quantized(
            coarse, quantize_embedding(F.col("embedding"))
        ).alias("cluster"),
    )
    idx = codes.join(assign, "vec_id")
    q = rows[2][1]
    got = ivfpq_search_batch(idx, books, coarse, [q], nprobe=1, k_top=10).collect()
    probed = set(route_query(coarse, _quant(q), 1))
    cells = {r.vec_id: r.cluster for r in assign.collect()}
    assert got and all(cells[r.vec_id] in probed for r in got)


def test_ivfpq_recall_floor_on_real_data(spark):
    """nprobe=3 of nlist=8 cells: mean recall@10 vs exact must stay ≥0.3
    (the price of scanning ~3/8 of the codes)."""
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES
    from kafka_streams_dead_letter_publishing_spark.plans.similarity import (
        emb_multi_query_topk,  # retired registry row, kept as the exact reference
    )

    sf = "/root/testdata/sf0.01"
    ivfpq = QUERIES["emb_ivfpq_batch_topk"].spark(spark, sf).collect()
    exact = emb_multi_query_topk(spark, sf).collect()
    recalls = []
    for qi in range(4):
        p = {r.vec_id for r in ivfpq if r.query_id == qi}
        e = {r.vec_id for r in exact if r.query_id == qi}
        recalls.append(len(p & e) / len(e))
    assert sum(recalls) / len(recalls) >= 0.3, recalls


def test_replayed_append_duplicates_never_distort_serving(clustered, spark, tmp_path):
    """At-least-once ingest contract (r9, ADVICE): pq_append replayed after
    a crash leaves identical (id, codes, cluster) rows in the codes store;
    serving must dedup on id so a duplicate can neither occupy two
    shortlist ranks nor displace a genuine candidate.  Double-append
    serving must equal single-append serving row-for-row, for both the
    plain-PQ and the IVF-PQ path."""
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        kmeans_fit_quantized,
    )
    from kafka_streams_dead_letter_publishing_spark.operators.pq import (
        ivfpq_search_batch,
        pq_append,
    )

    df, rows = clustered
    norm = l2_normalize(df)
    books = pq_fit(norm, DIM, m=M, k=K, iters=2, sample_mod=1)
    coarse = kmeans_fit_quantized(norm, k=2, iters=2)
    once, twice = str(tmp_path / "once"), str(tmp_path / "twice")
    pq_append(df, books, coarse, once)
    pq_append(df, books, coarse, twice)
    pq_append(df, books, coarse, twice)  # the crash replay

    q = [list(rows[3][1])]
    n = math.sqrt(sum(x * x for x in q[0]))
    q = [[x / n for x in q[0]]]

    def serve(path, fn):
        codes = spark.read.parquet(path)
        if fn == "pq":
            out = pq_search_batch(codes, books, q, k_top=10)
        else:
            out = ivfpq_search_batch(codes, books, coarse, q, nprobe=2, k_top=10)
        return [(r.query_id, r.vec_id, r.ad2, r.rnk) for r in
                out.orderBy("query_id", "rnk").collect()]

    for fn in ("pq", "ivfpq"):
        ref, got = serve(once, fn), serve(twice, fn)
        assert got == ref, (fn, ref, got)
        ids = [(g[0], g[1]) for g in got]
        assert len(ids) == len(set(ids)), f"{fn}: duplicate ids in shortlist"
        assert len(got) == 10


def test_pq_compact_preserves_codes_and_serving(clustered, spark, tmp_path):
    """VERDICT r8 #5: the pq_append codes table accumulates
    files-per-touched-cell exactly like the float IVF index; pq_compact
    (= ivf_compact, schema-agnostic) must collapse files into a NEW path
    with rows preserved and IVF-PQ serving identical row-for-row."""
    import glob

    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        kmeans_fit_quantized,
    )
    from kafka_streams_dead_letter_publishing_spark.operators.pq import (
        ivfpq_search_batch,
        pq_append,
        pq_compact,
    )

    df, rows = clustered
    norm = l2_normalize(df)
    books = pq_fit(norm, DIM, m=M, k=K, iters=2, sample_mod=1)
    coarse = kmeans_fit_quantized(norm, k=2, iters=2)
    path = str(tmp_path / "codes")
    for m in range(4):  # four micro-batch appends
        pq_append(df.filter(F.col("vec_id") % 4 == m), books, coarse, path)
    files_before = len(glob.glob(f"{path}/cluster=*/*.parquet"))
    assert files_before > 2

    compacted = str(tmp_path / "codes_compacted")
    pq_compact(spark, path, compacted)
    files_after = len(glob.glob(f"{compacted}/cluster=*/*.parquet"))
    assert files_after <= 2  # one file per cell at this scale

    def table(p):
        return sorted(
            (r.vec_id, list(r.codes), r.cluster)
            for r in spark.read.parquet(p).collect()
        )

    assert table(compacted) == table(path)

    q = [list(rows[7][1])]
    n = math.sqrt(sum(x * x for x in q[0]))
    q = [[x / n for x in q[0]]]

    def serve(p):
        return [
            (r.query_id, r.vec_id, r.ad2, r.rnk)
            for r in ivfpq_search_batch(
                spark.read.parquet(p), books, coarse, q, nprobe=2, k_top=10
            ).orderBy("rnk").collect()
        ]

    assert serve(compacted) == serve(path)
    # compacting onto an existing path must refuse (swap is by repoint)
    with pytest.raises(Exception):
        pq_compact(spark, path, compacted)
