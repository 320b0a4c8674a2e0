"""K-means IVF index build (operators/kmeans.py) — test-pinned tier (the
iterative fixpoint is not one SQL query; SURVEY §2.2b documents the tier).

What the gates pin: Lloyd's invariants (WCSS monotone, determinism, empty-
cluster degeneracy), the scale posture of both phases (single-fold
assignment with no Python eval; partial-aggregation update with no
collect_list), and the REASON the operator exists — learned routing beats
the registry's label routing at equal nprobe on the same corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
    KMeansResult,
    assign_clusters,
    ivf_search,
    kmeans_fit,
    route_query,
)
from kafka_streams_dead_letter_publishing_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def fitted(spark):
    emb = load_table(spark, SF, "embeddings")
    res = kmeans_fit(emb, k=10, max_iter=8)
    index = assign_clusters(emb, res.centroids).persist()
    index.count()
    yield res, index
    index.unpersist()


def test_wcss_monotone_nonincreasing(fitted):
    res, _ = fitted
    hist = res.wcss_history
    assert len(hist) >= 2
    assert all(a >= b for a, b in zip(hist, hist[1:])), hist
    # Lloyd's must actually improve on the seed partition, not just not-regress
    assert hist[-1] < 0.7 * hist[0], hist


def test_fit_is_deterministic(spark):
    emb = load_table(spark, SF, "embeddings")
    a = kmeans_fit(emb, k=5, max_iter=2)
    b = kmeans_fit(emb, k=5, max_iter=2)
    assert a.centroids == b.centroids  # bit-identical, not approximately
    assert a.wcss_history == b.wcss_history


def test_assignment_covers_corpus_with_balanced_cells(fitted):
    _, index = fitted
    sizes = {
        r.cluster: r.n
        for r in index.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    assert sum(sizes.values()) == index.count()
    assert set(sizes) == set(range(10))  # no cell lost on this corpus
    # isotropic corpus ⇒ no degenerate mega-cell (skew would break the
    # nprobe/nlist scan-fraction story)
    assert max(sizes.values()) < 3 * min(sizes.values()), sizes


def test_duplicate_points_and_empty_cluster_degeneracy(spark):
    """k near n with duplicated points: some cells go empty mid-iteration;
    Lloyd's keeps the previous centroid (standard degeneracy handling) and
    must neither crash nor emit NaN centroids."""
    rows = [
        (0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [0.0, 0.0]),  # triple point
        (3, [1.0, 1.0]), (4, [1.0, 1.0]),
        (5, [5.0, 5.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    res = kmeans_fit(emb, k=4, max_iter=5)
    assert all(all(c == c for c in cent) for cent in res.centroids)  # no NaN
    assigned = assign_clusters(emb, res.centroids)
    got = {r.vec_id: r.cluster for r in assigned.collect()}
    # duplicates land in the same cell, and the far point sits alone
    assert got[0] == got[1] == got[2]
    assert sum(1 for v in got.values() if v == got[5]) == 1


def test_fit_rejects_empty_and_undersized_input(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        kmeans_fit(empty, k=2)
    two = spark.createDataFrame(
        [(0, [0.0]), (1, [1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="k=3"):
        kmeans_fit(two, k=3)


def test_learned_routing_beats_label_routing_at_equal_nprobe(spark, fitted):
    """The operator's reason to exist: the registry's label-IVF measures
    recall@10 = 0.3 at nprobe=3 on sf0.01 (labels are random ⇒ ceiling is
    nprobe/nlist); the LEARNED partition measures 0.6 on the same corpus,
    query, and probe budget."""
    import duckdb
    import numpy as np

    from kafka_streams_dead_letter_publishing_spark.plans.similarity import (
        QUERY_VECTOR,
        ivf_probe_topk,
    )

    res, index = fitted
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchnumpy()
    ids = emb["vec_id"]
    m = np.array([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    q = np.array(QUERY_VECTOR)
    cos = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    true10 = {int(ids[i]) for i in np.argsort(-cos)[:10]}

    learned = {
        int(r.vec_id)
        for r in ivf_search(index, res.centroids, QUERY_VECTOR, nprobe=3).collect()
    }
    label = {int(r.vec_id) for r in ivf_probe_topk(spark, SF, nprobe=3).collect()}
    r_learned = len(learned & true10) / 10
    r_label = len(label & true10) / 10
    assert r_learned >= 0.5, r_learned
    assert r_learned > r_label, (r_learned, r_label)


def test_quantized_fit_is_deterministic_and_serves_better_than_labels(spark):
    """The r6 registry row's reason to exist: the quantized-integer fit is
    bit-identical across runs (it must be — the DuckDB oracle replays it),
    and the served top-10 beats label routing against brute-force truth at
    the same probe budget."""
    import duckdb
    import numpy as np

    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        kmeans_fit_quantized,
    )
    from kafka_streams_dead_letter_publishing_spark.plans.registry import QUERIES
    from kafka_streams_dead_letter_publishing_spark.plans.similarity import (
        QUERY_VECTOR,
        emb_ivf_learned_topk,
        ivf_probe_topk,
    )

    emb = load_table(spark, SF, "embeddings")
    a = kmeans_fit_quantized(emb, k=6, iters=2)
    b = kmeans_fit_quantized(emb, k=6, iters=2)
    assert a == b  # exact integers, not approximately
    assert all(isinstance(v, int) for row in a for v in row)

    raw = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchnumpy()
    ids = raw["vec_id"]
    m = np.array([np.asarray(e, dtype=np.float64) for e in raw["embedding"]])
    q = np.array(QUERY_VECTOR)
    cos = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    true10 = {int(ids[i]) for i in np.argsort(-cos)[:10]}

    learned = {
        int(r.vec_id) for r in emb_ivf_learned_topk(spark, SF).collect()
    }
    label = {int(r.vec_id) for r in ivf_probe_topk(spark, SF, nprobe=3).collect()}
    r_learned = len(learned & true10) / 10
    r_label = len(label & true10) / 10
    assert r_learned >= 0.5, r_learned
    assert r_learned > r_label, (r_learned, r_label)

    # the registered BATCH row (r7 consolidation) serves query 0 = the same
    # QUERY_VECTOR through the same index: its query-0 slice must equal the
    # single-query serving path exactly
    batch0 = [
        (int(r.vec_id), r.cos)
        for r in sorted(
            QUERIES["emb_ivf_batch_topk"].spark(spark, SF).collect(),
            key=lambda r: r.rnk,
        )
        if r.query_id == 0
    ]
    single = [
        (int(r.vec_id), r.cos) for r in emb_ivf_learned_topk(spark, SF).collect()
    ]
    assert batch0 == single


def test_route_query_prefix_property():
    cents = [[0.0, 0.0], [1.0, 0.0], [0.0, 2.0], [3.0, 3.0]]
    q = [0.2, 0.1]
    r1, r2, r3 = (route_query(cents, q, n) for n in (1, 2, 3))
    assert r1 == r3[:1] and r2 == r3[:2]  # probe sets nest — recall monotone
    assert r1 == [0]


def test_kmeans_plans_stay_jvm_side_with_partial_aggregation(spark, fitted):
    res, _ = fitted
    emb = load_table(spark, SF, "embeddings")
    assigned = assign_clusters(emb, res.centroids)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # assignment is a pure narrow map

    update = (
        assigned.select("cluster", F.posexplode("embedding").alias("dim", "val"))
        .groupBy("cluster", "dim")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    uplan = update._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in uplan and "collect_list" not in uplan

    search = ivf_search(assigned, res.centroids, [0.0] * 64, nprobe=3)
    splan = search._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in splan and "ArrowEvalPython" not in splan
    assert "TakeOrdered" in splan  # top-k reduce, not a global sort


def test_persisted_index_probe_prunes_partitions(spark, fitted, tmp_path):
    """The production IVF flow: write the assigned index partitionBy
    cluster, reload, probe — the cluster IN-filter must become a PARTITION
    filter (the scan touches nprobe/nlist directories, not the corpus),
    and results must equal serving from the in-memory index."""
    res, index = fitted
    path = str(tmp_path / "ivf_index")
    index.write.partitionBy("cluster").parquet(path)
    reloaded = spark.read.parquet(path)

    query = [float(i % 7 - 3) for i in range(64)]
    from_mem = ivf_search(index, res.centroids, query, nprobe=3, k=10).collect()
    served = ivf_search(reloaded, res.centroids, query, nprobe=3, k=10)
    from_disk = served.collect()
    assert [(r.vec_id, r.cos) for r in from_disk] == [
        (r.vec_id, r.cos) for r in from_mem
    ]

    plan = served._jdf.queryExecution().executedPlan().toString()
    # cluster is a partition column: the probe filter must prune at the
    # scan (PartitionFilters carries the isin), never a post-scan Filter
    # over the full corpus
    assert "PartitionFilters: [" in plan
    assert "cluster" in plan.split("PartitionFilters:")[1][:200]


def test_batch_ivf_search_equals_per_query_search_and_prunes(spark, fitted, tmp_path):
    """ivf_search_batch's contract: ONE partition-pruned index scan +
    broadcast probe fan-out must reproduce each query's single-query result
    bit-for-bit (same probe routing, same fold-ordered doubles), and the
    plan must show the pruned scan, the broadcast probe join, and a top-k
    reduce with no Python."""
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        ivf_search_batch,
    )

    res, index = fitted
    path = str(tmp_path / "ivf_index")
    index.write.partitionBy("cluster").parquet(path)
    reloaded = spark.read.parquet(path)

    queries = [
        [float(i % 7 - 3) for i in range(64)],
        [float((i * 3) % 5 - 2) for i in range(64)],
        [0.0] * 64,  # zero-norm query: cosine undefined -> no rows
    ]
    batch = ivf_search_batch(reloaded, res.centroids, queries, nprobe=3, k=5)
    got = {
        qi: [(r.vec_id, r.cos) for r in sorted(rows, key=lambda r: r.rnk)]
        for qi, rows in __import__("itertools").groupby(
            sorted(batch.collect(), key=lambda r: (r.query_id, r.rnk)),
            key=lambda r: r.query_id,
        )
    }
    for qi, q in enumerate(queries):
        single = [
            (r.vec_id, r.cos)
            for r in ivf_search(reloaded, res.centroids, q, nprobe=3, k=5).collect()
        ]
        assert got.get(qi, []) == single, qi

    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "cluster" in plan.split("PartitionFilters:")[1][:250]
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    with pytest.raises(ValueError, match="empty query batch"):
        ivf_search_batch(reloaded, res.centroids, [], nprobe=3)


def test_ivf_append_batches_equal_one_shot_build(spark, tmp_path):
    """Incremental ingest contract: with FROZEN centroids, appending the
    corpus batch-by-batch produces the same index rows (and therefore the
    same search results) as one all-at-once write — and a real streaming
    foreachBatch drive of ivf_append lands the same rows again.
    Unindexable rows (NaN component) are dropped at ingest like at build."""
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        ivf_append,
        ivf_search_batch,
        kmeans_fit_quantized,
        nearest_cluster_quantized,
        quantize_embedding,
    )

    emb = load_table(spark, SF, "embeddings").limit(400).persist()
    emb.count()
    cents = kmeans_fit_quantized(emb, k=5, iters=2)

    def assigned(df):
        return df.select(
            "vec_id",
            "embedding",
            nearest_cluster_quantized(
                cents, quantize_embedding(F.col("embedding"))
            ).alias("cluster"),
        )

    one_shot = str(tmp_path / "one_shot")
    assigned(emb).repartition("cluster").write.partitionBy("cluster").parquet(one_shot)

    # batch-by-batch appends, plus a poisoned batch whose NaN row must drop
    appended = str(tmp_path / "appended")
    lo = emb.filter(F.col("vec_id") % 2 == 0)
    hi = emb.filter(F.col("vec_id") % 2 == 1)
    poisoned = spark.createDataFrame(
        [(999_999, [float("nan")] * 64)], "vec_id long, embedding array<float>"
    )
    ivf_append(lo, cents, appended)
    ivf_append(hi.select("vec_id", "embedding").union(poisoned), cents, appended)

    def rows(path):
        return sorted(
            (r.vec_id, r.cluster, [float(x) for x in r.embedding])
            for r in spark.read.parquet(path).collect()
        )

    assert rows(appended) == rows(one_shot)

    # a real streaming drive: same batches through foreachBatch
    src = str(tmp_path / "src")
    emb.repartition(2).write.parquet(src)
    streamed = str(tmp_path / "streamed")
    q = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.option("checkpointLocation", str(tmp_path / "ck"))
        .foreachBatch(lambda batch, _id: ivf_append(batch, cents, streamed))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert rows(streamed) == rows(one_shot)

    # served results identical over all three physical layouts
    queries = [[float(i % 5 - 2) for i in range(64)]]
    serve = lambda p: [
        (r.query_id, r.vec_id, r.cos, r.rnk)
        for r in ivf_search_batch(
            spark.read.parquet(p), cents, queries, nprobe=2, k=5
        ).collect()
    ]
    assert serve(appended) == serve(one_shot) == serve(streamed)
    emb.unpersist()


def test_ivf_compact_preserves_rows_and_collapses_files(spark, tmp_path):
    """Compaction contract: after N appends a cell holds ~N files;
    ivf_compact rewrites to one-file-per-cell (at this scale) in a NEW
    path with contents preserved row-for-row and partition pruning intact."""
    import glob

    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        ivf_append,
        ivf_compact,
        kmeans_fit_quantized,
    )

    emb = load_table(spark, SF, "embeddings").limit(300).persist()
    emb.count()
    cents = kmeans_fit_quantized(emb, k=4, iters=1)
    path = str(tmp_path / "streamed_index")
    for m in range(5):  # five micro-batch appends
        ivf_append(emb.filter(F.col("vec_id") % 5 == m), cents, path)
    files_before = len(glob.glob(f"{path}/cluster=*/*.parquet"))
    assert files_before >= 4 * 5  # every append touched (almost) every cell

    compacted = str(tmp_path / "compacted")
    ivf_compact(spark, path, compacted)
    files_after = len(glob.glob(f"{compacted}/cluster=*/*.parquet"))
    assert files_after <= 4  # one file per cell at this scale

    def rows(p):
        return sorted(
            (r.vec_id, r.cluster, [float(x) for x in r.embedding])
            for r in spark.read.parquet(p).collect()
        )

    assert rows(compacted) == rows(path)
    # compacting onto an existing path must refuse (swap is by repoint)
    with pytest.raises(Exception, match="already exists|LOCATION_ALREADY_EXISTS"):
        ivf_compact(spark, path, compacted)
    emb.unpersist()


def test_ivf_replayed_append_duplicates_never_distort_serving(spark, tmp_path):
    """At-least-once contract (r9, ADVICE): an ivf_append crash replay
    leaves identical (id, embedding, cluster) rows; ivf_search_batch must
    dedup on id so a duplicate cannot occupy two ranks or displace a
    genuine candidate — double-append serving equals single-append
    serving row-for-row."""
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        ivf_append,
        ivf_search_batch,
        kmeans_fit_quantized,
    )

    emb = load_table(spark, SF, "embeddings").limit(200).persist()
    emb.count()
    cents = kmeans_fit_quantized(emb, k=4, iters=2)
    once, twice = str(tmp_path / "once"), str(tmp_path / "twice")
    ivf_append(emb, cents, once)
    ivf_append(emb, cents, twice)
    ivf_append(emb, cents, twice)  # the crash replay

    queries = [[float(i % 5 - 2) for i in range(64)]]
    serve = lambda p: [
        (r.query_id, r.vec_id, r.cos, r.rnk)
        for r in ivf_search_batch(
            spark.read.parquet(p), cents, queries, nprobe=2, k=10
        ).orderBy("rnk").collect()
    ]
    ref, got = serve(once), serve(twice)
    assert got == ref
    ids = [(g[0], g[1]) for g in got]
    assert len(ids) == len(set(ids))
    assert len(got) == 10
    emb.unpersist()
