"""Physical-plan quality gates (the 100 TB posture, SURVEY §4.3): filters
reach the scan, dimensions broadcast, candidate joins are equi-joins, and
row-at-a-time Python never appears.  These assertions are what `.explain`
iteration produced — pinned so regressions can't ship silently."""

from __future__ import annotations

import pytest

from kafka_streams_dead_letter_publishing_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    return QUERIES[name].spark(spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_to_scan_and_columns_pruned(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "l_shipdate" in plan.split(
        "PushedFilters"
    )[1].split("]")[0]
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema  # unused columns must not be read
    assert "l_quantity" in read_schema


def test_star_joins_broadcast_dimensions_only(spark):
    for name in ("q3_shipping_priority", "q5_region_revenue", "q14_promo_revenue"):
        plan = plan_of(spark, name)
        assert "BroadcastHashJoin" in plan, name
    # The CODE must not force-broadcast the fact-sized orders table: at toy
    # SF the optimizer may still auto-broadcast it (stats-based, correct —
    # at scale it exceeds the threshold and AQE picks a shuffle join), so
    # the assertion is on the *requested hints* in the analyzed plan: none
    # of them may sit directly on the orders relation.
    q5 = QUERIES["q5_region_revenue"].spark(spark, SF)
    analyzed = q5._jdf.queryExecution().analyzed().toString()
    hinted = [
        seg.split("Relation [", 1)[1][:12]
        for seg in analyzed.split("ResolvedHint")[1:]
        if "Relation [" in seg
    ]
    assert hinted, "expected broadcast hints on the dimension subtrees"
    # first relation under each hint must be a dimension, never orders/lineitem
    for first_scan in hinted:
        assert not first_scan.startswith(("o_orderkey", "l_orderkey")), hinted


def test_semi_anti_joins_use_semi_anti_physical_ops(spark):
    assert "LeftSemi" in plan_of(spark, "semi_promo_parts_shipped")
    assert "LeftAnti" in plan_of(spark, "anti_customers_no_open_orders")
    # the near-dup keeper's corpus dedup is an anti-join against the
    # non-keeper cluster members — never a cartesian or NOT-IN subquery scan
    keeper_plan = plan_of(spark, "docs_neardup_keepers")
    assert "LeftAnti" in keeper_plan
    assert "CartesianProduct" not in keeper_plan
    assert "BroadcastNestedLoopJoin" not in keeper_plan


def test_candidate_joins_are_never_cartesian(spark):
    for name in ("docs_neardup_verified", "emb_ann_multitable_pairs"):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # the retired-but-kept brute-force baseline (r14): still must fan the
    # query batch out via posexplode — never a cartesian against a query
    # table — and keep its two-phase window (local pid cut before global)
    from kafka_streams_dead_letter_publishing_spark.plans.similarity import (
        emb_multi_query_topk,
    )

    plan = str(
        emb_multi_query_topk(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_label_propagation_step_is_one_equi_join_one_aggregate(spark):
    """docs_neardup_clusters' iteration body (r3 verdict #2's plan demand):
    each round must be an equi-join + aggregate over the label table —
    never a cartesian, never a nested loop.  The registered query's final
    plan is a checkpoint scan (lineage deliberately cut per round), so the
    gate inspects the step function itself."""
    from kafka_streams_dead_letter_publishing_spark.operators.components import (
        label_propagation_step,
    )

    edges = spark.createDataFrame([(1, 2), (2, 1), (1, 1), (2, 2)], "src long, dst long")
    labels = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, lbl long")
    plan = label_propagation_step(edges, labels)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan and "HashAggregate" in plan
    assert "partial_min" in plan  # map-side partial agg before the shuffle


def test_no_row_at_a_time_python_anywhere(spark):
    for name in QUERIES:
        plan = plan_of(spark, name)
        assert "BatchEvalPython" not in plan, name  # Arrow-batched only


@pytest.mark.parametrize("name", ["dlt_route_counts"])
def test_route_counts_never_generates_strings(spark, name):
    plan = plan_of(spark, name)
    assert "translate" not in plan  # generation pruned out of the count path


def test_int_lsh_keys_are_bijective_with_string_keys(spark):
    """The engine-side integer band keys must induce EXACTLY the string
    keys' bucketing (1:1 mapping) — that equivalence is what keeps the
    candidate set identical to the oracle's string-keyed candidates."""
    from pyspark.sql import functions as F

    from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
        lsh_table_keys,
        lsh_table_keys_int,
    )
    from kafka_streams_dead_letter_publishing_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    paired = emb.select(
        F.explode(
            F.arrays_zip(
                lsh_table_keys(F.col("embedding")).alias("sk"),
                lsh_table_keys_int(F.col("embedding")).alias("ik"),
            )
        ).alias("z")
    ).select("z.sk", "z.ik")
    n_sk = paired.select("sk").distinct().count()
    n_ik = paired.select("ik").distinct().count()
    n_pairs = paired.distinct().count()
    assert n_sk == n_ik == n_pairs  # 1:1 both ways across the corpus


def test_lsh_bucket_occupancy_stays_bounded(spark):
    """r2 fix #4: the ANN bucket join is only sub-quadratic if buckets stay
    small.  At sf0.1 (the bench SF) the default 8-plane bucketing must keep
    every bucket far below corpus size, and the plane count must grow with
    the corpus so occupancy holds at scale."""
    from pyspark.sql import functions as F

    from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
        lsh_bucket,
        n_hyperplanes_for,
    )
    from kafka_streams_dead_letter_publishing_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    occ = (
        emb.select(lsh_bucket(F.col("embedding")).alias("b"))
        .groupBy("b")
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]["mx"]
    )
    assert occ <= 64, occ  # measured 23 at sf0.1; alarm well before quadratic
    # occupancy-constant scaling: 2^planes grows linearly with the corpus
    assert n_hyperplanes_for(10**6) >= 12
    assert n_hyperplanes_for(10**9) >= 21
    assert n_hyperplanes_for(0) == 8


def test_scale_centroids_use_partial_aggregation_not_collect(spark):
    """The r2 verdict's #1 scale fix: centroid/IVF index builds must never
    materialize a label's inverted list in one aggregation buffer — the
    plan must show map-side partial sums and no collect_list.
    ivf_probe_topk lost its registry row to the learned-IVF path (r6) but
    remains the recall-comparison baseline, so its plan stays gated."""
    from kafka_streams_dead_letter_publishing_spark.plans.similarity import ivf_probe_topk

    plans = {
        "emb_label_centroids_scale": plan_of(spark, "emb_label_centroids_scale"),
        "ivf_probe_topk": ivf_probe_topk(spark, SF, nprobe=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString(),
    }
    for name, plan in plans.items():
        assert "collect_list" not in plan, name
        assert "partial_sum" in plan, name


def test_oracle_centroid_mode_refuses_oversized_groups(spark):
    """r5 verdict #4: the order-pinned centroid mode buffers one label's
    whole inverted list in a single aggregation-buffer row — a contract
    violation at scale, not a slow path.  The guard must fail FAST (before
    the buffering aggregation) and point at the scale mode; the real cap
    must clear every sf the oracle runs at."""
    from kafka_streams_dead_letter_publishing_spark.plans.similarity import (
        ORACLE_CENTROID_MAX_GROUP,
        _centroids,
    )

    with pytest.raises(RuntimeError, match="emb_label_centroids_scale"):
        _centroids(spark, "/root/testdata/sf0.01", max_group=10).collect()
    # default cap admits the oracle SFs (sf0.01 ≈ 1e3 vectors/label) with
    # ~100× headroom, and the registry row stays green
    assert ORACLE_CENTROID_MAX_GROUP >= 100_000
    # fold mode stays buildable as a library helper (registry row retired
    # r9 — emb_label_centroids_scale is the registered centroid surface)
    assert _centroids(spark, "/root/testdata/sf0.001").columns == [
        "label",
        "n",
        "centroid",
    ]


def test_learned_ivf_serves_from_partition_pruned_scan(spark):
    """The learned-IVF registry row's scale contract (r5 verdict #2):
    cluster is a PARTITION column of the persisted index, and the probe
    filter must prune at the scan — PartitionFilters carries the cluster
    membership, so the serve reads nprobe/nlist directories, never the
    whole index — and the quantized k-means fit itself must keep the
    no-collect_list / partial-aggregation posture."""
    from kafka_streams_dead_letter_publishing_spark.plans.similarity import (
        IVF_LEARNED_NLIST,
        IVF_NPROBE,
        emb_ivf_learned_topk,
    )

    # single-query serving path (kept as a plain function after the r7
    # batch consolidation): pruned scan + top-k reduce
    plan = (
        emb_ivf_learned_topk(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters:")[1][:250]
    assert "cluster" in pf, pf
    # the IN-list must name nprobe clusters, a strict subset of nlist
    assert IVF_NPROBE < IVF_LEARNED_NLIST
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrdered" in plan  # top-k reduce, not a global sort

    # the registered BATCH row: ONE pruned scan over the union of probed
    # cells, broadcast probe fan-out (never a cartesian against the query
    # batch), two-phase window top-k, still zero Python
    bplan = plan_of(spark, "emb_ivf_batch_topk")
    assert "PartitionFilters: [" in bplan
    assert "cluster" in bplan.split("PartitionFilters:")[1][:250]
    assert "BroadcastHashJoin" in bplan
    assert "CartesianProduct" not in bplan
    assert "BroadcastNestedLoopJoin" not in bplan
    assert "BatchEvalPython" not in bplan and "ArrowEvalPython" not in bplan

    # fit posture: the per-iteration update aggregation (same shape the
    # driver loop collects) uses map-side partial sums, never collect_list
    from pyspark.sql import functions as F

    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        kmeans_fit_quantized,
        nearest_cluster_quantized,
        quantize_embedding,
    )
    from kafka_streams_dead_letter_publishing_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    cents = kmeans_fit_quantized(emb, k=4, iters=1)
    update = (
        emb.select(
            nearest_cluster_quantized(
                cents, quantize_embedding(F.col("embedding"))
            ).alias("cluster"),
            F.posexplode(quantize_embedding(F.col("embedding"))).alias("dim", "val"),
        )
        .groupBy("cluster", "dim")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    uplan = update._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in uplan and "collect_list" not in uplan


def _true_topk_pairs(k: int = 50) -> set[tuple[int, int]]:
    """Ground-truth top-k cosine pairs at sf0.1, brute-forced in numpy."""
    import duckdb
    import numpy as np

    emb = duckdb.sql(
        "SELECT vec_id, embedding FROM '/root/testdata/sf0.1/embeddings.parquet'"
    ).fetchnumpy()
    ids = emb["vec_id"]
    m = np.array([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = mn @ mn.T
    iu = np.triu_indices(len(ids), k=1)
    top = np.argsort(-cos[iu])[:k]
    return {(int(ids[iu[0][t]]), int(ids[iu[1][t]])) for t in top}


def test_multitable_ann_recall_floor(spark):
    """r3 verdict #6: the ANN path needs a measured RECALL gate, not just
    an occupancy gate.  Floor = 0.6 of the brute-force top-50 pairs at
    sf0.1 (the multi-table 6×4 config measures 0.64; the r3 single-table
    8-plane query measured 0.06 — the reason the operator is multi-table
    now).  Anyone re-tuning b/L or the plane pool trips this first."""
    import numpy as np

    from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
        HYPERPLANES,
        N_HYPERPLANES,
    )

    true_pairs = _true_topk_pairs(50)
    got = QUERIES["emb_ann_multitable_pairs"].spark(spark, "/root/testdata/sf0.1").collect()
    got_pairs = {(int(r.vec_a), int(r.vec_b)) for r in got}
    recall = len(got_pairs & true_pairs) / 50
    assert recall >= 0.6, f"multi-table recall {recall}"

    # document WHY multi-table: the single deep table loses almost all
    # moderate-similarity pairs (AND-amplification) — computed in numpy
    # with the same plane pool the operator uses
    import duckdb

    emb = duckdb.sql(
        "SELECT vec_id, embedding FROM '/root/testdata/sf0.1/embeddings.parquet'"
    ).fetchnumpy()
    ids = list(map(int, emb["vec_id"]))
    m = np.array([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    signs = (m @ np.array(HYPERPLANES[:N_HYPERPLANES]).T) >= 0
    bucket = {i: tuple(s) for i, s in zip(ids, signs)}
    single = sum(1 for a, b in true_pairs if bucket[a] == bucket[b]) / 50
    assert single < recall, (single, recall)


def test_ivf_multi_probe_recall_is_monotone_and_gated(spark):
    """Multi-probe IVF (r4): the probed label set at nprobe=k is a PREFIX of
    the coarse ranking, so the candidate pool only grows with nprobe and
    recall@10 is monotone non-decreasing — and probing every list must
    reproduce exact brute force.  On this corpus labels carry no cluster
    structure, so recall ≈ nprobe/nlist is the theoretical ceiling: measured
    0.0 / 0.3 / 1.0 at nprobe 1 / 3 / 10 (nlist=10).  The registry query
    pins nprobe=3; anyone dropping it back to the single-probe textbook demo
    (recall 0.0 here) trips this gate."""
    import duckdb
    import numpy as np

    from kafka_streams_dead_letter_publishing_spark.plans.similarity import (
        IVF_NPROBE,
        QUERY_VECTOR,
        ivf_probe_topk,
    )

    assert IVF_NPROBE >= 3
    emb = duckdb.sql(
        "SELECT vec_id, embedding FROM '/root/testdata/sf0.1/embeddings.parquet'"
    ).fetchnumpy()
    ids = emb["vec_id"]
    m = np.array([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    q = np.array(QUERY_VECTOR)
    cos = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    true10 = {int(ids[i]) for i in np.argsort(-cos)[:10]}

    recalls = {}
    for nprobe in (1, IVF_NPROBE, 10):
        got = {
            int(r.vec_id)
            for r in ivf_probe_topk(spark, "/root/testdata/sf0.1", nprobe).collect()
        }
        recalls[nprobe] = len(got & true10) / 10
    assert recalls[1] <= recalls[IVF_NPROBE] <= recalls[10]
    assert recalls[IVF_NPROBE] >= 0.3, recalls
    assert recalls[IVF_NPROBE] > recalls[1], recalls
    assert recalls[10] == 1.0, recalls  # full probe ≡ exact brute force


def test_hyperplane_pool_prefix_is_frozen():
    """The oracle SQL embeds the first 24 planes verbatim; the pool may
    GROW (r7: 24 → 192 so deeper multi-table configs can scale with corpus
    size) but the prefix must never shift — the seeded rng emits planes
    sequentially, so appending is safe and anything else is an oracle
    break.  Golden sha256 over the big-endian doubles of planes [0, 24)."""
    import hashlib
    import struct as _struct

    from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
        HYPERPLANES,
        MAX_HYPERPLANES,
        PLANES_PER_TABLE,
        planes_per_table_for,
    )

    h = hashlib.sha256()
    for p in HYPERPLANES[:24]:
        for w in p:
            h.update(_struct.pack(">d", w))
    assert (
        h.hexdigest()
        == "8d79e2b8ed1e3a7a2a0e63864e0548e84d3ab780cfe8a173e8f2405d1c03aefb"
    )
    assert len(HYPERPLANES) == MAX_HYPERPLANES >= 24

    # the depth knob: floored at the oracle default, monotone in N, capped
    # by the pool, and holding candidate volume ≈ linear (b grows by ~2
    # per 4× corpus)
    assert planes_per_table_for(0) == PLANES_PER_TABLE
    assert planes_per_table_for(2_000) >= PLANES_PER_TABLE
    bs = [planes_per_table_for(n) for n in (2_000, 8_000, 32_000, 10**9)]
    assert bs == sorted(bs)
    assert bs[-1] <= MAX_HYPERPLANES // 6
    assert bs[2] >= bs[0] + 3  # 16x corpus -> ~4 more planes


def test_lsh_config_solver_meets_recall_and_budget_or_refuses():
    """lsh_config_for must return configs that actually deliver the recall
    target AND the linear candidate budget, and must REFUSE (ValueError)
    where sign-LSH can't do both within the pool — never silently trade
    one constraint away (the clamped-depth bug class)."""
    import math

    import pytest as _pytest

    from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
        MAX_HYPERPLANES,
        lsh_config_for,
    )

    for n, thr, rec in ((2_000, 0.9, 0.9), (2_000, 0.95, 0.95), (32_000, 0.95, 0.95)):
        L, b = lsh_config_for(n, thr, rec)
        assert L * b <= MAX_HYPERPLANES
        p = 1 - math.acos(thr) / math.pi
        assert 1 - (1 - p**b) ** L >= rec  # promised recall actually holds
        assert L * n / 2**b <= 2 * 64  # random candidates/vector ~ budget

    # the regime where OR-amplified sign-LSH stops being the right tool:
    # the solver names it rather than shipping a quadratic or low-recall
    # config (the docstring routes these corpora to the learned-IVF path)
    with _pytest.raises(ValueError, match="plane pool"):
        lsh_config_for(1_000_000, 0.95, 0.95)


def test_lsh_knobs_edge_cases_fail_loud_not_degenerate():
    """r7 review regressions: (a) planes_per_table_for must refuse table
    counts the pool can't fund at minimum depth rather than return a
    sub-floor (even zero) depth whose single-bucket tables are the exact
    quadratic blowup the knob prevents; (b) lsh_config_for must refuse —
    not ZeroDivisionError — when p**b underflows so far that per-table
    recall is numerically zero."""
    import pytest as _pytest

    from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
        lsh_config_for,
        planes_per_table_for,
    )

    with _pytest.raises(ValueError, match="plane pool"):
        planes_per_table_for(10_000, n_tables=200)  # would have returned b=0
    with _pytest.raises(ValueError, match="plane pool"):
        planes_per_table_for(10_000, n_tables=64)  # would have returned b=3

    # low threshold => p small => p**b underflows during the search; the
    # documented ValueError refusal must come back, not a division crash
    with _pytest.raises(ValueError, match="plane pool"):
        lsh_config_for(1_000_000, threshold=0.2, recall=0.9)


def test_pretraining_pipeline_composes_without_single_partition(spark):
    """The r8 capstone: five composed stages (split -> decontaminate ->
    cap -> budget -> pack) must stay one bucket-parallel Catalyst plan —
    no SinglePartition exchange, no Python, no cartesian — or composing
    them at 100 TB would serialize on whichever stage regressed."""
    plan = plan_of(spark, "docs_pretraining_pipeline")
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
