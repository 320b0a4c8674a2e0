"""Embedding near-dup ingest filter (`operators/ann_filter.py`): planted
perturbation recall, threshold semantics, zero-norm handling, plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.ann_filter import (
    ann_filter,
    build_ann_index,
)

DIM = 64


def _vecs(n, seed):
    rng = np.random.default_rng(seed)
    return [[float(x) for x in rng.standard_normal(DIM)] for _ in range(n)]


def _perturb(v, eps, seed):
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal(DIM)
    out = np.array(v) + eps * noise
    return [float(x) for x in out]


@pytest.fixture(scope="module")
def ref_and_batch(spark):
    ref = _vecs(200, seed=1)
    corpus = spark.createDataFrame(
        [(i, v) for i, v in enumerate(ref)], "vec_id bigint, embedding array<float>"
    )
    # batch: 50 small perturbations of reference vectors (cos ≈ 0.999,
    # unambiguous dups) + 50 fresh random vectors (cos ≈ 0 w.h.p.)
    dups = [(1000 + i, _perturb(ref[i], 0.02, seed=100 + i)) for i in range(50)]
    novel = [(2000 + i, v) for i, v in enumerate(_vecs(50, seed=2))]
    batch = spark.createDataFrame(
        dups + novel + [(3000, [0.0] * DIM)],  # zero-norm: always passes
        "vec_id bigint, embedding array<float>",
    )
    return corpus, batch


def test_planted_dups_rejected_novel_kept(spark, ref_and_batch):
    """OR-amplified recall at cos≈0.999 is ~1-(1-p^4)^6 with p≈0.99 —
    expect essentially every planted dup caught; every novel vector and
    the zero-norm vector must pass."""
    corpus, batch = ref_and_batch
    idx = build_ann_index(corpus)
    kept = {r.vec_id for r in ann_filter(batch, idx, min_cos=0.9).collect()}
    novel_ids = {2000 + i for i in range(50)} | {3000}
    assert novel_ids <= kept  # precision: nothing novel is rejected
    missed_dups = {v for v in kept if v < 2000}
    assert len(missed_dups) == 0  # recall at cos~0.999: all planted dups caught


def test_threshold_above_dup_cosine_keeps_everything(spark, ref_and_batch):
    corpus, batch = ref_and_batch
    idx = build_ann_index(corpus)
    # cos(perturbed, ref) < 1 strictly, so min_cos=1.0 rejects nothing
    # (exact-equality dups would still hit 1.0 within float rounding)
    assert ann_filter(batch, idx, min_cos=1.0).count() == batch.count()


def test_empty_index_passes_everything(spark, ref_and_batch):
    _, batch = ref_and_batch
    empty = build_ann_index(
        batch.sparkSession.createDataFrame([], "vec_id bigint, embedding array<float>")
    )
    assert ann_filter(batch, empty).count() == batch.count()


def test_empty_batch_yields_empty_with_schema(spark, ref_and_batch):
    corpus, _ = ref_and_batch
    idx = build_ann_index(corpus)
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    out = ann_filter(empty, idx)
    assert out.count() == 0 and out.columns == ["vec_id", "embedding"]


def test_filter_is_idempotent_and_a_subset(spark, ref_and_batch):
    corpus, batch = ref_and_batch
    idx = build_ann_index(corpus)
    once = ann_filter(batch, idx)
    kept_once = sorted(r.vec_id for r in once.collect())
    kept_twice = sorted(r.vec_id for r in ann_filter(once, idx).collect())
    assert kept_once == kept_twice
    assert set(kept_once) <= {r.vec_id for r in batch.collect()}


def test_plan_is_equi_join_leftanti_no_python(spark, ref_and_batch):
    corpus, batch = ref_and_batch
    idx = build_ann_index(corpus)
    plan = (
        ann_filter(batch, idx)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bucket_occupancy_cap_defuses_hot_buckets(spark):
    """The correlated-cluster hot-bucket guard (r7), mirror of the neardup
    band cap: 40 copies of one direction fill their 6 buckets far past the
    random-model occupancy; capping drops those buckets — their dup passes
    (documented trade) — while a dup of a NORMAL vector keeps its non-hot
    buckets and is still rejected."""
    from pyspark.sql import functions as F

    from kafka_streams_dead_letter_publishing_spark.operators.ann_filter import (
        ann_filter,
        build_ann_index,
    )
    from kafka_streams_dead_letter_publishing_spark.sources.synth import synth_embeddings

    normal = synth_embeddings(spark, 40, planted_every=10**9)
    hot_dir = [float((i % 7) - 3) for i in range(64)]
    cluster = spark.createDataFrame(
        [(100 + i, [x * (1 + 0.0001 * i) for x in hot_dir]) for i in range(40)],
        "vec_id long, embedding array<float>",
    ).withColumn("label", F.lit(0))
    corpus = normal.unionByName(cluster).persist()

    base7 = [list(r.embedding) for r in normal.filter(F.col("vec_id") == 7).collect()][0]
    batch = spark.createDataFrame(
        [
            (1000, [float(x) * 1.001 for x in base7]),  # dup of normal vec 7
            (1001, [x * 1.0005 for x in hot_dir]),  # dup of the hot cluster
            (1002, [float(((i * 13) % 11) - 5) for i in range(64)]),  # unrelated
        ],
        "vec_id long, embedding array<float>",
    )

    uncapped = build_ann_index(corpus)
    kept = {r.vec_id for r in ann_filter(batch, uncapped, min_cos=0.99).collect()}
    assert kept == {1002}

    capped = build_ann_index(corpus, max_bucket_occupancy=10)
    kept_capped = {r.vec_id for r in ann_filter(batch, capped, min_cos=0.99).collect()}
    assert 1001 in kept_capped  # hot-cluster dup passes: its buckets dropped
    assert 1000 not in kept_capped  # normal dup still rejected
    assert 1002 in kept_capped
    occ = capped.buckets.groupBy("bk").count().agg(F.max("count")).collect()[0][0]
    assert occ <= 10
    corpus.unpersist()


def _unit(rng, d=64):
    import math

    v = [rng.gauss(0, 1) for _ in range(d)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _at_cos(rng, v, target):
    import math

    u = _unit(rng, len(v))
    d = sum(a * b for a, b in zip(v, u))
    u = [b - d * a for a, b in zip(v, u)]
    un = math.sqrt(sum(x * x for x in u))
    u = [x / un for x in u]
    s = math.sqrt(1 - target * target)
    return [target * a + s * b for a, b in zip(v, u)]


def test_semantic_decontaminate_boundary_recall_and_refusal(spark):
    """The production eval-leak gate (r11 verdict #6): at tau=0.85 with
    the lsh_config_for-solved (tables, depth), planted BOUNDARY
    paraphrases (cos ~ 0.86-0.92 — the regime where depth erodes recall;
    verbatim copies are easy at any depth) must be caught at >= the 0.95
    design recall, and an infeasible recall target must REFUSE rather
    than silently under-catch."""
    import random

    import pytest as _pytest

    from kafka_streams_dead_letter_publishing_spark.operators.ann_filter import (
        lsh_recall_bound,
        semantic_decontaminate,
    )

    rng = random.Random(5)
    ev = [(i, _unit(rng)) for i in range(30)]
    eval_df = spark.createDataFrame(ev, "vec_id long, embedding array<double>")
    clean = [(1000 + i, _unit(rng)) for i in range(800)]
    leaks = [
        (2000 + eid, list(v) if eid % 2 == 0 else _at_cos(rng, v, rng.uniform(0.86, 0.92)))
        for eid, v in ev
    ]
    df = spark.createDataFrame(
        clean + leaks, "vec_id long, embedding array<double>"
    )
    kept = {
        r.vec_id
        for r in semantic_decontaminate(
            df, eval_df, 30, min_cos=0.85, min_recall=0.95
        ).select("vec_id").collect()
    }
    caught = sum(1 for lid, _ in leaks if lid not in kept)
    assert caught / len(leaks) >= 0.95, caught / len(leaks)
    # clean random vectors in dim 16 essentially never reach cos 0.85
    assert sum(1 for cid, _ in clean if cid not in kept) <= len(clean) * 0.02

    # the bound the config was solved against is honest
    from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
        lsh_config_for,
    )

    t, b = lsh_config_for(30, threshold=0.85, recall=0.95)
    assert lsh_recall_bound(0.85, t, b) >= 0.95

    # refusing guard: an infeasible (threshold, recall) pair raises
    with _pytest.raises(ValueError, match="plane pool"):
        semantic_decontaminate(
            df, eval_df, 30, min_cos=0.5, min_recall=0.9999
        )


# ── fail-fast LSH dimension guard (r12 verdict #1) ───────────────────────
#
# A vector narrower than the EMBEDDING_DIM-wide hyperplane pool zip_with-
# pads every plane dot to NULL: all sign bits read '0', every vector lands
# in ONE bucket per table, and the candidate equi-join silently degrades
# to an all-pairs cross join while recall reads a flattering 1.0 (the
# SCALE.md decontam-probe caveat).  Every LSH entry point must REFUSE a
# mismatched dimension at execution time instead.

_SHORT = [1.0, 2.0, 3.0]


@pytest.fixture(scope="module")
def short_vec_df(spark):
    return spark.createDataFrame(
        [(1, _SHORT)], "vec_id bigint, embedding array<float>"
    )


def _expect_dim_error(df):
    with pytest.raises(Exception, match="LSH embedding must be exactly"):
        df.collect()


def test_lsh_bucket_refuses_mismatched_dim(spark, short_vec_df):
    from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
        lsh_bucket,
    )

    _expect_dim_error(short_vec_df.select(lsh_bucket(F.col("embedding"))))


def test_lsh_table_keys_refuse_mismatched_dim(spark, short_vec_df):
    from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
        lsh_table_keys,
        lsh_table_keys_int,
    )

    _expect_dim_error(short_vec_df.select(lsh_table_keys(F.col("embedding"))))
    _expect_dim_error(short_vec_df.select(lsh_table_keys_int(F.col("embedding"))))
    # the r18 string-name (single-SQL-expr) form guards identically
    _expect_dim_error(short_vec_df.select(lsh_table_keys_int("embedding")))


def test_lsh_table_keys_int_str_form_matches_column_form(spark, ref_and_batch):
    """The memoized-SQL string form (r18) must produce the exact key
    arrays of the Column-lambda form — same sign bits, same table
    offsets — on the default AND a non-default (tables, planes) config."""
    from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
        lsh_table_keys_int,
    )

    corpus, _ = ref_and_batch
    for nt, ppt in ((6, 4), (8, 5)):
        col_form = corpus.select(
            "vec_id", lsh_table_keys_int(F.col("embedding"), nt, ppt).alias("k")
        )
        str_form = corpus.select(
            "vec_id", lsh_table_keys_int("embedding", nt, ppt).alias("k")
        )
        assert col_form.exceptAll(str_form).count() == 0
        assert str_form.exceptAll(col_form).count() == 0


def test_ann_index_build_refuses_mismatched_dim(spark, short_vec_df):
    idx = build_ann_index(short_vec_df)  # lazy — the error fires on action
    _expect_dim_error(idx.buckets)


def test_ann_filter_refuses_mismatched_batch_dim(spark, ref_and_batch, short_vec_df):
    corpus, _ = ref_and_batch
    idx = build_ann_index(corpus)
    _expect_dim_error(ann_filter(short_vec_df, idx, min_cos=0.9))


def test_semantic_decontaminate_refuses_mismatched_dim(spark, ref_and_batch, short_vec_df):
    from kafka_streams_dead_letter_publishing_spark.operators.ann_filter import (
        semantic_decontaminate,
    )

    corpus, batch = ref_and_batch
    # mismatched EVAL side
    _expect_dim_error(
        semantic_decontaminate(batch, short_vec_df, 1, min_cos=0.9)
    )
    # mismatched BATCH side
    _expect_dim_error(
        semantic_decontaminate(short_vec_df, corpus, 200, min_cos=0.9)
    )


def test_dim_guard_passes_well_formed_vectors(spark, ref_and_batch):
    """The guard is a pure pass-through on EMBEDDING_DIM-wide input: the
    bucket keys of a well-formed corpus are unchanged and non-degenerate
    (more than one distinct bucket per table)."""
    from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
        lsh_table_keys_int,
    )

    corpus, _ = ref_and_batch
    keys = corpus.select(
        F.explode(lsh_table_keys_int(F.col("embedding"))).alias("bk")
    )
    assert keys.select("bk").distinct().count() > 6  # > one bucket/table
