"""DSIR importance resampling (operators/dsir.py): exact parity with a
sequential Python reference (same quantized integer weights), the
target-upweighting semantics the method exists for, and the 100 TB plan
shape — the weight table is bucket-bounded and broadcast, the exploded
corpus never shuffles on the bucket key, and no Python UDFs appear."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.dsir import (
    SCALE,
    doc_feature_buckets,
    dsir_sample,
    dsir_scores,
    importance_weights,
)


def _feats(text: str) -> list[str]:
    toks = " ".join(text.lower().split()).split(" ")
    return toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]


def _bucket(f: str) -> str:
    return hashlib.md5(f.encode()).hexdigest()[:2]


def _python_scores(rows, target_rows) -> dict[int, int]:
    rc = Counter(_bucket(f) for _, t in rows for f in _feats(t))
    tc = Counter(_bucket(f) for _, t in target_rows for f in _feats(t))
    w = {b: (SCALE * (1 + tc.get(b, 0))) // (1 + n) for b, n in rc.items()}
    return {
        d: sum(w[_bucket(f)] for f in _feats(t) if _bucket(f) in w)
        for d, t in rows
    }


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "der hund schlief auf dem boden"),
        (2, "the dog ran in the park"),
        (3, "el gato duerme en la casa"),
        (4, "the cat and the dog played"),
        (5, "une phrase en francais ici"),
        (6, "cat dog park mat"),
    ]
    target_rows = [r for r in rows if r[1].startswith("the")]
    return (
        spark.createDataFrame(rows, "doc_id long, text string"),
        spark.createDataFrame(target_rows, "doc_id long, text string"),
        rows,
        target_rows,
    )


def test_scores_match_python_reference(corpus):
    docs, target, rows, target_rows = corpus
    got = {r.doc_id: r.score for r in dsir_scores(docs, target).collect()}
    assert got == _python_scores(rows, target_rows)


def test_target_like_docs_outrank_off_domain(corpus):
    docs, target, rows, target_rows = corpus
    scores = {r.doc_id: r.score for r in dsir_scores(docs, target).collect()}
    # normalize by feature count so doc length doesn't dominate the check
    n = {d: len(_feats(t)) for d, t in rows}
    per_feat = {d: scores[d] / n[d] for d in scores}
    target_ids = {d for d, _ in target_rows}
    worst_target = min(per_feat[d] for d in per_feat if d in target_ids)
    best_off = max(per_feat[d] for d in per_feat if d not in target_ids)
    assert worst_target > best_off


def test_sample_is_top_n_with_id_tiebreak(corpus):
    docs, target, rows, _ = corpus
    scores = {r.doc_id: r.score for r in dsir_scores(docs, target).collect()}
    expect = sorted(scores, key=lambda d: (-scores[d], d))[:3]
    got = [r.doc_id for r in dsir_sample(docs, target, n=3).collect()]
    assert got == expect


def test_weight_table_is_bucket_bounded(corpus):
    docs, target, _, _ = corpus
    b = doc_feature_buckets(docs, ["doc_id"]).select("bucket")
    tb = doc_feature_buckets(target, ["doc_id"]).select("bucket")
    w = importance_weights(b, tb)
    assert w.count() <= 256
    # every weight positive; buckets with zero target mass get the floor
    assert w.filter(F.col("w") <= 0).count() == 0


def test_plan_broadcasts_weights_no_bucket_shuffle_no_udf(corpus):
    docs, target, _, _ = corpus
    plan = (
        dsir_sample(docs, target, n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan  # distributed top-k, no global sort
    # bucket-keyed exchanges may only sit under the broadcast (the ≤256-row
    # weight build); the scored corpus side — everything before the first
    # BroadcastExchange in the printed plan — shuffles only on doc_id
    probe = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning(bucket" not in probe


def test_subset_form_equals_two_frame_form(corpus):
    from kafka_streams_dead_letter_publishing_spark.operators.dsir import (
        dsir_scores_subset,
    )

    docs, target, _, _ = corpus
    two = {r.doc_id: r.score for r in dsir_scores(docs, target).collect()}
    one = {
        r.doc_id: r.score
        for r in dsir_scores_subset(
            docs, F.col("text").startswith("the")
        ).collect()
    }
    assert one == two
