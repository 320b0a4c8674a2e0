"""CCNet-style perplexity bucketing (operators/perplexity.py).

Pins the contracts the quality filter rests on: exact parity with a pure
Python bigram-LM reference (so the DuckDB oracle's bit-for-bit replay is
guaranteed by construction), the in-domain-scores-lower property, the
top-V vocabulary cut with OOV fallback, the zero-position edge, and the
broadcast-only executed plan.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.perplexity import (
    bigram_lm,
    perplexity_buckets,
    surprise_scores,
)


def _py_tokens(text: str) -> list[str]:
    import re

    return re.sub(r"[ \t\n\x0b\f\r]+", " ", text.lower()).split(" ")


def _py_scores(docs, ref_pred, max_vocab=65536):
    """(doc_id -> (n_positions, score)) under the exact integer model."""
    uni: Counter = Counter()
    bi: Counter = Counter()
    for doc_id, text in docs:
        if not ref_pred(doc_id, text):
            continue
        t = _py_tokens(text)
        uni.update(t)
        bi.update(f"{a} {b}" for a, b in zip(t, t[1:]))
    vocab = dict(
        sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]
    )
    V = len(vocab)
    out = {}
    for doc_id, text in docs:
        t = _py_tokens(text)
        score = 0
        for a, b in zip(t, t[1:]):
            r = (vocab.get(a, 0) + V + 1) // (bi.get(f"{a} {b}", 0) + 1)
            score += r.bit_length() - 1
        out[doc_id] = (len(t) - 1, score)
    return out


_DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the hat"),
    (3, "the dog sat on the mat"),
    (4, "zebra quark flux zebra prism"),
    (5, "the cat sat on the mat again and again"),
    (6, "solo"),
]
_REF_IDS = {1, 2, 3, 5}


def _docs_df(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def test_scores_match_python_reference(spark):
    docs = _docs_df(spark)
    uni, bi, V = bigram_lm(docs.filter(F.col("doc_id").isin(*_REF_IDS)))
    got = {
        r["doc_id"]: (r["n_positions"], r["score"])
        for r in surprise_scores(docs, uni, bi, V).collect()
    }
    want = _py_scores(_DOCS, lambda i, t: i in _REF_IDS)
    assert got == want


def test_out_of_domain_scores_higher(spark):
    docs = _docs_df(spark)
    uni, bi, V = bigram_lm(docs.filter(F.col("doc_id").isin(*_REF_IDS)))
    per_pos = {
        r["doc_id"]: r["score"] / max(r["n_positions"], 1)
        for r in surprise_scores(docs, uni, bi, V).collect()
    }
    in_domain_worst = max(per_pos[i] for i in (1, 2, 3, 5))
    assert per_pos[4] > in_domain_worst  # gibberish doc is most surprising


def test_vocab_cut_and_oov_fallback(spark):
    docs = _docs_df(spark)
    ref = docs.filter(F.col("doc_id").isin(*_REF_IDS))
    uni, bi, V = bigram_lm(ref, max_vocab=3)
    assert V == 3 and uni.count() == 3
    # the retained terms are the top-3 by (count desc, term asc)
    ref_counts = Counter(
        w for i, x in _DOCS if i in _REF_IDS for w in _py_tokens(x)
    )
    want_vocab = {
        t
        for t, _ in sorted(ref_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    }
    assert {r["a"] for r in uni.collect()} == want_vocab
    got = {
        r["doc_id"]: (r["n_positions"], r["score"])
        for r in surprise_scores(docs, uni, bi, V).collect()
    }
    assert got == _py_scores(_DOCS, lambda i, t: i in _REF_IDS, max_vocab=3)


def test_zero_position_doc_lands_in_head(spark):
    rows = {
        r["doc_id"]: r
        for r in perplexity_buckets(
            _docs_df(spark), F.col("doc_id").isin(*_REF_IDS)
        ).collect()
    }
    assert rows[6]["n_positions"] == 0
    assert rows[6]["score"] == 0
    assert rows[6]["bucket"] == "head"
    assert set(rows) == {i for i, _ in _DOCS}  # every doc bucketed


def test_plan_is_broadcast_only(spark):
    scored = perplexity_buckets(_docs_df(spark), F.col("doc_id").isin(*_REF_IDS))
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2, plan
    for bad in (
        "SortMergeJoin",
        "Window",
        "BatchEvalPython",
        "ArrowEvalPython",
        "CartesianProduct",
        "BroadcastNestedLoop",
    ):
        assert bad not in plan, (bad, plan)
