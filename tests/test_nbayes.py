"""Exact-integer Naive Bayes (operators/nbayes.py): learnability on a
separable corpus, Python-reference parity, OOV semantics, vocabulary
capping, and plan quality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.nbayes import (
    nb_classify,
    nb_train,
)

# two separable dialects + shared filler
A = "alpha beta gamma shared filler"
B = "delta epsilon zeta shared filler"
TRAIN = [(i, "a", A) for i in range(20)] + [(100 + i, "b", B) for i in range(20)]
TEST = [
    (200, "alpha beta shared"),  # -> a
    (201, "delta zeta filler"),  # -> b
    (202, "gamma gamma gamma"),  # -> a
    (203, "epsilon"),  # -> b
    (204, "totally unseen words"),  # all-OOV: smoothing decides, no crash
]


@pytest.fixture(scope="module")
def model(spark):
    train = spark.createDataFrame(TRAIN, "doc_id bigint, lang string, text string")
    return nb_train(train, "lang")


def test_separable_corpus_classified_correctly(spark, model):
    test = spark.createDataFrame(
        [(d, t) for d, t in TEST], "doc_id bigint, text string"
    )
    preds = {r.doc_id: r.pred for r in nb_classify(test, model).collect()}
    assert preds[200] == "a" and preds[202] == "a"
    assert preds[201] == "b" and preds[203] == "b"
    assert 204 in preds  # all-OOV doc still scored (smoothed), no drop


def test_model_matches_python_reference(model):
    """Replay training counts in pure Python and compare every millibit."""

    def mb(num, den):
        r = (num * 1024) // den
        e = r.bit_length() - 11
        return e * 1024 + (r // (1 << e)) - 1024

    toks = {}
    t_cls = {"a": 0, "b": 0}
    n_cls = {"a": 0, "b": 0}
    for _, cls, text in TRAIN:
        n_cls[cls] += 1
        for t in text.split(" "):
            toks[(t, cls)] = toks.get((t, cls), 0) + 1
            t_cls[cls] += 1
    vocab = {t for (t, _c) in toks}
    vprime = len(vocab) + 1
    n_total = sum(n_cls.values())
    assert model.classes == ["a", "b"]
    assert model.priors_mb == {c: mb(n_total, n_cls[c]) for c in "ab"}
    assert model.oov_mb == {c: mb(t_cls[c] + vprime, 1) for c in "ab"}
    got = {(t, c): s for t, c, s in model.term_rows}
    want = {
        (t, c): mb(t_cls[c] + vprime, n + 1) for (t, c), n in toks.items()
    }
    assert got == want


def test_vocab_cap_bounds_model(spark):
    train = spark.createDataFrame(TRAIN, "doc_id bigint, lang string, text string")
    small = nb_train(train, "lang", vocab=3)
    terms = {t for t, _c, _s in small.term_rows}
    assert len(terms) == 3
    # highest-frequency terms survive the cap ('shared'/'filler' appear in
    # both dialects — 40 occurrences vs 20)
    assert "shared" in terms and "filler" in terms


def test_empty_training_raises(spark):
    empty = spark.createDataFrame([], "doc_id bigint, lang string, text string")
    with pytest.raises(ValueError, match="empty"):
        nb_train(empty, "lang")


def test_zero_token_training_class_kept_by_both_engines(spark):
    """Edge fixture (r9 advisory): a class whose every training doc is
    token-free (empty text) has doc counts but NO token rows.  The
    engine keeps it (T_cls = 0, smoothed); the DuckDB oracle's
    nb_classes CTE used an INNER join to the token totals and silently
    dropped it — LEFT JOIN + COALESCE must agree with the engine on the
    class's prior and OOV millibits."""
    import duckdb

    from kafka_streams_dead_letter_publishing_spark.operators.nbayes import (
        nb_model_sql,
    )

    # NULL text is the genuinely token-free doc: tokens() of '' is ['']
    # (split never returns an empty array) in BOTH engines, but explode/
    # unnest of a NULL array drops the row — so an all-NULL-text class
    # has doc counts and zero token rows.
    rows = [(i, "a", A) for i in range(4)] + [(10 + i, "z", None) for i in range(4)]
    train = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    model = nb_train(train, "lang")
    assert model.classes == ["a", "z"]
    assert "z" in model.oov_mb and "z" in model.priors_mb

    # the all-OOV doc must be scorable against BOTH classes — with equal
    # doc counts the priors tie and 'z' (T_cls=0 -> lowest OOV surprise)
    # wins; under the dropped-class oracle it could never win
    test = spark.createDataFrame([(99, "unseen words")], "doc_id bigint, text string")
    pred = nb_classify(test, model).collect()[0]
    assert pred.pred == "z"

    con = duckdb.connect()
    con.sql("CREATE TABLE documents(doc_id BIGINT, lang VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    block = nb_model_sql("TRUE", "string_split(lower(text), ' ')")
    got = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            f"WITH {block} SELECT cls, prior_mb, oov_mb FROM nb_classes ORDER BY cls"
        ).fetchall()
    }
    assert set(got) == {"a", "z"}, "oracle dropped the zero-token class"
    assert got["a"] == (model.priors_mb["a"], model.oov_mb["a"])
    assert got["z"] == (model.priors_mb["z"], model.oov_mb["z"])


def test_plan_quality(spark, model):
    test = spark.createDataFrame(
        [(d, t) for d, t in TEST], "doc_id bigint, text string"
    )
    df = nb_classify(test, model)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan  # model joins all broadcast
    assert "Window" not in plan  # argmin is a partial-agg struct-min
