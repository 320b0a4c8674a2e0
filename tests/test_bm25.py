"""Exact-integer BM25 (operators/bm25.py): Python-reference exact parity,
ranking properties, quantized-log2 correctness, and plan quality."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.bm25 import (
    bm25_topk,
    query_terms_df,
)

CORPUS = [
    (0, "spark join broadcast join join table"),
    (1, "window agg stream window data"),
    (2, "hash table scan hash hash hash scan"),
    (3, "spark spark spark spark spark spark spark spark"),
    (4, "the a of and"),
    (5, "join"),
    (6, ""),
    (7, "broadcast window hash spark agg table"),
]
QUERIES = [(0, ("spark", "join")), (1, ("hash", "window"))]


def _qlog2_mb(num: int, den: int) -> int:
    r = (num * 1024) // den
    e = r.bit_length() - 11
    mant = r // (1 << e)
    return e * 1024 + mant - 1024


def _py_bm25(corpus, queries, k_top=10):
    toks = {d: t.lower().split(" ") for d, t in corpus}
    dl = {d: len(t) for d, t in toks.items()}
    total_t, n_docs = sum(dl.values()), len(toks)
    out = {}
    for qid, terms in queries:
        tf = {}
        for d, t in toks.items():
            for term in terms:
                c = t.count(term)
                if c:
                    tf[(d, term)] = c
        dfc = {term: sum(1 for (d, tm) in tf if tm == term) for term in terms}
        scores = {}
        for (d, term), c in tf.items():
            idf_mb = _qlog2_mb(2 * n_docs + 2, 2 * dfc[term] + 1)
            ratio_milli = (1000 * dl[d] * n_docs) // total_t
            contrib = (idf_mb * 22000 * c) // (
                10000 * c + 3000 + 9 * ratio_milli
            )
            s, n = scores.get(d, (0, 0))
            scores[d] = (s + contrib, n + 1)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))
        out[qid] = [
            (d, s, n, i + 1) for i, (d, (s, n)) in enumerate(ranked[:k_top])
        ]
    return out


def test_quantized_log2_tracks_real_log2():
    """idf_mb/1024 is within 0.09 bits of true log2 (linear mantissa
    interpolation max error) and exactly monotone in the ratio."""
    prev = -1
    for num in range(2, 400):
        mb = _qlog2_mb(num, 1)
        assert abs(mb / 1024 - math.log2(num)) < 0.09
    for den in range(1, 100):
        mb = _qlog2_mb(400, den)
        assert mb <= _qlog2_mb(400, max(1, den - 1))


def test_engine_matches_python_reference_exactly(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    got = {
        (r.query_id, r.doc_id): (r.score_mb, r.n_terms, r.rnk)
        for r in bm25_topk(docs, QUERIES).collect()
    }
    want = _py_bm25(CORPUS, QUERIES)
    flat = {
        (qid, d): (s, n, rnk)
        for qid, rows in want.items()
        for (d, s, n, rnk) in rows
    }
    assert got == flat


def test_ranking_properties(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    rows = bm25_topk(docs, QUERIES).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        # scores non-increasing with rank; all positive; no empty-doc hits
        for a, b in zip(rs, rs[1:]):
            assert (a.score_mb, -a.doc_id) >= (b.score_mb, -b.doc_id)
        assert all(r.score_mb > 0 for r in rs)
        assert all(r.doc_id != 6 for r in rs)
    # the spam doc repeating one term 8x must NOT beat the doc matching
    # both terms of query 0 (tf saturation is the point of BM25)
    q0 = {r.doc_id: r.rnk for r in by_q[0]}
    assert q0[0] < q0[3]


def test_empty_corpus_yields_typed_empty(spark):
    docs = spark.createDataFrame([], "doc_id bigint, text string")
    out = bm25_topk(docs, QUERIES)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id",
        "doc_id",
        "score_mb",
        "n_terms",
        "rnk",
    ]


def test_plan_quality(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    df = bm25_topk(docs, QUERIES)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # query-term and dfreq joins must broadcast (never shuffle the corpus
    # on a token key)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_index_serving_matches_full_scan(spark, tmp_path):
    """bm25_serve from the persisted postings index must equal bm25_topk
    row-for-row, and its postings scan must be partition-pruned to the
    query terms' buckets (the IVF pruning contract, for text)."""
    from kafka_streams_dead_letter_publishing_spark.operators.bm25 import (
        N_TERM_BUCKETS,
        _py_term_bucket,
        bm25_index,
        bm25_serve,
    )

    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    path = str(tmp_path / "bmidx")
    bm25_index(docs, path)
    served = bm25_serve(spark, path, QUERIES)
    rows_served = sorted(
        (r.query_id, r.doc_id, r.score_mb, r.n_terms, r.rnk)
        for r in served.collect()
    )
    rows_full = sorted(
        (r.query_id, r.doc_id, r.score_mb, r.n_terms, r.rnk)
        for r in bm25_topk(docs, QUERIES).collect()
    )
    assert rows_served == rows_full and rows_full

    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "bucket" in plan.split("PartitionFilters:")[1][:250]
    # Spark-side and driver-side bucket routing agree (the pruning is
    # only correct if both hash the term identically)
    from kafka_streams_dead_letter_publishing_spark.operators.bm25 import (
        _term_bucket,
    )

    terms = spark.createDataFrame(
        [(t,) for _, ts in QUERIES for t in ts], "term string"
    )
    got = {
        r.term: r.b
        for r in terms.select("term", _term_bucket(F.col("term")).alias("b")).collect()
    }
    assert got == {t: _py_term_bucket(t) for t in got}


def test_serving_fails_closed_on_missing_stats(spark, tmp_path):
    """A half-written index (postings without the stats completion gate)
    must refuse to serve, not silently score with garbage constants."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import AnalysisException

    from kafka_streams_dead_letter_publishing_spark.operators.bm25 import (
        bm25_serve,
    )

    with _pytest.raises((AnalysisException, Py4JJavaError)):
        bm25_serve(spark, str(tmp_path / "nope"), QUERIES)


def test_qlog2_three_engine_fuzz(spark):
    """The quantized-log2 primitive (shared by BM25 and Naive Bayes) must
    agree bit-for-bit across Spark SQL, DuckDB, and Python on a sweep of
    (num, den) pairs including powers of two, off-by-ones, and equal
    inputs."""
    import duckdb

    from kafka_streams_dead_letter_publishing_spark.operators.bm25 import (
        qlog2_mb_duck_sql,
        qlog2_mb_sql,
    )

    pairs = [(n, d) for n in (1, 2, 3, 7, 8, 1023, 1024, 1025, 10**6, 10**12)
             for d in (1, 2, 3, 7, 1024, 999) if n >= d]
    pairs += [(k, k) for k in (1, 5, 1 << 40)]
    df = spark.createDataFrame(pairs, "n long, d long")
    got_spark = {
        (r.n, r.d): r.mb
        for r in df.selectExpr(
            "n", "d", f"{qlog2_mb_sql('n', 'd')} AS mb"
        ).collect()
    }
    con = duckdb.connect()
    got_duck = {
        (n, d): con.sql(
            f"SELECT {qlog2_mb_duck_sql(str(n), str(d))}"
        ).fetchone()[0]
        for n, d in pairs
    }
    for n, d in pairs:
        want = _qlog2_mb(n, d)
        assert got_spark[(n, d)] == want, (n, d, got_spark[(n, d)], want)
        assert got_duck[(n, d)] == want, (n, d, got_duck[(n, d)], want)
