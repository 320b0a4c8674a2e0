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


def _served_rows(spark, path, queries=QUERIES):
    from kafka_streams_dead_letter_publishing_spark.operators.bm25 import bm25_serve

    return sorted(
        (r.query_id, r.doc_id, r.score_mb, r.n_terms, r.rnk)
        for r in bm25_serve(spark, path, queries).collect()
    )


def test_streamed_appends_match_one_shot(spark, tmp_path):
    """Batch-by-batch bm25_append (bootstrap from an empty path) must
    serve row-for-row identically to a one-shot bm25_index of the same
    corpus — the ivf_append/pq_append equivalence contract, which for
    BM25 additionally requires the global (N, sum dl, max dl) stats to
    merge associatively across epochs."""
    from kafka_streams_dead_letter_publishing_spark.operators.bm25 import (
        bm25_append,
        bm25_index,
    )

    streamed = str(tmp_path / "streamed")
    epochs = []
    for lo, hi in ((0, 3), (3, 6), (6, 8)):
        batch = spark.createDataFrame(CORPUS[lo:hi], "doc_id bigint, text string")
        epochs.append(bm25_append(batch, streamed))
    assert epochs == [0, 1, 2]

    oneshot = str(tmp_path / "oneshot")
    bm25_index(
        spark.createDataFrame(CORPUS, "doc_id bigint, text string"), oneshot
    )
    got = _served_rows(spark, streamed)
    assert got == _served_rows(spark, oneshot) and got


def test_empty_batch_append_is_a_noop(spark, tmp_path):
    from kafka_streams_dead_letter_publishing_spark.operators.bm25 import (
        bm25_append,
    )

    path = str(tmp_path / "idx")
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    assert bm25_append(docs, path) == 0
    before = _served_rows(spark, path)
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert bm25_append(empty, path) == 0  # epoch does not advance
    assert _served_rows(spark, path) == before


def test_orphan_postings_from_crashed_append_are_invisible(spark, tmp_path):
    """Crash-between-writes shape: postings for epoch E+1 land but the
    stats row (written LAST) never does.  Serving must keep returning
    the last complete snapshot — the orphan epoch is filtered out by the
    epoch <= stats.epoch gate, never half-scored against stale stats."""
    from kafka_streams_dead_letter_publishing_spark.operators.bm25 import (
        _batch_postings,
        bm25_append,
        bm25_index,
    )

    path = str(tmp_path / "idx")
    docs = spark.createDataFrame(CORPUS[:6], "doc_id bigint, text string")
    epoch = bm25_append(docs, path)
    before = _served_rows(spark, path)
    assert before

    # simulate the crashed append: postings written, stats write lost
    tail = spark.createDataFrame(CORPUS[6:], "doc_id bigint, text string")
    orphan, _ = _batch_postings(tail, "text", "doc_id", 64, epoch=epoch + 1)
    orphan.write.mode("append").partitionBy("bucket").parquet(f"{path}/postings")

    assert _served_rows(spark, path) == before
    # the retried append heals the index: the new epoch is allocated
    # PAST the orphan's (never reused — reuse would make the orphan's
    # tf rows servable alongside the retry's, double-counting the
    # retried docs' scores), and serving the healed index is
    # row-for-row identical to a one-shot build of the full corpus —
    # the orphan rows stay invisible because they have no stats row
    healed_epoch = bm25_append(tail, path)
    assert healed_epoch == epoch + 2
    oneshot = str(tmp_path / "oneshot")
    bm25_index(
        spark.createDataFrame(CORPUS, "doc_id bigint, text string"), oneshot
    )
    healed = _served_rows(spark, path)
    assert healed == _served_rows(spark, oneshot) and healed != before


def test_compact_preserves_served_results_and_drops_orphans(spark, tmp_path):
    from kafka_streams_dead_letter_publishing_spark.operators.bm25 import (
        _batch_postings,
        bm25_append,
        bm25_compact,
    )

    src = str(tmp_path / "src")
    for lo, hi in ((0, 4), (4, 8)):
        bm25_append(
            spark.createDataFrame(CORPUS[lo:hi], "doc_id bigint, text string"),
            src,
        )
    # plant an orphan epoch (crashed append) that compaction must drop
    orphan, _ = _batch_postings(
        spark.createDataFrame([(99, "spark join")], "doc_id bigint, text string"),
        "text", "doc_id", 64, epoch=5,
    )
    orphan.write.mode("append").partitionBy("bucket").parquet(f"{src}/postings")

    dst = str(tmp_path / "dst")
    bm25_compact(spark, src, dst)
    assert _served_rows(spark, dst) == _served_rows(spark, src)
    compacted = spark.read.parquet(f"{dst}/postings")
    assert compacted.filter(F.col("doc_id") == 99).count() == 0
    assert spark.read.parquet(f"{dst}/stats").count() == 1


def test_serving_fails_closed_on_empty_stats(spark, tmp_path):
    """A stats store that exists but holds no rows is a never-completed
    build — serve must raise, not score with garbage constants."""
    import pytest as _pytest

    from kafka_streams_dead_letter_publishing_spark.operators.bm25 import (
        bm25_serve,
    )

    path = str(tmp_path / "idx")
    spark.createDataFrame(
        [], "n_docs bigint, total_tokens bigint, max_dl bigint, epoch bigint"
    ).write.parquet(f"{path}/stats")
    with _pytest.raises(ValueError, match="no rows"):
        bm25_serve(spark, path, QUERIES)


def test_giant_corpus_cutover_keys_on_max_dl():
    """The avg-first degradation must engage exactly when the precise
    form's intermediate 1000*dl*N can overflow — bound 1000*max(dl)*N,
    NOT total tokens: a skewed corpus (few docs, one huge) overflows
    long before T grows, and a huge uniform corpus was degraded
    needlessly under the old T > 2^40 keying."""
    from kafka_streams_dead_letter_publishing_spark.operators.bm25 import (
        _RATIO_GUARD,
        _ratio_sql,
    )

    # skewed: tiny corpus, one astronomically long doc -> must degrade
    # (old keying: T = 2e15 < 2^40*? no — 2e15 > 2^40; pick T under 2^40)
    n, mx = 4, 2**52
    assert 1000 * mx * n >= _RATIO_GUARD
    assert "DIV " + str((mx + 3) // n) in _ratio_sql(n, mx + 3, mx)

    # huge uniform corpus: T far beyond 2^40 but no overflow risk ->
    # must stay on the precise path
    n, t, mx = 10**10, 10**13, 5000
    assert t > (1 << 40) and 1000 * mx * n < _RATIO_GUARD
    assert f"* {n}) DIV {t}" in _ratio_sql(n, t, mx)


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
