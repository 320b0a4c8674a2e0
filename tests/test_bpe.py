"""Character-level BPE counter (functions/bpe.py): fold-equivalence of the
marked-string trick, engine/oracle/Python three-way parity, trainer
determinism (the pinned DEFAULT_MERGES regenerate from the fixture), plan
quality (zero UDFs, zero shuffles), and pluggability into the budget
sampler."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.functions.bpe import (
    DEFAULT_MERGES,
    bpe_count_sql,
    bpe_marked,
    bpe_marked_sql,
    bpe_token_count,
    bpe_tokens_py,
    train_bpe_merges,
)

MERGES = [("t", "h"), ("th", "e"), ("a", "a"), ("i", "n"), ("in", "g"), ("e", "e")]


def _marked_py(text, merges):
    """The marked-string construction in Python (str.replace is the same
    left-to-right non-overlapping scan as SQL replace)."""
    import re

    s = re.sub("[ \t\n\x0b\f\r]+", " ", text.replace("\x1f", "").lower())
    s = "".join(f"\x1f{c}\x1f" for c in s)
    for a, b in merges:
        s = s.replace(f"\x1f{a}\x1f\x1f{b}\x1f", f"\x1f{a}{b}\x1f")
    return s


@given(st.text(alphabet="the aing\t\n.x", max_size=60))
@settings(max_examples=300, deadline=None)
def test_marked_trick_equals_sequential_fold(text):
    """The load-bearing equivalence: one replace() pass over the marked
    string == one left-to-right fold pass over the token list, for every
    merge — including overlapping runs ('aaa'), merged-token reuse
    ('th'+'e'), and marker stripping."""
    from_marked = [
        t for t in _marked_py(text, MERGES).split("\x1f") if t not in ("", " ")
    ]
    assert from_marked == bpe_tokens_py(text, MERGES)


def test_engine_oracle_python_three_way_parity(spark):
    texts = [
        "The theme of the thing",
        "aaaa aaaaa a",
        "",
        "   ",
        None,
        "mixed\tthe\nwhitespace\x0bthe",
        "mark\x1fer injection \x1f\x1f attempt",
        "it's 'quoted' text the",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r.doc_id: (r.m, r.n)
        for r in df.select(
            "doc_id",
            bpe_marked(F.col("text"), MERGES).alias("m"),
            bpe_token_count(F.col("text"), MERGES).alias("n"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    du = {
        i: (m, n)
        for i, m, n in con.execute(
            f"SELECT doc_id, {bpe_marked_sql('text', MERGES)},"
            f" {bpe_count_sql('text', MERGES)} FROM t"
        ).fetchall()
    }
    for i, t in enumerate(texts):
        exp = (
            (None, None)
            if t is None
            else (_marked_py(t, MERGES), len(bpe_tokens_py(t, MERGES)))
        )
        assert got[i] == exp, (t, got[i], exp)
        assert du[i] == exp, (t, du[i], exp)


def test_default_merges_regenerate_from_fixture():
    """DEFAULT_MERGES is exactly what the pinned trainer produces on the
    sf0.01 fixture corpus — the table is reproducible, not hand-waved."""
    texts = [
        t
        for (t,) in duckdb.sql(
            "SELECT text FROM read_parquet('/root/testdata/sf0.01/documents.parquet')"
        ).fetchall()
        if t is not None
    ]
    assert tuple(train_bpe_merges(texts, len(DEFAULT_MERGES))) == DEFAULT_MERGES


def test_trainer_merges_are_applied_during_training():
    # 'ab' dominates; after ('a','b') the pair ('ab','c') must be countable
    texts = ["abc abc abc ab ab"]
    merges = train_bpe_merges(texts, 2)
    assert merges[0] == ("a", "b")
    assert merges[1] == ("ab", "c")


def test_merge_validation():
    with pytest.raises(ValueError):
        bpe_tokens_py("x", [("a", " ")])
    with pytest.raises(ValueError):
        bpe_marked_sql("text", [("", "b")])
    with pytest.raises(ValueError):
        bpe_count_sql("text", [("\x1f", "b")])


def test_plan_is_udf_free_and_shuffle_free(spark):
    # RETIRED r16 (slot funds the embedding-ingest gate): the pair keeps
    # running here and in the edge batteries
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES, RETIRED

    q = QUERIES.get("docs_bpe_token_counts") or RETIRED["docs_bpe_token_counts"]
    df = q.spark(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "Exchange"):
        assert bad not in plan, (bad, plan)


def test_bpe_counts_plug_into_budget_sampler(spark):
    """The counter is a drop-in n_tokens column for token_budget_sample:
    greedy admission under a BPE budget matches the Python reference."""
    from kafka_streams_dead_letter_publishing_spark.operators.budget import (
        token_budget_sample,
    )

    texts = [(i, f"the thing {'aa ' * (i % 4)}number {i}", "web") for i in range(30)]
    df = spark.createDataFrame(texts, "doc_id long, text string, source string")
    scored = df.withColumn("n_bpe", bpe_token_count(F.col("text")))
    out = token_budget_sample(
        scored, "n_bpe", {"web": 120}, id_col="doc_id", group_col="source"
    )
    rows = {r.doc_id: r.n_bpe for r in out.collect()}
    # python replay: md5-order greedy fill with the same counts
    import hashlib

    counts = {i: len(bpe_tokens_py(t)) for i, t, _ in texts}
    order = sorted(counts, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    run, expect = 0, {}
    for i in order:
        run += counts[i]  # running total over ALL docs: prefix-closed sample
        if run <= 120:
            expect[i] = counts[i]
    assert rows == expect


# ── r9: production-scale path (Arrow executor + saturated table) ─────────


def test_trained_full_table_is_saturated_and_prefixed():
    """TRAINED_MERGES_FULL is what the pinned trainer produces on the
    sf0.01 fixture when asked for MORE merges than the vocabulary can
    yield — training halts at 89 because the 31-word vocab fully
    collapses; DEFAULT_MERGES is its 16-entry prefix."""
    from kafka_streams_dead_letter_publishing_spark.functions.bpe import (
        TRAINED_MERGES_FULL,
    )

    texts = [
        t
        for (t,) in duckdb.sql(
            "SELECT text FROM read_parquet("
            "'/root/testdata/sf0.01/documents.parquet')"
        ).fetchall()
        if t is not None
    ]
    got = train_bpe_merges(texts, 256)
    assert tuple(got) == TRAINED_MERGES_FULL
    assert TRAINED_MERGES_FULL[:16] == DEFAULT_MERGES


@given(st.text(alphabet="the aing\t\n.x", max_size=60))
@settings(max_examples=300, deadline=None)
def test_minrank_merge_equals_fold_on_well_nested_tables(text):
    """The Arrow executor's load-bearing equivalence: iterative
    lowest-rank-pair merging (the GPT-2 tokenizer shape, M-independent)
    == the pass-in-rank-order fold, for WELL-NESTED tables.  Fuzzed on
    both pinned trained tables."""
    from kafka_streams_dead_letter_publishing_spark.functions.bpe import (
        TRAINED_MERGES_FULL,
        _merge_word_minrank,
        _norm_py,
        _well_nested,
    )

    for table in (DEFAULT_MERGES, TRAINED_MERGES_FULL):
        assert _well_nested(table)
        ranks = {(a, b): i for i, (a, b) in enumerate(table)}
        expect = bpe_tokens_py(text, table)
        got = [
            t
            for w in _norm_py(text).split(" ")
            for t in (_merge_word_minrank(w, ranks) if w else [])
        ]
        assert got == expect, (table is DEFAULT_MERGES, text)


def test_arrow_engine_matches_expr_engine_on_real_docs(spark):
    """Cross-engine parity at the saturated table on real fixture docs —
    the Spark-level counterpart of the registry row's oracle hash."""
    from kafka_streams_dead_letter_publishing_spark.functions.bpe import (
        TRAINED_MERGES_FULL,
        bpe_token_count_arrow,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    both = docs.select(
        "doc_id",
        bpe_token_count(F.col("text"), TRAINED_MERGES_FULL).alias("e"),
        bpe_token_count_arrow(F.col("text"), TRAINED_MERGES_FULL).alias("a"),
    )
    assert both.filter("e IS DISTINCT FROM a").count() == 0


def test_counter_auto_rule_and_nonnested_fallback(spark):
    """engine='auto' stays on the UDF-free expr chain at/below the
    measured cutover and switches to Arrow above it; a NON-well-nested
    table still counts correctly via the per-word fold fallback."""
    from kafka_streams_dead_letter_publishing_spark.functions.bpe import (
        BPE_EXPR_MAX_MERGES,
        bpe_counter,
        bpe_token_count_arrow,
        _well_nested,
    )

    df = spark.createDataFrame([(1, "the thing in the bag")], "id long, t string")

    small = bpe_counter(F.col("t"), DEFAULT_MERGES, engine="auto")
    plan = df.select(small)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan  # expr chain: pure JVM

    # pad well-nested past the cutover -> auto goes to arrow
    pad, prod = [], "\x01"
    while len(DEFAULT_MERGES) + len(pad) <= BPE_EXPR_MAX_MERGES:
        pad.append((prod, "\x01"))
        prod += "\x01"
    big = tuple(DEFAULT_MERGES) + tuple(pad)
    big_col = bpe_counter(F.col("t"), big, engine="auto")
    plan = df.select(big_col)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    a, b = df.select(small.alias("s"), big_col.alias("b")).first()
    assert a == b  # padding never fires

    # non-nested table: ('aa','bb') sides are not earlier products
    weird = (("a", "b"), ("aa", "bb"))
    assert not _well_nested(weird)
    got = df.select(bpe_token_count_arrow(F.col("t"), weird).alias("n")).first().n
    assert got == len(bpe_tokens_py("the thing in the bag", weird))

    with pytest.raises(ValueError, match="unknown bpe engine"):
        bpe_counter(F.col("t"), DEFAULT_MERGES, engine="nope")


def test_distributed_trainer_equals_sequential_on_fixture(spark):
    """train_bpe_distributed (Spark word histogram + driver loop) must
    reproduce train_bpe_merges on the same corpus verbatim — i.e. the
    pinned TRAINED_MERGES_FULL — and its histogram plan must be a
    partial-agg aggregate (the corpus never reaches the driver)."""
    from kafka_streams_dead_letter_publishing_spark.functions.bpe import (
        TRAINED_MERGES_FULL,
        train_bpe_distributed,
        word_histogram,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = train_bpe_distributed(docs, 256)
    assert tuple(got) == TRAINED_MERGES_FULL

    plan = (
        word_histogram(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_count" in plan, plan
    assert "Window" not in plan, plan

    # the driver-traffic knobs: floor + cap bound the collected vocab
    capped = word_histogram(docs, min_count=2, max_vocab=5).collect()
    assert len(capped) == 5
    assert all(r.n >= 2 for r in capped)


def test_tokens_arr_matches_python_and_counter(spark):
    """bpe_tokens_arr (the id-delivery token ARRAY, spaces kept as their
    own tokens) must equal the Python marked-string split, degrade to []
    on empty/None, and its non-space length must equal bpe_token_count."""
    from kafka_streams_dead_letter_publishing_spark.functions.bpe import (
        bpe_tokens_arr,
    )

    texts = [
        "The theme of the thing",
        "aaaa aaaaa a",
        "",
        "   ",
        None,
        "mixed\tthe\nwhitespace\x0bthe",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    rows = df.select(
        F.col("t"),
        bpe_tokens_arr(F.col("t"), MERGES).alias("arr"),
        bpe_token_count(F.col("t"), MERGES).alias("n"),
    ).collect()
    for r in rows:
        m = _marked_py(r.t or "", MERGES)
        expect = m[1:-1].split("\x1f\x1f") if len(m) >= 2 else []
        assert r.arr == expect, (r.t, r.arr, expect)
        # counter contract: NULL text counts NULL (not 0) — array is []
        assert sum(1 for t in r.arr if t != " ") == (r.n or 0), (
            r.t,
            r.arr,
            r.n,
        )


@given(st.text(alphabet="the aing\t\n.x", max_size=60))
@settings(max_examples=200, deadline=None)
def test_tokens_arr_detokenizes_to_normalized_text(text):
    """Round-trip invariant: concatenating the token array (spaces are
    real tokens) reproduces the normalized text exactly — the id-delivery
    segmentation loses nothing.  Checked on the Python twin (fuzz); the
    Spark expression is pinned ≡ the twin by
    test_tokens_arr_matches_python_and_counter."""
    import re

    m = _marked_py(text, MERGES)
    arr = m[1:-1].split("\x1f\x1f") if len(m) >= 2 else []
    norm = re.sub("[ \t\n\x0b\f\r]+", " ", text.replace("\x1f", "").lower())
    assert "".join(arr) == norm


@given(
    st.dictionaries(
        st.text(alphabet="abcdexyz", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=50),
        min_size=0,
        max_size=25,
    ),
    st.integers(min_value=0, max_value=40),
)
@settings(max_examples=300, deadline=None)
def test_fast_trainer_equals_reference_loop(words, n_merges):
    """train_bpe_on_counts_fast (incremental pair bookkeeping — the
    production path) must produce the EXACT merge sequence of the
    reference recount-everything loop: same greedy objective, same
    (count, pair) tie-break, same stop rule.  Fuzzed over histograms
    with overlapping runs ('aaa'-style words), repeated words, and
    merge budgets past saturation."""
    from kafka_streams_dead_letter_publishing_spark.functions.bpe import (
        train_bpe_on_counts,
        train_bpe_on_counts_fast,
    )

    assert train_bpe_on_counts_fast(words, n_merges) == train_bpe_on_counts(
        words, n_merges
    )


def test_fast_trainer_reaches_production_merge_counts():
    """The reference loop was never measured past 256 merges (r9->r10
    verdicts); the fast loop must train >= 1k merges from a vocabulary
    rich enough to support them, and its full sequence must equal the
    reference loop's on the same histogram (one deep non-fuzz pin)."""
    import random

    from kafka_streams_dead_letter_publishing_spark.functions.bpe import (
        train_bpe_on_counts,
        train_bpe_on_counts_fast,
    )

    rng = random.Random(11)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = {}
    for _ in range(3000):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 12)))
        words[w] = words.get(w, 0) + rng.randint(1, 200)
    fast = train_bpe_on_counts_fast(words, 1024)
    assert len(fast) == 1024  # the vocab sustains a production-scale run
    assert fast == train_bpe_on_counts(words, 1024)
