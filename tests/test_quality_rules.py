"""Repetition-rule quality filters (``functions/quality.py``): values
pinned against hand-computed references on crafted documents, degenerate
cases, and a pure-Python multiplicity oracle on the synthetic corpus;
plans stay expression-only and narrow."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.functions.quality import (
    duplicate_line_stats,
    gopher_repetition_keep,
    ngrams,
    top_ngram_stats,
)
from kafka_streams_dead_letter_publishing_spark.functions.text import norm_text, tokens


def _score(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    staged = df.select(
        "doc_id", "text", tokens(norm_text(F.col("text"))).alias("toks")
    )
    return {
        r.doc_id: r
        for r in staged.select(
            "doc_id",
            duplicate_line_stats(F.col("text")).alias("ls"),
            top_ngram_stats(F.col("toks"), 2).alias("g2"),
            top_ngram_stats(F.col("toks"), 3).alias("g3"),
            gopher_repetition_keep(F.col("text"), F.col("toks")).alias("keep"),
        ).collect()
    }


def test_duplicate_line_and_ngram_stats_match_hand_computed(spark):
    rows = [
        # 4 non-empty lines, "spam" twice: 1 beyond-first dup, 4 chars
        (1, "spam\nalpha beta\nspam\ngamma"),
        # all lines unique
        (2, "one line\nanother line\nthird"),
        # boilerplate: "buy now" bigram dominates
        (3, "buy now buy now buy now buy now truly"),
        # empty / whitespace-only
        (4, ""),
        (5, "   \n  \n"),
    ]
    s = _score(spark, rows)

    assert (s[1].ls.n_lines, s[1].ls.dup_lines, s[1].ls.dup_chars) == (4, 1, 4)
    assert (s[2].ls.dup_lines, s[2].ls.dup_chars) == (0, 0)
    assert s[2].keep is True

    # doc 3 tokens: buy now ×4 + truly → "buy now" bigram appears 4 times
    # ("now buy" 3); 7 chars per occurrence incl. the separator (the
    # reference accounting)
    assert s[3].g2.gram == "buy now"
    assert s[3].g2['count'] == 4
    assert s[3].g2.chars == 4 * 7
    assert s[3].keep is False  # dominant bigram: 28 chars of the 37-char text

    for d in (4, 5):
        assert s[d].ls.n_lines == 0
        # whitespace-only text tokenizes to empty-string tokens (upstream
        # tokens() contract), so a single degenerate n-gram may exist —
        # but never a REPEATED one, and every rule passes
        assert s[d].g2["count"] <= 1
        assert s[d].keep is True  # degenerate docs pass every rule


def test_top_ngram_matches_python_counter_on_synth_corpus(spark):
    from kafka_streams_dead_letter_publishing_spark.sources.synth import synth_documents

    docs = synth_documents(spark, 120)
    got = {
        r.doc_id: (r.g.gram, r.g["count"])
        for r in docs.select(
            "doc_id", top_ngram_stats(tokens(norm_text(F.col("text"))), 2).alias("g")
        ).collect()
    }
    for r in docs.collect():
        toks = r.text.split(" ")
        grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        counts = Counter(grams)
        best_count = max(counts.values())
        # ties break to the lexicographically lowest gram (sorted fold)
        best_gram = min(g for g, c in counts.items() if c == best_count)
        assert got[r.doc_id] == (best_gram, best_count), r.doc_id


def test_quality_rules_are_narrow_and_python_free(spark):
    from kafka_streams_dead_letter_publishing_spark.sources.synth import synth_documents

    docs = synth_documents(spark, 500)
    staged = docs.select("doc_id", "text", tokens(norm_text(F.col("text"))).alias("toks"))
    scored = staged.select(
        "doc_id", gopher_repetition_keep(F.col("text"), F.col("toks")).alias("keep")
    )
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # per-row narrow work only
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the synthetic corpus is hash-random: the overwhelming majority passes
    n = scored.count()
    kept = scored.filter("keep").count()
    assert kept >= 0.9 * n, (kept, n)


def test_gopher_registry_row_plan_is_narrow(spark):
    """The registered docs_gopher_repetition row stays expression-only:
    no Python eval, and the only exchange is the fan_out repartition of
    the single-row-group toy scan (a no-op to skip at real scale)."""
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES

    df = QUERIES["docs_gopher_repetition"].spark(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") <= 1, plan


def test_ngrams_expression_contract(spark):
    df = spark.createDataFrame([(1, ["a", "b", "c"]), (2, ["a"]), (3, [])],
                               "id long, toks array<string>")
    out = {r.id: r.g for r in df.select("id", ngrams(F.col("toks"), 2).alias("g")).collect()}
    assert out[1] == ["a b", "b c"]
    assert out[2] == [] and out[3] == []


def test_repetition_stats_match_duckdb_oracle_on_documents(spark):
    """Oracle-grade parity without a registry row: DuckDB computes the
    same duplicate-line and top-bigram statistics in plain relational
    form (unnest → group → aggregate), and every value must match the
    engine's sorted-run folds on the real documents table."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    staged = docs.select(
        "doc_id", "text", tokens(norm_text(F.col("text"))).alias("toks")
    )
    got = {
        r.doc_id: (
            r.ls.n_lines, r.ls.dup_lines, r.ls.dup_chars,
            r.g2.gram, r.g2["count"], r.g2.chars,
        )
        for r in staged.select(
            "doc_id",
            duplicate_line_stats(F.col("text")).alias("ls"),
            top_ngram_stats(F.col("toks"), 2).alias("g2"),
        ).collect()
    }

    con = duckdb.connect()
    try:
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
        oracle = con.sql("""
            WITH lines AS (
                SELECT doc_id, unnest(list_filter(string_split(text, chr(10)),
                                      l -> len(trim(l)) > 0)) AS line
                FROM documents
            ),
            line_groups AS (
                SELECT doc_id, line, COUNT(*) AS cnt FROM lines GROUP BY doc_id, line
            ),
            line_stats AS (
                SELECT doc_id, SUM(cnt) AS n_lines,
                       SUM(cnt - 1) AS dup_lines,
                       SUM((cnt - 1) * len(line)) AS dup_chars
                FROM line_groups GROUP BY doc_id
            ),
            toks AS (
                SELECT doc_id,
                       string_split(regexp_replace(lower(text),
                           '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ') AS t
                FROM documents
            ),
            grams AS (
                SELECT doc_id,
                       unnest([t[i] || ' ' || t[i + 1]
                               FOR i IN generate_series(1, len(t) - 1)]) AS gram
                FROM toks WHERE len(t) >= 2
            ),
            gram_groups AS (
                SELECT doc_id, gram, COUNT(*) AS cnt FROM grams GROUP BY doc_id, gram
            ),
            top_gram AS (
                SELECT doc_id, gram, cnt FROM (
                    SELECT doc_id, gram, cnt,
                           ROW_NUMBER() OVER (PARTITION BY doc_id
                                              ORDER BY cnt DESC, gram ASC) AS rn
                    FROM gram_groups) WHERE rn = 1
            )
            SELECT d.doc_id,
                   COALESCE(ls.n_lines, 0) AS n_lines,
                   COALESCE(ls.dup_lines, 0) AS dup_lines,
                   COALESCE(ls.dup_chars, 0) AS dup_chars,
                   tg.gram AS gram,
                   COALESCE(tg.cnt, 0) AS cnt,
                   COALESCE(tg.cnt * len(tg.gram), 0) AS chars
            FROM documents d
            LEFT JOIN line_stats ls ON d.doc_id = ls.doc_id
            LEFT JOIN top_gram tg ON d.doc_id = tg.doc_id
        """).fetchall()
    finally:
        con.close()

    assert len(oracle) == len(got)
    for doc_id, n_lines, dup_lines, dup_chars, gram, cnt, chars in oracle:
        assert got[doc_id] == (
            n_lines, dup_lines, dup_chars, gram, cnt, chars
        ), (doc_id, got[doc_id], (n_lines, dup_lines, dup_chars, gram, cnt, chars))


def test_deregistered_quality_stats_and_token_counts_stay_exact(spark, tmp_path):
    """docs_quality_stats / docs_token_counts were de-registered in r12
    (registry hygiene — the funnel and the BPE rows carry their oracle
    coverage); the library functions must stay Python-reference-exact."""
    import re

    from kafka_streams_dead_letter_publishing_spark.functions.text import STOPWORDS
    from kafka_streams_dead_letter_publishing_spark.plans.text import (
        docs_quality_stats,
        docs_token_counts,
    )

    rows = [
        (1, "the quick brown fox and the lazy dog", "web"),
        (2, "Spark SQL compiles 2 plans; DuckDB replays 1!", "web"),
        (3, "a b c a b c a 42 --", "books"),
        (4, "", "books"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.parquet(f"{tmp_path}/documents.parquet")

    qs = {r.doc_id: r for r in docs_quality_stats(spark, str(tmp_path)).collect()}
    # n_chars is raw length; stopword count/ratio are over the tokenizer's
    # own tokens (pin the RELATIONSHIP, not a re-implementation of the
    # tokenizer — that contract lives in the tokens() tests)
    from kafka_streams_dead_letter_publishing_spark.functions.text import norm_text, tokens
    from pyspark.sql import functions as F

    toks = {
        r.doc_id: r.t
        for r in spark.read.parquet(f"{tmp_path}/documents.parquet")
        .select("doc_id", tokens(norm_text(F.col("text"))).alias("t"))
        .collect()
    }
    for doc_id, text, _src in rows:
        r = qs[doc_id]
        t = toks[doc_id]
        n_stop = sum(1 for w in t if w in STOPWORDS)
        assert r.n_chars_actual == len(text)
        assert r.n_tokens == len(t)
        assert r.n_stopwords == n_stop
        if len(t):
            assert r.stopword_ratio == n_stop / len(t)

    tc = {r.source: (r.ws_tokens, r.re_tokens) for r in
          docs_token_counts(spark, str(tmp_path)).collect()}
    want_ws: dict[str, int] = {}
    want_re: dict[str, int] = {}
    for doc_id, text, src in rows:
        want_ws[src] = want_ws.get(src, 0) + len(toks[doc_id])
        want_re[src] = want_re.get(src, 0) + len(
            re.findall(r"[a-z]+|[0-9]+|[^a-z0-9 ]", text)
        )
    assert tc == {s: (want_ws[s], want_re[s]) for s in want_ws}
