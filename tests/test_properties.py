"""Property-based invariants of the dead-letter topology (hypothesis).

The reference pins four golden scenarios; these properties hold for ANY
record batch (SURVEY §5 notes the reference has no property tier — this is
engine-side hardening):

* partition property: every input record lands on exactly one channel;
* key preservation: the multiset of keys is conserved end-to-end;
* DLT value contract: process-DLT carries the original int bytes, deser-DLT
  the raw bytes, prod-DLT empty bytes;
* output lengths equal the decoded input ints.
"""

from __future__ import annotations

import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_streams_dead_letter_publishing_spark.config import EngineConfig
from kafka_streams_dead_letter_publishing_spark.operators.topology import route
from kafka_streams_dead_letter_publishing_spark.sources.records import int32be, records_df

CFG = EngineConfig()

# happy-path strings stay small for speed; sampled extremes exercise the
# negative (process), oversize (production), and boundary paths
int_values = st.one_of(
    st.integers(min_value=-50, max_value=3000),
    st.sampled_from([0, -1, 1_100_000, 2_000_000, -(2**31), 2**31 - 1]),
)
value_strategy = st.one_of(
    st.none(),
    int_values.map(int32be),  # well-formed int32
    st.binary(min_size=0, max_size=9).filter(lambda b: len(b) != 4),  # deser garbage
)
record_strategy = st.tuples(
    st.one_of(st.none(), st.binary(min_size=0, max_size=16)), value_strategy
)


@given(st.lists(record_strategy, min_size=1, max_size=30))
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_topology_invariants(spark, records):
    routed = route(records_df(spark, records), CFG)
    out = routed.output.collect()
    proc = routed.process_dlt.collect()
    deser = routed.deser_dlt.collect()
    prod = routed.prod_dlt.collect()

    # exactly-one-channel partition
    assert len(out) + len(proc) + len(deser) + len(prod) == len(records)

    # key multiset conserved
    in_keys = sorted((r[0] or b"").hex() for r in records)
    out_keys = sorted((r.key or b"").hex() for rows in (out, proc, deser, prod) for r in rows)
    assert in_keys == out_keys

    def decoded(v):
        return struct.unpack(">i", v)[0] if v is not None and len(v) == 4 else None

    in_by_decoded: dict[str, list] = {}
    for k, v in records:
        in_by_decoded.setdefault((k or b"").hex(), []).append(v)

    for r in out:
        assert r.value is not None and all(97 <= c <= 122 for c in r.value)
        # some input for this key decodes to exactly this length
        assert any(
            decoded(v) == len(r.value) for v in in_by_decoded[(r.key or b"").hex()]
        )
    for r in deser:
        assert r.value is not None and len(r.value) != 4  # raw bytes, untouched
    for r in proc:
        # original value restored: NULL stays NULL, else the original int bytes
        assert r.value is None or decoded(r.value) is not None
    for r in prod:
        assert r.value == b""  # truncated to empty, never null


# random pair lists over a small id space force chains, cycles, self-pairs
# and duplicate edges — the shapes the planted-dup fixtures never produce
pair_strategy = st.lists(
    st.tuples(st.integers(0, 24), st.integers(0, 24)), min_size=1, max_size=40
)


vector_strategy = st.lists(
    st.lists(
        st.floats(-3, 3, allow_nan=False, allow_infinity=False, width=32),
        min_size=64,
        max_size=64,
    ),
    min_size=2,
    max_size=12,
)


@given(vector_strategy)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_int_and_string_lsh_keys_yield_identical_candidates(spark, vecs):
    """The long-key encoding must produce EXACTLY the candidate pairs the
    oracle-mirrored string keys produce, for arbitrary vectors — the
    bijection argument behind using long keys on the engine side."""
    from pyspark.sql import functions as F

    from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
        lsh_table_keys,
        lsh_table_keys_int,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )

    def cands(keyfn):
        k = df.select("vec_id", F.explode(keyfn(F.col("embedding"))).alias("bk"))
        a, b = k.alias("a"), k.alias("b")
        return {
            (r.va, r.vb)
            for r in a.join(
                b, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.vec_id") < F.col("b.vec_id"))
            )
            .select(F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb"))
            .distinct()
            .collect()
        }

    assert cands(lsh_table_keys) == cands(lsh_table_keys_int)


@given(pair_strategy)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_connected_components_match_union_find(spark, pairs):
    from kafka_streams_dead_letter_publishing_spark.operators.components import (
        connected_components,
    )

    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r.node: r.component for r in connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(v: int) -> int:
        parent.setdefault(v, v)
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    expected = {v: find(v) for v in parent}
    assert got == expected


@given(vector_strategy, st.integers(min_value=1, max_value=8))
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_quantized_kmeans_is_partition_layout_invariant(spark, vecs, n_parts):
    """The oracle-replayability claim behind emb_ivf_batch_topk: the
    quantized fit is a pure function of the DATA — exact integer sums are
    commutative, so arbitrary repartitioning (different partition counts,
    different row orders per partition) must produce bit-identical
    centroids.  A float-sum implementation would fail this under
    hypothesis's adversarial vectors."""
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        kmeans_fit_quantized,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    k = min(3, len(vecs))
    base = kmeans_fit_quantized(df, k=k, iters=2)
    shuffled = kmeans_fit_quantized(df.repartition(n_parts), k=k, iters=2)
    assert base == shuffled


# ── learned-IVF end-to-end oracle parity on ARBITRARY corpora ────────────
#
# The driver hash-gates the learned-IVF batch row on the fixed testdata corpus
# and the edge-case tier pins degenerate/unindexable fixtures; this fuzz
# closes the remaining gap — the fit+probe+top-k replay must agree on
# corpora hypothesis invents.  The value pool is DISCRETE (float32-exact,
# small magnitudes) so quantized distance TIES are common and the
# lowest-index tie-break is actually exercised; vec_ids are drawn with
# gaps so the %4 training-sample predicate varies per example (including
# the no-trainable-sample → 0-rows path); "dup" forces exact duplicate
# vectors, "nan"/"inf"/"short" violate the indexable contract and must be
# excluded identically by both engines.

_IVF_POOL = [-2.0, -0.5, 0.0, 0.25, 1.0]
ivf_corpus_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),  # vec_id (gaps vary the sample)
        st.integers(min_value=0, max_value=2**31 - 1),  # value seed
        st.sampled_from(["ok", "ok", "ok", "ok", "dup", "nan", "inf", "short"]),
    ),
    min_size=0,
    max_size=14,
    unique_by=lambda t: t[0],
)


@given(ivf_corpus_strategy)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_learned_ivf_row_matches_oracle_on_random_corpora(spark, entries):
    import math
    import shutil
    import tempfile

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES

    rows = []
    for vec_id, seed, shape in entries:
        rng = np.random.default_rng(1234 if shape == "dup" else seed)
        v = [float(x) for x in rng.choice(_IVF_POOL, 64)]
        if shape == "nan":
            v[0] = float("nan")
        elif shape == "inf":
            v[0] = float("inf")
        elif shape == "short":
            v = v[:63]
        rows.append((vec_id, v))

    # fresh dir per example: the learned-index cache keys on the corpus path
    d = tempfile.mkdtemp(prefix="ivf-fuzz-")
    try:
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                    "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
                    "label": pa.array([0] * len(rows), pa.int32()),
                }
            ),
            f"{d}/embeddings.parquet",
        )
        q = QUERIES["emb_ivf_batch_topk"]
        sdf = q.spark(spark, d).toPandas()
        con = duckdb.connect()
        try:
            con.sql(
                f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'"
            )
            odf = con.sql(q.oracle).df()
        finally:
            con.close()

        # one canonicalizer for every engine-vs-oracle compare (r6 ADVICE:
        # the local twin lacked the key=repr sort and would TypeError on a
        # column mixing None/str/int across rows instead of diffing)
        from tests.test_oracle_edge_cases import _canon

        cols = sorted(sdf.columns)
        assert cols == sorted(odf.columns)
        srows = sorted(
            (tuple(_canon(r[c]) for c in cols) for r in sdf.to_dict("records")),
            key=repr,
        )
        orows = sorted(
            (tuple(_canon(r[c]) for c in cols) for r in odf.to_dict("records")),
            key=repr,
        )
        assert srows == orows, f"engine {srows[:3]} vs oracle {orows[:3]}"
    finally:
        shutil.rmtree(d, ignore_errors=True)
        # drop this example's learned-index cache entry AND its index dir
        # (r6 ADVICE: the fuzz multiplies the documented one-dir-per-corpus
        # cache contract into ~8 leaked dirs per run)
        from kafka_streams_dead_letter_publishing_spark.plans.similarity import (
            _LEARNED_INDEX_CACHE,
        )

        cached = _LEARNED_INDEX_CACHE.pop(d, None)
        if cached is not None:
            shutil.rmtree(cached[0], ignore_errors=True)


# ── near-dup pipeline oracle parity on ARBITRARY corpora ─────────────────
#
# Same closing argument as the learned-IVF fuzz above, for the OTHER
# intricate oracle family: the composed minhash → banding → Jaccard
# verify → recursive-closure → keeper anti-join chain is pinned on the
# driver corpus and fixed degenerate fixtures, but its graph logic
# (cluster topology, tie-breaks, sub-shingle docs, exact duplicates) is
# exactly what random corpora vary.  A SIX-WORD vocabulary makes shingle
# collisions — and therefore non-trivial candidate pairs, clusters, and
# keeper decisions — common instead of vanishingly rare.

_VOCAB = ["alpha", "beta", "gamma", "delta", "omega", "€uro"]
text_corpus_strategy = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12).map(" ".join),
    min_size=0,
    max_size=8,
)

NEARDUP_PIPELINE_QUERIES = (
    "docs_exact_dup_groups",
    "docs_neardup_verified",
    "docs_neardup_clusters",
    "docs_neardup_keepers",
)


@given(text_corpus_strategy)
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
def test_neardup_pipeline_matches_oracle_on_random_corpora(spark, texts):
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from test_oracle_edge_cases import assert_query_matches_oracle

    d = tempfile.mkdtemp(prefix="neardup-fuzz-")
    try:
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(["en"] * len(texts), pa.string()),
                    "source": pa.array(["fuzz"] * len(texts), pa.string()),
                    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                }
            ),
            f"{d}/documents.parquet",
        )
        for name in NEARDUP_PIPELINE_QUERIES:
            assert_query_matches_oracle(spark, d, name, tables=("documents",))
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ── document-ingest pipeline invariants on ARBITRARY corpora ─────────────
#
# The deterministic ingest tests pin planted-dup scenarios; this fuzz pins
# the pipeline's CONTRACT on corpora hypothesis invents (the same
# six-word-vocabulary trick as the near-dup pipeline fuzz, so banding
# collisions and dedup decisions actually happen):
#
# * determinism: identical batch sequences into fresh base_dirs produce
#   identical accepted corpora;
# * exact-dup freedom: no two accepted docs share a fingerprint;
# * rejection witnesses: every admitted-then-rejected doc has an exact
#   Jaccard >= threshold witness among (accepted store before its batch)
#   union (admitted docs of its batch with lower id) — i.e. the filter
#   never drops a doc it cannot justify (precision 1.0; the verify step
#   is exact, LSH only MISSES, it never fabricates similarity).

_INGEST_VOCAB = ["alpha", "beta", "gamma", "delta", "omega", "kappa"]
ingest_corpus_strategy = st.lists(
    st.lists(st.sampled_from(_INGEST_VOCAB), min_size=0, max_size=10).map(" ".join),
    min_size=0,
    max_size=10,
)


@given(ingest_corpus_strategy)
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
def test_document_ingest_contract_on_random_corpora(spark, texts):
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from kafka_streams_dead_letter_publishing_spark.streaming.ingest_pipeline import (
        DocumentIngest,
    )

    threshold = 60
    rows = [(i, t) for i, t in enumerate(texts)]

    def mk_df(subset):
        return spark.createDataFrame(subset, "doc_id long, text string").select(
            "doc_id",
            "text",
            F.lit("en").alias("lang"),
            F.lit("srcX").alias("source"),
            F.length("text").alias("n_chars"),
        )

    def run(base):
        ing = DocumentIngest(base, threshold_pct=threshold)
        # two batches: evens then odds — deterministic arrival order
        b1 = [r for r in rows if r[0] % 2 == 0]
        b2 = [r for r in rows if r[0] % 2 == 1]
        accepted_after_b1 = set()
        if b1:
            ing.process_batch(mk_df(b1), 0)
            if _corpus_exists(base):
                accepted_after_b1 = {
                    r.doc_id for r in spark.read.parquet(ing.corpus_path).collect()
                }
        if b2:
            ing.process_batch(mk_df(b2), 1)
        final = (
            {r.doc_id for r in spark.read.parquet(ing.corpus_path).collect()}
            if _corpus_exists(base)
            else set()
        )
        return accepted_after_b1, final

    def _corpus_exists(base):
        import os

        p = f"{base}/corpus"
        return os.path.isdir(p) and any(
            not n.startswith(("_", ".")) for n in os.listdir(p)
        )

    def shingle_set(text):
        import re

        toks = re.sub(r"[ \t\n\x0B\f\r]+", " ", text.lower()).split(" ")
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()

    def jac_pct(a, b):
        u = len(a | b)
        return 100 * len(a & b) / u if u else 0

    d1 = tempfile.mkdtemp(prefix="ingest-fuzz-a-")
    d2 = tempfile.mkdtemp(prefix="ingest-fuzz-b-")
    try:
        acc_b1, final1 = run(d1)
        _, final2 = run(d2)
        # determinism across identical runs
        assert final1 == final2

        sh = {i: shingle_set(t) for i, t in rows}
        admitted = {i for i, t in rows if sh[i]}  # >=1 shingle
        # only admitted docs can be accepted; every accepted doc admitted
        assert final1 <= admitted

        # exact-dup freedom among accepted
        norm = {
            i: " ".join(t.lower().split()) for i, t in rows if i in final1
        }
        assert len(set(norm.values())) == len(norm)

        # rejection witnesses (precision 1.0): for every admitted doc that
        # was NOT accepted, some justifying witness must exist — a doc in
        # the accepted-store-before-its-batch, or an admitted lower-id doc
        # of its own batch — with exact Jaccard >= threshold
        for i in sorted(admitted - final1):
            if i % 2 == 0:  # batch 1: witnesses are admitted evens with lower id
                pool = [j for j in admitted if j % 2 == 0 and j < i]
            else:  # batch 2: accepted store after batch 1, plus lower odd ids
                pool = list(acc_b1) + [
                    j for j in admitted if j % 2 == 1 and j < i
                ]
            assert any(
                jac_pct(sh[i], sh[j]) >= threshold for j in pool
            ), (i, rows[i][1], pool)
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)


# ── Gopher repetition rules: sorted-run folds vs a pure-Python oracle ────

# repetition-prone text builder: small vocab + duplicate-friendly
# separators so duplicate lines, dominant n-grams, and whitespace edge
# cases (\t, \x0B, runs of spaces, empty lines) all actually occur
_words = st.sampled_from(["a", "b", "ab", "the", "buy", "now", "é.", "0"])
_line = st.lists(_words, min_size=0, max_size=6).map(" ".join)
_sep = st.sampled_from(["\n", "\n\n", " \n", "\t\n", "\x0B"])


@st.composite
def _texts(draw):
    lines = draw(st.lists(_line, min_size=0, max_size=8))
    # duplicate a prefix of the lines to plant repeated lines
    lines = lines + lines[: draw(st.integers(0, len(lines)))]
    seps = [draw(_sep) for _ in lines]
    return "".join(l + s for l, s in zip(lines, seps))


def _py_line_stats(text: str) -> tuple[int, int, int]:
    from collections import Counter

    # engine: split on \n, F.trim trims SPACES only (\t / \x0B lines count)
    lines = [l for l in text.split("\n") if l.strip(" ")]
    c = Counter(lines)
    return (
        len(lines),
        sum(k - 1 for k in c.values()),
        sum((k - 1) * len(l) for l, k in c.items()),
    )


def _py_top_ngram(toks: list[str], n: int) -> tuple[str | None, int, int]:
    from collections import Counter

    if len(toks) < n:
        return (None, 0, 0)
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    c = Counter(grams)
    best = max(c.values())
    gram = min(g for g, k in c.items() if k == best)  # ties: lowest gram
    return (gram, best, best * len(gram))


@given(st.lists(_texts(), min_size=1, max_size=10))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_quality_rule_folds_match_python_oracle(spark, texts):
    """duplicate_line_stats / top_ngram_stats / gopher_repetition_keep on
    ARBITRARY repetition-prone text (incl. \\t, \\x0B, multi-space runs,
    planted duplicate lines) must equal a pure-Python reference that
    implements the documented contracts directly — the registry row's
    DuckDB oracle only sees the real corpus; this covers the edges."""
    import re

    from pyspark.sql import functions as F

    from kafka_streams_dead_letter_publishing_spark.functions.quality import (
        duplicate_line_stats,
        gopher_repetition_keep,
        top_ngram_stats,
    )
    from kafka_streams_dead_letter_publishing_spark.functions.text import (
        norm_text,
        tokens,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, text string")
    staged = df.select("id", "text", tokens(norm_text(F.col("text"))).alias("toks"))
    got = {
        r.id: r
        for r in staged.select(
            "id",
            duplicate_line_stats(F.col("text")).alias("ls"),
            top_ngram_stats(F.col("toks"), 2).alias("g2"),
            top_ngram_stats(F.col("toks"), 3).alias("g3"),
            gopher_repetition_keep(F.col("text"), F.col("toks")).alias("keep"),
        ).collect()
    }

    for i, text in rows:
        n_lines, dup_lines, dup_chars = _py_line_stats(text)
        toks = re.sub(r"[ \t\n\x0B\f\r]+", " ", text.lower()).split(" ")
        g2 = _py_top_ngram(toks, 2)
        g3 = _py_top_ngram(toks, 3)
        r = got[i]
        assert (r.ls.n_lines, r.ls.dup_lines, r.ls.dup_chars) == (
            n_lines, dup_lines, dup_chars,
        ), (i, text)
        assert (r.g2.gram, r.g2["count"], r.g2.chars) == g2, (i, text)
        assert (r.g3.gram, r.g3["count"], r.g3.chars) == g3, (i, text)
        n_chars = len(text)
        line_ok = n_lines == 0 or (
            dup_lines <= 0.30 * n_lines and dup_chars <= 0.20 * n_chars
        )
        keep = (
            line_ok
            and (g2[1] <= 1 or g2[2] <= 0.20 * n_chars)
            and (g3[1] <= 1 or g3[2] <= 0.18 * n_chars)
        )
        assert r.keep is keep, (i, text)


# ── prefix-sum family: budget sampling + global packing on random corpora ─


@st.composite
def _idn_rows(draw):
    ids = draw(
        st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True)
    )
    return [(i, draw(st.integers(min_value=0, max_value=50))) for i in ids]


@given(_idn_rows(), st.integers(min_value=1, max_value=128))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_global_packing_fuzz_matches_python_oracle(spark, rows, seq_len):
    """pack_corpus_segments on ARBITRARY (id, n) corpora — including
    zero-token rows, sparse ids, giant docs relative to seq_len — must
    equal the direct sequential reference."""
    from tests.test_packing import _py_reference

    from kafka_streams_dead_letter_publishing_spark.operators.packing import (
        pack_corpus_segments,
    )

    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        (r.seq_id, r.doc_id): (r.tok_start, r.n_toks)
        for r in pack_corpus_segments(df, "n_tokens", seq_len).collect()
    }
    assert got == _py_reference(rows, seq_len), (rows, seq_len)


@st.composite
def _grouped_rows_and_budgets(draw):
    groups = ["web", "books", "code"]
    ids = draw(
        st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True)
    )
    rows = [
        (draw(st.sampled_from(groups)), i, draw(st.integers(1, 60))) for i in ids
    ]
    budgets = {
        g: draw(st.integers(min_value=0, max_value=400))
        for g in draw(st.lists(st.sampled_from(groups), unique=True, max_size=3))
    }
    return rows, budgets


@given(_grouped_rows_and_budgets())
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_grouped_budget_fuzz_matches_python_oracle(spark, case):
    """token_budget_sample with mapping budgets on random grouped corpora
    — including absent groups and zero budgets — must equal the direct
    per-group greedy reference."""
    from tests.test_budget import _py_grouped_reference

    from kafka_streams_dead_letter_publishing_spark.operators.budget import (
        token_budget_sample,
    )

    rows, budgets = case
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    got = {
        r.doc_id: r.running_tokens
        for r in token_budget_sample(
            df, "n_tokens", budgets, group_col="source"
        ).collect()
    }
    assert got == _py_grouped_reference(rows, budgets), (rows, budgets)


@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=12),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=2, max_value=4),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_substring_family_matches_python_reference(spark, docs, k):
    """dup_ngram_stats and remove_dup_spans on ARBITRARY small corpora
    (tiny alphabet forces heavy gram collisions, incl. within-doc
    repeats) must match a direct Python reference: counts, removal
    positions, and the rebuilt text."""
    from kafka_streams_dead_letter_publishing_spark.functions.text import (
        norm_text,
        tokens,
    )
    from kafka_streams_dead_letter_publishing_spark.operators.substrings import (
        dup_ngram_stats,
        remove_dup_spans,
    )
    from pyspark.sql import functions as F

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    # Python reference — tokenize exactly like the engine: split(' ') of
    # the joined text, so an EMPTY doc holds one empty-string token
    # (the engine-wide tokens()/_TOKS_SQL semantics, same on both engines)
    ref_toks = [text.split(" ") for _, text in rows]
    grams = [
        (i, pos + 1, tuple(toks[pos : pos + k]))
        for i, toks in enumerate(ref_toks)
        for pos in range(len(toks) - k + 1)
    ]
    from collections import Counter

    occ = Counter(g for _, _, g in grams)
    first = {}
    for i, pos, g in sorted(grams):
        first.setdefault(g, (i, pos))
    exp_stats = {
        i: (
            sum(1 for d, _, _ in grams if d == i),
            sum(1 for d, _, g in grams if d == i and occ[g] > 1),
        )
        for i in range(len(docs))
    }
    removed = {i: set() for i in range(len(docs))}
    for i, pos, g in grams:
        if occ[g] > 1 and first[g] != (i, pos):
            removed[i].update(range(pos, pos + k))
    exp_removal = {
        i: (
            len(ref_toks[i]),
            len(removed[i]),
            " ".join(
                t
                for j, t in enumerate(ref_toks[i], start=1)
                if j not in removed[i]
            ),
        )
        for i in range(len(docs))
    }

    df = spark.createDataFrame(rows, "doc_id long, text string")
    staged = df.select("doc_id", tokens(norm_text(F.col("text"))).alias("toks"))
    got_stats = {
        r.doc_id: (r.n_grams, r.n_dup_grams)
        for r in dup_ngram_stats(staged, k).collect()
    }
    got_removal = {
        r.doc_id: (r.n_tokens, r.n_removed, r.new_text)
        for r in remove_dup_spans(staged, k).collect()
    }
    assert got_stats == exp_stats, (docs, k)
    assert got_removal == exp_removal, (docs, k)


# ── r13: codec round-trip fuzz (pure Python — no Spark session needed) ───


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=6),
    data=st.data(),
)
def test_bmp_roundtrip_fuzz(w, h, data):
    """decode(encode(pixels)) == pixels for arbitrary RGB content at any
    (width, height) — every row-padding residue, every byte value."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        decode_image,
        encode_bmp,
    )

    px = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=3 * w * h,
                max_size=3 * w * h,
            )
        )
    )
    assert decode_image(encode_bmp(px, w, h)) == (w, h, px)


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    channels=st.integers(min_value=1, max_value=3),
    rate=st.sampled_from([8000, 16000, 44100]),
    data=st.data(),
)
def test_wav_roundtrip_fuzz(channels, rate, data):
    """decode(encode(samples)) == samples for arbitrary 16-bit content,
    any channel count, including the full signed range endpoints."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        decode_audio,
        encode_wav,
    )

    n_frames = data.draw(st.integers(min_value=0, max_value=40))
    samples = data.draw(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=n_frames * channels,
            max_size=n_frames * channels,
        )
    )
    assert decode_audio(encode_wav(samples, rate, channels)) == (
        channels,
        rate,
        samples,
    )


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=7),
    data=st.data(),
)
def test_png_roundtrip_fuzz(w, h, data):
    """decode(encode(pixels)) == pixels for arbitrary RGB content through
    the COMPRESSED codec — any height ≥5 exercises all five scanline
    filters (encode_png cycles them per row), every byte value, every
    deflate path stdlib zlib picks for that content."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        decode_image,
        encode_png,
    )

    px = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=3 * w * h,
                max_size=3 * w * h,
            )
        )
    )
    assert decode_image(encode_png(px, w, h)) == (w, h, px)


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=7),
    n_frames=st.integers(min_value=1, max_value=4),
    data=st.data(),
)
def test_gif_roundtrip_fuzz(w, h, n_frames, data):
    """decode(encode(frames)) == frames through the LZW codec — arbitrary
    RGB content, single- and multi-frame (the animation path adds the
    NETSCAPE loop extension and per-frame graphic-control extensions the
    chunk walk must skip), variable code widths, and whichever color-table
    mode (global vs per-frame local) the palette union forces."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        decode_gif,
        encode_gif,
    )

    frames = [
        bytes(
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=255),
                    min_size=3 * w * h,
                    max_size=3 * w * h,
                )
            )
        )
        for _ in range(n_frames)
    ]
    assert decode_gif(encode_gif(frames, w, h)) == (w, h, frames)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    mcs=st.integers(min_value=2, max_value=8),
    data=st.data(),
)
def test_gif_lzw_stream_fuzz(mcs, data):
    """The raw LZW layer round-trips any index stream at any min-code-size
    — including the all-distinct-symbols shape that pins the EARLY width
    change (the decoder's table lags the encoder's by one entry, so both
    sides must widen one entry apart or the EOI is read a bit short)."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    seq = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=(1 << mcs) - 1),
                min_size=0,
                max_size=4000,
            )
        )
    )
    assert _lzw_decode(_lzw_encode(seq, mcs), mcs) == seq
