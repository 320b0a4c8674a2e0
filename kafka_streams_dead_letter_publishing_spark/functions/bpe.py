"""Character-level BPE token counting ([EXT]) — a pluggable, pretraining-
grade alternative to the whitespace ``tokens()`` counter for the budget /
mixture / packing family ("collect 10 B tokens" means BPE tokens, not
regex words).

ALGORITHM (public knowledge: the subword-NMT / GPT-2-tokenizer lineage —
a merge table applied in rank order; no reference counterpart, the
reference is a 326-LoC Kafka Streams demo): normalize text (lowercase +
collapse whitespace — the same ``norm_text`` every text operator uses),
split into characters, then for each merge ``(a, b)`` in table order run
one left-to-right pass replacing every adjacent token pair ``(a, b)``
with the single token ``a+b``.  Spaces are word boundaries: no merge pair
may contain a space, so merges never cross words.  The token count is the
number of surviving non-space tokens.

EXPRESSION-ONLY EXECUTION — the marked-string trick.  A merge pass
(left-to-right, non-overlapping) is EXACTLY what SQL ``replace()`` does,
once token boundaries are explicit: encode the token list as a string
with every token wrapped in U+001F markers (``␟tok␟␟tok␟…``), and the
pass for ``(a, b)`` is ``replace(s, '␟a␟␟b␟', '␟ab␟')`` — a wrapped
pattern can only match whole tokens, and both Spark's and DuckDB's
``replace`` scan left-to-right past each substitution (pinned by the
fold-equivalence fuzz in tests/test_bpe.py).  So the whole counter is
``M + 3`` scalar string functions per row: JVM-side, codegen, zero UDFs,
zero shuffles — and the DuckDB oracle replays it byte-for-byte.  Cost is
O(len × n_merges) per row; narrow, embarrassingly parallel at 100 TB.

Caveats: input U+001F characters are stripped before marking (they would
forge token boundaries); characters are Unicode code points in both
engines' regex engines, but the two `length()` semantics only stay
consistent in the COUNT arithmetic because the markers themselves are
ASCII; astral-plane text may segment differently between engines (the
fixture corpora are ASCII).
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.functions.text import norm_text

#: token-boundary marker (ASCII unit separator)
_US = "\x1f"

#: merge table trained on the sf0.01 fixture corpus by tools/train_bpe.py
#: (16 merges, deterministic; regenerate with the tool).  Format is the
#: published one: ordered (left, right) pairs, applied in rank order.
DEFAULT_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("p", "a"),
    ("pa", "r"),
    ("o", "in"),
    ("j", "oin"),
    ("s", "h"),
    ("h", "a"),
    ("ha", "sh"),
    ("r", "ow"),
)


#: the SATURATED merge table for the fixture corpus: training on
#: sf0.01 halts after 89 merges because the corpus's 31-word
#: vocabulary has fully collapsed to single tokens — more merges
#: CANNOT be trained from this fixture (tools/train_bpe.py, any
#: n_merges >= 89 reproduces this table verbatim; DEFAULT_MERGES
#: is its 16-entry prefix).  Production vocabularies (30k-50k
#: merges) need a production corpus; the executor-choice machinery
#: below is measured with no-op-padded tables instead (a merge
#: that never fires still costs a full string scan per pass).
TRAINED_MERGES_FULL: tuple[tuple[str, str], ...] = (
    ('e', 'r'),
    ('i', 'n'),
    ('o', 'w'),
    ('o', 'r'),
    ('s', 't'),
    ('m', 'er'),
    ('a', 't'),
    ('l', 'u'),
    ('p', 'a'),
    ('pa', 'r'),
    ('o', 'in'),
    ('j', 'oin'),
    ('s', 'h'),
    ('h', 'a'),
    ('ha', 'sh'),
    ('r', 'ow'),
    ('c', 'h'),
    ('b', 'at'),
    ('bat', 'ch'),
    ('s', 'c'),
    ('sc', 'a'),
    ('sca', 'n'),
    ('u', 'st'),
    ('ust', 'o'),
    ('usto', 'mer'),
    ('o', 'lu'),
    ('olu', 'm'),
    ('olum', 'n'),
    ('c', 'ustomer'),
    ('c', 'olumn'),
    ('t', 'er'),
    ('l', 'ter'),
    ('i', 'lter'),
    ('f', 'ilter'),
    ('s', 'm'),
    ('sm', 'a'),
    ('sma', 'l'),
    ('smal', 'l'),
    ('s', 'l'),
    ('sl', 'ow'),
    ('mer', 'g'),
    ('merg', 'e'),
    ('v', 'e'),
    ('ve', 'c'),
    ('vec', 't'),
    ('vect', 'or'),
    ('or', 'd'),
    ('ord', 'er'),
    ('l', 'in'),
    ('lin', 'e'),
    ('t', 'a'),
    ('ta', 'b'),
    ('tab', 'l'),
    ('tabl', 'e'),
    ('d', 'at'),
    ('dat', 'a'),
    ('u', 'p'),
    ('g', 'g'),
    ('a', 'gg'),
    ('v', 'a'),
    ('va', 'lu'),
    ('valu', 'e'),
    ('k', 'e'),
    ('ke', 'y'),
    ('st', 'r'),
    ('str', 'e'),
    ('stre', 'a'),
    ('strea', 'm'),
    ('w', 'in'),
    ('win', 'd'),
    ('wind', 'ow'),
    ('s', 'par'),
    ('spar', 'k'),
    ('r', 'o'),
    ('ro', 'up'),
    ('par', 't'),
    ('g', 'roup'),
    ('i', 'g'),
    ('b', 'ig'),
    ('s', 'or'),
    ('sor', 't'),
    ('u', 'er'),
    ('uer', 'y'),
    ('q', 'uery'),
    ('f', 'a'),
    ('fa', 'st'),
    ('t', 'h'),
    ('th', 'e'),
    ('d', 'up'),
)


def _validate(merges: Sequence[tuple[str, str]]) -> None:
    for a, b in merges:
        if not a or not b:
            raise ValueError(f"empty merge side in {(a, b)!r}")
        if " " in a or " " in b:
            raise ValueError(f"merge may not cross word boundaries: {(a, b)!r}")
        if _US in a or _US in b:
            raise ValueError(f"merge may not contain the marker: {(a, b)!r}")


def bpe_marked(text: Column, merges: Sequence[tuple[str, str]] | None = None) -> Column:
    """The ␟-marked token string of ``text`` after all merge passes — the
    full segmentation, byte-exact (what the registry row fingerprints).
    NULL text ⇒ NULL."""
    merges = DEFAULT_MERGES if merges is None else tuple(merges)
    _validate(merges)
    s = norm_text(F.replace(text, F.lit(_US), F.lit("")))
    s = F.regexp_replace(s, "(.)", f"{_US}$1{_US}")
    for a, b in merges:
        s = F.replace(
            s, F.lit(f"{_US}{a}{_US}{_US}{b}{_US}"), F.lit(f"{_US}{a}{b}{_US}")
        )
    return s


def bpe_token_count(
    text: Column, merges: Sequence[tuple[str, str]] | None = None
) -> Column:
    """Number of BPE tokens in ``text`` (spaces excluded) as a long —
    drop-in for the whitespace counter in ``token_budget_sample`` /
    ``pack_corpus_segments`` (they take any precomputed count column).
    Marker arithmetic: each token contributes two ␟, each space token is
    the 3-char ``␟ ␟``."""
    m = bpe_marked(text, merges)
    n_all = (F.length(m) - F.length(F.replace(m, F.lit(_US), F.lit("")))) / 2
    n_space = (
        F.length(m) - F.length(F.replace(m, F.lit(f"{_US} {_US}"), F.lit("")))
    ) / 3
    return (n_all - n_space).cast("long")


def bpe_tokens_arr(
    text: Column, merges: Sequence[tuple[str, str]] | None = None
) -> Column:
    """The BPE token ARRAY (spaces included as their own tokens) — the
    marked segmentation with the outer markers trimmed, split on the
    ``␟␟`` inter-token boundary.  NULL text or text that normalizes to
    nothing yields an empty array.  This is the id-delivery entry point:
    downstream maps terms to vocabulary ids and reassembles ``input_ids``
    sequences."""
    m = bpe_marked(text, merges)
    inner = F.substring(m, 2, F.length(m) - F.lit(2))
    return F.when(F.length(m) >= 2, F.split(inner, _US + _US)).otherwise(
        F.array().cast("array<string>")
    )


# ── DuckDB oracle twins (same marked-string construction, verbatim) ──────

_NORM_SQL_TPL = "regexp_replace(lower({expr}), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')"


def _q(s: str) -> str:
    return s.replace("'", "''")


def bpe_marked_sql(expr: str, merges: Sequence[tuple[str, str]] | None = None) -> str:
    merges = DEFAULT_MERGES if merges is None else tuple(merges)
    _validate(merges)
    s = _NORM_SQL_TPL.format(expr=f"replace({expr}, chr(31), '')")
    s = f"regexp_replace({s}, '(.)', chr(31) || '\\1' || chr(31), 'g')"
    for a, b in merges:
        pat = f"chr(31) || '{_q(a)}' || chr(31) || chr(31) || '{_q(b)}' || chr(31)"
        rep = f"chr(31) || '{_q(a + b)}' || chr(31)"
        s = f"replace({s}, {pat}, {rep})"
    return s


def bpe_count_sql(expr: str, merges: Sequence[tuple[str, str]] | None = None) -> str:
    m = bpe_marked_sql(expr, merges)
    return (
        f"CAST((len({m}) - len(replace({m}, chr(31), ''))) / 2"
        f" - (len({m}) - len(replace({m}, chr(31) || ' ' || chr(31), ''))) / 3"
        f" AS BIGINT)"
    )


# ── pure-Python references (tests + trainer) ─────────────────────────────


def _norm_py(text: str) -> str:
    return re.sub("[ \t\n\x0b\f\r]+", " ", text.replace(_US, "").lower())


def bpe_tokens_py(text: str, merges: Sequence[tuple[str, str]] | None = None) -> list[str]:
    """Sequential fold reference: the SEMANTICS the marked-string trick
    must reproduce (one left-to-right pass per merge)."""
    merges = DEFAULT_MERGES if merges is None else tuple(merges)
    _validate(merges)
    toks = list(_norm_py(text))
    for a, b in merges:
        acc: list[str] = []
        for t in toks:
            if acc and acc[-1] == a and t == b:
                acc[-1] = a + b
            else:
                acc.append(t)
        toks = acc
    return [t for t in toks if t != " "]


def train_bpe_merges(
    texts: Sequence[str], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE training over the word vocabulary: repeatedly merge the
    most frequent adjacent token pair (ties: lexicographically greatest
    pair — any fixed rule works, it just must be deterministic).  Words
    never cross spaces, so no produced pair can contain one."""
    words = Counter()
    for t in texts:
        for w in _norm_py(t).split(" "):
            if w:
                words[w] += 1
    return train_bpe_on_counts_fast(words, n_merges)


def train_bpe_on_counts(
    words: dict, n_merges: int
) -> list[tuple[str, str]]:
    """The training loop over a (word -> count) histogram — what BPE
    training ACTUALLY consumes (subword-NMT lineage trains on the word
    vocabulary, never the raw corpus).  Split out so the distributed
    trainer can feed it a Spark-aggregated histogram.

    This is the REFERENCE loop: O(n_merges x total vocab chars) because
    every merge recounts every pair and rescans every word — fine to a
    few hundred merges, prohibitive at a production 30k-50k vocabulary.
    :func:`train_bpe_on_counts_fast` is the production path (identical
    output, fuzz-pinned); this one stays as the parity oracle."""
    vocab = {w: list(w) for w in words}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, cnt in words.items():
            toks = vocab[w]
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        (a, b), _n = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        merges.append((a, b))
        for w, toks in vocab.items():
            acc: list[str] = []
            for t in toks:
                if acc and acc[-1] == a and t == b:
                    acc[-1] = a + b
                else:
                    acc.append(t)
            vocab[w] = acc
    return merges


def _apply_merge(toks: list[str], a: str, b: str) -> list[str]:
    """One left-to-right non-overlapping merge pass (the replace() pass
    the executors run)."""
    acc: list[str] = []
    for t in toks:
        if acc and acc[-1] == a and t == b:
            acc[-1] = a + b
        else:
            acc.append(t)
    return acc


def train_bpe_on_counts_fast(
    words: dict, n_merges: int
) -> list[tuple[str, str]]:
    """Incremental-count BPE training (the subword-NMT ``fast`` shape):
    maintain the global pair histogram and a pair -> {words containing
    it} index, and on each merge touch ONLY the words that contain the
    winning pair — per-merge cost is proportional to the affected slice
    of the vocabulary, not to all of it.  Output is IDENTICAL to
    :func:`train_bpe_on_counts` (same greedy objective, same
    (count, pair) lexicographic tie-break, same stop rule; fuzz-pinned
    in tests/test_bpe.py), only the bookkeeping differs.

    Cost: the reference loop is O(M x C) for C total vocab characters;
    this is O(C + sum over merges of affected-word chars x log), with
    the per-merge WINNER selection a lazy max-heap pop (stale entries —
    counts changed since push — are discarded on pop against the live
    histogram), not an O(|pairs|) scan: the scan was the residual
    superlinear term past ~1k merges.  Measured curve in SCALE.md (r11).
    """
    import heapq

    vocab = {w: list(w) for w in words}
    pair_counts: Counter = Counter()
    occ: dict[tuple[str, str], set] = {}
    for w, cnt in words.items():
        toks = vocab[w]
        for p in zip(toks, toks[1:]):
            pair_counts[p] += cnt
            occ.setdefault(p, set()).add(w)

    # max-heap on (count, pair) with the SAME lexicographic-greatest
    # tie-break as the reference loop: negate the count, reverse the
    # string ordering via a wrapper.
    class _Rev(str):
        __slots__ = ()

        def __lt__(self, other):  # inverted: max-lex pops first
            return str.__gt__(self, other)

    def entry(p, n):
        return (-n, _Rev(p[0]), _Rev(p[1]), p)

    heap = [entry(p, n) for p, n in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negn, _ra, _rb, best = heapq.heappop(heap)
        if pair_counts.get(best) != -negn:
            continue  # stale: count changed since this entry was pushed
        merges.append(best)
        a, b = best
        touched: set = set()
        for w in list(occ.get(best, ())):
            toks = vocab[w]
            cnt = words[w]
            # retract this word's old pair contributions...
            for p in zip(toks, toks[1:]):
                touched.add(p)
                left = pair_counts[p] - cnt
                if left > 0:
                    pair_counts[p] = left
                else:
                    del pair_counts[p]
                s = occ.get(p)
                if s is not None:
                    s.discard(w)
                    if not s:
                        del occ[p]
            # ...apply the merge, then re-add the new ones
            toks = _apply_merge(toks, a, b)
            vocab[w] = toks
            for p in zip(toks, toks[1:]):
                touched.add(p)
                pair_counts[p] += cnt
                occ.setdefault(p, set()).add(w)
        for p in touched:
            n = pair_counts.get(p)
            if n:
                heapq.heappush(heap, entry(p, n))
    return merges


# ── Arrow-batched executor (large vocabularies) ──────────────────────────
#
# The expression chain above costs O(len × M) string scans per row — every
# merge is one full replace() pass whether or not it fires.  At a
# production vocabulary (30k–50k merges) that is prohibitive, and far
# before that the chained-replace expression tree blows past whole-stage
# codegen's JVM method limits.  The scale path is the documented
# Python-legal Arrow surface (like multimodal decode): a pandas_udf whose
# per-WORD cost is independent of M — words are segmented by iteratively
# merging the lowest-rank adjacent pair (the GPT-2 tokenizer shape), and
# every unique word's count is memoized, so the corpus-scale cost is
# ~ one dict lookup per word occurrence plus one segmentation per unique
# word.  Equivalence to the pass-in-rank-order fold holds for WELL-NESTED
# tables (each merge side is a single char or an earlier merge's product —
# every trained table is, by construction); non-nested tables fall back to
# the literal per-word fold.  Fuzz-pinned in tests/test_bpe.py.


def _well_nested(merges: Sequence[tuple[str, str]]) -> bool:
    products: set[str] = set()
    for a, b in merges:
        for side in (a, b):
            if len(side) > 1 and side not in products:
                return False
        products.add(a + b)
    return True


def _merge_word_minrank(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    toks = list(word)
    while len(toks) > 1:
        best: tuple[str, str] | None = None
        best_rank = None
        for p in zip(toks, toks[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, p
        if best is None:
            break
        a, b = best
        acc: list[str] = []
        for t in toks:
            if acc and acc[-1] == a and t == b:
                acc[-1] = a + b
            else:
                acc.append(t)
        toks = acc
    return toks


def _merge_word_fold(
    word: str, merges: Sequence[tuple[str, str]]
) -> list[str]:
    toks = list(word)
    for a, b in merges:
        acc: list[str] = []
        for t in toks:
            if acc and acc[-1] == a and t == b:
                acc[-1] = a + b
            else:
                acc.append(t)
        toks = acc
    return toks


def bpe_token_count_arrow(
    text: Column, merges: Sequence[tuple[str, str]] | None = None
) -> Column:
    """``bpe_token_count`` on the Arrow path: same count, M-independent
    per-word cost, word-memoized across the batch (cache is per-executor
    and bounded by the corpus's unique-word vocabulary).  NULL ⇒ NULL."""
    merges = DEFAULT_MERGES if merges is None else tuple(merges)
    _validate(merges)
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    nested = _well_nested(merges)
    cache: dict[str, int] = {}

    # no parameter annotations: under `from __future__ import annotations`
    # they are unresolved strings, which Spark's hint parser rejects
    @F.pandas_udf("long")
    def _count(s):
        def one(t):
            if t is None:
                return None
            total = 0
            for w in _norm_py(t).split(" "):
                if not w:
                    continue
                n = cache.get(w)
                if n is None:
                    n = len(
                        _merge_word_minrank(w, ranks)
                        if nested
                        else _merge_word_fold(w, merges)
                    )
                    cache[w] = n
                total += n
            return total

        return s.map(one)

    return _count(text)


#: cutover for engine='auto', from the SCALE.md "BPE executor choice"
#: measurement (sf0.1, 5000 docs, local[32]): expr is linear in M —
#: 0.75 s @16, 1.56 @89, 3.21 @256 — and FAILS outright past ~1024
#: merges (JVM optimizer StackOverflowError on the chained-replace tree);
#: arrow is flat ~0.33 s at every size.  On raw throughput arrow wins
#: even at M=16 on the fixture (its 31-word vocabulary makes the word
#: cache near-perfect), but small tables stay on expr by default: the
#: whole plan remains UDF-free whole-stage codegen (fusable with
#: surrounding expressions, no Python workers, symbolically
#: oracle-replayable) at a sub-second absolute cost.  Past this bound
#: the purity trade is indefensible and auto switches to arrow.
BPE_EXPR_MAX_MERGES = 128


def bpe_counter(
    text: Column,
    merges: Sequence[tuple[str, str]] | None = None,
    engine: str = "auto",
) -> Column:
    """The executor-choice rule, as one entry point: ``engine='expr'``
    forces the codegen replace chain, ``'arrow'`` the batched Python
    tokenizer, ``'auto'`` picks by table size against the measured
    ``BPE_EXPR_MAX_MERGES`` cutover."""
    merges = DEFAULT_MERGES if merges is None else tuple(merges)
    if engine == "auto":
        engine = "expr" if len(merges) <= BPE_EXPR_MAX_MERGES else "arrow"
    if engine == "expr":
        return bpe_token_count(text, merges)
    if engine == "arrow":
        return bpe_token_count_arrow(text, merges)
    raise ValueError(f"unknown bpe engine {engine!r}")


# ── distributed training (Spark histogram → driver loop) ─────────────────


def word_histogram(
    docs, text_col: str = "text", min_count: int = 1, max_vocab: int | None = None
):
    """(word, n) DataFrame: the corpus word-count histogram BPE training
    consumes — one explode + partial-agg hash aggregate over the corpus
    (a hot word collapses map-side).  ``min_count`` floors and
    ``max_vocab`` caps (by (n desc, word) — deterministic) what a caller
    will collect: the driver traffic bound.  The corpus never leaves the
    cluster; only the bounded vocabulary does, which is exactly the
    subword-NMT design (training reads the word vocabulary, not text)."""
    toks = F.split(norm_text(F.col(text_col)), " ")
    hist = (
        docs.select(F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= int(min_count))
    )
    if max_vocab is not None:
        hist = hist.orderBy(F.desc("n"), F.asc("word")).limit(int(max_vocab))
    return hist


def train_bpe_distributed(
    docs,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 1,
    max_vocab: int | None = None,
) -> list[tuple[str, str]]:
    """BPE training with the corpus-scale part distributed: Spark
    aggregates the word histogram (TakeOrdered cap ⇒ bounded collect),
    the driver runs the classic merge loop on it
    (:func:`train_bpe_on_counts`).  With min_count=1 and no cap this is
    EXACTLY ``train_bpe_merges`` over the same corpus (test-pinned) —
    the collected histogram is metadata-sized (unique words after the
    floor), never the corpus."""
    hist = word_histogram(docs, text_col, min_count, max_vocab)
    words = {r.word: r.n for r in hist.collect()}
    return train_bpe_on_counts_fast(words, n_merges)
