"""CCNet-style LM-surprise corpus filtering ([EXT]): score every document
by how predictable its text is under an n-gram language model trained on
an in-domain reference subset, then bucket the corpus head / middle /
tail — the classic pretraining quality filter (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data": KenLM perplexity over Wikipedia-trained 5-grams, corpus split at
perplexity terciles).  The reference app has no counterpart (stateless
Kafka topology); this completes the quality-filter family next to the
Gopher repetition rules (functions/quality.py) and DSIR importance
resampling (operators/dsir.py).

Model: add-one-smoothed BIGRAM LM with an open vocabulary.  Per bigram
position (a, b) the surprise is

    w = floor(log2( (c(a) + V + 1)  DIV  (c(a,b) + 1) ))

— the integer floor of the conditional log2-inverse-probability
-log2 p(b|a), p(b|a) = (c(a,b)+1)/(c(a)+V+1), where c(.) are reference
counts (0 for out-of-vocabulary) and V the retained unigram vocabulary
size (+1 for the OOV outcome).  A document's score is the sum over its
size(tokens)-1 bigram positions; mean score/positions is the bits-per-
token surprise the CCNet buckets cut on.

Quantization deviation (documented, same policy as operators/dsir.py):
true log-probabilities need transcendental ``log`` whose last ulp
differs across libm implementations, so a cross-engine exact oracle
cannot hash them.  floor(log2 x) for integer x is ``length(bin(x)) - 1``
— EXACT integer arithmetic both Spark and DuckDB reproduce bit-for-bit
(and floor(log2(a DIV b)) = floor(log2(a/b)) for a >= b >= 1, so the
integer division loses nothing).  Resolution is one bit per position;
summed over a document's positions the mean keeps 1/n-bit resolution,
plenty for tercile-style bucketing.  BIGINT-safe at any corpus size:
the largest intermediate is c(a)+V+1 <= total reference tokens + V + 1.

Scale posture (100 TB corpus)
-----------------------------
Reference n-gram counts are partial-agg ``groupBy().count()`` over
exploded token streams; the retained tables are driver-bounded
(``max_vocab`` unigrams, ``max_bigrams`` bigrams — the KenLM-model-fits-
in-RAM analogue, enforced by a distributed TakeOrdered with a
deterministic count-desc/term-asc tie-break) and BROADCAST into the
corpus position stream — the corpus never shuffles on a token key.  The
vocabulary size V is ONE scalar read to the driver (metadata-bounded,
the k-means-centroid precedent) and folded into the surprise expression
as a literal.  Per-doc scoring is a map-side-combinable sum; bucketing
is a per-row integer comparison.  Everything downstream of the explode
is one Catalyst plan: no window, no data-sized collect, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.functions.text import (
    ngrams,
    norm_text,
    tokens,
)

DEFAULT_MAX_VOCAB = 65_536
DEFAULT_MAX_BIGRAMS = 1 << 22  # ~4M retained bigrams ≈ low-GB broadcast

#: bucket cut points in MILLI-BITS of mean per-position surprise
#: (score*1000 < t*positions).  Corpus-derived terciles are the CCNet
#: way; fixed defaults keep the operator a pure function of its inputs —
#: production recomputes them per-corpus from a sampled quantile.
DEFAULT_HEAD_MILLIBITS = 4_350
DEFAULT_TAIL_MILLIBITS = 4_450


def _floor_log2(x: Column) -> Column:
    """floor(log2(x)) for a positive BIGINT column — exact via the
    minimal binary-string length, identical in Spark and DuckDB."""
    return (F.length(F.bin(x)) - F.lit(1)).cast("long")


def bigram_lm(
    ref_docs: DataFrame,
    text_col: str = "text",
    max_vocab: int = DEFAULT_MAX_VOCAB,
    max_bigrams: int = DEFAULT_MAX_BIGRAMS,
    toks_col: str | None = None,
) -> tuple[DataFrame, DataFrame, int]:
    """Train the reference LM: ``(uni, bi, V)``.

    ``uni`` = (a, ca) retained unigram counts (top-``max_vocab`` by
    count, term tie-break), ``bi`` = (bg, cab) retained bigram counts
    keyed by the space-joined bigram string — both driver-bounded and
    broadcast-sized by construction.  ``V`` is the retained vocabulary
    size, read to the driver as ONE scalar (the same metadata-bounded
    driver read the k-means fit and the prefix-sum bucket totals make;
    a 1-row DataFrame join instead constant-folds its equi-key and
    degenerates to BroadcastNestedLoopJoin — observed, and exactly what
    the repo plan lint exists to keep out of query plans).
    """
    # r17 optimization (guide §1.2 "don't compute things twice"): the
    # returned uni/bi used to be LAZY frames — the reference corpus was
    # re-tokenized once for uni, once for bi, once more for ``uni.count()``
    # and then AGAIN under every downstream broadcast join that consumed
    # them (the quality funnel paid the chain 5x).  r18 (the r17 advice):
    # break the recomputation with ``localCheckpoint`` instead of a
    # driver ``collect()`` — at the default max_bigrams = 1<<22 the old
    # Python round-trip (4M pickled Rows + a pickle-path createDataFrame)
    # was a multi-hundred-MB driver episode on the operator's own
    # advertised envelope.  The checkpointed frames materialize ONCE on
    # the executors; downstream F.broadcast() builds from those blocks
    # JVM-side, and the driver reads back exactly one scalar (V).
    # r18 (guide §2.3, the nb_train restructure applied here): ONE tagged
    # explode+aggregate pass builds the full (gram-kind, gram) count
    # table — the corpus is scanned/tokenized once and shuffled once —
    # and both top-K reads are tiny TakeOrdered jobs over the persisted
    # aggregate (<= distinct terms + distinct bigrams count rows, far
    # smaller than the r17 per-occurrence token cache).  Counts are the
    # same exact occurrence counts; values identical.
    # stage the token array as an attribute: both transform() args below
    # reference it at ROW level (never inside a lambda body, where
    # re-evaluation would be per element), so codegen subexpression
    # elimination computes the tokenize chain once per row
    src = ref_docs.select(
        (
            F.col(toks_col)
            if toks_col is not None
            else tokens(norm_text(F.col(text_col)))
        ).alias("t")
    )
    t = F.col("t")
    agg = (
        src.select(
            F.explode(
                F.concat(
                    F.transform(
                        t, lambda x: F.struct(F.lit(1).alias("k"), x.alias("g"))
                    ),
                    F.transform(
                        ngrams(t, 2),
                        lambda g: F.struct(F.lit(2).alias("k"), g.alias("g")),
                    ),
                )
            ).alias("e")
        )
        .groupBy(F.col("e.k").alias("k"), F.col("e.g").alias("g"))
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    try:
        uni = (
            agg.filter(F.col("k") == 1)
            .select(F.col("g").alias("a"), F.col("c").alias("ca"))
            .orderBy(F.desc("ca"), F.asc("a"))
            .limit(max_vocab)
            .localCheckpoint(eager=True)
        )
        bi = (
            agg.filter(F.col("k") == 2)
            .select(F.col("g").alias("bg"), F.col("c").alias("cab"))
            .orderBy(F.desc("cab"), F.asc("bg"))
            .limit(max_bigrams)
            .localCheckpoint(eager=True)
        )
        vocab_n = uni.count()
    finally:
        agg.unpersist()
    return uni, bi, vocab_n


def surprise_scores(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
    toks_col: str | None = None,
) -> DataFrame:
    """Per-doc ``(id_col, *keep_cols, n_positions, score)``: summed
    integer bigram surprise over the doc's size(tokens)-1 positions.

    Single-token docs have zero positions and score 0 (no evidence of
    surprise — they land in the head bucket; real pipelines drop them
    earlier via the Gopher length rules).

    ``toks_col`` (r17): an already-tokenized array column to score from
    (must equal ``tokens(norm_text(text_col))``) — callers that stage
    tokens once behind a persist barrier pass it so the scoring shares
    the tokenize pass (the nb_classify convention).
    """
    staged = docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        (
            F.col(toks_col)
            if toks_col is not None
            else tokens(norm_text(F.col(text_col)))
        ).alias("t"),
    )
    stream = staged.select(
        id_col,
        *keep_cols,
        (F.size("t") - F.lit(1)).cast("long").alias("n_positions"),
        F.explode_outer(ngrams(F.col("t"), 2)).alias("bg"),
    ).withColumn("a", F.substring_index(F.col("bg"), " ", 1))
    joined = stream.join(F.broadcast(uni), "a", "left").join(
        F.broadcast(bi), "bg", "left"
    )
    w = _floor_log2(
        F.expr(f"(coalesce(ca, 0) + {int(vocab_size)} + 1) DIV (coalesce(cab, 0) + 1)")
    )
    return (
        joined.groupBy(id_col)
        .agg(
            *[F.first(c).alias(c) for c in keep_cols],
            F.first("n_positions").alias("n_positions"),
            F.sum(F.when(F.col("bg").isNotNull(), w).otherwise(0))
            .cast("long")
            .alias("score"),
        )
    )


def bucket_expr(
    score: Column,
    n_positions: Column,
    head_millibits: int = DEFAULT_HEAD_MILLIBITS,
    tail_millibits: int = DEFAULT_TAIL_MILLIBITS,
) -> Column:
    """CCNet bucket from integer mean surprise: 'head' (most predictable)
    / 'middle' / 'tail' by exact integer cross-multiplication — no float
    division anywhere near the hash."""
    return (
        F.when(score * 1000 < n_positions * head_millibits, F.lit("head"))
        .when(score * 1000 < n_positions * tail_millibits, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )


def perplexity_buckets(
    docs: DataFrame,
    ref_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
    max_vocab: int = DEFAULT_MAX_VOCAB,
    max_bigrams: int = DEFAULT_MAX_BIGRAMS,
    head_millibits: int = DEFAULT_HEAD_MILLIBITS,
    tail_millibits: int = DEFAULT_TAIL_MILLIBITS,
) -> DataFrame:
    """The composed filter for the common in-corpus reference case
    (``ref_pred`` a boolean Column, e.g. ``col('lang') == 'en'``):
    train the bigram LM on the reference subset, score every doc, assign
    CCNet buckets.  Returns (id_col, *keep_cols, n_positions, score,
    bucket)."""
    uni, bi, vocab_size = bigram_lm(
        docs.filter(ref_pred), text_col, max_vocab, max_bigrams
    )
    scored = surprise_scores(docs, uni, bi, vocab_size, id_col, text_col, keep_cols)
    zero = F.col("n_positions") <= 0
    return scored.withColumn(
        "bucket",
        F.when(zero, F.lit("head")).otherwise(
            bucket_expr(
                F.col("score"), F.col("n_positions"), head_millibits, tail_millibits
            )
        ),
    )
