"""Data Selection with Importance Resampling (DSIR-style, [EXT]): score
every corpus document by how much its hashed n-gram distribution looks
like a *target* domain, then keep the top-scoring docs.

Public method (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling"): featurize text into hashed unigram+bigram
buckets, fit bucket distributions on the raw corpus and on a target
corpus, and weight each document by its likelihood ratio under the two
distributions.  The reference app has no counterpart (stateless Kafka
topology); this is part of the driver-mandated [EXT] training-data
surface.

Quantization deviation (documented, rank-monotone in the weights): DSIR's
doc weight is the per-token log-ratio SUM (= product of ratios).  A
cross-engine exact oracle cannot ship transcendental ``ln`` (last-ulp
differences between libm implementations break value-hash parity), so the
doc score here is the per-token sum of integer-quantized ratios

    w[b] = (SCALE * (1 + target_count[b])) DIV (1 + raw_count[b]),

with add-one smoothing and SCALE = 2^20 — exact BIGINT arithmetic both
engines reproduce bit-for-bit.  The global normalizer
(raw_total/target_total) multiplies every bucket equally and is dropped as
rank-irrelevant.

Scale posture (100 TB corpus)
-----------------------------
Bucket counts are partial-agg-friendly ``groupBy(bucket).count()`` over
exploded features; the weight table is at most ``n_buckets`` rows
(metadata-sized, like the prefix-sum family's bucket totals) and is
BROADCAST into the feature stream — the exploded corpus never shuffles on
the bucket key; the per-doc score is again map-side-combinable.  Top-N is
Spark's distributed TakeOrderedAndProject.  Buckets are the first two hex
chars of md5(feature) — a fixed-width *string* key both engines compute
identically (no dialect-dependent hex→int parsing), giving 256 buckets;
``n_hex`` widens it (3 hex chars → 4096) without code changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.functions.text import (
    ngrams,
    norm_text,
    tokens,
)

SCALE = 1 << 20  # weight quantization; exact in BIGINT for corpus counts
DEFAULT_N_HEX = 2  # md5-prefix chars → 16^n buckets


def feature_bucket(feat: Column, n_hex: int = DEFAULT_N_HEX) -> Column:
    """Hashed feature bucket: fixed-width md5-prefix string key."""
    return F.substring(F.md5(feat), 1, n_hex)


def doc_feature_buckets(
    docs: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    n_hex: int = DEFAULT_N_HEX,
) -> DataFrame:
    """(id_cols..., bucket) rows: one per unigram and per bigram occurrence
    (WITH multiplicity — these are distribution counts, not sets)."""
    staged = docs.select(*id_cols, tokens(norm_text(F.col(text_col))).alias("toks"))
    feats = staged.select(
        *id_cols,
        F.explode(
            F.concat(F.col("toks"), ngrams(F.col("toks"), 2))
        ).alias("feat"),
    )
    return feats.select(*id_cols, feature_bucket(F.col("feat"), n_hex).alias("bucket"))


def importance_weights(
    raw_buckets: DataFrame,
    target_buckets: DataFrame,
    scale: int = SCALE,
) -> DataFrame:
    """Per-bucket quantized likelihood-ratio weight ``(bucket, w)``.

    Buckets absent from the raw stream cannot be scored (nothing to join
    them to) and are dropped; buckets absent from the target get the
    add-one floor.  At most 16^n_hex rows — broadcast-sized by
    construction.
    """
    rc = raw_buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("rc"))
    tc = target_buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("tc"))
    # both sides are ≤ n_buckets rows post-agg; broadcast the target side so
    # the weight build never sorts
    return rc.join(F.broadcast(tc), "bucket", "left").select(
        "bucket",
        F.expr(f"({scale} * (1 + coalesce(tc, 0))) DIV (1 + rc)").alias("w"),
    )


def dsir_scores(
    docs: DataFrame,
    target_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hex: int = DEFAULT_N_HEX,
    scale: int = SCALE,
) -> DataFrame:
    """(id_col, score): per-doc sum of its features' bucket weights —
    higher = more target-like.  Every doc has at least one token (the
    tokenizer never returns an empty array), so every doc gets a row."""
    feats = doc_feature_buckets(docs, [id_col], text_col, n_hex)
    tfeats = doc_feature_buckets(target_docs, [id_col], text_col, n_hex)
    w = importance_weights(
        feats.select("bucket"), tfeats.select("bucket"), scale
    )
    return (
        feats.join(F.broadcast(w), "bucket")
        .groupBy(id_col)
        .agg(F.sum("w").cast("long").alias("score"))
    )


def dsir_scores_subset(
    docs: DataFrame,
    target_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hex: int = DEFAULT_N_HEX,
    scale: int = SCALE,
) -> DataFrame:
    """:func:`dsir_scores` for the common case where the target domain is
    a PREDICATE over the corpus itself (``target_pred`` a boolean Column,
    e.g. ``col('lang') == 'en'``): the raw and target bucket counts come
    from ONE conditional aggregation over one exploded feature stream, so
    the corpus is tokenized twice (count pass + score pass) instead of
    three times.  Identical result to ``dsir_scores(docs,
    docs.filter(target_pred))`` — pinned by tests."""
    staged = docs.select(
        F.col(id_col), F.col(text_col), target_pred.alias("_tgt")
    )
    feats = doc_feature_buckets(
        staged, [id_col, "_tgt"], text_col, n_hex
    )
    # r17 optimization (guide §2.3 "aggregate before you shuffle" + §1.2):
    # both consumers (bucket totals, per-doc scores) need only the
    # per-(doc, bucket) multiplicity k, so partial-aggregate the exploded
    # feature stream ONCE and persist the compact result (<= 2^n_hex
    # distinct buckets per doc) — before, the tokenize + explode chain ran
    # twice and the score join shipped one row per feature OCCURRENCE.
    # score = sum_bucket k*w == the old sum-per-occurrence of w, exactly.
    per_doc = (
        feats.groupBy(id_col, "_tgt", "bucket")
        .agg(F.count(F.lit(1)).alias("k"))
        .persist()
    )
    counts = per_doc.groupBy("bucket").agg(
        F.sum("k").alias("rc"),
        F.sum(F.when(F.col("_tgt"), F.col("k")).otherwise(0)).alias("tc"),
    )
    w = counts.select(
        "bucket",
        F.expr(f"({scale} * (1 + coalesce(tc, 0))) DIV (1 + rc)").alias("w"),
    )
    return (
        per_doc.join(F.broadcast(w), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("w") * F.col("k")).cast("long").alias("score"))
    )


def dsir_sample(
    docs: DataFrame,
    target_docs: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hex: int = DEFAULT_N_HEX,
    scale: int = SCALE,
    target_pred=None,
) -> DataFrame:
    """Top-*n* most-target-like docs as ``(id_col, score)``, deterministic
    via the id tie-break (distributed top-k, no global sort of the
    corpus).  Pass ``target_pred`` (and ``target_docs=None``) to use the
    one-pass subset form."""
    if target_pred is not None:
        scores = dsir_scores_subset(
            docs, target_pred, id_col, text_col, n_hex, scale
        )
    else:
        scores = dsir_scores(docs, target_docs, id_col, text_col, n_hex, scale)
    return scores.orderBy(F.desc("score"), F.asc(id_col)).limit(n)
