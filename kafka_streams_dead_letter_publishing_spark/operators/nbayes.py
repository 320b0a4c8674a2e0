"""Exact-integer multinomial Naive Bayes — the quality/language
classifier tier of an LLM data pipeline ([EXT]).

Production corpora gate documents with a cheap linear text classifier
(CCNet / GPT-3 / Llama use fastText or logistic models for language ID
and in-domain quality scoring).  SGD-trained models are float-order-
dependent and unreproducible across engines; multinomial Naive Bayes is
the classifier whose TRAINING is nothing but counting — partial-agg
groupBy counts, exactly the aggregate Spark does best — and whose
SCORING becomes exact integer arithmetic under the repo's quantized-log2
contract (operators/bm25.py ``qlog2_mb_sql``, 10 fractional bits):

* train: per-class token counts ``c(t,cls)``, class token totals
  ``T_cls``, class doc counts — one groupBy each, all integers.  The
  feature space is capped to the top-``V`` corpus terms picked on the
  driver (TakeOrdered, deterministic (count DESC, term) tie-break) — the
  same driver-bounded "model fits in RAM" contract as the perplexity
  module's n-gram tables; the broadcast model is V x C integers.
* score: add-one-smoothed surprise ``-log2 p(t|cls) = log2((T_cls + V')
  / (c(t,cls) + 1))`` in millibits, ``V'`` the smoothing vocabulary
  (retained V + 1 OOV bucket); document score per class =
  ``prior_mb(cls) + sum_t tf_t * surprise_mb(t|cls)`` — a SUM of
  BIGINTs, shuffle-order-independent.  Lowest total surprise wins;
  ties break on class name.  Out-of-model terms hit the OOV row
  (c = 0) — never dropped, so verbose documents don't win by omission.

Scale shape: the model broadcasts; the corpus explodes to (doc, term,
tf) partial aggregates, joins the broadcast model producing C rows per
distinct doc-term, and partial-aggregates to (doc, cls) — no shuffle
keyed on a token, no UDFs, no driver data traffic beyond the V x C
model and the scalar priors.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.functions.text import norm_text, tokens

DEFAULT_VOCAB = 4096


@dataclass
class NbModel:
    classes: list[str]  # sorted
    priors_mb: dict[str, int]  # -log2 P(cls) in millibits
    # (term, cls) -> surprise_mb; missing (term, cls) uses oov_mb[cls]
    term_rows: list[tuple[str, str, int]]
    oov_mb: dict[str, int]


def nb_train(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    vocab: int = DEFAULT_VOCAB,
    toks_col: str | None = None,
) -> NbModel:
    """Count-based fit.  Driver traffic: V terms + V x C count rows +
    C scalars — metadata-bounded by the ``vocab`` knob.  ``toks_col``
    (r17): an already-tokenized array column (must equal
    ``tokens(norm_text(text_col))``) so a caller that staged the tokens
    shares the pass — the nb_classify convention."""
    # r17 staged the exploded (cls, term) stream behind a persist so the
    # three aggregates below stopped re-tokenizing the split.  r18 (guide
    # §2.3, measured): aggregate ONCE to the (cls, term) contingency
    # table and persist THAT — the heavy tokenize+explode+aggregate job
    # runs exactly once, the persisted frame shrinks from per-occurrence
    # rows to <= classes x distinct-terms count rows, and the three
    # collects become metadata reads over the cached table (quality
    # funnel: nb_train wall 2.6 s -> ~1.1 s at sf0.1/32c).  All counts
    # are exact sums of the same occurrences — values identical.
    ct = (
        docs.select(
            F.col(label_col).alias("cls"),
            F.explode(
                F.col(toks_col)
                if toks_col is not None
                else tokens(norm_text(F.col(text_col)))
            ).alias("term"),
        )
        .groupBy("cls", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()
    )
    try:
        # top-V corpus terms, deterministic tie-break (the retained model)
        top = (
            ct.groupBy("term")
            .agg(F.sum("c").cast("long").alias("n"))
            .orderBy(F.desc("n"), F.asc("term"))
            .limit(vocab)
            .collect()
        )
        kept = [r.term for r in top]
        if not kept:
            raise ValueError("nb_train: empty training corpus")
        spark = docs.sparkSession
        kept_df = F.broadcast(
            spark.createDataFrame([(t,) for t in kept], "term string")
        )
        counts = ct.join(kept_df, "term").select("cls", "term", "c").collect()
        totals = (
            ct.groupBy("cls")
            .agg(F.sum("c").cast("long").alias("t"))
            .collect()
        )
    finally:
        ct.unpersist()
    ndocs = (
        docs.groupBy(F.col(label_col).alias("cls"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    )
    t_cls = {r.cls: r.t for r in totals}
    n_cls = {r.cls: r.n for r in ndocs}
    classes = sorted(n_cls)
    n_total = sum(n_cls.values())
    vprime = len(kept) + 1  # +1: the OOV bucket shares the smoothing mass

    def mb(num: int, den: int) -> int:
        r = (num * 1024) // den
        e = r.bit_length() - 11
        return e * 1024 + (r // (1 << e)) - 1024

    priors = {c: mb(n_total, n_cls[c]) for c in classes}
    # classes absent from training totals (label present, zero tokens)
    # still get a smoothed model: T_cls = 0
    term_rows = [
        (r.term, r.cls, mb(t_cls.get(r.cls, 0) + vprime, r.c + 1))
        for r in counts
    ]
    oov = {c: mb(t_cls.get(c, 0) + vprime, 1) for c in classes}
    return NbModel(
        classes=classes, priors_mb=priors, term_rows=term_rows, oov_mb=oov
    )


def nb_classify(
    docs: DataFrame,
    model: NbModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    toks_col: str | None = None,
) -> DataFrame:
    """(id, pred, score_mb): the argmin-surprise class per document.

    Every class scores every document (a doc with zero in-model terms
    still gets prior + tf*oov per class).  The min is taken with a
    partial-agg min over a (score_mb, cls) struct — no window.

    ``toks_col`` (r17): an already-tokenized array column to score from
    instead of re-running the tokenize chain — callers that stage the
    tokens once behind a persist barrier (the quality funnel) pass it so
    classification shares the pass with their other token consumers; the
    column must equal ``tokens(norm_text(text_col))``."""
    spark = docs.sparkSession
    cls_df = F.broadcast(
        spark.createDataFrame(
            [(c, model.priors_mb[c], model.oov_mb[c]) for c in model.classes],
            "cls string, prior_mb bigint, oov_mb bigint",
        )
    )
    model_df = F.broadcast(
        spark.createDataFrame(
            model.term_rows, "term string, cls string, s_mb bigint"
        )
    )
    toks = (
        F.col(toks_col)
        if toks_col is not None
        else tokens(norm_text(F.col(text_col)))
    )
    tf = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(toks).alias("term"),
        )
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    # C rows per (doc, term): crossJoin the tiny class table, then LEFT
    # join the model — a miss means OOV for that (term, cls)
    per_cls = (
        tf.crossJoin(cls_df)
        .join(model_df, ["term", "cls"], "left")
        .withColumn("s", F.coalesce(F.col("s_mb"), F.col("oov_mb")))
        .groupBy("_id", "cls")
        .agg(
            (F.sum(F.col("tf") * F.col("s")) + F.first("prior_mb"))
            .cast("long")
            .alias("score_mb")
        )
    )
    best = per_cls.groupBy("_id").agg(
        F.min(F.struct("score_mb", "cls")).alias("_b")
    )
    return best.select(
        F.col("_id").alias(id_col),
        F.col("_b.cls").alias("pred"),
        F.col("_b.score_mb").alias("score_mb"),
    )


def nb_model_sql(
    train_where: str,
    toks_sql: str,
    label_col: str = "lang",
    vocab: int = DEFAULT_VOCAB,
) -> str:
    """DuckDB CTE block replaying nb_train + nb_classify's model tables
    over the ``documents`` view — same integer arithmetic, dialect-
    spelled.  Emits CTEs: nb_classes(cls, prior_mb, oov_mb) and
    nb_model(term, cls, s_mb).  ``train_where`` picks the training split.
    """
    from kafka_streams_dead_letter_publishing_spark.operators.bm25 import (
        qlog2_mb_duck_sql,
    )

    return f"""
    nb_train_toks AS (
        SELECT {label_col} AS cls, unnest(t) AS term
        FROM (SELECT {label_col}, {toks_sql} AS t FROM documents
              WHERE {train_where})
    ),
    nb_top AS (
        SELECT term FROM nb_train_toks GROUP BY term
        ORDER BY COUNT(*) DESC, term LIMIT {vocab}
    ),
    nb_vp AS (SELECT COUNT(*) + 1 AS vprime FROM nb_top),
    nb_tot AS (
        SELECT cls, COUNT(*) AS t_cls FROM nb_train_toks GROUP BY cls
    ),
    nb_nd AS (
        SELECT {label_col} AS cls, COUNT(*) AS n_cls
        FROM documents WHERE {train_where} GROUP BY 1
    ),
    nb_ntot AS (SELECT SUM(n_cls) AS n_total FROM nb_nd),
    nb_classes AS (
        -- LEFT join + COALESCE: a class whose every training doc is
        -- token-free appears in nb_nd but not nb_tot; the engine keeps
        -- it with T_cls = 0 (nb_train's t_cls.get(cls, 0)), so an INNER
        -- join here would silently drop its prior/OOV rows and the two
        -- engines would diverge on any doc that class should win.
        SELECT cls,
               {qlog2_mb_duck_sql('n_total', 'n_cls')} AS prior_mb,
               {qlog2_mb_duck_sql('COALESCE(t_cls, 0) + vprime', '1')} AS oov_mb
        FROM nb_nd LEFT JOIN nb_tot USING (cls), nb_ntot, nb_vp
    ),
    nb_model AS (
        SELECT term, cls,
               {qlog2_mb_duck_sql('t_cls + vprime', 'c + 1')} AS s_mb
        FROM (
            SELECT k.term, cls, COUNT(*) AS c
            FROM nb_train_toks k JOIN nb_top USING (term)
            GROUP BY 1, 2
        ) JOIN nb_tot USING (cls), nb_vp
    )
    """
