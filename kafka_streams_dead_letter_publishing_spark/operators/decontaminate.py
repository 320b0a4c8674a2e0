"""Benchmark decontamination ([EXT] LLM-pipeline surface): flag and drop
training documents that share word *k*-grams with a held-out evaluation
set.

Every serious pretraining pipeline ships this step — the GPT-3 paper's
13-gram eval-overlap removal and its successors (PaLM, Llama) all define
contamination as "a training document containing an n-gram that also
appears in a benchmark/eval document".  The reference app has no notion of
it (stateless per-record Kafka topology); this module is part of the
driver-mandated [EXT] training-data surface.

Semantics
---------
* ``eval_gram_fps(eval_docs, k)`` — the DISTINCT set of md5-compacted
  k-token shingles over the eval corpus (normalization identical to the
  dedup family: lowercase, collapsed whitespace).
* ``contamination_report(docs, eval_docs, k)`` — one row per contaminated
  doc: ``(doc_id, n_hits)`` where ``n_hits`` counts the doc's DISTINCT
  k-grams that appear anywhere in the eval set (≥1 by construction).
* ``decontaminate(docs, eval_docs, k)`` — the surviving corpus
  (anti-join on the report).

Docs with fewer than *k* tokens have no k-grams and are never flagged.

Scale posture (100 TB corpus, benchmark-sized eval set)
-------------------------------------------------------
The eval side is a *benchmark* — orders of magnitude smaller than the
training corpus — so its distinct gram fingerprints are broadcast: the
exploded (doc_id, gram_fp) training rows meet the eval set in a
BroadcastHashJoin and never shuffle.  The per-doc hit count is a
partial-agg-friendly ``groupBy(doc_id).count()`` (map-side combine), and
the final removal is a broadcast LeftAnti of the (small) contaminated-id
set against the corpus.  Gram keys are md5-compacted to fixed-width hex so
the broadcast table size is bounded by #grams, not by gram text length
(k=13 grams of long words would otherwise dominate).  Everything is
Column-expression work — no UDFs, no window over a hot key.

The gate SF uses k=5 because the synthetic docs are ~50 tokens; the k of a
production run (8–13) is a parameter, not a code change.
``tests/test_decontaminate.py`` pins the broadcast plan shape and the
semantics against a planted-overlap fixture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.functions.text import (
    norm_text,
    shingles,
    tokens,
)

DEFAULT_K = 5


def _gram_fp(gram: Column) -> Column:
    """Fixed-width gram key: md5 of the space-joined shingle text."""
    return F.md5(gram)


def eval_gram_fps(
    eval_docs: DataFrame, text_col: str = "text", k: int = DEFAULT_K
) -> DataFrame:
    """DISTINCT md5 fingerprints of all k-token shingles in the eval set,
    as a single-column frame ``(gram_fp)`` sized for broadcast."""
    toks = eval_docs.select(tokens(norm_text(F.col(text_col))).alias("toks"))
    return (
        toks.select(F.explode(shingles(F.col("toks"), k)).alias("gram"))
        .select(_gram_fp(F.col("gram")).alias("gram_fp"))
        .distinct()
    )


def _doc_gram_fps(
    docs: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(id, gram_fp) rows — one per DISTINCT shingle per doc (shingles()
    is already the distinct-set form, so no per-doc dedup join is needed)."""
    staged = docs.select(
        F.col(id_col), tokens(norm_text(F.col(text_col))).alias("toks")
    )
    return staged.select(
        F.col(id_col), F.explode(shingles(F.col("toks"), k)).alias("gram")
    ).select(F.col(id_col), _gram_fp(F.col("gram")).alias("gram_fp"))


def contamination_report_fps(
    docs: DataFrame,
    fps: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
) -> DataFrame:
    """`contamination_report` against a PRECOMPUTED eval fingerprint frame
    ``(gram_fp)`` — the form the streaming ingest stage uses, where the
    eval set is fingerprinted once and persisted rather than re-shingled
    every micro-batch."""
    hits = _doc_gram_fps(docs, id_col, text_col, k).join(
        F.broadcast(fps), "gram_fp"
    )
    return hits.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hits"))


def contamination_report(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
) -> DataFrame:
    """Per contaminated doc: ``(id_col, n_hits)`` — the count of the doc's
    distinct k-grams that appear in the eval set.  Docs with zero hits are
    absent (join survivors only)."""
    fps = eval_gram_fps(eval_docs, text_col=text_col, k=k)
    return contamination_report_fps(docs, fps, id_col, text_col, k)


def decontaminate_by_fps(
    docs: DataFrame,
    fps: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
) -> DataFrame:
    """`decontaminate` against a precomputed eval fingerprint frame.

    The contaminated-id anti-join is deliberately NOT force-broadcast:
    although the flagged set is usually benchmark-scale, ONE common gram
    in the eval set (boilerplate like "all rights reserved") can flag a
    corpus-scale fraction of training docs — a forced broadcast would OOM
    exactly then.  AQE broadcasts it when it really is small."""
    bad = contamination_report_fps(docs, fps, id_col, text_col, k).select(id_col)
    return docs.join(bad, id_col, "left_anti")


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_K,
) -> DataFrame:
    """The corpus with every contaminated doc removed (schema unchanged).

    See :func:`decontaminate_by_fps` for why the removal anti-join is left
    to AQE instead of force-broadcast (a single common eval gram can flag
    a corpus-scale doc set)."""
    fps = eval_gram_fps(eval_docs, text_col=text_col, k=k)
    return decontaminate_by_fps(docs, fps, id_col, text_col, k)
