"""Corpus-incremental embedding near-dup filter: drop incoming vectors
whose cosine similarity to a REFERENCE vector set reaches a threshold
([EXT] — the embedding-space sibling of ``operators.neardup_filter``).

Same ingest shape: build a multi-table sign-LSH index over the reference
vectors once, then filter every incoming (micro-)batch against it —
candidates from an EQUI-join on the skinny ``(bucket_key, ref_id)`` index,
exact cosine verify on candidates only, LeftAnti reject.  Pure
batch→batch, so it slots into the ``foreachBatch`` streaming wrapper
unchanged.

Recall at dup-grade thresholds is far better than the top-k-pairs regime:
sign-LSH per-plane collision probability is ``p = 1 − θ/π``, so at
``cos ≥ 0.9`` (θ ≈ 25.8°) ``p ≈ 0.857`` and the 6-table × 4-plane OR-index
keeps ``1 − (1 − p⁴)⁶ ≈ 0.99`` of true near-dups — verified by the
planted-perturbation test.  (Contrast the registry's top-50-pairs query,
whose true cosines are only ~0.5 on the random corpus and recall is the
measured 0.64.)
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.occupancy import drop_hot_keys
from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
    N_TABLES,
    PLANES_PER_TABLE,
    dot,
    lsh_table_keys_int,
)


class AnnIndex(NamedTuple):
    """Prebuilt reference-vector index.

    ``buckets`` — (bk long, ref_id)                        : candidate side
    ``vectors`` — (ref_id, ref_emb array<float>, ref_nrm)  : verify payload
    ``n_tables`` / ``planes_per_table`` — the LSH config the buckets were
    built with; the filter derives batch keys from the SAME config (a
    mismatch would silently miss every collision), so the config rides the
    index object rather than being re-supplied by callers.
    """

    buckets: DataFrame
    vectors: DataFrame
    n_tables: int = N_TABLES
    planes_per_table: int = PLANES_PER_TABLE


def build_ann_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_tables: int = N_TABLES,
    planes_per_table: int = PLANES_PER_TABLE,
    max_bucket_occupancy: int | None = None,
) -> AnnIndex:
    """Index reference vectors for :func:`ann_filter`.  Zero-norm vectors
    are dropped from the index — cosine against them is undefined, so they
    can never reject anything.

    ``planes_per_table``: pass ``planes_per_table_for(corpus_size)`` when
    the reference set is large — the default oracle config (6×4 planes, 16
    buckets/table) keeps RANDOM-pair collisions ≈ N/16 per vector per
    table, i.e. candidate volume quadratic in N at fixed depth; scaling
    the depth with log2(N) holds it linear-ish while dup-grade recall
    (cos ≥ 0.9 ⇒ per-plane p ≈ 0.86) stays OR-amplified across tables.

    ``max_bucket_occupancy``: drop buckets bigger than the cap — the
    hot-key guard for CORRELATED vector sets (dense clusters put far more
    than the random-model N/2^b vectors into one bucket, and that bucket's
    join is quadratic in its size).  Same trade as the neardup filter's
    band cap: a dup reachable only through dropped buckets is missed, but
    near-parallel pairs collide in ~every table, so they stay reachable
    through the non-hot ones."""
    base = corpus.select(
        F.col(id_col).alias("ref_id"),
        F.col(emb_col).alias("ref_emb"),
        F.sqrt(dot(emb_col, emb_col)).alias("ref_nrm"),
    ).filter(F.col("ref_nrm") > 0)
    buckets = base.select(
        "ref_id",
        F.explode(
            # column NAME, not Column: the keys build as one memoized SQL
            # string (r18 — this runs per micro-batch on ingest hot paths)
            lsh_table_keys_int("ref_emb", n_tables, planes_per_table)
        ).alias("bk"),
    ).select("bk", "ref_id")
    buckets = drop_hot_keys(buckets, max_bucket_occupancy)
    return AnnIndex(
        buckets=buckets,
        vectors=base.select("ref_id", "ref_emb", "ref_nrm"),
        n_tables=n_tables,
        planes_per_table=planes_per_table,
    )


def ann_candidates(
    batch: DataFrame,
    index: AnnIndex,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Distinct (vec_id, ref_id) LSH-collision candidate pairs — the
    exact-verify workload :func:`ann_filter` scores.  Exposed so callers
    (and the SCALE.md probe) can measure the candidate BUDGET the
    configured depth buys; the filter's cost is linear in this count."""
    staged = batch.select(
        F.col(id_col).alias("vec_id"),
        F.col(emb_col).alias("emb"),
        F.sqrt(dot(emb_col, emb_col)).alias("nrm"),
    ).filter(F.col("nrm") > 0)
    banded = staged.select(
        "vec_id",
        F.explode(
            lsh_table_keys_int("emb", index.n_tables, index.planes_per_table)
        ).alias("bk"),
    )
    return banded.join(index.buckets, "bk").select("vec_id", "ref_id").distinct()


def ann_filter(
    batch: DataFrame,
    index: AnnIndex,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    min_cos: float = 0.9,
) -> DataFrame:
    """Rows of ``batch`` that are NOT cosine-near-dups of the indexed set.

    A batch vector is rejected when its exact cosine with ANY reference
    vector it shares an LSH bucket with (any of the 6 tables) reaches
    ``min_cos``.  Zero-norm batch vectors have undefined cosine and always
    pass.  The miss rate is the OR-amplified LSH bound above, not a
    semantic difference.
    """
    batch_index = build_ann_index(
        batch,
        id_col=id_col,
        emb_col=emb_col,
        n_tables=index.n_tables,
        planes_per_table=index.planes_per_table,
    )
    dup_ids = ann_reject_ids(batch_index, index, min_cos)
    return batch.join(
        dup_ids.withColumnRenamed("vec_id", id_col), id_col, "left_anti"
    )


def ann_reject_ids(
    batch_index: AnnIndex,
    index: AnnIndex,
    min_cos: float = 0.9,
) -> DataFrame:
    """(vec_id) rows of ``batch_index``'s vectors that ARE cosine-near-dups
    of ``index``'s set — the reject set :func:`ann_filter` anti-joins away,
    exposed on prebuilt indexes so a caller that already staged the batch's
    (buckets, vectors) — EmbeddingIngest computes them once per micro-batch
    for the intra-batch dedup — never re-runs the 6×4 plane-fold chain for
    the store filter (r16: the chain was evaluated 3× per batch).  Both
    indexes must share the LSH config or the bucket equi-join silently
    misses every collision."""
    if (batch_index.n_tables, batch_index.planes_per_table) != (
        index.n_tables,
        index.planes_per_table,
    ):
        raise ValueError(
            f"LSH-config mismatch: batch {batch_index.n_tables}x"
            f"{batch_index.planes_per_table} vs index {index.n_tables}x"
            f"{index.planes_per_table} — the bucket join would match nothing"
        )
    cands = (
        batch_index.buckets.withColumnRenamed("ref_id", "vec_id")
        .join(index.buckets, "bk")
        .select("vec_id", "ref_id")
        .distinct()
    )
    staged = batch_index.vectors.select(
        F.col("ref_id").alias("vec_id"),
        F.col("ref_emb").alias("emb"),
        F.col("ref_nrm").alias("nrm"),
    )
    return (
        cands.join(staged, "vec_id")
        .join(index.vectors, "ref_id")
        .select(
            "vec_id",
            F.try_divide(
                dot("emb", "ref_emb"), F.col("nrm") * F.col("ref_nrm")
            ).alias("cos"),
        )
        .filter(F.col("cos") >= F.lit(min_cos))
        .select("vec_id")
        .distinct()
    )


def lsh_recall_bound(
    min_cos: float, n_tables: int, planes_per_table: int
) -> float:
    """Theoretical OR-amplified recall AT the threshold: a pair with
    cosine exactly ``min_cos`` collides per plane with p = 1 − θ/π, per
    table with p^b, in at least one of L tables with 1 − (1−p^b)^L.
    Every true pair ABOVE the threshold does at least this well (p rises
    with cosine), so this is the filter's worst-case designed recall."""
    import math

    p = 1.0 - math.acos(min_cos) / math.pi
    return 1.0 - (1.0 - p**planes_per_table) ** n_tables


def build_decontam_index(
    eval_df: DataFrame,
    n_eval: int,
    min_cos: float = 0.85,
    min_recall: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_bucket_occupancy: int | None = None,
) -> AnnIndex:
    """The recall/budget-solved eval-set index :func:`semantic_decontaminate`
    filters against, exposed so a streaming caller can build (and persist)
    it ONCE for a documented-immutable eval set instead of re-deriving it
    every micro-batch (r12 ADVICE; see streaming/ingest_pipeline.py).
    Carries the same REFUSING GUARD: ``lsh_config_for`` raises when no
    (tables, depth) config inside the plane pool meets both the recall
    target and the collision budget."""
    from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
        lsh_config_for,
    )

    n_tables, planes = lsh_config_for(
        max(n_eval, 1), threshold=min_cos, recall=min_recall
    )
    return build_ann_index(
        eval_df,
        id_col=id_col,
        emb_col=emb_col,
        n_tables=n_tables,
        planes_per_table=planes,
        max_bucket_occupancy=max_bucket_occupancy,
    )


def semantic_decontaminate(
    batch: DataFrame,
    eval_df: DataFrame,
    n_eval: int,
    min_cos: float = 0.85,
    min_recall: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_bucket_occupancy: int | None = None,
    index: AnnIndex | None = None,
) -> DataFrame:
    """Production-scale semantic eval-leak gate: drop batch documents
    whose embedding is cosine-``min_cos``-close to ANY eval-benchmark
    embedding — the LSH-bucketed composition whose SEMANTICS the flat
    broadcast registry row ``emb_semantic_decontaminated`` pins (that
    row cross-joins because an eval set is fixed-size; this path scales
    the corpus side).

    REFUSING GUARD (r11 verdict #6): the (tables, depth) config comes
    from ``lsh_config_for(n_eval, threshold=min_cos, recall=min_recall)``
    — candidate volume per corpus vector stays ≈ the collision budget
    while the OR-amplified recall AT the threshold meets the target, and
    when no config inside the plane pool can deliver both, it RAISES
    instead of silently under-catching leaks (fail-closed: a
    decontamination gate that quietly misses boundary paraphrases is
    worse than an error).  ``n_eval`` is the eval-set size (the caller
    usually knows it without a count job; it sizes the collision
    budget).  Measured on planted boundary paraphrases in
    tests/test_ann_filter.py and SCALE.md.

    ``index``: a prebuilt :func:`build_decontam_index` result — pass it
    when filtering MANY batches against the same immutable eval set so
    the index (and any persist on its frames) is shared instead of
    rebuilt per call."""
    if index is None:
        index = build_decontam_index(
            eval_df,
            n_eval,
            min_cos=min_cos,
            min_recall=min_recall,
            id_col=id_col,
            emb_col=emb_col,
            max_bucket_occupancy=max_bucket_occupancy,
        )
    return ann_filter(batch, index, id_col, emb_col, min_cos=min_cos)
