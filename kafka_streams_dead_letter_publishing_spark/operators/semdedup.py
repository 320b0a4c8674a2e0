"""SemDeDup — semantic deduplication via coarse-cluster-scoped cosine
([EXT] scale surface; published method: Abbas et al. 2023, "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication").

The web-scale observation: semantically duplicate training examples
(re-hosted articles, templated product pages, paraphrase mirrors) hurt
data efficiency but are NOT exact or near-exact dups, so fingerprint /
MinHash dedup misses them.  SemDeDup finds them in embedding space — but
an all-pairs cosine over the corpus is O(N²) and impossible at scale, so
the published method first k-means-clusters the embeddings and compares
ONLY within each cluster.

Spark shape here:

* cell assignment is the engine's frozen quantized coarse quantizer
  (``operators.kmeans.nearest_cluster_quantized`` — the IVF routing fold,
  exact integer arithmetic, oracle-replayable);
* the within-cell pair search is an EQUI-join on the cluster id with the
  cosine threshold as a residual condition — never a cartesian product;
  the N² term is confined to single cells, and production sizing picks
  k ≈ N / target_cell so cells stay ~10³–10⁴ rows (the same knob that
  sizes the IVF index; a hot cell is bounded by the quantizer, not by
  data luck);
* the keeper rule is the engine-wide deterministic one (see
  ``streaming/ingest_pipeline._intra_batch_dedup``): a vector is DROPPED
  iff any LOWER-id cell-mate is cosine-similar at ``tau`` — greedy
  lowest-id survivor, batch-order-free, reproducible.

Registry row: ``emb_semdedup_keepers`` (plans/similarity.py) plants
deterministic semantic twins and replays assignment + pair search in
DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.functions.similarity import cosine
from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
    nearest_cluster_quantized,
    nearest_cluster_two_level,
    quantize_embedding,
)

#: flat routing pays an O(N·k) argmin fold; production sizing sets
#: k ≈ N / target_cell, so k grows WITH the corpus and the fold's cost
#: exponent was measured at 1.27 (SCALE.md, semdedup_scaled_k).  Past
#: this k the engine refuses flat routing instead of silently paying it:
#: use routing="two_level" (O(sqrt k) folds) or reuse a persisted
#: index's assignment via cluster_col (free).
SEMDEDUP_FLAT_MAX_K = 4096


def semdedup_flags(
    emb_df: DataFrame,
    centroids: list[list[int]] | None,
    tau: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    cluster_col: str | None = None,
    routing: str = "auto",
    max_cell_occupancy: int | None = None,
) -> DataFrame:
    """(id, cluster, kept) for every row of *emb_df*: assign each vector
    to its coarse cell against the FROZEN microunit *centroids*, then keep
    a vector iff no lower-id cell-mate has cosine ≥ *tau*.

    ``cluster_col`` names a PRE-ASSIGNED cell column instead (pass
    ``centroids=None``) — the production path when a persisted IVF index
    already carries (id, embedding, cluster): flat routing costs O(N·k)
    argmin folds (a narrow map — embarrassingly parallel, but compute
    that the index build already paid; measured curves in SCALE.md), so
    SemDeDup over the index reuses that assignment for free and pays only
    the cell-scoped pair search.

    ``routing`` picks the cell-assignment strategy when ``centroids``
    are given: "flat" (exact argmin, O(k) folds per row — REFUSED past
    ``SEMDEDUP_FLAT_MAX_K``, the measured-1.27-exponent cost cliff),
    "two_level" (O(sqrt k) folds via
    ``kmeans.nearest_cluster_two_level`` — deterministic, approximate:
    cell boundaries shift slightly, which SemDeDup tolerates since any
    deterministic partition is a valid dedup scope), "two_level_p2"
    (the r12 multi-probe variant — 2·sqrt(k) folds, boundary vectors
    route to the cross-group best, flat-agreement 0.77→0.93 on the hard
    overlapping fixture, SCALE.md), or "auto" (flat while k allows,
    two_level beyond).

    ``max_cell_occupancy`` (r11 verdict #7 — the ``neardup_filter``
    hot-band-cap analogue): cells holding more rows than the cap are
    SKIPPED by the pair search — every row of a hot cell is kept.  The
    within-cell term is O(|cell|²), so one under-split dense cluster
    (quantizer-vs-data mismatch) otherwise dominates the whole job; with
    the cap, total pair work is bounded by N·cap regardless of how the
    data clumps.  Deterministic (occupancy is a property of the data and
    the frozen quantizer, not of partitioning) and FAIL-OPEN in the safe
    direction: a semantic dup inside a hot cell is missed, never wrongly
    dropped, and the lowest-id-survivor contract holds exactly on every
    searched cell.  The production remedy for persistent hot cells is
    re-fitting the quantizer with larger k (the same sizing knob as the
    IVF index); the cap is the guard that keeps the job linear until the
    re-fit lands.

    The caller guarantees rows satisfy the indexable contract (exactly
    dim finite components — same precondition as every IVF path).  Zero-
    norm vectors have NULL cosine against everything (the engine-wide
    ``cosine`` contract) and are therefore always kept.
    """
    if (centroids is None) == (cluster_col is None):
        raise ValueError("pass exactly one of centroids / cluster_col")
    if cluster_col is not None:
        assigned = emb_df.select(
            id_col, emb_col, F.col(cluster_col).alias("cluster")
        )
    else:
        k = len(centroids)
        if routing == "auto":
            routing = "flat" if k <= SEMDEDUP_FLAT_MAX_K else "two_level"
        if routing == "flat" and k > SEMDEDUP_FLAT_MAX_K:
            raise ValueError(
                f"semdedup_flags: flat routing over k={k} centroids pays "
                f"an O(N*k) argmin fold (> SEMDEDUP_FLAT_MAX_K="
                f"{SEMDEDUP_FLAT_MAX_K}; measured cost exponent 1.27, "
                "SCALE.md) — use routing='two_level', or reuse a "
                "persisted index's assignment via cluster_col"
            )
        if routing == "flat":
            route = nearest_cluster_quantized(
                centroids, quantize_embedding(F.col(emb_col))
            )
        elif routing == "two_level":
            route = nearest_cluster_two_level(
                centroids, quantize_embedding(F.col(emb_col))
            )
        elif routing == "two_level_p2":
            route = nearest_cluster_two_level(
                centroids, quantize_embedding(F.col(emb_col)), probes=2
            )
        else:
            raise ValueError(f"unknown routing {routing!r}")
        assigned = emb_df.select(id_col, emb_col, route.alias("cluster"))
    # r17 optimization (guide §1.2): the assigned frame feeds BOTH sides
    # of the pair search, the hot-cell gauge and the final kept join —
    # without a persist barrier each branch re-ran the O(N*k) argmin
    # routing fold (and whatever lineage produced emb_df).  Eviction-
    # recompute is safe; the ContextCleaner unpins it when the query's
    # references drop.
    assigned = assigned.persist()
    searched = assigned
    if max_cell_occupancy is not None:
        # hot-cluster table is <= k rows (quantizer metadata) — broadcast;
        # excluding a hot cell from BOTH join sides means it contributes
        # no pairs at all, so its rows fall through as kept
        hot = (
            assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_cell_occupancy)
            .select("cluster")
        )
        searched = assigned.join(F.broadcast(hot), "cluster", "left_anti")
    left = searched.select(
        F.col(id_col).alias("_aid"),
        F.col("cluster").alias("_ac"),
        F.col(emb_col).alias("_ae"),
    )
    right = searched.select(
        F.col(id_col).alias("_bid"),
        F.col("cluster").alias("_bc"),
        F.col(emb_col).alias("_be"),
    )
    pair_cond = (
        (F.col("_ac") == F.col("_bc"))
        & (F.col("_bid") < F.col("_aid"))
        & (cosine(F.col("_ae"), F.col("_be")) >= F.lit(float(tau)))
    )
    dup_ids = (
        left.join(right, pair_cond, "leftsemi")
        .select(F.col("_aid").alias(id_col))
        .withColumn("_dup", F.lit(True))
    )
    return (
        assigned.join(dup_ids, id_col, "left")
        .select(id_col, "cluster", F.col("_dup").isNull().alias("kept"))
    )
