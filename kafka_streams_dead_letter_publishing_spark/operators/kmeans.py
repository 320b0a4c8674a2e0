"""K-means coarse quantizer for IVF indexes ([EXT]): DataFrame-native
Lloyd's iterations, the index-build step that makes inverted-file ANN real.

``plans/similarity.py``'s registry IVF routes on the pre-existing ``label``
column; on the synthetic corpus labels carry NO cluster structure, so its
recall ceiling is nprobe/nlist (measured: 0.3 at nprobe=3, nlist=10 —
pinned in tests/test_plan_quality.py).  A LEARNED partition concentrates a
query's true neighbors into few cells, which is the entire point of IVF
(tests/test_kmeans.py pins that k-means routing beats label routing at
equal nprobe on the same corpus).

Scale posture — every step is the shape that survives 100 TB:

* **Assignment** is one narrow map: the k×d centroid matrix is a driver
  literal (ConstantFolding collapses it to ONE node, the LSH-plane trick)
  and each row folds over it ONCE, carrying ``(best_idx, best_d2)`` through
  the fold — argmin and distance come out of a single evaluation, no
  duplicated k×d work, no shuffle, no Python.
* **Update** is the scale-mode centroid pattern (plans/similarity.py):
  posexplode → groupBy(cluster, dim).agg(sum, count) — commutative partial
  aggregation with O(1) state per group; only the k×d result (index
  metadata, a few KB) is collected to the driver, exactly what Spark MLlib's
  own KMeans collects per iteration.
* **Lineage stays flat**: centroids live on the driver between iterations,
  so iteration T's plan is always scan→assign→aggregate — no growing
  lineage, no checkpoint needed (unlike the connected-components loop in
  plans/text.py whose per-round frames chain).

The iterative fixpoint is not expressible in one SQL query, so the operator
is test-pinned rather than oracle-gated (same tier as the streaming ops;
SURVEY §2.2b documents which).  Oracle-grade determinism still holds: seeded
init (k lowest vec_ids), left-to-right folds, lowest-index tie-breaks — two
fits on the same data produce bit-identical centroids.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.functions.similarity import dot


def _centroid_matrix_expr(centroids: list[list[float]]) -> Column:
    """Nested array literal (k×d), one Literal node after ConstantFolding."""
    return F.expr(
        "array("
        + ", ".join(
            "array(" + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in c) + ")"
            for c in centroids
        )
        + ")"
    )


def _nearest(centroids: list[list[float]], emb: Column) -> Column:
    """struct(cluster int, d2 double): argmin over squared-L2 distances in a
    SINGLE fold over the centroid matrix — index, best distance, and the
    running position ride one accumulator, so the k×d work happens exactly
    once per row and ties break to the lowest index deterministically.

    SENTINEL: a row whose distance to EVERY centroid is NULL/NaN (a NULL or
    non-finite component, or a length-mismatched vector) keeps cluster=-1 —
    it is unindexable, not assignable-by-tiebreak.  Callers building an
    index must filter such rows up front (see plans/similarity
    learned_ivf_index's indexable predicate, mirrored in its oracle)."""
    cm = _centroid_matrix_expr(centroids)
    init = F.struct(
        F.lit(-1).alias("cluster"),
        F.lit(float("inf")).alias("d2"),
        F.lit(0).alias("i"),
    )
    def step(acc: Column, c: Column) -> Column:
        d2 = F.aggregate(
            F.zip_with(
                c, emb, lambda a, b: (a - b.cast("double")) * (a - b.cast("double"))
            ),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        better = d2 < acc["d2"]
        return F.struct(
            F.when(better, acc["i"]).otherwise(acc["cluster"]).alias("cluster"),
            F.when(better, d2).otherwise(acc["d2"]).alias("d2"),
            (acc["i"] + 1).alias("i"),
        )
    folded = F.aggregate(cm, init, step)
    return F.struct(folded["cluster"].alias("cluster"), folded["d2"].alias("d2"))


def assign_clusters(emb_df: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Add ``cluster`` (int) and ``d2`` (squared L2 to its centroid) to a
    frame with an ``embedding`` column.  Pure narrow projection; idempotent
    (withColumn REPLACES pre-existing cluster/d2, so re-assigning an
    already-assigned index after a refit just works)."""
    near = _nearest(centroids, F.col("embedding"))
    return (
        emb_df.withColumn("_n", near)
        .withColumn("cluster", F.col("_n.cluster"))
        .withColumn("d2", F.col("_n.d2"))
        .drop("_n")
    )


@dataclass(frozen=True)
class KMeansResult:
    centroids: list[list[float]]  # k×d
    wcss_history: list[float]  # per-iteration within-cluster sum of squares
    iterations: int
    converged: bool  # assignments reached a fixpoint before max_iter


def kmeans_fit(
    emb_df: DataFrame,
    k: int,
    max_iter: int = 10,
    id_col: str = "vec_id",
    tol: float = 0.0,
) -> KMeansResult:
    """Deterministic Lloyd's: init = embeddings of the k lowest ``id_col``
    values (seeded, reproducible), then assign/update until the WCSS stops
    improving by more than ``tol`` or ``max_iter`` is hit.  Empty clusters
    keep their previous centroid (standard Lloyd's degeneracy handling).

    Driver traffic per iteration is exactly k×d sums + k counts + one WCSS
    double — index metadata, not data.
    """
    if k < 1:
        raise ValueError(f"kmeans_fit: k={k} must be >= 1")
    # persist: every iteration scans the input; without this the caller's
    # full lineage (joins, reads) would be recomputed max_iter+1 times
    src = emb_df.persist()
    try:
        seeds = (
            src.orderBy(F.asc(id_col))
            .limit(k)
            .select(F.col("embedding").cast("array<double>").alias("e"))
            .collect()
        )
        if not seeds:
            raise ValueError("kmeans_fit: empty input")
        if len(seeds) < k:
            raise ValueError(f"kmeans_fit: k={k} but only {len(seeds)} rows")
        centroids = [list(r.e) for r in seeds]

        wcss_history: list[float] = []
        converged = False
        it = 0
        for it in range(1, max_iter + 1):
            assigned = assign_clusters(src, centroids)
            # one scan: per-(cluster, dim) partial sums AND the per-cluster
            # d2 totals ride the same exploded aggregation (grouping on dim
            # keeps state O(1); d2 is summed once per row via the dim=0 arm)
            stats = (
                assigned.select(
                    "cluster",
                    "d2",
                    F.posexplode(F.col("embedding").cast("array<double>")).alias(
                        "dim", "val"
                    ),
                )
                .groupBy("cluster", "dim")
                .agg(
                    F.sum("val").alias("s"),
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.when(F.col("dim") == 0, F.col("d2"))).alias("d2sum"),
                )
                .collect()
            )
            by_cluster: dict[int, dict[int, float]] = {}
            counts: dict[int, int] = {}
            wcss = 0.0
            for r in stats:
                by_cluster.setdefault(r.cluster, {})[r.dim] = r.s
                counts[r.cluster] = r.n
                if r.dim == 0 and r.d2sum is not None:
                    wcss += r.d2sum
            wcss_history.append(wcss)
            new_centroids = [
                [by_cluster[c][d] / counts[c] for d in range(len(centroids[0]))]
                if c in by_cluster
                else centroids[c]  # empty cluster: keep previous centroid
                for c in range(k)
            ]
            if new_centroids == centroids or (
                len(wcss_history) >= 2
                and wcss_history[-2] - wcss_history[-1] <= tol
            ):
                converged = True
                centroids = new_centroids
                break
            centroids = new_centroids
        return KMeansResult(
            centroids=centroids,
            wcss_history=wcss_history,
            iterations=it,
            converged=converged,
        )
    finally:
        src.unpersist()


# ── quantized (fixed-point) k-means: the ORACLE-GRADE fit ────────────────
#
# kmeans_fit above is deterministic per-session (seeded init, left-to-right
# folds) but its double arithmetic is not reproducible by a SQL engine that
# sums in a different order.  The quantized variant makes the WHOLE fit a
# pure function of the data in EXACT INTEGER arithmetic, so an unrolled
# DuckDB CTE chain reproduces it bit-for-bit and the learned-IVF registry
# row can be value-hash-gated like any relational query:
#
# * embeddings quantize to microunit bigints (floor(x·1e6), the same
#   resolution contract as plans/similarity.FIXED_SCALE);
# * distances are exact bigint sums of squared diffs (|diff| ≤ 1.2e7 ⇒
#   per-pair d² ≤ 64·1.44e14 ≈ 9.2e15 — inside bigint);
# * the centroid update is exact integer FLOOR division of exact sums
#   (DECIMAL(38,0) partials here ≙ HUGEINT SUM there) — commutative, so
#   Spark's partial aggregation and DuckDB's single-threaded SUM agree
#   regardless of order.  Python's `//` is exact floor at any magnitude;
#   the oracle uses mod-subtraction + integer `//` on HUGEINT
#   ((s - ((s%n)+n)%n) // n — numerator exactly divisible, so truncation
#   IS floor and no float division ever runs; a bare floor(s/n) would
#   round through double and drift past 2^53);
# * ties break to the lowest cluster index in both engines.
#
# Quantized coarse quantizers are standard IVF practice (the fine ranking
# stays exact cosine); determinism is the point, not a concession.

QUANT_SCALE = 1_000_000  # microunits per unit


def quantize_embedding(emb: Column) -> Column:
    """array<bigint> microunit form of an array<float/double> embedding."""
    return F.transform(
        emb, lambda x: F.floor(x.cast("double") * QUANT_SCALE).cast("bigint")
    )


def indexable(emb: Column, dim: int) -> Column:
    """True iff the embedding has exactly ``dim`` finite non-NULL
    components — the admission contract for every IVF index path.
    ``abs(x) < inf`` excludes NULL, NaN and ±inf in one predicate, with the
    same semantics as the oracle's ``list_filter`` mirror (see
    plans/similarity's learned-IVF eq CTE)."""
    return (
        F.size(F.filter(emb, lambda x: F.abs(x.cast("double")) < F.lit(float("inf"))))
        == dim
    )


def _centroid_matrix_fixed_expr(centroids: list[list[int]]) -> Column:
    return F.expr(
        "array("
        + ", ".join(
            "array(" + ", ".join(f"CAST({v} AS BIGINT)" for v in c) + ")"
            for c in centroids
        )
        + ")"
    )


def nearest_cluster_quantized(centroids: list[list[int]], qe: Column) -> Column:
    """int cluster id: argmin over exact-bigint squared-L2 distances, single
    fold over the centroid matrix, ties to the lowest index (strict `<`
    keeps the earliest minimum) — the integer twin of :func:`_nearest`."""
    return nearest_cluster_quantized_expr(
        _centroid_matrix_fixed_expr(centroids), qe
    )


def _nearest_fold_expr(cm: Column, qe: Column) -> Column:
    """struct(cluster, d2, i): the argmin fold with its winning distance
    exposed — multi-probe routing compares candidates ACROSS probed
    groups, so it needs the distance, not just the index."""
    init = F.struct(
        F.lit(-1).alias("cluster"),
        F.lit(2**63 - 1).cast("long").alias("d2"),
        F.lit(0).alias("i"),
    )

    def step(acc: Column, c: Column) -> Column:
        d2 = F.aggregate(
            F.zip_with(c, qe, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda s, v: s + v,
        )
        better = d2 < acc["d2"]
        return F.struct(
            F.when(better, acc["i"]).otherwise(acc["cluster"]).alias("cluster"),
            F.when(better, d2).otherwise(acc["d2"]).alias("d2"),
            (acc["i"] + 1).alias("i"),
        )

    return F.aggregate(cm, init, step)


def nearest_cluster_quantized_expr(cm: Column, qe: Column) -> Column:
    """:func:`nearest_cluster_quantized` over a centroid matrix that is
    itself a Column (array<array<bigint>>) — lets a caller select a
    per-row matrix (e.g. the PQ joint fit picks its subspace's codebook
    from one nested literal) while keeping the identical fold/tie-break
    semantics."""
    return _nearest_fold_expr(cm, qe)["cluster"]


def nearest_two_quantized_expr(cm: Column, qe: Column) -> Column:
    """struct(c1, c2): indices of the TWO nearest rows of the centroid
    matrix, one fold — the multi-probe coarse step.  Tie-breaks mirror
    the argmin fold: strict ``<`` everywhere, so equal distances keep
    the earliest index in c1 and the next in c2."""
    big = F.lit(2**63 - 1).cast("long")
    init = F.struct(
        F.lit(-1).alias("c1"),
        big.alias("d1"),
        F.lit(-1).alias("c2"),
        big.alias("d2"),
        F.lit(0).alias("i"),
    )

    def step(acc: Column, c: Column) -> Column:
        d = F.aggregate(
            F.zip_with(c, qe, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda s, v: s + v,
        )
        b1 = d < acc["d1"]
        b2 = (~b1) & (d < acc["d2"])
        return F.struct(
            F.when(b1, acc["i"]).otherwise(acc["c1"]).alias("c1"),
            F.when(b1, d).otherwise(acc["d1"]).alias("d1"),
            F.when(b1, acc["c1"])
            .otherwise(F.when(b2, acc["i"]).otherwise(acc["c2"]))
            .alias("c2"),
            F.when(b1, acc["d1"])
            .otherwise(F.when(b2, d).otherwise(acc["d2"]))
            .alias("d2"),
            (acc["i"] + 1).alias("i"),
        )

    return F.aggregate(cm, init, step)


def two_level_groups(
    centroids_fixed: list[list[int]], n_coarse: int | None = None
) -> tuple[list[list[int]], list[list[list[int]]], list[list[int]]]:
    """Deterministic two-level routing metadata from a flat k x d
    microunit centroid matrix: stride-sampled coarse representatives
    (every ceil(k/n1)-th fine centroid — no re-fit, no randomness) and
    the exact-integer argmin grouping of every fine centroid under its
    nearest representative (ties to the lowest index — the engine fold's
    tie-break).  Empty groups are dropped.  All driver-side Python-int
    arithmetic on k x d metadata.

    Returns (reps, members, ids): ``reps`` the n1 x d coarse matrix,
    ``members[g]`` the fine centroid vectors in group g, ``ids[g]`` the
    matching GLOBAL fine indices."""
    k = len(centroids_fixed)
    if n_coarse is None:
        n_coarse = max(1, math.isqrt(k))
    stride = -(-k // n_coarse)  # ceil
    reps = [centroids_fixed[i] for i in range(0, k, stride)][:n_coarse]
    groups: list[list[int]] = [[] for _ in reps]
    for idx, c in enumerate(centroids_fixed):
        best, bd = 0, None
        for gi, r in enumerate(reps):
            d2 = sum((a - b) * (a - b) for a, b in zip(c, r))
            if bd is None or d2 < bd:
                best, bd = gi, d2
        groups[best].append(idx)
    keep = [gi for gi in range(len(reps)) if groups[gi]]
    reps = [reps[gi] for gi in keep]
    ids = [groups[gi] for gi in keep]
    members = [[centroids_fixed[i] for i in g] for g in ids]
    return reps, members, ids


def nearest_cluster_two_level(
    centroids_fixed: list[list[int]],
    qe: Column,
    n_coarse: int | None = None,
    probes: int = 1,
) -> Column:
    """Two-level routing: argmin over the n1 ≈ sqrt(k) coarse
    representatives, then argmin over ONLY that group's fine members —
    O(sqrt(k)) distance folds per row instead of the flat fold's O(k)
    (the IMI/IVF-HNSW idea at its simplest).  Returns the GLOBAL fine
    cluster id.

    APPROXIMATE by design: a vector whose true nearest fine centroid
    lives in a different coarse group routes to its group-local best
    instead.  ``probes=2`` (the r11 verdict's multi-probe ask) searches
    the TWO nearest coarse groups and keeps the cross-group winner by
    (distance, global id) — 2×sqrt(k) folds, still ≪ k, recovering the
    boundary misses: a vector's true cell can only be missed now when
    BOTH its coarse-nearest and coarse-second groups exclude it.  For
    cell-partitioning uses (SemDeDup, IVF cell files) any deterministic
    assignment is a valid contract — both engines replay the same folds
    — but probe-set routing and the on-disk partition must come from
    the SAME function with the SAME probes (the ivf_append rebuild
    rule).  Determinism: same strict-< / lowest-index tie-breaks as the
    flat fold inside each group, lexicographic (d2, global id) across
    the two probed groups, and the grouping itself is driver-side exact
    integers."""
    reps, members, ids = two_level_groups(centroids_fixed, n_coarse)
    mm = F.array(*[_centroid_matrix_fixed_expr(m) for m in members])
    idm = F.array(
        *[F.array(*[F.lit(int(i)) for i in g]) for g in ids]
    )
    if probes <= 1 or len(reps) < 2:
        coarse = nearest_cluster_quantized(reps, qe)
        local = nearest_cluster_quantized_expr(
            F.element_at(mm, coarse + 1), qe
        )
        return F.element_at(F.element_at(idm, coarse + 1), local + 1)
    if probes != 2:
        raise ValueError(
            f"nearest_cluster_two_level: probes={probes} unsupported — "
            "1 (single-probe) or 2 (boundary-recovering multi-probe)"
        )
    two = nearest_two_quantized_expr(_centroid_matrix_fixed_expr(reps), qe)
    s1 = _nearest_fold_expr(F.element_at(mm, two["c1"] + 1), qe)
    s2 = _nearest_fold_expr(F.element_at(mm, two["c2"] + 1), qe)
    gid1 = F.element_at(
        F.element_at(idm, two["c1"] + 1), s1["cluster"] + 1
    )
    gid2 = F.element_at(
        F.element_at(idm, two["c2"] + 1), s2["cluster"] + 1
    )
    second_wins = (s2["d2"] < s1["d2"]) | (
        (s2["d2"] == s1["d2"]) & (gid2 < gid1)
    )
    return F.when(second_wins, gid2).otherwise(gid1)


def kmeans_fit_quantized(
    emb_df: DataFrame, k: int, iters: int, id_col: str = "vec_id"
) -> list[list[int]]:
    """Fixed-iteration Lloyd's in exact microunit-integer arithmetic.

    Init = quantized embeddings of the min(k, n) lowest ``id_col`` values;
    exactly ``iters`` assign/update rounds (NO early stop — the unrolled
    SQL oracle runs the same fixed count); empty clusters keep their
    previous centroid.  Returns the final k×d centroid matrix in microunits
    — index metadata, a few KB of driver traffic per iteration, same as
    :func:`kmeans_fit`.  Two engines running this on the same data produce
    IDENTICAL integers (see the module-section comment for why)."""
    if k < 1:
        raise ValueError(f"kmeans_fit_quantized: k={k} must be >= 1")
    # Quantize ONCE and persist: every Lloyd's round scans this frame, so
    # without the persist each of the iters+1 jobs would re-read the source
    # and redo the quantization (MLlib's KMeans caches its norm-augmented
    # input for the same reason).
    qdf = emb_df.select(
        F.col(id_col).alias("_id"), quantize_embedding(F.col("embedding")).alias("qe")
    ).persist()
    try:
        seeds = qdf.orderBy(F.asc("_id")).limit(k).select("qe").collect()
        if not seeds:
            raise ValueError("kmeans_fit_quantized: empty input")
        centroids: list[list[int]] = [[int(v) for v in r.qe] for r in seeds]
        dim = len(centroids[0])
        for _ in range(iters):
            assigned = qdf.select(
                nearest_cluster_quantized(centroids, F.col("qe")).alias("cluster"),
                "qe",
            )
            # DECIMAL(38,0) partial sums: exact to ~1e38 like the oracle's
            # HUGEINT SUM — a plain bigint sum would wrap silently past
            # ~1.5e12 vectors per cluster while DuckDB kept going exactly
            stats = (
                assigned.select("cluster", F.posexplode("qe").alias("dim", "val"))
                .groupBy("cluster", "dim")
                .agg(
                    F.sum(F.col("val").cast("decimal(38,0)")).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )
            sums: dict[int, dict[int, int]] = {}
            counts: dict[int, int] = {}
            for r in stats:
                sums.setdefault(r.cluster, {})[r.dim] = int(r.s)
                counts[r.cluster] = r.n
            centroids = [
                [sums[c][d] // counts[c] for d in range(dim)]  # Python // floors
                if c in sums
                else centroids[c]
                for c in range(len(centroids))
            ]
        return centroids
    finally:
        qdf.unpersist()


def route_query(
    centroids: list[list[float]], query: list[float], nprobe: int
) -> list[int]:
    """Driver-side probe routing (centroids are index metadata): the nprobe
    cluster ids nearest the query, lowest-distance first, index tie-break."""
    scored = sorted(
        (sum((c - q) ** 2 for c, q in zip(cent, query)), i)
        for i, cent in enumerate(centroids)
    )
    return [i for _, i in scored[:nprobe]]


def ivf_search_batch(
    index_df: DataFrame,
    centroids: list[list[float]],
    queries: list[list[float]],
    nprobe: int,
    k: int = 10,
    id_col: str = "vec_id",
    route_queries: list[list[float]] | None = None,
) -> DataFrame:
    """Serve a BATCH of queries from ONE scan of a persisted IVF index —
    the real ANN serving shape (amortizes the index scan the way
    emb_multi_query_topk amortizes the brute-force scan).

    Per-query probe sets are routed driver-side from the k×d centroid
    metadata; the index scan filters to the UNION of probed cells (still a
    partition-pruned IN-filter on the ``cluster`` partition column), and a
    broadcast (query_id, cluster) probe table fans each scanned vector out
    to exactly the queries that probed its cell — a vector never scores
    against a query whose probe set excludes it, so each per-query result
    equals its single-query :func:`ivf_search`.  Top-k per query is
    two-phase (partition-local row_number caps k rows per partition per
    query before the final per-query rank) — never N·Q rows into Q
    reducers.  Returns (query_id, id_col, cluster, cos, rnk).

    ``route_queries``: probe-routing twins of ``queries`` expressed in the
    CENTROID space — standard IVF practice when the coarse quantizer lives
    in a quantized domain (the registry's learned index stores microunit-
    integer centroids, so routing compares microunit queries while the fine
    ranking scores the exact float originals).  Defaults to ``queries``
    when both spaces coincide."""
    from pyspark.sql import Window

    if not queries:
        raise ValueError("ivf_search_batch: empty query batch")
    rq = route_queries if route_queries is not None else queries
    if len(rq) != len(queries):
        raise ValueError(
            f"ivf_search_batch: {len(rq)} route_queries for {len(queries)} queries"
        )
    spark = index_df.sparkSession
    probe_pairs = [
        (qi, c)
        for qi, q in enumerate(rq)
        for c in route_query(centroids, q, nprobe)
    ]
    union_clusters = sorted({c for _, c in probe_pairs})
    probes = spark.createDataFrame(probe_pairs, "query_id int, cluster int")
    qmatrix = F.expr(
        "array("
        + ", ".join(
            "array(" + ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in q) + ")"
            for q in queries
        )
        + ")"
    )
    qnorms = F.array(
        *[
            F.lit(math.sqrt(sum(float(x) * float(x) for x in q)))
            for q in queries
        ]
    )
    qv = F.element_at(qmatrix, F.col("query_id") + 1)
    # functions.similarity.dot: the ONE fold definition every cosine in the
    # engine shares (bit-identical ordering is a correctness contract)
    dot_q = dot(F.col("embedding"), qv)
    nrm = F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    scored = (
        index_df.filter(F.col("cluster").isin(union_clusters))  # partition prune
        .join(F.broadcast(probes), "cluster")  # fan out to probing queries only
        .select(
            "query_id",
            id_col,
            "cluster",
            F.try_divide(
                dot_q, nrm * F.element_at(qnorms, F.col("query_id") + 1)
            ).alias("cos"),
        )
        .filter(F.col("cos").isNotNull())
    )
    # duplicate-proof two-phase top-k (r9): ivf_append replay can leave
    # identical (id, embedding) rows — dense_rank lets same-partition
    # copies share one local rank (no genuine candidate displaced), and
    # the id dedup runs on the <= n_partitions*k local winners only
    staged = scored.withColumn("pid", F.spark_partition_id())
    w_local = Window.partitionBy("pid", "query_id").orderBy(
        F.desc("cos"), F.asc(id_col)
    )
    local = (
        staged.withColumn("rn", F.dense_rank().over(w_local))
        .filter(F.col("rn") <= k)
        .drop("pid", "rn")
    )
    deduped = local.dropDuplicates(["query_id", id_col])
    w_global = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return deduped.withColumn("rnk", F.row_number().over(w_global)).filter(
        F.col("rnk") <= k
    )


def ivf_append(
    batch_df: DataFrame,
    centroids_fixed: list[list[int]],
    path: str,
    id_col: str = "vec_id",
) -> None:
    """Incremental IVF ingest: assign a micro-batch against FROZEN
    microunit centroids and APPEND it to a persisted partitionBy(cluster)
    index — the ``foreachBatch`` body that keeps a served index growing
    without a rebuild (build once with plans/similarity.learned_ivf_index
    or an explicit fit+write, then stream new vectors in).

    Assignment is the same quantized argmin the index build uses, so an
    appended row lands in EXACTLY the cell a full rebuild with the same
    centroids would put it in (test-pinned: batch-by-batch appends ≡ one
    all-at-once write, row for row).  Rows violating the indexable
    contract are dropped, matching the build path.  The batch repartitions
    on cluster before writing — appends add files-per-touched-cell, not
    files-per-task-per-cell.  Re-fitting centroids on drifted data is a
    REBUILD (new path), never an in-place mutation: probe routing and the
    on-disk partition must never disagree."""
    dim = len(centroids_fixed[0])
    assigned = batch_df.filter(indexable(F.col("embedding"), dim)).select(
        id_col,
        "embedding",
        nearest_cluster_quantized(
            centroids_fixed, quantize_embedding(F.col("embedding"))
        ).alias("cluster"),
    )
    assigned.repartition("cluster").write.mode("append").partitionBy(
        "cluster"
    ).parquet(path)


def ivf_compact(spark, src_path: str, dst_path: str) -> None:
    """Compact a streamed-into IVF index: every ``ivf_append`` adds
    files-per-touched-cell, so a long-lived streaming ingest accumulates
    small files and the probe scan's task count grows with append count,
    not data size.  Compaction rewrites the index with one shuffle on the
    cluster partition column (files-per-cell collapses back to the
    shuffle partitions holding that cell) into a NEW path — swap by
    rename/repoint, never in place, so a concurrent reader always sees a
    complete index.  Contents are preserved row-for-row (test-pinned)."""
    idx = spark.read.parquet(src_path)
    idx.repartition("cluster").write.mode("errorifexists").partitionBy(
        "cluster"
    ).parquet(dst_path)


def ivf_search(
    index_df: DataFrame,
    centroids: list[list[float]],
    query: list[float],
    nprobe: int,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Serve a query from a k-means IVF index: ``index_df`` is the
    pre-assigned corpus (``assign_clusters`` output, persisted as the index
    at build time), the probe set is routed on the driver from the k×d
    centroid metadata, and exact cosine top-k runs ONLY over the probed
    cells — an IN-filter the scanner can push down, nprobe/nlist of the
    corpus, no shuffle, one top-k reduce."""
    probes = route_query(centroids, query, nprobe)
    qcol = F.array(*[F.lit(float(x)) for x in query])
    dot_q = dot(F.col("embedding"), qcol)
    nrm = F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    qnrm = math.sqrt(sum(float(x) * float(x) for x in query))
    return (
        index_df.filter(F.col("cluster").isin(probes))
        .select(
            id_col,
            "cluster",
            F.try_divide(dot_q, nrm * F.lit(qnrm)).alias("cos"),
        )
        .filter(F.col("cos").isNotNull())
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )
