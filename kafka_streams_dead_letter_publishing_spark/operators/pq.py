"""Product quantization ([EXT] similarity-search surface): the FAISS-style
fine quantizer (Jégou et al. 2011, "Product Quantization for Nearest
Neighbor Search") that makes billion-vector serving memory-feasible —
each d-dim embedding is stored as m small codes (one k-means codebook per
d/m-dim subspace), and queries score candidates with asymmetric distance
computation (ADC): per-query lookup tables of exact subspace distances,
summed by code index, never touching the original vectors.

Why this matters at 100 TB: the corpus embeddings are ~d·4 bytes/vector;
PQ codes are m·log2(k) bits (the registry row: 16 codes of 4 bits, ~32×
smaller).  A re-ranking pass over PQ candidates against original vectors
(IVF-PQ's usual tail) is the registry row's second stage / the existing
:func:`operators.kmeans.ivf_search_batch` path — this module supplies the
memory-bounded candidate scorer.

Exactness contract (same discipline as the learned IVF family): the
sub-quantizers run microunit-integer Lloyd's — per-subspace math
identical to :func:`operators.kmeans.kmeans_fit_quantized` on the slice,
bit-for-bit reproducible — and ADC tables are exact BIGINT squared-L2
distances in the same microunit space, so the DuckDB oracle replays fit,
encoding, and serving identically (``emb_pq_batch_topk``).

Scale posture: fits see only the deterministic training sample (k×d
metadata to the driver per round); encoding is a per-row narrow fold over
a broadcast-literal codebook (no shuffle, no UDF); serving is one scan of
the codes table with a Q-row broadcast of precomputed tables (m·k BIGINTs
per query — driver math on metadata) and the same two-phase per-query
top-k as the IVF path (never N·Q rows into Q reducers).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
    QUANT_SCALE,
    nearest_cluster_quantized,
    nearest_cluster_quantized_expr,
    quantize_embedding,
)

Codebooks = list[list[list[int]]]  # m × k × (dim/m) microunit centroids


def l2_normalize(
    df: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """Unit-normalize embeddings (zero-norm rows dropped — they have no
    direction to quantize, and Spark's ANSI double division would raise on
    them).  REQUIRED before PQ when the serving metric is cosine: on unit
    vectors ``||a-b||² = 2 - 2·cos(a,b)``, so ADC's squared-L2 ranking IS
    the cosine ranking; on raw vectors the two orderings disagree
    (measured: recall@10 collapsed to ~0.1 unnormalized).

    Exactness: the norm is the engine's ONE dot fold (fixed left-to-right
    association) and sqrt/division are IEEE correctly-rounded, so both
    engines produce bit-identical normalized doubles — the oracle replays
    this stage too.  The norm is staged as a real column so the per-element
    division doesn't re-run the fold dim times (no CSE inside transform)."""
    from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
        dot,
    )

    staged = df.withColumn(
        "_nrm", F.sqrt(dot(F.col(emb_col), F.col(emb_col)))
    ).filter(F.col("_nrm") > 0)
    return staged.select(
        F.col(id_col),
        F.transform(
            F.col(emb_col), lambda x: x.cast("double") / F.col("_nrm")
        ).alias(emb_col),
    )


def pq_fit(
    emb_df: DataFrame,
    dim: int,
    m: int,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    sample_mod: int = 4,
) -> Codebooks:
    """One quantized k-means codebook per subspace, trained on the
    deterministic ``id % sample_mod == 0`` sample (FAISS-style sampled
    training).  Slicing commutes with quantization (both elementwise), so
    fitting on sliced floats equals fitting on sliced microunits.

    JOINT fit: all m sub-quantizers iterate together over one exploded
    (subspace, sub-vector) frame — ONE assignment scan + ONE
    (subspace, cluster, dim) aggregation per Lloyd's round, instead of m
    independent fits each scanning the sample per round (measured 25.6 s
    → one-pass-per-round cold build at m=16).  Per-subspace math is
    IDENTICAL to running :func:`kmeans_fit_quantized` on the slice: same
    lowest-id seeds (the k lowest sample ids, sliced — every subspace
    seeds from the same rows), same strict-< earliest-index argmin, same
    exact floor-div centroid update, empty clusters keep their previous
    centroid.  The per-round driver traffic is the m×k×(dim/m) = k×dim
    stats matrix — metadata, not data."""
    if m < 1 or dim % m:
        raise ValueError(f"pq_fit: dim={dim} must split into m={m} subspaces")
    sub = dim // m
    sample = emb_df.filter((F.col(id_col) % sample_mod) == 0)
    qdf = sample.select(
        F.col(id_col).alias("_id"),
        quantize_embedding(F.col("embedding")).alias("_qe"),
    ).persist()
    try:
        seeds = qdf.orderBy(F.asc("_id")).limit(k).select("_qe").collect()
        if not seeds:
            raise ValueError("pq_fit: empty input")
        books: Codebooks = [
            [[int(v) for v in r._qe[j * sub : (j + 1) * sub]] for r in seeds]
            for j in range(m)
        ]
        exploded = qdf.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("sub"),
                            F.slice(F.col("_qe"), j * sub + 1, sub).alias("qe"),
                        )
                        for j in range(m)
                    ]
                )
            ).alias("s")
        ).select("s.sub", "s.qe")
        for _ in range(iters):
            cm_all = F.expr(
                "array("
                + ", ".join(
                    "array("
                    + ", ".join(
                        "array(" + ", ".join(f"CAST({v} AS BIGINT)" for v in c) + ")"
                        for c in book
                    )
                    + ")"
                    for book in books
                )
                + ")"
            )
            assigned = exploded.select(
                "sub",
                "qe",
                nearest_cluster_quantized_expr(
                    F.element_at(cm_all, F.col("sub") + 1), F.col("qe")
                ).alias("cluster"),
            )
            stats = (
                assigned.select("sub", "cluster", F.posexplode("qe").alias("dim", "val"))
                .groupBy("sub", "cluster", "dim")
                .agg(
                    F.sum(F.col("val").cast("decimal(38,0)")).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )
            sums: dict[tuple[int, int], dict[int, int]] = {}
            counts: dict[tuple[int, int], int] = {}
            for r in stats:
                sums.setdefault((r.sub, r.cluster), {})[r.dim] = int(r.s)
                counts[(r.sub, r.cluster)] = r.n
            books = [
                [
                    [
                        sums[(j, c)][d] // counts[(j, c)]
                        for d in range(sub)
                    ]
                    if (j, c) in counts
                    else books[j][c]  # empty cluster keeps its centroid
                    for c in range(len(books[j]))
                ]
                for j in range(m)
            ]
        return books
    finally:
        qdf.unpersist()


def pq_encode(
    emb_df: DataFrame,
    codebooks: Codebooks,
    dim: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id_col, codes array<int>): each vector's nearest sub-centroid per
    subspace — m argmin folds over broadcast-literal codebooks, per-row
    narrow work."""
    m = len(codebooks)
    sub = dim // m
    staged = emb_df.select(
        F.col(id_col), quantize_embedding(F.col("embedding")).alias("_qe")
    )
    codes = F.array(
        *[
            nearest_cluster_quantized(
                codebooks[j], F.slice(F.col("_qe"), j * sub + 1, sub)
            )
            for j in range(m)
        ]
    )
    return staged.select(F.col(id_col), codes.alias("codes"))


def adc_table(codebooks: Codebooks, q_micro: list[int]) -> list[list[int]]:
    """Per-subspace exact squared-L2 distance tables (m × k BIGINTs) from
    a microunit query to every sub-centroid — the driver-side metadata ADC
    serving broadcasts."""
    m = len(codebooks)
    sub = len(q_micro) // m
    return [
        [
            sum(
                (c[i] - q_micro[j * sub + i]) ** 2 for i in range(sub)
            )
            for c in book
        ]
        for j, book in enumerate(codebooks)
    ]


def _query_tables_df(spark, codebooks: Codebooks, queries: list[list[float]]):
    """(query_id, tables) broadcast side: per-query ADC distance tables
    computed driver-side from quantized queries (m·k BIGINTs each)."""
    if not queries:
        raise ValueError("ADC search: empty query batch")
    qm = [[math.floor(float(x) * QUANT_SCALE) for x in q] for q in queries]
    return spark.createDataFrame(
        [(qi, adc_table(codebooks, q)) for qi, q in enumerate(qm)],
        "query_id int, tables array<array<bigint>>",
    )


def _adc_sum(m: int) -> F.Column:
    """Approximate squared distance: sum of per-subspace table lookups by
    code index — the ONE definition both serving paths share."""
    ad2 = None
    for j in range(m):
        term = F.element_at(
            F.element_at(F.col("tables"), j + 1),
            F.element_at(F.col("codes"), j + 1) + 1,
        )
        ad2 = term if ad2 is None else ad2 + term
    return ad2.cast("long")


def _two_phase_topk(scored: DataFrame, k_top: int, id_col: str) -> DataFrame:
    """Per-query ascending-ad2 top-k: a partition-local rank caps k keys
    per (partition, query) before the final per-query rank — never the
    full scored set into Q reducers (the ivf_search_batch shape).

    Duplicate-proof (r9, the at-least-once contract): ``pq_append`` /
    ``ivf_append`` replay after a crash can leave IDENTICAL (id, codes)
    rows in the store, so serving must dedup on id.  The local cut uses
    ``dense_rank`` — identical (ad2, id) copies share one rank, so a
    same-partition replay duplicate cannot displace the k-th genuine
    candidate — and the explicit ``dropDuplicates([query_id, id])`` runs
    on the <= n_partitions*k local winners only, never a full-table
    shuffle."""
    staged = scored.withColumn("pid", F.spark_partition_id())
    w_local = Window.partitionBy("pid", "query_id").orderBy(
        F.asc("ad2"), F.asc(id_col)
    )
    local = (
        staged.withColumn("rn", F.dense_rank().over(w_local))
        .filter(F.col("rn") <= k_top)
        .drop("pid", "rn")
    )
    deduped = local.dropDuplicates(["query_id", id_col])
    w_global = Window.partitionBy("query_id").orderBy(F.asc("ad2"), F.asc(id_col))
    return deduped.withColumn("rnk", F.row_number().over(w_global)).filter(
        F.col("rnk") <= k_top
    )


def pq_search_batch(
    codes_df: DataFrame,
    codebooks: Codebooks,
    queries: list[list[float]],
    k_top: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k for a query batch over the codes table: one scan, a
    Q-row broadcast of precomputed distance tables, approximate distance =
    sum of table lookups by code, two-phase per-query top-k.  Returns
    (query_id, id_col, ad2, rnk) — ad2 ascending (smaller = closer)."""
    qt = _query_tables_df(codes_df.sparkSession, codebooks, queries)
    scored = codes_df.crossJoin(F.broadcast(qt)).select(
        "query_id", id_col, _adc_sum(len(codebooks)).alias("ad2")
    )
    return _two_phase_topk(scored, k_top, id_col)


def ivfpq_search_batch(
    codes_df: DataFrame,
    codebooks: Codebooks,
    coarse_centroids: list[list[int]],
    queries: list[list[float]],
    nprobe: int,
    k_top: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """The full FAISS IVF-PQ serving shape: route each query to its
    ``nprobe`` nearest coarse cells driver-side (k×d centroid metadata),
    prune the codes scan to the UNION of probed cells (``codes_df`` must
    carry the coarse ``cluster`` column — written partitionBy(cluster),
    so the filter is partition pruning), fan each code row out to exactly
    the queries that probed its cell via a broadcast (query_id, cluster)
    table, ADC-score with the broadcast distance tables, and take the
    two-phase per-query top-k shortlist.  Returns (query_id, id_col, ad2,
    rnk) — feed to an exact re-rank for final results."""
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        route_query,
    )

    if not queries:
        raise ValueError("ivfpq_search_batch: empty query batch")
    spark = codes_df.sparkSession
    qm = [[math.floor(float(x) * QUANT_SCALE) for x in q] for q in queries]
    probe_pairs = [
        (qi, c)
        for qi, q in enumerate(qm)
        for c in route_query(coarse_centroids, q, nprobe)
    ]
    union_clusters = sorted({c for _, c in probe_pairs})
    probes = spark.createDataFrame(probe_pairs, "query_id int, cluster int")
    qt = _query_tables_df(spark, codebooks, queries)
    scored = (
        codes_df.filter(F.col("cluster").isin(union_clusters))  # partition prune
        .join(F.broadcast(probes), "cluster")
        .join(F.broadcast(qt), "query_id")
        .select("query_id", id_col, _adc_sum(len(codebooks)).alias("ad2"))
    )
    return _two_phase_topk(scored, k_top, id_col)


def pq_append(
    batch_df: DataFrame,
    codebooks: Codebooks,
    coarse_centroids: list[list[int]],
    path: str,
    id_col: str = "vec_id",
) -> None:
    """Incremental IVF-PQ ingest: encode a micro-batch against FROZEN
    codebooks, assign its coarse cell against FROZEN centroids, and APPEND
    (id, codes, cluster) to a persisted partitionBy(cluster) codes table —
    the `operators.kmeans.ivf_append` twin for the memory-bounded serving
    tier, so a streaming ingest keeps a servable IVF-PQ index growing
    without a rebuild.

    Same frozen-parameter contract as ivf_append: an appended row gets
    EXACTLY the codes and cell a one-shot encode with the same books and
    centroids would give it (test-pinned), and re-fitting on drifted data
    is a rebuild into a NEW path.  Normalization is applied here (the
    books live in unit space); zero-norm and non-indexable rows drop,
    matching the build path."""
    m = len(codebooks)
    dim = m * len(codebooks[0][0])
    norm = l2_normalize(
        batch_df.filter(
            F.size(
                F.filter(
                    F.col("embedding"),
                    lambda x: F.abs(x.cast("double")) < F.lit(float("inf")),
                )
            )
            == dim
        ),
        id_col=id_col,
    )
    codes = pq_encode(norm, codebooks, dim, id_col=id_col)
    assigned = codes.join(
        norm.select(
            F.col(id_col),
            nearest_cluster_quantized(
                coarse_centroids, quantize_embedding(F.col("embedding"))
            ).alias("cluster"),
        ),
        id_col,
    )
    assigned.repartition("cluster").write.mode("append").partitionBy(
        "cluster"
    ).parquet(path)


def pq_compact(spark, src_path: str, dst_path: str) -> None:
    """Compact a streamed-into PQ codes table: every ``pq_append`` adds
    files-per-touched-cell per micro-batch — the same small-files
    pathology ``operators.kmeans.ivf_compact`` fixes for the float IVF
    index.  The codes table carries the same ``cluster`` partition
    column, and ``ivf_compact`` is schema-agnostic (one shuffle on the
    partition column into a NEW path, row-for-row preserved), so
    compaction IS ``ivf_compact`` — this alias exists to make that
    contract explicit and test-pinned (a compacted codes table serves
    identically via ``ivfpq_search_batch``).  Swap by repoint, never in
    place."""
    from kafka_streams_dead_letter_publishing_spark.operators.kmeans import (
        ivf_compact,
    )

    ivf_compact(spark, src_path, dst_path)
