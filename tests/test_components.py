"""Connected-components operator tests + the embedding-cosine near-dup
composition — the last of the dedup families (exact, MinHash/Jaccard,
SimHash, embedding-cosine) to get an end-to-end pinned pipeline:
ANN candidate pairs → cosine threshold → connected components → keeper.
"""

from __future__ import annotations

import duckdb
import numpy as np
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.operators.components import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    rows = connected_components(df).collect()
    return {r.node: r.component for r in rows}


def test_chain_collapses_to_one_component(spark):
    # (1,2),(2,3),(3,4): diameter 3 — more rounds than the planted-dup case
    assert _cc(spark, [(1, 2), (2, 3), (3, 4)]) == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components_keep_distinct_minima(spark):
    got = _cc(spark, [(5, 9), (9, 7), (20, 30)])
    assert got == {5: 5, 7: 5, 9: 5, 20: 20, 30: 20}


def test_long_path_converges_within_cap(spark):
    # path 0-1-2-...-7: diameter 7 — several doubling rounds, early exit
    pairs = [(i, i + 1) for i in range(7)]
    got = _cc(spark, pairs)
    assert got == {i: 0 for i in range(8)}


def test_adversarial_deep_chain_converges_or_raises_never_wrong(spark):
    """r4 verdict #1: a 600-edge chain (diameter 600 > 2^8) must either
    converge to the single true component under the default cap or raise —
    connected_components may NEVER return unconverged labels silently."""
    pairs = [(i, i + 1) for i in range(600)]
    got = _cc(spark, pairs)  # raises RuntimeError if the cap were too low
    assert got == {i: 0 for i in range(601)}


def test_cap_exhaustion_raises_instead_of_wrong_labels(spark):
    """With max_iters forced below what the chain needs, the operator must
    raise rather than hand back multiple cluster ids for one component."""
    import pytest

    df = spark.createDataFrame([(i, i + 1) for i in range(600)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="no label fixpoint"):
        connected_components(df, max_iters=3)


def test_empty_pairs_yield_empty_components(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(df).count() == 0


def test_cluster_keepers_dedup_the_corpus(spark):
    """The actual DEDUP action a user performs with the cluster table:
    anti-join the corpus against non-keeper cluster members.  Exactly one
    doc (the keeper = component min) survives per cluster, and docs in no
    cluster pass through untouched."""
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES
    from kafka_streams_dead_letter_publishing_spark.plans.text import _corpus_neardup

    sf = "/root/testdata/sf0.001"
    corpus = _corpus_neardup(spark, sf)
    clusters = QUERIES["docs_neardup_clusters"].spark(spark, sf)
    non_keepers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    survivors = corpus.join(non_keepers, "doc_id", "left_anti")

    n_corpus = corpus.count()
    n_non_keepers = non_keepers.count()
    assert n_non_keepers > 0, "fixture regression: no planted near-dups"
    assert survivors.count() == n_corpus - n_non_keepers
    # each cluster keeps exactly its minimum member
    rows = clusters.collect()
    keepers_per_cluster: dict[int, list[int]] = {}
    for r in rows:
        keepers_per_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    surviving_ids = {r.doc_id for r in survivors.select("doc_id").collect()}
    for cid, members in keepers_per_cluster.items():
        assert min(members) == cid
        assert set(members) & surviving_ids == {cid}


def test_embedding_cosine_neardup_dedup_end_to_end(spark):
    """The embedding-cosine near-dup family: multi-table LSH candidates →
    exact-cosine threshold → connected components → min-vec_id keeper.
    The numpy oracle recomputes the SAME semantics (same plane pool, same
    threshold, union-find closure) over all pairs, so the engine's
    clusters must match EXACTLY; a separate assertion pins the capture
    rate of above-threshold pairs (the OR-amplified recall — 97 of 144 at
    sf0.1/0.45, consistent with the 0.6 recall floor)."""
    threshold = 0.45
    sf = "/root/testdata/sf0.1"

    # engine path: reuse the registered ANN candidate machinery
    from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
        HYPERPLANES,
        N_TABLES,
        PLANES_PER_TABLE,
        dot,
        lsh_table_keys,
    )
    from kafka_streams_dead_letter_publishing_spark.sources.tables import fan_out, load_table

    emb = load_table(spark, sf, "embeddings")
    keys = fan_out(emb, "vec_id").select(
        "vec_id", F.explode(lsh_table_keys(F.col("embedding"))).alias("bk")
    )
    a, b = keys.alias("a"), keys.alias("b")
    cands = (
        a.join(b, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    base = emb.select(
        "vec_id", "embedding", F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("nrm")
    )
    x = base.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("e_a"), F.col("nrm").alias("n_a"))
    y = base.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("e_b"), F.col("nrm").alias("n_b"))
    dup_pairs = (
        cands.join(x, "vec_a")
        .join(y, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            (dot(F.col("e_a"), F.col("e_b")) / (F.col("n_a") * F.col("n_b"))).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    comp = connected_components(dup_pairs, "vec_a", "vec_b")
    got = {r.node: r.component for r in comp.collect()}

    # numpy oracle: SAME plane pool, SAME collision predicate, SAME
    # threshold — union-find gives the exact expected clusters
    raw = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf}/embeddings.parquet'"
    ).fetchnumpy()
    ids = list(map(int, raw["vec_id"]))
    m = np.array([np.asarray(e, dtype=np.float64) for e in raw["embedding"]])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = mn @ mn.T
    signs = (m @ np.array(HYPERPLANES[: N_TABLES * PLANES_PER_TABLE]).T) >= 0
    tabs = [signs[:, t * PLANES_PER_TABLE : (t + 1) * PLANES_PER_TABLE] for t in range(N_TABLES)]
    iu = np.triu_indices(len(ids), k=1)
    above = [(i, j) for i, j in zip(*iu) if cos[i, j] >= threshold]
    caught = [
        (ids[i], ids[j]) for i, j in above if any((t[i] == t[j]).all() for t in tabs)
    ]
    assert above, "fixture regression: no above-threshold pair at sf0.1"
    assert len(caught) >= 0.6 * len(above), (len(caught), len(above))

    parent: dict[int, int] = {}

    def find(v: int) -> int:
        parent.setdefault(v, v)
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for u, v in caught:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    expected = {v: find(v) for v in parent}

    assert got == expected
