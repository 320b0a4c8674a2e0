"""SCALE.md probe: production semantic decontamination (r11 verdict #6).

Measures the LSH-bucketed ``semantic_decontaminate`` composition against
exact-cosine ground truth on planted BOUNDARY paraphrases — the honest
regime: planted eps-twins sit at cos ≈ 1 where any depth catches them, so
the probe plants leaks just above the threshold (cos ~ 0.86–0.92 at
tau = 0.85), where the OR-amplified recall bound actually binds.

Per corpus size N: corpus = N random unit vectors ∪ verbatim copies of
half the eval set ∪ boundary paraphrases of the other half; eval set
fixed at 40 vectors.  Reports measured recall on the planted leaks, the
theoretical bound at the chosen (L, b), and the candidate-pair budget
(the verify workload — linear in N at fixed eval size is the design
claim).

Usage: python tools/probe_semantic_decontam.py [factors...]  (default 1 4 16)
"""

from __future__ import annotations

import json
import math
import pathlib
import random
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

DIM = 64
N_EVAL = 40
BASE_N = 4000
TAU = 0.85


def _unit(rng, d=DIM):
    v = [rng.gauss(0, 1) for _ in range(d)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _paraphrase(rng, v, target_cos):
    """normalize(a*v + b*u), u ⟂-ish random — lands within ~0.02 of
    target_cos for unit v."""
    u = _unit(rng)
    d = sum(a * b for a, b in zip(v, u))
    u = [b - d * a for a, b in zip(v, u)]  # orthogonalize
    un = math.sqrt(sum(x * x for x in u))
    u = [x / un for x in u]
    s = math.sqrt(1 - target_cos * target_cos)
    w = [target_cos * a + s * b for a, b in zip(v, u)]
    return w


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    from pyspark.sql import SparkSession, functions as F

    from kafka_streams_dead_letter_publishing_spark.functions.similarity import (
        dot,
        lsh_config_for,
    )
    from kafka_streams_dead_letter_publishing_spark.operators.ann_filter import (
        ann_candidates,
        build_ann_index,
        lsh_recall_bound,
        semantic_decontaminate,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    rng = random.Random(17)
    ev = [(i, _unit(rng)) for i in range(N_EVAL)]
    eval_df = spark.createDataFrame(
        ev, "vec_id long, embedding array<double>"
    )

    for f in factors:
        n = BASE_N * f
        corpus = [(10_000 + i, _unit(rng)) for i in range(n)]
        leaks = []
        for i, (eid, v) in enumerate(ev):
            lid = 1_000_000 + eid
            if i % 2 == 0:
                leaks.append((lid, list(v)))  # verbatim
            else:
                leaks.append(
                    (lid, _paraphrase(rng, v, rng.uniform(0.86, 0.92)))
                )
        df = spark.createDataFrame(
            corpus + leaks, "vec_id long, embedding array<double>"
        )

        # exact ground truth on the planted rows (cross join is
        # eval-sized, fine at probe scale)
        truth = {
            r.vec_id
            for r in df.filter(F.col("vec_id") >= 1_000_000)
            .crossJoin(
                eval_df.select(
                    F.col("embedding").alias("ev_emb")
                )
            )
            .select(
                "vec_id",
                F.try_divide(
                    dot(F.col("embedding"), F.col("ev_emb")),
                    F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                    * F.sqrt(dot(F.col("ev_emb"), F.col("ev_emb"))),
                ).alias("cos"),
            )
            .filter(F.col("cos") >= TAU)
            .select("vec_id")
            .distinct()
            .collect()
        }

        n_tables, planes = lsh_config_for(N_EVAL, threshold=TAU, recall=0.95)
        kept = semantic_decontaminate(
            df, eval_df, N_EVAL, min_cos=TAU, min_recall=0.95
        )
        kept_ids = {r.vec_id for r in kept.select("vec_id").collect()}
        caught = {v for v in truth if v not in kept_ids}
        idx = build_ann_index(
            eval_df, n_tables=n_tables, planes_per_table=planes
        )
        n_cands = ann_candidates(df, idx).count()
        print(
            json.dumps(
                {
                    "op": "semantic_decontam",
                    "n_corpus": n + len(leaks),
                    "n_eval": N_EVAL,
                    "tau": TAU,
                    "tables": n_tables,
                    "planes": planes,
                    "bound": round(lsh_recall_bound(TAU, n_tables, planes), 4),
                    "true_leaks": len(truth),
                    "caught": len(caught),
                    "recall": round(len(caught) / max(len(truth), 1), 4),
                    "candidates": n_cands,
                    "cands_per_vector": round(n_cands / (n + len(leaks)), 3),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
