"""PCA projected-space recall study on the PLANTED low-rank synth table
(r13, r12 verdict #7): the variance-explained gate and the deflation
recall claim, demonstrated on engine-generated data instead of a
driver-local numpy corpus.

For each corpus (the anisotropic ``synth_embeddings_lowrank`` table and,
as the contrast/NO-GO case, the isotropic ``synth_embeddings`` table):

1. one covariance pass (``second_moments`` → ``scaled_covariance`` —
   the d² metadata the engine computes anyway),
2. variance explained at r from the covariance eigenvalues (the GATE),
3. top-r directions via the ORACLE-REPLAYABLE exact-integer route
   (``power_directions`` — the emb_pca_deflated_neighbors path), and
   LAPACK (``numpy.eigh``) as the non-replayable reference,
4. recall@10: brute-force cosine top-10 in the r-dim projected space vs
   the full d=64 space, 20 deterministic probes.

Run: ``python tools/probe_pca_recall.py [N]`` (default 2000).  Prints a
markdown table for SCALE.md.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _recall(x_full: np.ndarray, x_low: np.ndarray, probes: list[int], k: int = 10) -> float:
    def topk(m, qid):
        q = m[qid]
        nq = np.linalg.norm(q)
        nv = np.linalg.norm(m, axis=1)
        s = (m @ q) / np.where(nq * nv > 0, nq * nv, 1.0)
        s[qid] = -2
        order = np.lexsort((np.arange(len(s)), -s))
        return set(order[:k].tolist())

    hits = [len(topk(x_full, q) & topk(x_low, q)) / k for q in probes]
    return float(np.mean(hits))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from kafka_streams_dead_letter_publishing_spark.operators.pca import (
        power_directions,
        scaled_covariance,
        second_moments,
    )
    from kafka_streams_dead_letter_publishing_spark.sources.synth import (
        synth_embeddings,
        synth_embeddings_lowrank,
    )

    d = 64
    probes = [7 * i + 3 for i in range(20)]  # deterministic spread
    print(f"| corpus (N={n}) | r | var explained | recall (integer basis) | recall (LAPACK) |")
    print("|---|---|---|---|---|")
    for name, df in (
        ("lowrank (planted)", synth_embeddings_lowrank(spark, n)),
        ("isotropic (contrast)", synth_embeddings(spark, n, planted_every=10**9)),
    ):
        rows = df.orderBy("vec_id").collect()
        x = np.array([r.embedding for r in rows], dtype=np.float64)
        cov_rows = scaled_covariance(second_moments(df)).collect()
        cov = np.zeros((d, d))
        for r_ in cov_rows:
            cov[r_.i, r_.j] = cov[r_.j, r_.i] = float(r_.cov_scaled)
        vals, vecs = np.linalg.eigh(cov)
        order = np.argsort(vals)[::-1]
        vals, vecs = vals[order], vecs[:, order]
        for r in (3, 8, 16):
            var = vals[:r].sum() / vals.sum()
            dirs = np.array(power_directions(cov_rows, r), dtype=np.float64)
            x_int = x @ dirs.T
            x_lap = x @ vecs[:, :r]
            rec_i = _recall(x, x_int, probes)
            rec_l = _recall(x, x_lap, probes)
            print(
                f"| {name} | {r} | {var:.2f} | {rec_i:.2f} | {rec_l:.2f} |"
            )
    spark.stop()


if __name__ == "__main__":
    main()
