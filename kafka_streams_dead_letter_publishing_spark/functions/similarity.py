"""Vector-similarity operators ([EXT], SURVEY §7 M5): exact cosine via pure
array expressions, and an LSH (random-hyperplane) bucketing scheme for the
scale path.

Determinism/portability: the oracle must reproduce the exact IEEE doubles,
so (a) every float is cast to double *before* any multiply, (b) the dot
product folds strictly left-to-right (Spark ``aggregate`` fold == the
oracle's explicit left-associated sum), and (c) the hyperplanes are module-
level literals (seeded numpy) embedded verbatim into both engines' SQL.

Scale posture: brute-force cosine is O(Q·N·d) — fine for a broadcast query
set against any N because it is embarrassingly parallel with no shuffle;
the LSH variant buckets the corpus once (narrow) and joins only within
buckets, the standard trick above ~10⁶ vectors (SURVEY §4.3).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EMBEDDING_DIM = 64
N_HYPERPLANES = 6  # 2^6 = 64 buckets

# Deterministic hyperplanes, shared verbatim with the oracle SQL literals.
_rng = np.random.default_rng(7)
HYPERPLANES: list[list[float]] = [
    [float(x) for x in _rng.standard_normal(EMBEDDING_DIM)] for _ in range(N_HYPERPLANES)
]


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with per-element double casts, strict left-to-right fold."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def plane_dot(emb: Column, plane: list[float]) -> Column:
    """Dot product against a literal hyperplane, same fold order as the
    oracle's generated sum."""
    acc = F.lit(0.0)
    for i, w in enumerate(plane):
        acc = acc + F.lit(w) * F.element_at(emb, i + 1).cast("double")
    return acc


def lsh_bucket(emb: Column) -> Column:
    """Random-hyperplane LSH bucket id: the sign-bit string of the plane
    dot products ('010011' for 6 planes)."""
    bits = [F.when(plane_dot(emb, p) >= 0, F.lit("1")).otherwise(F.lit("0")) for p in HYPERPLANES]
    return F.concat(*bits)


# ── oracle-side SQL generators (DuckDB dialect: 1-based l[i] indexing) ───


def dot_sql(a: str, b: str, dim: int = EMBEDDING_DIM) -> str:
    terms = " + ".join(
        f"(CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE))" for i in range(1, dim + 1)
    )
    return f"(CAST(0 AS DOUBLE) + {terms})"


def cosine_sql(a: str, b: str, dim: int = EMBEDDING_DIM) -> str:
    return f"({dot_sql(a, b, dim)} / (SQRT({dot_sql(a, a, dim)}) * SQRT({dot_sql(b, b, dim)})))"


def plane_dot_sql(emb: str, plane: list[float]) -> str:
    # CAST the literal: DuckDB parses bare decimal literals as DECIMAL, and
    # we need the exact repr→double conversion Spark's F.lit(float) does.
    terms = " + ".join(
        f"(CAST('{w!r}' AS DOUBLE) * CAST({emb}[{i + 1}] AS DOUBLE))" for i, w in enumerate(plane)
    )
    return f"(CAST(0 AS DOUBLE) + {terms})"


def lsh_bucket_sql(emb: str) -> str:
    bits = " || ".join(
        f"(CASE WHEN {plane_dot_sql(emb, p)} >= 0 THEN '1' ELSE '0' END)" for p in HYPERPLANES
    )
    return f"({bits})"
