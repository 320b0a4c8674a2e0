"""Seeded synthetic corpus generators for scale probing ([EXT]).

The driver's fixed testdata tops out at sf0.1 (5k documents / 2k vectors)
— big enough for correctness, far too small to OBSERVE how an operator's
cost grows.  These generators produce corpora of any size with the same
shape as the testdata tables (``documents``: doc_id/text/lang/source/
n_chars over a small word vocabulary; ``embeddings``: vec_id/embedding/
label), entirely as Spark expressions over ``spark.range``:

* **Deterministic**: every cell is a pure function of (id, seed) through
  ``xxhash64`` — two generations of the same size are identical, a prefix
  of a bigger corpus equals the smaller corpus, and no data ever crosses
  the driver.
* **Distributed**: ``spark.range`` splits across the cluster; generation
  is a narrow map (no shuffle), so a 100× corpus costs 100× map work.
* **Planted near-dups at a FIXED RATE**: every ``planted_every``-th id
  re-derives its content from the previous id (documents: same word
  sequence + one appended word ⇒ shingle-Jaccard just under 1; vectors:
  the same direction scaled by 1.001 ⇒ cosine exactly 1 up to float
  rounding).  A constant dup fraction is what real corpora look like, and
  it keeps verify-stage work proportional to corpus size — so a scaling
  probe measures the OPERATOR's growth, not an artificial dup blow-up.

Used by ``tools/scale_probe.py``; deterministic contract pinned in
``tests/test_synth.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Same flavor of micro-vocabulary as the driver's documents table (64
#: words ⇒ 3-shingle space of ~262k — collisions happen, like real text).
VOCAB_SIZE = 64
LANGS = ("en", "de", "fr", "zh", "es")


def _src_id(id_col: Column, planted_every: int) -> Column:
    """The id whose content this row derives from: itself, or the previous
    id for planted near-dup rows."""
    planted = (id_col % planted_every == 0) & (id_col > 0)
    return F.when(planted, id_col - 1).otherwise(id_col)


def synth_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    planted_every: int = 5,
) -> DataFrame:
    """(doc_id, text, lang, source, n_chars) — text is 8–120 words drawn
    from the vocabulary by hash; every ``planted_every``-th doc is the
    previous doc's text plus one extra word (a near-dup the minhash/LSH
    pipeline must catch)."""
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    src = _src_id(F.col("doc_id"), planted_every)
    planted = (F.col("doc_id") % planted_every == 0) & (F.col("doc_id") > 0)
    n_words = F.lit(8) + F.pmod(F.xxhash64(src, F.lit(seed + 1)), F.lit(113))
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(src, j, F.lit(seed)), F.lit(VOCAB_SIZE)).cast("string"),
        ),
    )
    text = F.array_join(words, " ")
    text = F.when(planted, F.concat(text, F.lit(" wx"))).otherwise(text)
    return ids.select(
        "doc_id",
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(x) for x in LANGS]),
            (F.pmod(F.xxhash64(F.col("doc_id"), F.lit(seed + 2)), F.lit(len(LANGS))) + 1).cast("int"),
        ).alias("lang"),
        F.concat(
            F.lit("src"),
            F.pmod(F.xxhash64(F.col("doc_id"), F.lit(seed + 3)), F.lit(4)).cast("string"),
        ).alias("source"),
        F.length(text).alias("n_chars"),
    )


def synth_embeddings(
    spark: SparkSession,
    n_vecs: int,
    seed: int = 43,
    planted_every: int = 10,
    dim: int = 64,
) -> DataFrame:
    """(vec_id, embedding array<float>, label) — components uniform-ish in
    [-1, 1] by hash; every ``planted_every``-th vector is the previous
    vector's direction scaled by 1.001 (cosine ≈ 1: a near-dup the
    sign-LSH index must catch)."""
    ids = spark.range(n_vecs).select(F.col("id").alias("vec_id"))
    src = _src_id(F.col("vec_id"), planted_every)
    planted = (F.col("vec_id") % planted_every == 0) & (F.col("vec_id") > 0)
    scale = F.when(planted, F.lit(1.001)).otherwise(F.lit(1.0))
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            (
                (F.pmod(F.xxhash64(src, j, F.lit(seed)), F.lit(2_000_001)) - F.lit(1_000_000))
                / F.lit(1_000_000.0)
            )
            * scale
        ).cast("float"),
    )
    return ids.select(
        "vec_id",
        emb.alias("embedding"),
        F.pmod(F.xxhash64(F.col("vec_id"), F.lit(seed + 1)), F.lit(10))
        .cast("int")
        .alias("label"),
    )


# ── planted low-rank (anisotropic) embeddings (r13, r12 verdict #7) ──────
#
# The fixed testdata embeddings are near-ISOTROPIC (top-16 eigenvalues
# carry ~31% of variance at sf0.1 — SCALE.md), so the PCA family's recall
# story could only be demonstrated on a driver-local pytest corpus.  This
# generator plants the structure real text embeddings have: variance
# concentrated in a few directions, plus small isotropic noise — with the
# same determinism contract as the generators above (pure function of
# (id, seed) through xxhash64; narrow map; prefix-stable).

#: geometric scale decay of the planted directions, and the isotropic
#: noise floor relative to the strongest direction.  With rank=8 /
#: decay=0.7 / noise=0.05, ~97% of variance sits in the top-8 subspace.
LOWRANK_RANK = 8
LOWRANK_DECAY = 0.7
LOWRANK_NOISE = 0.05


def _lowrank_basis(dim: int, rank: int, seed: int) -> list[list[float]]:
    """Deterministic orthonormal rank×dim basis (seeded numpy QR — a
    module-level literal exactly like functions.similarity.HYPERPLANES;
    embedded verbatim into the generating expression, so two generations
    can never drift)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    q = np.linalg.qr(rng.standard_normal((dim, dim)))[0]
    return [[float(x) for x in q[:, t]] for t in range(rank)]


def synth_embeddings_lowrank(
    spark: SparkSession,
    n_vecs: int,
    seed: int = 47,
    dim: int = 64,
    rank: int = LOWRANK_RANK,
    decay: float = LOWRANK_DECAY,
    noise: float = LOWRANK_NOISE,
) -> DataFrame:
    """(vec_id, embedding array<float>, label) with PLANTED low-rank
    structure: ``emb = Σ_t c_t(id)·decay^t·B_t + noise·n(id, ·)`` over a
    deterministic orthonormal basis B — anisotropic by construction, so
    r-dim PCA projection provably preserves neighborhoods here (the
    variance-explained gate's GO case, measured in SCALE.md).

    Everything is a narrow Spark expression: the per-row coefficients and
    noise are xxhash64-uniform in [-1, 1]; the scaled basis collapses to
    one array literal under ConstantFolding.  label = argmax |c_t|
    bucketed — rows dominated by the same direction cluster together,
    giving the IVF/SemDeDup studies a meaningful ground truth."""
    basis = _lowrank_basis(dim, rank, seed)
    scaled = [
        [w * (decay**t) for w in basis[t]] for t in range(rank)
    ]
    basis_lit = F.expr(
        "array("
        + ", ".join(
            "array(" + ", ".join(f"CAST('{w!r}' AS DOUBLE)" for w in row) + ")"
            for row in scaled
        )
        + ")"
    )
    ids = spark.range(n_vecs).select(F.col("id").alias("vec_id"))
    vid = F.col("vec_id")

    def u(t: Column | int, salt: int) -> Column:
        # hash-uniform in [-1, 1], the synth_embeddings convention
        return (
            F.pmod(F.xxhash64(vid, t, F.lit(seed + salt)), F.lit(2_000_001))
            - F.lit(1_000_000)
        ) / F.lit(1_000_000.0)

    coefs = F.transform(F.sequence(F.lit(0), F.lit(rank - 1)), lambda t: u(t, 1))
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.aggregate(
                F.zip_with(coefs, basis_lit, lambda c, row: c * F.element_at(row, j + 1)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            + u(j, 2) * F.lit(noise)
        ).cast("float"),
    )
    # dominant planted direction, tie-broken to the lowest t
    dom = F.aggregate(
        F.sequence(F.lit(0), F.lit(rank - 1)),
        F.struct(F.lit(-1.0).alias("best"), F.lit(0).alias("t")),
        lambda acc, t: F.when(
            F.abs(F.element_at(coefs, t + 1)) * F.pow(F.lit(decay), t) > acc["best"],
            F.struct(
                (F.abs(F.element_at(coefs, t + 1)) * F.pow(F.lit(decay), t)).alias("best"),
                t.cast("int").alias("t"),
            ),
        ).otherwise(acc),
    )
    return ids.select(
        "vec_id", emb.alias("embedding"), dom["t"].alias("label")
    )


# ── planted-Zipf events (r14, r13 verdict #6: the skew-stress corpus) ────
#
# The fixed testdata events hash user_ids near-uniformly, so the salted
# aggregation and AQE skew-join paths could never be measured against a
# genuinely hot key.  This generator plants the traffic shape real event
# streams have — a Zipf(1) user popularity law via the inverse-CDF N^u
# transform: P(rank r) ∝ 1/r, so rank 1 alone carries ~1/ln(N) of ALL
# events (~8.7% at N=100k) — the key that serializes a 1000-executor
# shuffle unless the plan spreads it.  Same determinism contract as the
# other generators: pure function of (event_id, seed) through xxhash64,
# narrow map, prefix-stable.

ZIPF_USERS = 100_000


def synth_events_zipf(
    spark: SparkSession,
    n_events: int,
    seed: int = 44,
    n_users: int = ZIPF_USERS,
) -> DataFrame:
    """(event_id, user_id, event_type, value) with ``user_id`` Zipf(1)-
    distributed: ``u`` uniform in (0,1) by hash, ``user_id = floor(N^u)``
    — the classic inverse-CDF approximation of P(r) ∝ 1/r over ranks
    1..N (P(r) = ln((r+1)/r)/ln N ≈ 1/(r·ln N); hot ranks are the SMALL
    ids, so skew is easy to inspect)."""
    ids = spark.range(n_events).select(F.col("id").alias("event_id"))
    u = (
        F.pmod(F.xxhash64(F.col("event_id"), F.lit(seed)), F.lit(1_000_000))
        + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    user = F.least(
        F.floor(F.pow(F.lit(float(n_users)), u)).cast("long"), F.lit(n_users)
    )
    return ids.select(
        "event_id",
        user.alias("user_id"),
        F.concat(
            F.lit("t"),
            F.pmod(F.xxhash64(F.col("event_id"), F.lit(seed + 1)), F.lit(5)).cast(
                "string"
            ),
        ).alias("event_type"),
        (
            F.pmod(F.xxhash64(F.col("event_id"), F.lit(seed + 2)), F.lit(100_000))
            / F.lit(100.0)
        ).alias("value"),
    )


# ── image-like payloads with planted near-copies (r15) ───────────────────
#
# The dHash banded near-pair search's cost contract holds only when band
# values DISTRIBUTE — true of real image bytes, provably false of ASCII
# text prefixes (tools/probe_dhash.py measures both regimes).  The driver
# corpus is text, so gating the banded search needs a planted IMAGE-LIKE
# payload table: full-byte-range bytes as a pure integer function of
# doc_id (replayable in DuckDB SQL verbatim — the synth_events_zipf
# discipline), plus a planted near-copy of every COPY_EVERY-th doc that
# perturbs exactly ONE pixel triple, so each copy's dHash differs from
# its base in at most 2 bits (one cell feeds two left/right comparisons)
# — within the Hamming<=3 regime where 4-band LSH has GUARANTEED recall 1
# by pigeonhole (<=3 differing bits cannot touch all four 16-bit bands).

IMAGELIKE_COPY_EVERY = 7
IMAGELIKE_COPY_OFFSET = 1_000_000_000
#: one byte of the synthetic image: hex pair (p mod 16) of
#: md5("<base_id>:<p DIV 16>") — md5 agrees bit-for-bit across Spark and
#: DuckDB (the KMV/Bloom precedent) and is genuinely uniform, so the
#: 16-bit hash bands distribute; CHUNKED (one md5 yields 16 bytes) so a
#: payload costs 54 hashes, not 864 — the per-byte variant benched 22.7 s
#: at sf0.1, ~16x the hash work for identical statistics.  A polynomial
#: mod 256 does NOT work here at all: any integer polynomial is periodic
#: in the id with period 256, so ids 256 apart produced byte-identical
#: images (measured at sf0.01: 572 docs → only 274 distinct hashes) — a
#: planted-collision artifact, not a near-dup signal.  The Spark form
#: reads a STAGED _md5s array column (one md5 list per row — inlining the
#: md5 into the 864-element transform would recompute it per element).
IMAGELIKE_BYTE_DUCK = (
    "CAST(('0x' || substring(m[p//16 + 1], 2*(p%16) + 1, 2)) AS INTEGER)"
)
IMAGELIKE_MD5S_SPARK = (
    "transform(sequence(0, {last_chunk}), c -> "
    "md5(concat(CAST({base} AS STRING), ':', CAST(c AS STRING))))"
)
IMAGELIKE_MD5S_DUCK = (
    "[md5({base} || ':' || c) FOR c IN generate_series(0, {last_chunk})]"
)


def synth_docs_imagelike(docs: DataFrame, n_bytes: int, n_pixels: int) -> DataFrame:
    """(doc_id, payload) with image-like binary payloads derived from the
    ``documents`` table's ids (so the table scales with SF and the oracle
    can regenerate it from the same view): every id gets ``n_bytes`` of
    full-range deterministic bytes; every ``IMAGELIKE_COPY_EVERY``-th id
    additionally plants a near-copy at id + IMAGELIKE_COPY_OFFSET whose
    payload differs in exactly one pixel triple.  Pure Catalyst
    expressions (sequence → transform → unhex), narrow, no Python."""
    last_chunk = (n_bytes + 15) // 16 - 1
    # the md5 hex strings concatenated ARE the payload hex — no per-byte
    # lambda walk at all (a per-byte transform referencing a staged md5
    # array measured 132 s at sf0.1: CollapseProject inlined the 54-md5
    # array into all 864 lambda bodies — 46k hashes per row)
    md5s = IMAGELIKE_MD5S_SPARK.format(base="base_id", last_chunk=last_chunk)
    hexpr = f"substring(concat_ws('', {md5s}), 1, {2 * n_bytes})"
    kx = f"(base_id % {n_pixels})"

    def pb(j: int) -> str:
        # perturbed byte j of the planted pixel, re-encoded as a hex pair
        return (
            f"lpad(hex((CAST(conv(substring(_hex, 6*{kx} + {2 * j + 1}, 2), "
            "16, 10) AS INT) + 64) % 256), 2, '0')"
        )

    pert_hex = (
        f"concat(substring(_hex, 1, 6*{kx}), {pb(0)}, {pb(1)}, {pb(2)}, "
        f"substring(_hex, 6*{kx} + 7, {2 * n_bytes}))"
    )
    ids = docs.select(F.col("doc_id").alias("base_id"))
    base = (
        ids.withColumn("_hex", F.expr(hexpr))
        .select(
            F.col("base_id").alias("doc_id"),
            F.expr("unhex(_hex)").alias("payload"),
        )
    )
    copies = (
        ids.filter(F.col("base_id") % IMAGELIKE_COPY_EVERY == 0)
        .withColumn("_hex", F.expr(hexpr))
        .select(
            (F.col("base_id") + IMAGELIKE_COPY_OFFSET).alias("doc_id"),
            F.expr(f"unhex({pert_hex})").alias("payload"),
        )
    )
    return base.unionByName(copies)
