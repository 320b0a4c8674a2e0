"""Corpus-incremental near-dup filter: drop incoming documents that are
fuzzy duplicates of a REFERENCE corpus ([EXT], the ingest-time stage of the
LLM-pipeline dedup story — SURVEY §2.2b).

The batch registry covers near-dup dedup WITHIN a corpus
(``docs_neardup_verified`` → ``docs_neardup_clusters``); this operator
covers the other production shape: a stream of new documents arriving
against an already-cleaned reference corpus, where anything
Jaccard-similar to the corpus must be rejected at ingest.  It is a pure
batch→batch function, so it slots directly into the engine's
``foreachBatch`` streaming wrapper (the same batch==streaming contract as
``operators.topology.route``): build the index once, filter every
micro-batch against it.

Scale posture mirrors the registry pipeline (``plans/text.py``):
candidates come from an EQUI-join on LSH band keys over a SKINNY
(band_key, ref_id) index — shingle payloads never ride the candidate
shuffle; the exact-Jaccard verify touches candidates only; the final
reject is a LeftAnti on doc id.  At 100 TB the index side is a bucketed
table and every join here shuffles on uniform hash keys.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The FAST minhash family (xxhash64 → long keys), not the registry's md5
# family: this operator is pytest-pinned, not oracle-replayed, so it can
# use engine-native hashing — measured 4.3× on the banding stage (80k
# docs, local[32]: 4.1 s → 0.95 s) and 2.5× on the full filter at the
# 64× probe size (9.4 s → 3.8 s, 3.4k → 8.4k rows/s); the registry's
# docs_neardup_* rows keep md5 for DuckDB byte-parity.  Same
# S-curve; which near-miss dups land in which band differs, the exact
# Jaccard verify keeps precision identical either way.
from kafka_streams_dead_letter_publishing_spark.operators.occupancy import drop_hot_keys
from kafka_streams_dead_letter_publishing_spark.functions.text import (
    band_keys_from_minhash,
    band_keys_from_minhash_fast,
    minhash_array,
    minhash_array_fast,
    norm_text as _norm,
    shingles,
    tokens,
)


class NeardupIndex(NamedTuple):
    """Prebuilt reference-corpus index.

    ``bands``   — (bk, ref_id)                   : the skinny candidate side
                                                   (long keys in the fast
                                                   family, strings in md5)
    ``shingles``— (ref_id, ref_sh array<string>) : verify payload, joined
                                                   back for candidates only
    ``hash_family`` — the minhash family the bands were built with; the
    filter derives batch keys from the SAME family (a mismatch would
    silently miss every collision), so it rides the index object — the
    AnnIndex config convention.
    """

    bands: DataFrame
    shingles: DataFrame
    hash_family: str = "fast"


#: hash_family → (minhash fold, band-key builder).  "fast" (xxhash64
#: longs) is the production default; "md5" is the registry family the
#: DuckDB oracles replay byte-for-byte (plans/text._NEARDUP_BASE_CTES) —
#: the streamed-ingest registry row drives the pipeline with it so the
#: sink is value-hash comparable.  Same banding structure and S-curve
#: either way; the exact-Jaccard verify keeps precision identical.
_HASH_FAMILIES = {
    "fast": (minhash_array_fast, band_keys_from_minhash_fast),
    "md5": (minhash_array, band_keys_from_minhash),
}

#: hash_family → Spark SQL dtype of the band key it emits.  The on-disk
#: bands store carries no other family marker, so the bk dtype IS the
#: durable record of which family wrote it.
_FAMILY_BK_DTYPES = {"fast": "bigint", "md5": "string"}


def validate_bands_store_family(bands: DataFrame, hash_family: str) -> None:
    """Fail fast when a loaded on-disk bands store was written with a
    different minhash family than ``hash_family``.

    The in-memory guard in :func:`neardup_reject_ids` only compares two
    ``NeardupIndex`` objects' stamps — a store REloaded from disk gets
    stamped with whatever the restarting pipeline was configured with, so
    without this check an md5-built store read through the default
    ``fast`` family (or vice versa) silently misses every store
    collision: long and string band keys never equi-match, and duplicate
    documents flow into the corpus with no error.  The bk dtype is a
    faithful family marker ("fast" banding emits xxhash64 longs, "md5"
    emits hex strings), so a dtype mismatch is always a configuration
    error and never a recoverable state."""
    expected = _FAMILY_BK_DTYPES[hash_family]
    actual = dict(bands.dtypes).get("bk")
    if actual != expected:
        wrote = next(
            (fam for fam, dt in _FAMILY_BK_DTYPES.items() if dt == actual), None
        )
        wrote_msg = (
            f"written by the {wrote!r} family"
            if wrote is not None
            else f"of unrecognized bk dtype {actual!r}"
        )
        raise ValueError(
            f"bands store family mismatch: pipeline configured with "
            f"hash_family={hash_family!r} (bk dtype {expected!r}) but the "
            f"on-disk bands store is {wrote_msg} — the store join would "
            f"silently match nothing; restart with the family the store "
            f"was built with, or compact into a fresh base_dir"
        )


def build_neardup_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_band_occupancy: int | None = None,
    hash_family: str = "fast",
) -> NeardupIndex:
    """Index a reference corpus for :func:`neardup_filter`.

    In a long-running stream the caller materializes both frames once
    (persist / write to a bucketed table) and reuses them every
    micro-batch; building is one narrow pass over the corpus.

    ``max_band_occupancy``: drop band keys whose bucket exceeds the cap —
    the HOT-KEY guard for boilerplate-heavy corpora.  Minhash banding's
    candidate volume is similarity-driven (random pairs almost never
    collide), so unlike sign-LSH it has no depth knob; its failure mode is
    a templated phrase putting millions of documents into ONE bucket,
    whose pair join is then quadratic in the bucket (a 1M-doc bucket is
    ~10^12 candidate pairs).  Capping trades a documented recall sliver —
    a true dup reachable ONLY through dropped keys is missed, but near
    dups agree on ~J·N_BANDS of the 8 bands, so they stay reachable
    through the non-hot ones (test-pinned).  The hot-key set is tiny by
    construction (≤ n_keys/cap entries), broadcast into an anti-join at
    build time; serving cost is unchanged."""
    mh_fn, bk_fn = _HASH_FAMILIES[hash_family]
    sh_tbl = (
        corpus.select(F.col(id_col).alias("ref_id"), tokens(_norm(F.col(text_col))).alias("toks"))
        .select("ref_id", shingles(F.col("toks")).alias("ref_sh"))
    )
    # column NAMES, not Columns: the minhash fold and band keys build as
    # memoized SQL strings (r18 — this runs per micro-batch on the
    # DocumentIngest hot path; the lsh_table_keys_int convention)
    banded = sh_tbl.select(
        "ref_id", F.size("ref_sh").alias("n_sh"), mh_fn("ref_sh").alias("mh")
    ).select(
        "ref_id",
        F.explode(bk_fn("mh", "n_sh")).alias("bk"),
    )
    bands = drop_hot_keys(banded.select("bk", "ref_id"), max_band_occupancy)
    return NeardupIndex(bands=bands, shingles=sh_tbl, hash_family=hash_family)


def neardup_filter(
    batch: DataFrame,
    index: NeardupIndex,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_pct: int = 60,
) -> DataFrame:
    """Rows of ``batch`` that are NOT near-dups of the indexed corpus.

    A batch document is rejected when its shingle set has exact Jaccard
    similarity ≥ ``threshold_pct``/100 with ANY corpus document it shares
    an LSH band with (same banding recall as the registry pipeline — a
    true dup missed by all 8 bands is the documented LSH miss rate, not a
    semantic difference).  Documents with fewer tokens than one shingle
    have no shingles, collide with nothing, and always pass — the
    threshold is meaningless on them; callers wanting exact-dup rejection
    of short docs compose with the fingerprint dedup stage.

    Integer cross-multiplied threshold (``common * 100 >= union * pct``):
    exact on every engine, no float epsilon.
    """
    batch_index = build_neardup_index(
        batch, id_col=id_col, text_col=text_col, hash_family=index.hash_family
    )
    dup_ids = neardup_reject_ids(batch_index, index, threshold_pct)
    return batch.join(
        dup_ids.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )


def neardup_reject_ids(
    batch_index: NeardupIndex,
    index: NeardupIndex,
    threshold_pct: int = 60,
) -> DataFrame:
    """(doc_id) rows of ``batch_index``'s documents that ARE near-dups of
    ``index``'s corpus — the reject set :func:`neardup_filter` anti-joins
    away, exposed on prebuilt indexes so a caller that already staged the
    batch's (bands, shingles) — DocumentIngest computes them once per
    micro-batch for the intra-batch dedup — never re-runs the
    tokenize→shingle→minhash chain for the store filter (r16: the chain
    was evaluated 3× per batch; it is the dominant per-batch cost).
    Both indexes must share a hash family or the band equi-join silently
    misses every collision."""
    if batch_index.hash_family != index.hash_family:
        raise ValueError(
            f"hash-family mismatch: batch {batch_index.hash_family!r} vs "
            f"index {index.hash_family!r} — the band join would match nothing"
        )
    # skinny candidate pairs: batch doc × corpus doc sharing any band
    cands = (
        batch_index.bands.withColumnRenamed("ref_id", "doc_id")
        .join(index.bands, "bk")
        .select("doc_id", "ref_id")
        .distinct()
    )
    staged = batch_index.shingles.select(
        F.col("ref_id").alias("doc_id"), F.col("ref_sh").alias("sh")
    )
    n_common = F.size(F.array_intersect("sh", "ref_sh"))
    return (
        cands.join(staged, "doc_id")
        .join(index.shingles, "ref_id")
        .select(
            "doc_id",
            n_common.alias("n_common"),
            (F.size("sh") + F.size("ref_sh")).alias("n_ab"),
        )
        .filter(
            F.col("n_common") * 100
            >= (F.col("n_ab") - F.col("n_common")) * threshold_pct
        )
        .select("doc_id")
        .distinct()
    )
