"""Text-analysis operators for the LLM-data-pipeline surface ([EXT],
SURVEY §2.2 / §7 M5): tokenization, shingling, fingerprinting, minhash,
simhash, quality scoring, language ID.

All hot-path logic is Column expressions (JVM-side, codegen); the shingle /
minhash hashes use md5 so the DuckDB oracle can compute byte-identical
values (engine-portable, unlike xxhash64/DuckDB-hash).

Scale posture: everything here is per-row narrow work before any join, so it
scales linearly; the pairwise near-dup joins it feeds are gated by LSH
banding (candidates only), not an all-pairs product.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic marker vocabularies, shared with the oracle SQL.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
}

N_MINHASH = 16  # minhash functions; banded as N_BANDS × 2 rows
N_BANDS = 8
SIMHASH_BITS = 60  # 15 hex chars of md5 → fits a signed 64-bit long exactly


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def shingles(toks: Column, k: int = 3) -> Column:
    """Distinct k-token shingles (k-grams) as an array<string>; empty when
    the doc has fewer than k tokens.  1-based element_at keeps the index
    convention identical to the oracle's DuckDB list indexing."""
    gram = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )
    return F.when(F.size(toks) >= k, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the lowercased, space-normalized text —
    the exact-dup key that survives formatting noise."""
    return F.md5(F.regexp_replace(F.lower(text), r"\s+", " "))


def minhash_value(shingle_col: Column, j: int) -> Column:
    """j-th minhash of a shingle set: min over md5('<j>:' || shingle)."""
    return F.array_min(F.transform(shingle_col, lambda s: F.md5(F.concat(F.lit(f"{j}:"), s))))


def band_keys(shingle_col: Column) -> Column:
    """LSH band keys (N_BANDS entries, r=2 minhashes per band): two docs are
    near-dup candidates iff they share at least one band key."""
    return F.array(
        *[
            F.concat_ws(
                "|", minhash_value(shingle_col, 2 * b), minhash_value(shingle_col, 2 * b + 1)
            )
            for b in range(N_BANDS)
        ]
    )


def shingle_hash60(shingle: Column) -> Column:
    """First 15 md5 hex chars → 60-bit non-negative long (portable to the
    oracle, which parses the same hex)."""
    return F.conv(F.substring(F.md5(shingle), 1, 15), 16, 10).cast("long")


def stopword_count(toks: Column) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def lang_marker_count(toks: Column, lang: str) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang])))


def lang_guess(toks: Column) -> Column:
    """Marker-vocabulary language ID with a strict-majority rule; 'und' on
    ties or no evidence."""
    en, es, de = (lang_marker_count(toks, l) for l in ("en", "es", "de"))
    return (
        F.when((en > es) & (en > de), F.lit("en"))
        .when((es > en) & (es > de), F.lit("es"))
        .when((de > en) & (de > es), F.lit("de"))
        .otherwise(F.lit("und"))
    )
