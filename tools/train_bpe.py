"""Regenerate functions/bpe.py's DEFAULT_MERGES: classic BPE training
(count adjacent-pair frequencies over the word vocabulary, merge the most
frequent, repeat — the published algorithm from the subword-NMT /
GPT-2-tokenizer lineage) on the sf0.01 fixture corpus.

Usage: python tools/train_bpe.py [sf_dir] [n_merges]

Deterministic: ties break on the lexicographically greatest pair, words
come from the same normalization the engine uses, and the corpus is a
fixed parquet file — re-running reproduces the pinned table verbatim.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import duckdb

from kafka_streams_dead_letter_publishing_spark.functions.bpe import train_bpe_merges


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    texts = [
        t
        for (t,) in duckdb.sql(
            f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
        if t is not None
    ]
    merges = train_bpe_merges(texts, n_merges)
    print("DEFAULT_MERGES: tuple[tuple[str, str], ...] = (")
    for a, b in merges:
        print(f"    ({a!r}, {b!r}),")
    print(")")


if __name__ == "__main__":
    main()
