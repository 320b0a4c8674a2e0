"""Measure when dHash banding bounds pair work and when it degenerates.

Two corpora through the SAME ``with_dhash`` → band-join pipeline:

* ``text``  — real ``documents.text`` payload prefixes (ASCII): short
  docs share all-zero bottom grid rows, so at least one 16-bit band is
  constant across most of the corpus and the candidate join funnels
  toward all-pairs — the hot-LSH-bucket failure mode.
* ``image`` — synthetic full-byte-range payloads (planted noisy copies):
  bands distribute and candidates stay near the planted-pair count.
* ``synth`` (r15) — the REGISTRY fixture itself
  (``sources.synth.synth_docs_imagelike`` scaled by the documents
  table): reproduces the SCALE.md r15 banding table — candidate count
  vs the uniform expectation 4·C(N,2)/2^16 vs all-pairs, verified
  pairs at Hamming ≤ 3 with the planted/natural split, and the
  pigeonhole recall-1 check (banded ≡ brute force in this regime).

Prints one JSON line per (corpus, n) with candidate counts vs the
all-pairs ceiling; the SCALE.md dHash rows cite these numbers.

Usage: python tools/probe_dhash.py [sf_dir]
"""

from __future__ import annotations

import json
import pathlib
import random
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        DHASH_BYTES,
        dhash_near_pairs,
        with_dhash,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .appName("dhash-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def candidates(h):
        """Candidate count BEFORE the Hamming filter (the join cost)."""
        bands = []
        for expr in (
            "shiftright(dhash_hi, 16)",
            "dhash_hi & 65535",
            "shiftright(dhash_lo, 16)",
            "dhash_lo & 65535",
        ):
            bands.append(F.expr(expr))
        b = h.select(
            "doc_id",
            F.posexplode(F.array(*bands)).alias("band_id", "band_val"),
        )
        return (
            b.alias("a")
            .join(
                b.alias("b"),
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_val") == F.col("b.band_val"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .count()
        )

    # ── text corpus: real documents ──────────────────────────────────────
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    n = docs.count()
    h = with_dhash(docs).select("doc_id", "dhash_hi", "dhash_lo").localCheckpoint(
        eager=True
    )
    cand = candidates(h)
    print(
        json.dumps(
            {
                "corpus": "text",
                "n": n,
                "candidates": cand,
                "all_pairs": n * (n - 1) // 2,
                "frac_of_all_pairs": round(cand / max(n * (n - 1) // 2, 1), 3),
            }
        ),
        flush=True,
    )

    # ── image-like corpus: full-byte-range + planted noisy copies ────────
    rng = random.Random(14)
    n_img, n_planted = 400, 20
    rows = []
    for i in range(n_img):
        rows.append((i, bytes(rng.randrange(256) for _ in range(DHASH_BYTES))))
    for j in range(n_planted):  # noisy copy of image j
        noisy = bytearray(rows[j][1])
        for _ in range(5):
            noisy[rng.randrange(DHASH_BYTES)] ^= 0x04
        rows.append((n_img + j, bytes(noisy)))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    h = with_dhash(df).select("doc_id", "dhash_hi", "dhash_lo").localCheckpoint(
        eager=True
    )
    total = len(rows)
    cand = candidates(h)
    found = {
        (r.doc_a, r.doc_b)
        for r in dhash_near_pairs(h, max_hamming=6).collect()
    }
    recall = sum(1 for j in range(n_planted) if (j, n_img + j) in found) / n_planted
    print(
        json.dumps(
            {
                "corpus": "image",
                "n": total,
                "candidates": cand,
                "all_pairs": total * (total - 1) // 2,
                "frac_of_all_pairs": round(
                    cand / (total * (total - 1) // 2), 4
                ),
                "planted_recall_at_h6": recall,
                "pairs_reported": len(found),
            }
        ),
        flush=True,
    )
    # ── synth corpus: the registry fixture (SCALE.md r15 table) ──────────
    from kafka_streams_dead_letter_publishing_spark.sources.synth import (
        IMAGELIKE_COPY_OFFSET,
        synth_docs_imagelike,
    )
    from kafka_streams_dead_letter_publishing_spark.sources.tables import (
        fan_out,
    )

    base_docs = fan_out(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id"
    )
    pay = synth_docs_imagelike(base_docs, DHASH_BYTES, DHASH_BYTES // 3)
    h = with_dhash(pay).select(
        "doc_id", "dhash_hi", "dhash_lo"
    ).localCheckpoint(eager=True)
    n = h.count()
    cand = candidates(h)
    pairs = dhash_near_pairs(h, max_hamming=3).collect()
    planted = sum(1 for r in pairs if r.doc_b >= IMAGELIKE_COPY_OFFSET)
    # brute-force Hamming <= 3 over all pairs — must equal the banded
    # result exactly (pigeonhole: <= 3 bits can't touch all four bands)
    hh = h.select(
        F.col("doc_id").alias("id"), "dhash_hi", "dhash_lo"
    )
    brute = (
        hh.alias("a")
        .join(hh.alias("b"), F.col("a.id") < F.col("b.id"))
        .withColumn(
            "ham",
            F.expr(
                "bit_count(a.dhash_hi ^ b.dhash_hi) "
                "+ bit_count(a.dhash_lo ^ b.dhash_lo)"
            ),
        )
        .filter(F.col("ham") <= 3)
        .count()
    )
    print(
        json.dumps(
            {
                "corpus": "synth",
                "n": n,
                "candidates": cand,
                "uniform_expectation": round(4 * n * (n - 1) / 2 / 65536),
                "all_pairs": n * (n - 1) // 2,
                "frac_of_all_pairs": round(cand / (n * (n - 1) // 2), 5),
                "pairs_at_h3": len(pairs),
                "planted": planted,
                "natural": len(pairs) - planted,
                "banded_equals_brute_force": len(pairs) == brute,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
