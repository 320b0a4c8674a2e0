"""Multimodal column plumbing ([EXT], SURVEY §7 M5): opaque binary payloads
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The image/audio codec libraries are not in this container, so the actual
decode is stubbed (``decode_image``) — but the Spark-side plumbing is real
and tested: binary column + metadata struct in, ``mapInPandas`` with an
explicit output schema over Arrow batches out.  Swapping the stub for a real
``PIL.Image.open(io.BytesIO(buf))`` is a one-function change.

Scale posture: ``mapInPandas`` streams Arrow record batches (no per-row
Python overhead) and is a narrow transformation — no shuffle; partition
sizing is inherited from the scan, so 100 TB of media shards across
executors exactly like any other column.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, checksum bigint, n_frames bigint"

CHECKSUM_PREFIX = 64
CHECKSUM_MOD = 997
FRAME_BYTES = 1000


def decode_image(buf: bytes):
    """Real codec entry point — deliberately stubbed: the container has no
    image libraries.  The deterministic feature path below never calls it."""
    raise NotImplementedError(
        "image decoding requires an image codec library not present in this "
        "environment; extract_features computes deterministic byte-level "
        "features instead"
    )


def _feature_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len),
                "checksum": payloads.map(
                    lambda b: sum(b[:CHECKSUM_PREFIX]) % CHECKSUM_MOD
                ),
                "n_frames": payloads.map(lambda b: len(b) // FRAME_BYTES),
            }
        )


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the opaque binary column + typed metadata struct (the
    multimodal data model: binary + metadata, SURVEY north star)."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(text_col)).alias("declared_bytes"),
        ).alias("meta"),
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column:
    byte length, prefix checksum, frame-sample count."""
    return df.select("doc_id", "payload").mapInPandas(_feature_batches, FEATURE_SCHEMA)
