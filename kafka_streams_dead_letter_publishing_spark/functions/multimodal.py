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


# ── frame sampling (1 payload row → N frame rows) ────────────────────────

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary, frame_checksum bigint"

#: bytes kept per sampled frame (a real video path would decode the frame
#: here; the slice stands in for the decoded buffer — same schema, same
#: batch shape, same fan-out)
FRAME_SAMPLE_LEN = 16


def _frame_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        doc_ids: list[int] = []
        idxs: list[int] = []
        frames: list[bytes] = []
        sums: list[int] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for i in range(len(payload) // FRAME_BYTES):
                frame = bytes(payload[i * FRAME_BYTES : i * FRAME_BYTES + FRAME_SAMPLE_LEN])
                doc_ids.append(doc_id)
                idxs.append(i)
                frames.append(frame)
                sums.append(sum(frame) % CHECKSUM_MOD)
        yield pd.DataFrame(
            {"doc_id": doc_ids, "frame_idx": idxs, "frame": frames, "frame_checksum": sums}
        )


def sample_frames(df: DataFrame) -> DataFrame:
    """Frame sampling: each payload fans out to one row per ``FRAME_BYTES``
    stride, carrying the frame's leading bytes + checksum — the
    video-keyframe-extraction shape (1→N explode INSIDE the Arrow batch,
    so the fan-out never round-trips through a join or a generator node).
    A real codec would decode each frame where the slice is taken; the
    schema, partitioning and batch shape are exactly what that path needs."""
    return df.select("doc_id", "payload").mapInPandas(_frame_batches, FRAME_SCHEMA)


# ── resize (payload → smaller payload, metadata updated) ─────────────────

RESIZE_FACTOR = 4

RESIZED_SCHEMA = "doc_id bigint, payload binary, orig_bytes bigint, resized_bytes bigint"


def _resize_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        resized = pdf["payload"].map(lambda b: bytes(b[::RESIZE_FACTOR]))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload": resized,
                "orig_bytes": pdf["payload"].map(len),
                "resized_bytes": resized.map(len),
            }
        )


def resize_payload(df: DataFrame) -> DataFrame:
    """Deterministic stand-in for a codec-backed resize: keep every
    ``RESIZE_FACTOR``-th byte (a real image path decodes, resizes,
    re-encodes inside ``_resize_batches`` — the stub is byte-level so it
    runs and verifies in this codec-less container).  Output keeps the
    binary payload column plus before/after sizes, so downstream stages
    see the same binary-plus-metadata shape they started with."""
    return df.select("doc_id", "payload").mapInPandas(_resize_batches, RESIZED_SCHEMA)
