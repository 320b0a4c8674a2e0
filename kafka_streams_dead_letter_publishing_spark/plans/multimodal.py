"""Multimodal-column query family ([EXT], SURVEY §7 M5): opaque binary
payloads + typed metadata, processed through Arrow-batched ``mapInPandas``.

The payload here is the UTF-8 bytes of ``documents.text`` (the container has
no image/audio codecs — ``functions.multimodal.decode_image`` is the
documented stub), but the Spark-side plumbing is the real thing: binary
column, metadata struct, ``mapInPandas`` with an explicit output schema over
Arrow record batches.  The oracle reproduces the byte-level features in SQL
at the UTF-8 BYTE level (octet_length + a hex-pair walk), so the hash check
holds for any text, ASCII or not, despite the Python stage.

Scale posture: ``mapInPandas`` is a narrow transformation over Arrow batches
— no shuffle, no per-row Python; 100 TB of media shards across executors
like any other column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
    CHECKSUM_MOD,
    CHECKSUM_PREFIX,
    FRAME_BYTES,
    GIF_H,
    GIF_W,
    PNG_H,
    PNG_W,
    PX_H,
    PX_W,
    extract_features,
    with_payload,
)
from kafka_streams_dead_letter_publishing_spark.plans.registry import query
from kafka_streams_dead_letter_publishing_spark.sources.tables import load_table


@query(
    "docs_payload_features",
    # byte-exact for ANY text: the engine's features are over UTF-8 payload
    # BYTES, so the oracle walks hex(encode(text)) two nibbles at a time —
    # the earlier unicode(char)-based oracle was only right because the
    # driver corpus is pure ASCII (char == byte), the same latent-divergence
    # class as the r3 gear-CDC finding
    f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(COALESCE(list_sum(
                    [CAST(('0x' || substring(hex(encode(text)), 2 * i - 1, 2)) AS INTEGER)
                     for i in generate_series(1, least(octet_length(encode(text)),
                                                       {CHECKSUM_PREFIX}))]), 0)
                % {CHECKSUM_MOD} AS BIGINT) AS checksum,
           CAST(octet_length(encode(text)) // {FRAME_BYTES} AS BIGINT) AS n_frames,
           CAST(COALESCE(list_sum(
                    [CAST(('0x' || substring(hex(encode(text)), 2 * i - 1, 2)) AS INTEGER)
                     for i in generate_series(1, least(octet_length(encode(text)),
                                                       {3 * PX_W * PX_H}))]), 0)
                % {CHECKSUM_MOD} AS BIGINT) AS decoded_px_sum,
           CAST(COALESCE(list_sum(
                    [CAST(('0x' || substring(hex(encode(text)), 2 * i - 1, 2)) AS INTEGER)
                     for i in generate_series(1, least(octet_length(encode(text)),
                                                       {3 * PNG_W * PNG_H}))]), 0)
                % {CHECKSUM_MOD} AS BIGINT) AS png_px_sum,
           CAST(COALESCE(list_sum(
                    [CAST(('0x' || substring(hex(encode(text)), 2 * i - 1, 2)) AS INTEGER)
                     for i in generate_series(1, least(octet_length(encode(text)),
                                                       {3 * GIF_W * GIF_H}))]), 0)
                % {CHECKSUM_MOD} AS BIGINT) AS gif_px_sum
    FROM documents
    """,
    doc="[EXT] Multimodal feature extraction: binary payload column → "
    "Arrow-batched mapInPandas computing byte length, prefix checksum and "
    "frame-sample count; the oracle recomputes the same features at the "
    "UTF-8 BYTE level (hex-pair walk), exact for non-ASCII text too.  "
    "r13: decoded_px_sum runs the REAL pure-Python BMP codec per row "
    "(functions/multimodal.py encode_bmp → decode_image: bottom-up rows, "
    "4-byte padding, BGR swap) — the checksum of the DECODED pixels equals "
    "the oracle's source-byte sum only when the decoder inverts every "
    "format quirk, so the hash gate exercises the codec on every row.  "
    "r14: png_px_sum extends the discipline to a COMPRESSED format — a "
    "real stdlib-zlib PNG encode→decode per row with a CYCLING scanline "
    "filter (5 rows = all five of None/Sub/Up/Average/Paeth exercised), "
    "CRC-checked chunk walk, inflate — equal to the source-byte sum only "
    "when every unfilter path is correct.  gif_px_sum does the same for "
    "the SECOND compression family: a real GIF89a encode→decode per row "
    "(palette build, variable-width LZW with LSB-first bit packing, "
    "extension-block skipping) over a deliberately different prefix "
    "length (90 vs PNG's 75 bytes) so the two columns can't shadow each "
    "other's bugs.",
    tags=("multimodal",),
)
def docs_payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(with_payload(docs))


@query(
    "docs_payload_audio",
    # samples = 16-bit LE byte pairs of the UTF-8 payload: byte j occupies
    # hex chars 2j-1..2j, so sample i is ('0x' || high || low) with
    # low = substr(hex, 4i-3, 2) and high = substr(hex, 4i-1, 2); two's
    # complement via the explicit >= 32768 CASE (exact integers end-to-end)
    """
    WITH b AS (SELECT doc_id, encode(text) AS raw FROM documents)
    SELECT doc_id,
           CAST(octet_length(raw) // 2 AS BIGINT) AS n_samples,
           CAST((octet_length(raw) // 2) // 8 AS BIGINT) AS duration_ms,
           CAST(COALESCE(list_sum(
               [ABS(CASE WHEN v >= 32768 THEN v - 65536 ELSE v END)
                FOR v IN [CAST(('0x' || substring(hex(raw), 4*i - 1, 2)
                                     || substring(hex(raw), 4*i - 3, 2)) AS INTEGER)
                          FOR i IN generate_series(1, octet_length(raw) // 2)]]), 0)
                AS BIGINT) AS energy
    FROM b
    """,
    doc="[EXT] Multimodal AUDIO features (functions/multimodal.py, r13 — "
    "the audio leg of the image/audio/video surface): each payload's byte "
    "pairs become 16-bit PCM samples, run through a REAL pure-Python WAV "
    "encode→decode cycle (RIFF chunk walk, word alignment, two's-"
    "complement samples), and the DECODED stream is featured — sample "
    "count, duration at 8 kHz, Σ|sample| energy (exact BIGINTs, no "
    "transcendentals).  The oracle replays the same arithmetic over the "
    "source bytes, so the hash gate passes only when the codec "
    "round-trips the container exactly.  Scale posture: mapInPandas over "
    "Arrow batches, narrow, no shuffle — media shards like any column.",
    tags=("multimodal",),
)
def docs_payload_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        extract_audio_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    return extract_audio_features(with_payload(docs))
