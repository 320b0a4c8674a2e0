"""Multimodal operator tests: the Arrow-batched binary-column pipeline
(payload attach → feature extract / frame sample / resize) with pure-Python
expected values, plus plan shape (Arrow-only, narrow — no shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
    CHECKSUM_MOD,
    CHECKSUM_PREFIX,
    FRAME_BYTES,
    JPEG_QUALITY,
    RESIZE_FACTOR,
    box_downscale,
    decode_image,
    encode_avi,
    extract_features,
    resize_image,
    resize_payload,
    sample_frames,
    with_payload,
)


@pytest.fixture()
def payload_df(spark):
    rows = [
        (1, "a" * 2500),              # many full frames + remainder
        (2, "xy"),                    # shorter than a frame → no frame rows
        (3, "b" * (FRAME_BYTES * 3)),  # exactly 3 frames
    ]
    return with_payload(spark.createDataFrame(rows, "doc_id long, text string"))


def test_extract_features_matches_python(spark, payload_df):
    got = {r.doc_id: r for r in extract_features(payload_df).collect()}
    for doc_id, text in ((1, "a" * 2500), (2, "xy"), (3, "b" * (FRAME_BYTES * 3))):
        raw = text.encode()
        assert got[doc_id].n_bytes == len(raw)
        assert got[doc_id].checksum == sum(raw[:CHECKSUM_PREFIX]) % CHECKSUM_MOD
        assert got[doc_id].n_frames == len(raw) // FRAME_BYTES


def test_sample_frames_decodes_real_mjpeg_frames(spark, payload_df):
    """Each FRAME_BYTES stride → one real AVI frame decoded back through
    the RIFF walk + JPEG decode; checksums equal the solid closed form."""
    from kafka_streams_dead_letter_publishing_spark.functions.jpeg import (
        solid_roundtrip_rgb,
    )

    rows = sample_frames(payload_df).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc.get(1, [])) == 2500 // FRAME_BYTES
    assert len(by_doc.get(3, [])) == 3
    assert 2 not in by_doc  # sub-frame payloads produce no frames
    a = ord("a")
    expect_a = 256 * sum(solid_roundtrip_rgb(a, a, a, JPEG_QUALITY)) % CHECKSUM_MOD
    f0 = next(r for r in by_doc[1] if r.frame_idx == 0)
    assert f0.frame_px_sum == expect_a
    assert sorted(r.frame_idx for r in by_doc[3]) == [0, 1, 2]


@pytest.fixture()
def image_payload_df(spark):
    """Payloads that ARE encoded images (the resize operator's input
    contract since the stub retired): one PNG, one BMP."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        encode_bmp,
        encode_png,
    )

    px_a = bytes((7 * i + 3) % 256 for i in range(3 * 12 * 8))
    px_b = bytes((11 * i + 5) % 256 for i in range(3 * 6 * 4))
    rows = [(1, encode_png(px_a, 12, 8)), (2, encode_bmp(px_b, 6, 4))]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_resize_payload_real_decode_downscale_reencode(spark, image_payload_df):
    got = {r.doc_id: r for r in resize_payload(image_payload_df).collect()}
    px_a = bytes((7 * i + 3) % 256 for i in range(3 * 12 * 8))
    expect = box_downscale(px_a, 12, 8, RESIZE_FACTOR)
    w, h, dec = decode_image(bytes(got[1].payload))
    assert (w, h, dec) == expect  # output decodes to the exact box average
    assert (got[1].resized_w, got[1].resized_h) == (12 // RESIZE_FACTOR, 8 // RESIZE_FACTOR)
    assert got[1].resized_bytes == len(bytes(got[1].payload))
    assert got[2].resized_w == 3  # the BMP input resized too
    # output keeps the binary-plus-metadata shape for downstream stages
    assert dict(resize_payload(image_payload_df).dtypes)["payload"] == "binary"


def test_box_downscale_edge_blocks_and_errors():
    # 3x3 by 2 → 2x2 with partial edge blocks averaged over what exists
    px = bytes(range(27))
    nw, nh, out = box_downscale(px, 3, 3, 2)
    assert (nw, nh) == (2, 2)
    # top-left block: pixels (0,0),(1,0),(0,1),(1,1) channel 0 = 0,3,9,12
    assert out[0] == (0 + 3 + 9 + 12) // 4
    # top-right edge block: single column (2,0),(2,1) channel 0 = 6,15
    assert out[3] == (6 + 15) // 2
    # bottom-right corner: single pixel (2,2)
    assert out[3 * 3 : 3 * 4] == px[24:27]
    with pytest.raises(ValueError, match="factor"):
        box_downscale(px, 3, 3, 0)
    with pytest.raises(ValueError, match="RGB bytes"):
        box_downscale(px[:-1], 3, 3, 2)


def test_multimodal_plans_are_arrow_and_narrow(spark, payload_df):
    for op in (extract_features, sample_frames, resize_payload):
        plan = op(payload_df)._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan, op.__name__
        assert "BatchEvalPython" not in plan, op.__name__  # Arrow, not per-row
        assert "Exchange" not in plan, op.__name__  # narrow: no shuffle


def test_decode_stub_is_explicit_for_exotic_formats(spark):
    # WebP magic: a format this container genuinely has no decoder for
    # (PNG and JPEG both graduated to real codecs in r14)
    with pytest.raises(NotImplementedError, match="image library"):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    # a JPEG SOI prefix now routes to the real decoder — and a truncated
    # one fails LOUDLY as corrupt, not as unsupported
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0\x00\x10JFIF")


# ── pure-Python BMP / PPM codec (r13, r12 verdict #6) ────────────────────


def test_bmp_golden_fixture_decodes_exactly():
    """Hand-assembled 2x2 24-bit BMP with known pixels: rows stored
    bottom-up and BGR with 2 padding bytes per row (2*3=6 → stride 8);
    the decoder must return them top-down RGB unpadded."""
    # pixels (top-down RGB): (1,2,3) (4,5,6) / (7,8,9) (10,11,12)
    row_bottom = bytes([9, 8, 7, 12, 11, 10]) + b"\x00\x00"  # BGR + pad
    row_top = bytes([3, 2, 1, 6, 5, 4]) + b"\x00\x00"
    data = row_bottom + row_top  # bottom-up: last image row first
    off, size = 54, 54 + len(data)
    hdr = (
        b"BM" + size.to_bytes(4, "little") + b"\x00" * 4 + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little", signed=True)
        + (2).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
        + b"\x00" * 16
    )
    w, h, px = decode_image(hdr + data)
    assert (w, h) == (2, 2)
    assert px == bytes(range(1, 13))


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (5, 1), (4, 3)])
def test_bmp_roundtrip_all_padding_widths(w, h):
    """decode(encode(x)) == x for widths that hit every 4-byte row-padding
    residue (3*w mod 4 ∈ {0,1,2,3} across these cases)."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import encode_bmp

    px = bytes((7 * i + 13) % 256 for i in range(3 * w * h))
    got = decode_image(encode_bmp(px, w, h))
    assert got == (w, h, px)


def test_bmp_top_down_variant_decodes():
    """Negative height = top-down row order; the decoder must NOT flip."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import encode_bmp

    px = bytes(range(12))  # 2x2
    buf = bytearray(encode_bmp(px, 2, 2))
    buf[22:26] = (-2).to_bytes(4, "little", signed=True)
    # rows were written bottom-up by the encoder; declaring top-down means
    # the decoder reads them in stored order → vertically flipped pixels
    w, h, got = decode_image(bytes(buf))
    assert (w, h) == (2, 2)
    assert got == px[6:] + px[:6]


def test_ppm_decodes_with_header_comments():
    ppm = b"P6\n# a comment\n3 1\n# another\n255\n" + bytes(range(9))
    assert decode_image(ppm) == (3, 1, bytes(range(9)))


def test_corrupt_recognized_formats_fail_loudly():
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import encode_bmp

    with pytest.raises(ValueError, match="truncated"):
        decode_image(encode_bmp(bytes(12), 2, 2)[:-3])
    with pytest.raises(ValueError, match="unsupported BMP"):
        bad = bytearray(encode_bmp(bytes(12), 2, 2))
        bad[28:30] = (8).to_bytes(2, "little")  # 8-bit palette bmp
        decode_image(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_image(b"P6 2 2 255 " + bytes(5))
    with pytest.raises(ValueError, match="maxval"):
        decode_image(b"P6 1 1 65535 " + bytes(6))


def test_decoded_px_sum_exercises_codec_per_row(spark, payload_df):
    """The registry row's decoded_px_sum column comes from a real
    encode→decode cycle; equals the source-byte sum for every doc."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import PX_H, PX_W

    got = {r.doc_id: r.decoded_px_sum for r in extract_features(payload_df).collect()}
    for doc_id, text in ((1, "a" * 2500), (2, "xy"), (3, "b" * (FRAME_BYTES * 3))):
        raw = text.encode()
        assert got[doc_id] == sum(raw[: 3 * PX_W * PX_H]) % CHECKSUM_MOD


def test_frame_sampling_composes_with_resize(spark, image_payload_df):
    """resize → frame-sample chains inside one narrow Arrow pipeline (the
    media-preprocessing composition); frame counts follow the RESIZED
    encoded byte length."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        encode_png,
    )

    px_a = bytes((7 * i + 3) % 256 for i in range(3 * 12 * 8))
    resized_buf = resize_image(encode_png(px_a, 12, 8))
    resized = resize_payload(image_payload_df)
    frames = sample_frames(resized.select("doc_id", "payload"))
    n = frames.filter(F.col("doc_id") == 1).count()
    assert n == len(resized_buf) // FRAME_BYTES
    plan = frames._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ── RIFF/WAVE PCM codec (r13, the audio leg) ─────────────────────────────


def test_wav_roundtrip_mono_and_stereo():
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        decode_audio,
        encode_wav,
    )

    for ch in (1, 2):
        s = [(-1) ** i * (137 * i % 30000) for i in range(10 * ch)]
        assert decode_audio(encode_wav(s, 8000, ch)) == (ch, 8000, s)
    assert decode_audio(encode_wav([], 44100, 1)) == (1, 44100, [])


def test_wav_decoder_walks_unknown_chunks():
    """A LIST metadata chunk (odd length → word-aligned pad) between WAVE
    and fmt must be skipped, not break sample extraction."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        decode_audio,
        encode_wav,
    )

    w = encode_wav([1, -2, 3], 44100, 1)
    w2 = w[:12] + b"LIST" + (3).to_bytes(4, "little") + b"abc\x00" + w[12:]
    w2 = w2[:4] + (len(w2) - 8).to_bytes(4, "little") + w2[8:]
    assert decode_audio(w2) == (1, 44100, [1, -2, 3])


def test_wav_corrupt_and_exotic_failures():
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        decode_audio,
        encode_wav,
    )

    with pytest.raises(NotImplementedError, match="RIFF/WAVE"):
        decode_audio(b"OggS....")
    with pytest.raises(ValueError, match="truncated"):
        decode_audio(encode_wav([1, 2, 3], 8000, 1)[:-2])
    bad = bytearray(encode_wav([1, 2], 8000, 1))
    bad[20:22] = (3).to_bytes(2, "little")  # IEEE-float fmt tag
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_audio(bytes(bad))


def test_audio_features_match_python(spark, payload_df):
    """extract_audio_features == the byte-pair arithmetic the oracle runs,
    via the real per-row encode→decode cycle."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        extract_audio_features,
    )

    got = {r.doc_id: r for r in extract_audio_features(payload_df).collect()}
    for doc_id, text in ((1, "a" * 2500), (2, "xy"), (3, "b" * (FRAME_BYTES * 3))):
        raw = text.encode()
        n = len(raw) // 2
        energy = 0
        for i in range(n):
            v = raw[2 * i] | (raw[2 * i + 1] << 8)
            energy += abs(v - 65536 if v >= 32768 else v)
        assert got[doc_id].n_samples == n
        assert got[doc_id].duration_ms == n * 1000 // 8000
        assert got[doc_id].energy == energy


# ── pure-Python PNG codec (r14, r13 verdict #2 — the compressed format) ──


def _hand_png(px: bytes, w: int, h: int, extra_idat_split: bool = False) -> bytes:
    """INDEPENDENT minimal PNG writer (filter 0 only, assembled by hand in
    the test — not via encode_png), so the decoder is cross-checked against
    a second implementation of the container, not just its own inverse."""
    import zlib

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big") + ctype + body
            + (zlib.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    raw = b"".join(b"\x00" + px[r * 3 * w : (r + 1) * 3 * w] for r in range(h))
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    z = zlib.compress(raw)
    if extra_idat_split:
        idats = chunk(b"IDAT", z[:5]) + chunk(b"IDAT", z[5:])
    else:
        idats = chunk(b"IDAT", z)
    return sig + chunk(b"IHDR", ihdr) + idats + chunk(b"IEND", b"")


def test_png_golden_fixture_decodes_exactly():
    px = bytes(range(3 * 3 * 2))  # 3x2, known pixels
    assert decode_image(_hand_png(px, 3, 2)) == (3, 2, px)


def test_png_split_idat_chunks_concatenate():
    """The spec allows IDAT split across chunks; inflate runs over the
    CONCATENATION — a per-chunk inflate would fail on the second chunk."""
    px = bytes((11 * i + 3) % 256 for i in range(3 * 4 * 3))
    assert decode_image(_hand_png(px, 4, 3, extra_idat_split=True)) == (4, 3, px)


def test_png_roundtrip_exercises_all_five_filters():
    """encode_png cycles the scanline filter per row, so a 5-row image's
    round-trip fails unless None/Sub/Up/Average/Paeth ALL invert."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import encode_png

    for w, h in [(1, 5), (5, 5), (7, 6), (2, 11)]:
        px = bytes((13 * i + 7) % 256 for i in range(3 * w * h))
        assert decode_image(encode_png(px, w, h)) == (w, h, px), (w, h)


def test_png_ancillary_chunks_are_skipped():
    """Real PNGs carry tEXt/pHYs/... between IHDR and IDAT — the chunk
    walk must skip what it doesn't know (the WAV LIST/INFO discipline)."""
    import zlib

    px = bytes(range(3 * 2 * 2))
    buf = _hand_png(px, 2, 2)
    body = b"Comment\x00hello"
    extra = (
        len(body).to_bytes(4, "big") + b"tEXt" + body
        + (zlib.crc32(b"tEXt" + body) & 0xFFFFFFFF).to_bytes(4, "big")
    )
    # splice the ancillary chunk right after IHDR (8-byte sig + 25-byte IHDR)
    spliced = buf[:33] + extra + buf[33:]
    assert decode_image(spliced) == (2, 2, px)


def test_png_corruption_fails_loudly():
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import encode_png

    px = bytes(range(3 * 2 * 2))
    good = encode_png(px, 2, 2)
    with pytest.raises(ValueError, match="CRC mismatch"):
        bad = bytearray(good)
        bad[-5] ^= 0xFF  # flip a bit inside IEND's CRC
        decode_image(bytes(bad))
    with pytest.raises(ValueError, match="missing IDAT or IEND"):
        decode_image(good[:-8])  # IEND chunk cut to a dangling length field
    with pytest.raises(ValueError, match="truncated"):
        decode_image(good[:42])  # cut mid-IDAT body: shorter than declared
    import zlib as _z

    def _reheader(depth, color, interlace=0):
        ihdr = (
            (2).to_bytes(4, "big")
            + (2).to_bytes(4, "big")
            + bytes([depth, color, 0, 0, interlace])
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + len(ihdr).to_bytes(4, "big") + b"IHDR" + ihdr
            + (_z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF).to_bytes(4, "big")
            + good[33:]
        )

    with pytest.raises(ValueError, match="unsupported PNG variant"):
        # sub-8-bit depth stays unsupported (depth 16 graduated in r15)
        decode_image(_reheader(4, 0))
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        # 16-bit PALETTE is not a legal spec combination either
        decode_image(_reheader(16, 3))
    with pytest.raises(ValueError, match="scanline data length mismatch"):
        # a 16-bit header over 8-bit scanline data is now CORRUPT, not
        # unsupported: the declared stride no longer matches the stream
        decode_image(_reheader(16, 2))
    with pytest.raises(ValueError, match="inflate failed"):
        # valid CRC, garbage deflate stream
        import zlib as _z

        sig_ihdr = good[:33]
        body = b"\x00not-deflate"
        idat = (
            len(body).to_bytes(4, "big") + b"IDAT" + body
            + (_z.crc32(b"IDAT" + body) & 0xFFFFFFFF).to_bytes(4, "big")
        )
        iend = (0).to_bytes(4, "big") + b"IEND" + (_z.crc32(b"IEND") & 0xFFFFFFFF).to_bytes(4, "big")
        decode_image(sig_ihdr + idat + iend)


def _hand_png_typed(scanlines: bytes, w: int, h: int, color: int, bpp: int,
                    plte: bytes | None = None) -> bytes:
    """Hand-assembled PNG of any 8-bit color type (filter 0 rows)."""
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big") + ctype + body
            + (zlib.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    stride = bpp * w
    raw = b"".join(
        b"\x00" + scanlines[r * stride : (r + 1) * stride] for r in range(h)
    )
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, color, 0, 0, 0])
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_png_grayscale_and_alpha_color_types_normalize_to_rgb():
    # color 0: gray replicates to RGB
    buf = _hand_png_typed(bytes([10, 200, 30, 40]), 2, 2, color=0, bpp=1)
    assert decode_image(buf) == (
        2, 2, bytes([10, 10, 10, 200, 200, 200, 30, 30, 30, 40, 40, 40]),
    )
    # color 4: gray+alpha — alpha drops, gray replicates
    ga = bytes([10, 255, 200, 0, 30, 128, 40, 7])
    buf = _hand_png_typed(ga, 2, 2, color=4, bpp=2)
    assert decode_image(buf) == (
        2, 2, bytes([10, 10, 10, 200, 200, 200, 30, 30, 30, 40, 40, 40]),
    )
    # color 6: RGBA — alpha drops
    rgba = bytes([1, 2, 3, 255, 4, 5, 6, 0])
    buf = _hand_png_typed(rgba, 2, 1, color=6, bpp=4)
    assert decode_image(buf) == (2, 1, bytes([1, 2, 3, 4, 5, 6]))


def test_png_palette_color_type_and_errors():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red green blue
    buf = _hand_png_typed(bytes([0, 2, 1, 1]), 2, 2, color=3, bpp=1, plte=plte)
    assert decode_image(buf) == (
        2, 2, bytes([255, 0, 0, 0, 0, 255, 0, 255, 0, 0, 255, 0]),
    )
    with pytest.raises(ValueError, match="palette index 3 out of range"):
        decode_image(
            _hand_png_typed(bytes([0, 3, 1, 1]), 2, 2, color=3, bpp=1, plte=plte)
        )
    with pytest.raises(ValueError, match="without a PLTE"):
        decode_image(_hand_png_typed(bytes([0, 1, 1, 0]), 2, 2, color=3, bpp=1))
    with pytest.raises(ValueError, match="PLTE length"):
        decode_image(
            _hand_png_typed(bytes([0, 0, 0, 0]), 2, 2, color=3, bpp=1,
                            plte=bytes([1, 2]))
        )


def test_png_filters_apply_at_color_type_pixel_width():
    """Filter 1 (Sub) must subtract at the color type's bpp, not RGB's 3:
    a gray+alpha image with a Sub row checks the bpp plumbing."""
    import zlib

    def chunk(ctype, body):
        return (
            len(body).to_bytes(4, "big") + ctype + body
            + (zlib.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    # target reconstructed scanline (gray+alpha, w=3): g,a pairs
    recon = bytes([50, 255, 60, 255, 70, 255])
    # filter 1 encoding: first pixel raw, later = diff vs pixel 2 back
    enc = bytes([recon[0], recon[1]]) + bytes(
        (recon[i] - recon[i - 2]) & 0xFF for i in range(2, 6)
    )
    raw = b"\x01" + enc
    ihdr = (3).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes([8, 4, 0, 0, 0])
    buf = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    assert decode_image(buf) == (
        3, 1, bytes([50, 50, 50, 60, 60, 60, 70, 70, 70]),
    )


def test_png_px_sum_exercises_codec_per_row(spark, payload_df):
    """The registry row's png_px_sum column comes from a real compressed
    encode→decode cycle; equals the source-byte sum for every doc."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import PNG_H, PNG_W

    got = {r.doc_id: r.png_px_sum for r in extract_features(payload_df).collect()}
    for doc_id, text in ((1, "a" * 2500), (2, "xy"), (3, "b" * (FRAME_BYTES * 3))):
        raw = text.encode()
        assert got[doc_id] == sum(raw[: 3 * PNG_W * PNG_H]) % CHECKSUM_MOD


def test_gif_golden_fixture_decodes_exactly():
    """Hand-assembled 2x1 GIF with a 2-color global table and a hand-packed
    LZW stream: mcs=2 → codes (clear=4, eoi=5) at 3 bits.  Stream: clear(4),
    px0(1), px1(0), eoi(5) = 100 110 000 101 LSB-first → 0x34 0x29 ... the
    decoder must map indices through the palette in stored order."""
    # palette: idx0=(10,20,30), idx1=(40,50,60); pixels: idx1 then idx0
    pal = bytes([10, 20, 30, 40, 50, 60]) + b"\x00" * 6  # padded to 4 entries
    # LZW codes at width 3: 4, 1, 0, 5 → bits LSB-first:
    # 4=100, 1=001, 0=000, 5=101 → byte0 = 100 | 001<<3 | (000&11)<<6 = 0x0c
    # remaining: 0>>2=0 (1 bit) | 101<<1 = 1010_ → 0x0a
    lzw = bytes([0x0C, 0x0A])
    buf = (
        b"GIF89a"
        + (2).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + bytes([0x80 | 0x70 | 0x01]) + b"\x00\x00"  # GCT, 4 entries
        + pal
        + b"\x2c" + b"\x00\x00\x00\x00"
        + (2).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + b"\x00"          # no local table
        + bytes([2])       # LZW min code size
        + bytes([len(lzw)]) + lzw + b"\x00"
        + b"\x3b"
    )
    assert decode_image(buf) == (2, 1, bytes([40, 50, 60, 10, 20, 30]))


def test_gif_multiframe_animation_roundtrip():
    """4 random-ish frames whose color union overflows 256 → the encoder
    must fall back to per-frame LOCAL color tables; the decoder returns
    every frame, in order, through the NETSCAPE + GCE extension blocks."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        decode_gif,
        encode_gif,
    )

    frames = [
        bytes((37 * i + 11 * j + 5) % 256 for i in range(3 * 16 * 16))
        for j in range(4)
    ]
    gif = encode_gif(frames, 16, 16)
    assert b"NETSCAPE2.0" in gif
    assert decode_gif(gif) == (16, 16, frames)


def test_gif_single_frame_uses_global_table():
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        decode_gif,
        encode_gif,
    )

    px = bytes((7 * i + 3) % 256 for i in range(3 * 4 * 3))
    gif = encode_gif([px], 4, 3)
    assert gif[10] & 0x80  # global color table flag set
    assert b"NETSCAPE2.0" not in gif  # single frame: no loop extension
    assert decode_gif(gif) == (4, 3, [px])
    assert decode_image(gif) == (4, 3, px)  # decode_image → first frame


def test_gif_corruption_fails_loudly():
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        decode_gif,
        encode_gif,
    )

    px = bytes(range(3 * 4 * 2))
    good = encode_gif([px], 4, 2)
    with pytest.raises(ValueError, match="no trailer"):
        decode_gif(good[:-1])
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(good[:16])
    with pytest.raises(ValueError, match="partial-canvas"):
        bad = bytearray(good)
        i = bad.index(0x2C, 13)  # image descriptor introducer
        bad[i + 1] = 1  # left offset 1
        decode_gif(bytes(bad))
    # flipping the interlace flag on sequentially-stored rows no longer
    # raises (r15 decodes interlaced GIFs) — it yields exactly the
    # de-interlace row permutation applied to the stored data
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        _gif_interlace_rows,
    )

    flipped = bytearray(good)
    i = flipped.index(0x2C, 13)
    flipped[i + 9] |= 0x40
    w0, h0, frames0 = decode_gif(good)
    _, _, frames1 = decode_gif(bytes(flipped))
    stride = 3 * w0
    for f0, f1 in zip(frames0, frames1):
        for stored, r in enumerate(_gif_interlace_rows(h0)):
            assert (
                f1[stride * r : stride * (r + 1)]
                == f0[stride * stored : stride * (stored + 1)]
            )
    # a sub-block that declares more bytes than the file holds
    with pytest.raises(ValueError, match="truncated"):
        bad = bytearray(good)
        bad[-2] = 255  # the 0x00 block terminator becomes a 255-byte claim
        decode_gif(bytes(bad))


def test_gif_px_sum_exercises_codec_per_row(spark, payload_df):
    """The registry row's gif_px_sum column comes from a real LZW
    encode→decode cycle; equals the source-byte sum for every doc."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import GIF_H, GIF_W

    got = {r.doc_id: r.gif_px_sum for r in extract_features(payload_df).collect()}
    for doc_id, text in ((1, "a" * 2500), (2, "xy"), (3, "b" * (FRAME_BYTES * 3))):
        raw = text.encode()
        assert got[doc_id] == sum(raw[: 3 * GIF_W * GIF_H]) % CHECKSUM_MOD


# ── dHash: perceptual hashing as pure Catalyst expressions (r14) ─────────


def test_dhash_matches_python_reference(spark):
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        dhash_reference,
        with_dhash,
    )

    payloads = [
        b"hello world this is a test payload " * 30,
        bytes(range(256)) * 4,
        b"",
        b"\x01",
        b"short",
        b"dup" * 400,
        b"dup" * 400,
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "doc_id long, payload binary"
    )
    got = {r.doc_id: (r.dhash_hi, r.dhash_lo) for r in with_dhash(df).collect()}
    for i, p in enumerate(payloads):
        assert got[i] == dhash_reference(p), f"payload {i}"
    assert got[5] == got[6]  # identical payloads → identical hash
    # the whole chain is JVM expressions — no Python eval nodes
    plan = with_dhash(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_dhash_near_pairs_on_image_like_fixture(spark):
    """Banded near-pair search on payloads with full-byte-range variance
    (the image case): a noisy copy lands within Hamming 6 of its source
    while unrelated images stay far — and the bands genuinely
    distribute (no all-pairs funnel)."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        DHASH_BYTES,
        dhash_near_pairs,
        with_dhash,
    )

    import random

    rng = random.Random(7)
    base = bytes(rng.randrange(256) for _ in range(DHASH_BYTES))
    noisy = bytearray(base)
    for _ in range(5):  # sparse single-byte perturbations
        noisy[rng.randrange(DHASH_BYTES)] ^= 0x04
    others = [
        bytes(rng.randrange(256) for _ in range(DHASH_BYTES)) for _ in range(20)
    ]
    rows = [(0, base), (1, bytes(noisy))] + [
        (i + 2, p) for i, p in enumerate(others)
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dhash_near_pairs(with_dhash(df), max_hamming=6).collect()
    }
    assert (0, 1) in pairs, "noisy copy must band-join to its source"
    # unrelated random images must not flood the result
    assert len(pairs) <= 3, pairs


def test_dhash_registry_row_groups_exact_dups(spark):
    # RETIRED r16 (slot funds the doc-ingest gate): the pair keeps running
    # here and in the edge batteries
    from kafka_streams_dead_letter_publishing_spark.plans import QUERIES, RETIRED

    q = QUERIES.get("docs_image_dhash") or RETIRED["docs_image_dhash"]
    rows = q.spark(spark, "/root/testdata/sf0.001").collect()
    assert rows and all(r.n_same_hash >= 1 for r in rows)
    by_hash: dict = {}
    for r in rows:
        by_hash.setdefault((r.dhash_hi, r.dhash_lo), []).append(r.doc_id)
    for (hi, lo), ids in by_hash.items():
        n = next(r.n_same_hash for r in rows if r.doc_id == ids[0])
        assert n == len(ids)


def _ref_lzw_decode(data: bytes, mcs: int) -> bytes:
    """INDEPENDENT GIF-LZW reference decoder (the giflib/spec convention,
    written from the spec in this test file — not the module's inverse):
    LSB-first reader, LATE width change (widen when the next free code
    reaches 2^width).  Pins the r14 fix: the codec previously used the
    TIFF-style EARLY change, which round-trips against itself but is
    unreadable by every real GIF decoder."""
    pos = acc = nbits = 0

    def get(width):
        nonlocal pos, acc, nbits
        while nbits < width:
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev = None
    while True:
        c = get(width)
        if c == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if c == eoi:
            return bytes(out)
        if prev is None:
            prev = table[c]
            out += prev
            continue
        entry = table[c] if c < len(table) else prev + prev[:1]
        out += entry
        if len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def test_lzw_encoder_readable_by_independent_spec_decoder():
    import random

    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    rng = random.Random(7)
    cases = [
        # the width-boundary crosser that exposed the early-change bug:
        # many distinct symbols, table crosses 512/1024/2048
        bytes(rng.randrange(200) for _ in range(4096)),
        # dictionary-reset path (tiny alphabet, long run → 4096 resets)
        bytes(rng.randrange(4) for _ in range(9000)),
        b"",
        b"\x00",
        bytes(range(4)) * 700,
    ]
    for i, data in enumerate(cases):
        mcs = 8 if i == 0 else max(2, max(data, default=3).bit_length())
        enc = _lzw_encode(data, mcs)
        assert _ref_lzw_decode(enc, mcs) == data, f"case {i}: spec decoder"
        assert _lzw_decode(enc, mcs) == data, f"case {i}: own decoder"


# ── AVI/MJPEG container codec (r15, the video leg) ───────────────────────


def _two_frame_avi():
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        _solid_jpeg,
    )

    return encode_avi([_solid_jpeg(10, 200, 30), _solid_jpeg(255, 0, 128)], 16, 16)


def test_avi_roundtrip_preserves_frame_order_and_dims():
    from kafka_streams_dead_letter_publishing_spark.functions.jpeg import (
        solid_roundtrip_rgb,
    )
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        decode_avi,
    )

    w, h, frames = decode_avi(_two_frame_avi())
    assert (w, h, len(frames)) == (16, 16, 2)
    assert frames[0] == bytes(solid_roundtrip_rgb(10, 200, 30, JPEG_QUALITY)) * 256
    assert frames[1] == bytes(solid_roundtrip_rgb(255, 0, 128, JPEG_QUALITY)) * 256


def test_avi_structure_is_a_real_riff_container():
    """The writer emits genuine AVI 1.0 structure: fourccs in order, a
    word-aligned movi list, and an idx1 whose offsets point at each
    '00dc' chunk relative to the movi fourcc (the classic convention)."""
    buf = _two_frame_avi()
    assert buf[:4] == b"RIFF" and buf[8:12] == b"AVI "
    assert int.from_bytes(buf[4:8], "little") == len(buf) - 8
    for fourcc in (b"hdrl", b"avih", b"strl", b"strh", b"strf", b"movi",
                   b"00dc", b"idx1", b"vids", b"MJPG"):
        assert fourcc in buf, fourcc
    movi_at = buf.index(b"movi")
    idx_at = buf.index(b"idx1") + 8
    first_off = int.from_bytes(buf[idx_at + 8 : idx_at + 12], "little")
    assert buf[movi_at + first_off : movi_at + first_off + 4] == b"00dc"
    n_entries = int.from_bytes(buf[idx_at - 4 : idx_at], "little") // 16
    assert n_entries == 2


def test_avi_skips_unknown_chunks_like_a_real_player():
    """A JUNK chunk spliced between hdrl and movi must not derail the
    walk (real muxers pad with JUNK for alignment)."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        decode_avi,
    )

    buf = bytearray(_two_frame_avi())
    movi_list_at = buf.index(b"movi") - 8  # back to the LIST header
    junk = b"JUNK" + (6).to_bytes(4, "little") + b"\x00" * 6
    patched = bytes(buf[:movi_list_at]) + junk + bytes(buf[movi_list_at:])
    patched = (
        patched[:4]
        + (len(patched) - 8).to_bytes(4, "little")
        + patched[8:]
    )
    w, h, frames = decode_avi(patched)
    assert (w, h, len(frames)) == (16, 16, 2)


def test_avi_corruption_fails_loudly():
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        _solid_jpeg,
        decode_avi,
    )

    good = _two_frame_avi()
    # truncated file: declared RIFF size exceeds the buffer
    with pytest.raises(ValueError, match="truncated"):
        decode_avi(good[:-20])
    # a non-AVI RIFF (WAV) keeps the stub path
    with pytest.raises(NotImplementedError, match="video"):
        decode_avi(b"RIFF" + (4).to_bytes(4, "little") + b"WAVE")
    # frame dims disagreeing with the header are rejected
    bad_dims = encode_avi([_solid_jpeg(1, 2, 3)], 8, 8)
    with pytest.raises(ValueError, match="header declares"):
        decode_avi(bad_dims)
    with pytest.raises(ValueError, match="at least one frame"):
        encode_avi([], 16, 16)


def test_avi_odd_length_frames_stay_word_aligned():
    """JPEG frames are arbitrary-length; an odd one forces the RIFF pad
    byte and every later chunk must still parse."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        _solid_jpeg,
        decode_avi,
    )

    f1 = _solid_jpeg(9, 9, 9)
    odd = f1 if len(f1) % 2 else f1 + b""  # parity probe below handles both
    frames_in = [odd, _solid_jpeg(10, 200, 30), odd]
    w, h, frames = decode_avi(encode_avi(frames_in, 16, 16))
    assert len(frames) == 3
    assert frames[0] == frames[2]


def test_resized_px_sum_matches_box_average_of_source_bytes():
    """The registry gate's resize column: full PNG→downscale→BMP chain
    equals the direct box average over source bytes (what the DuckDB
    oracle replays)."""
    import random

    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        RESIZE_SRC_H,
        RESIZE_SRC_W,
        _resized_px_sum,
    )

    rng = random.Random(11)
    need = 3 * RESIZE_SRC_W * RESIZE_SRC_H
    for _ in range(25):
        p = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 2 * need)))
        px = p[:need].ljust(need, b"\x00")
        _, _, small = box_downscale(px, RESIZE_SRC_W, RESIZE_SRC_H, RESIZE_FACTOR)
        assert _resized_px_sum(p) == sum(small) % CHECKSUM_MOD


# ── PNG depth-16 + Adam7 interlace (r15) ─────────────────────────────────


def test_png_adam7_and_depth16_roundtrip_every_edge_size():
    """Adam7 de-interlace and 16-bit sample reduction across sizes that
    exercise empty passes (w or h < 8), single-pixel images, and the
    full 7-pass grid; 16-bit low bytes are noise the MSB reduction must
    ignore."""
    import random

    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        encode_png,
    )

    rng = random.Random(5)
    for w, h in [(1, 1), (3, 2), (5, 5), (8, 8), (9, 10), (16, 13), (7, 1), (1, 9)]:
        px = bytes(rng.randrange(256) for _ in range(3 * w * h))
        assert decode_image(encode_png(px, w, h, interlace=1)) == (w, h, px)
        px16 = b"".join(
            bytes([px[i], rng.randrange(256)]) for i in range(3 * w * h)
        )
        assert decode_image(encode_png(px16, w, h, depth=16)) == (w, h, px)
        assert decode_image(
            encode_png(px16, w, h, depth=16, interlace=1)
        ) == (w, h, px)


def test_png_adam7_golden_pass_structure():
    """The interlaced stream is seven independently-filtered sub-images:
    decode an 8x8 where each pixel encodes its own (x, y), so any pass
    misplacement scrambles a known coordinate."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        encode_png,
    )

    px = bytes(
        v
        for y in range(8)
        for x in range(8)
        for v in (x * 16 + y, x, y)
    )
    got = decode_image(encode_png(px, 8, 8, interlace=1))
    assert got == (8, 8, px)
    # the interlaced file is genuinely different bytes on the wire
    assert encode_png(px, 8, 8, interlace=1) != encode_png(px, 8, 8)


def test_png_adam7_truncated_pass_fails_loudly():
    import zlib as _z

    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        encode_png,
    )

    px = bytes(range(64 * 3))[: 3 * 8 * 8]
    good = encode_png(px, 8, 8, interlace=1)
    # rebuild IDAT with the last pass's bytes cut off (re-deflated so the
    # inflate itself succeeds — the LENGTH walk must catch it)
    sig_ihdr = good[:33]
    idat_len = int.from_bytes(good[33:37], "big")
    raw = _z.decompress(good[41 : 41 + idat_len])
    body = _z.compress(raw[:-10])
    idat = (
        len(body).to_bytes(4, "big") + b"IDAT" + body
        + (_z.crc32(b"IDAT" + body) & 0xFFFFFFFF).to_bytes(4, "big")
    )
    iend = b"\x00\x00\x00\x00IEND" + (_z.crc32(b"IEND") & 0xFFFFFFFF).to_bytes(4, "big")
    with pytest.raises(ValueError, match="scanline data length mismatch"):
        decode_image(sig_ihdr + idat + iend)


def test_png_depth16_gray_hand_assembled_golden():
    """Hand-assembled 16-bit GRAYSCALE PNG (color 0, depth 16, filter 0
    rows): the decoder must reduce each big-endian sample to its MSB and
    replicate to RGB — built without the encoder, so the 16-bit
    non-RGB path is pinned independently."""
    import zlib as _z

    w, h = 3, 2
    samples = [0x0102, 0x8081, 0xFFFE, 0x0000, 0x7FFF, 0xABCD]
    raw = bytearray()
    for r in range(h):
        raw.append(0)  # filter None
        for c in range(w):
            raw += samples[r * w + c].to_bytes(2, "big")
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([16, 0, 0, 0, 0])
    )
    def chunk(t, b):
        return (
            len(b).to_bytes(4, "big") + t + b
            + (_z.crc32(t + b) & 0xFFFFFFFF).to_bytes(4, "big")
        )
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _z.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    got = decode_image(buf)
    expect = bytes(v for s in samples for v in ((s >> 8),) * 3)
    assert got == (w, h, expect)


def test_gif_interlace_roundtrip_and_golden_permutation():
    """GIF four-pass interlace (r15): encode(interlace=True) round-trips
    across heights that exercise every pass-boundary shape, the wire
    bytes genuinely differ, and the row order matches the spec's
    four-pass schedule computed independently here."""
    import random

    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        _gif_interlace_rows,
        decode_gif,
        encode_gif,
    )

    rng = random.Random(8)
    for w, h in [(6, 5), (3, 1), (1, 1), (8, 8), (5, 11), (4, 2)]:
        frames = [bytes(rng.randrange(256) for _ in range(3 * w * h)) for _ in range(2)]
        buf_i = encode_gif(frames, w, h, interlace=True)
        buf_p = encode_gif(frames, w, h)
        assert decode_gif(buf_i) == (w, h, frames)
        if h > 1:
            assert buf_i != buf_p  # the interlaced file differs on the wire
    # independent schedule transcription (spec appendix E)
    def ref_rows(height):
        out = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            out.extend(range(start, height, step))
        return out

    for h in (1, 2, 3, 5, 8, 9, 16, 17):
        got = _gif_interlace_rows(h)
        assert got == ref_rows(h)
        assert sorted(got) == list(range(h))  # a permutation, no row lost


def test_sample_avi_frames_uses_the_index_and_decodes_sparsely():
    """idx1-driven sparse decode: selected frames equal the sequential
    walk's, non-selected frames are NEVER decoded (measured via the
    decode memo's miss count), and a lying index raises."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        _decode_jpeg_memo,
        _solid_jpeg,
        decode_avi,
        sample_avi_frames,
    )

    colors = [(i * 23 % 256, i * 57 % 256, i * 91 % 256) for i in range(9)]
    avi = encode_avi([_solid_jpeg(*c) for c in colors], 16, 16)
    w, h, full = decode_avi(avi)
    _decode_jpeg_memo.cache_clear()
    _solid_jpeg.cache_clear()
    sw, sh, sparse = sample_avi_frames(avi, every=3)
    assert (sw, sh) == (w, h)
    assert [i for i, _ in sparse] == [0, 3, 6]
    for i, px in sparse:
        assert px == full[i]
    # only the selected frames hit the decoder
    assert _decode_jpeg_memo.cache_info().misses == 3
    # a lying index (offset shifted by 2) is rejected, not decoded
    bad = bytearray(avi)
    idx_at = bad.index(b"idx1") + 8
    off = int.from_bytes(bad[idx_at + 8 : idx_at + 12], "little")
    bad[idx_at + 8 : idx_at + 12] = (off + 2).to_bytes(4, "little")
    with pytest.raises(ValueError, match="does not point at its chunk"):
        sample_avi_frames(bytes(bad), every=1)
    with pytest.raises(ValueError, match="every"):
        sample_avi_frames(avi, every=0)


def test_avi_rec_lists_and_multistream_index():
    """AVI 1.0 interleaving (r15 advice): video chunks wrapped in 'rec '
    record LISTs with co-timed audio chunks must still decode in order,
    and idx1-driven sampling must stride over VIDEO entries only —
    frame_idx means "k-th video frame", never a raw interleaving-dependent
    index ordinal."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        _riff_chunk,
        _solid_jpeg,
        decode_avi,
        encode_avi,
        sample_avi_frames,
    )

    colors = [(i * 31 % 256, i * 67 % 256, i * 5 % 256) for i in range(6)]
    frames = [_solid_jpeg(*c) for c in colors]
    flat = encode_avi(frames, 16, 16)
    w, h, expect = decode_avi(flat)
    assert (w, h, len(expect)) == (16, 16, 6)

    # reassemble the container by hand: each frame rides inside a
    # 'LIST rec ' with a co-timed '01wb' audio chunk, and idx1 carries
    # entries for BOTH streams in interleaving order
    le32 = lambda v: int(v).to_bytes(4, "little")  # noqa: E731
    hlen = int.from_bytes(flat[16:20], "little")
    hdrl = bytearray(flat[12 : 12 + 8 + hlen + (hlen & 1)])
    hdrl[8 + 4 + 8 + 24 : 8 + 4 + 8 + 28] = le32(2)  # avih dwStreams = 2
    movi_body = bytearray()
    idx = bytearray()
    for f in frames:
        vid = _riff_chunk(b"00dc", f)
        aud = _riff_chunk(b"01wb", b"\x11\x22\x33")
        at = 4 + len(movi_body) + 8 + 4  # movi-rel pos of the vid fourcc
        idx += b"00dc" + le32(0x10) + le32(at) + le32(len(f))
        idx += b"01wb" + le32(0) + le32(at + len(vid)) + le32(3)
        movi_body += _riff_chunk(b"LIST", b"rec " + vid + aud)
    movi = _riff_chunk(b"LIST", b"movi" + bytes(movi_body))
    body = b"AVI " + bytes(hdrl) + movi + _riff_chunk(b"idx1", bytes(idx))
    avi = b"RIFF" + le32(len(body)) + body

    # sequential walk recurses into the rec lists, skips the audio chunks
    assert decode_avi(avi) == (16, 16, expect)
    # index-driven sampling strides over the 6 VIDEO entries (not the 12
    # interleaved index rows): every=2 picks video frames 0, 2, 4
    sw, sh, sparse = sample_avi_frames(avi, every=2)
    assert (sw, sh) == (16, 16)
    assert [(i, px) for i, px in sparse] == [(k, expect[k]) for k in (0, 2, 4)]
    _, _, full = sample_avi_frames(avi, every=1)
    assert [(i, px) for i, px in full] == list(enumerate(expect))


def test_avi_nested_rec_lists_raise_value_error_not_recursion_error():
    """'rec ' record LISTs legally never nest (AVI 1.0 interleaving is one
    level deep), so a crafted deep nest must hit the corrupt-input
    ValueError contract instead of blowing the Python stack (r16 advice:
    ~1000 nested rec lists in ~12 KB turned the contract into an uncaught
    RecursionError)."""
    from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
        _riff_chunk,
        _solid_jpeg,
        decode_avi,
        encode_avi,
    )

    frames = [_solid_jpeg(10, 20, 30)]
    flat = encode_avi(frames, 16, 16)
    le32 = lambda v: int(v).to_bytes(4, "little")  # noqa: E731
    hlen = int.from_bytes(flat[16:20], "little")
    hdrl = flat[12 : 12 + 8 + hlen + (hlen & 1)]
    wrapped = _riff_chunk(b"00dc", frames[0])
    for _ in range(1000):
        wrapped = _riff_chunk(b"LIST", b"rec " + wrapped)
    movi = _riff_chunk(b"LIST", b"movi" + wrapped)
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + le32(len(body)) + body
    with pytest.raises(ValueError, match="rec"):
        decode_avi(avi)
    # ONE level of rec wrapping (the legal AVI 1.0 shape) still decodes
    legal_movi = _riff_chunk(
        b"LIST", b"movi" + _riff_chunk(b"LIST", b"rec " + _riff_chunk(b"00dc", frames[0]))
    )
    legal_body = b"AVI " + hdrl + legal_movi
    legal = b"RIFF" + le32(len(legal_body)) + legal_body
    w, h, px = decode_avi(legal)
    assert (w, h, len(px)) == (16, 16, 1)
