"""Baseline JPEG codec (functions/jpeg.py): hand-assembled DC-only
golden streams (decoder checked against BYTES built in this file, not
against the encoder), solid-color closed-form parity, smooth-image
round-trip error bounds, restart markers, odd dimensions, corrupt-file
failures, and the hypothesis fuzz."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_dead_letter_publishing_spark.functions.jpeg import (
    CHR_QUANT_BASE,
    LUM_QUANT_BASE,
    decode_jpeg,
    encode_jpeg,
    quant_table,
    solid_roundtrip_rgb,
)
from kafka_streams_dead_letter_publishing_spark.functions.multimodal import (
    CHECKSUM_MOD,
    JPEG_H,
    JPEG_QUALITY,
    JPEG_W,
    _jpeg_px_sum,
    decode_image,
)

# ── hand-assembled DC-only streams (decoder golden, encoder-free) ────────
# Tiny custom Huffman tables: DC = eight 3-bit codes for categories 0..7
# (canonical: 000..111), AC = one 2-bit code 00 for EOB.  The decoder
# builds its tables from these DHT bytes, so nothing here depends on the
# module's Annex K transcription or its encoder.

_DC_BITS = bytes([0, 0, 8] + [0] * 13)
_DC_VALS = bytes(range(8))
_AC_BITS = bytes([0, 1] + [0] * 14)
_AC_VALS = bytes([0x00])


class _TestBits:
    def __init__(self):
        self.bits = []

    def put(self, code, size):
        for i in range(size - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self):
        bits = self.bits + [1] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for b in bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        return bytes(out)


def _seg(tag, body):
    return bytes([0xFF, tag]) + (len(body) + 2).to_bytes(2, "big") + body


def _dc_only_jpeg(width, height, comps, dcs, q=16):
    """Assemble a baseline JPEG byte-by-byte: one DQT (all entries q),
    the tiny test Huffman tables, SOF0 with the given (id, h, v)
    component layout, one interleaved scan where every block of
    component i carries DC value dcs[i] (first block codes the value,
    later blocks code diff 0)."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, b"\x00" + bytes([q] * 64))
    out += _seg(0xC4, b"\x00" + _DC_BITS + _DC_VALS)
    out += _seg(0xC4, b"\x10" + _AC_BITS + _AC_VALS)
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for cid, ch, cv in comps:
        sof += bytes([cid, (ch << 4) | cv, 0])
    out += _seg(0xC0, sof)
    sos = bytes([len(comps)])
    for cid, _, _ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus = ((width + 8 * hmax - 1) // (8 * hmax)) * (
        (height + 8 * vmax - 1) // (8 * vmax)
    )
    bw = _TestBits()
    first = [True] * len(comps)
    for _ in range(mcus):
        for i, (_, ch, cv) in enumerate(comps):
            for _ in range(ch * cv):
                diff = dcs[i] if first[i] else 0
                first[i] = False
                size = abs(diff).bit_length()
                bw.put(size, 3)  # DC category, 3-bit code == category
                if size:
                    bw.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
                bw.put(0, 2)  # EOB
    out += bw.tobytes()
    out += b"\xff\xd9"
    return bytes(out)


def _dc_pixel(dc, q):
    """Hand formula: clamp(128 + round_shift((dc*q) << 2, 5))."""
    x = ((dc * q) << 2) + 16
    v = 128 + (x >> 5)
    return max(0, min(255, v))


def _inv_color(y, cb, cr):
    """Independent transcription of the fixed-point inverse transform."""

    def fdiv(m):
        return m >> 16  # python floor shift

    cl = lambda v: max(0, min(255, v))  # noqa: E731
    r = cl(y + fdiv(91881 * (cr - 128) + 32768))
    g = cl(y + fdiv(-22554 * (cb - 128) - 46802 * (cr - 128) + 32768))
    b = cl(y + fdiv(116130 * (cb - 128) + 32768))
    return r, g, b


def test_golden_grayscale_dc_only():
    buf = _dc_only_jpeg(8, 8, [(1, 1, 1)], [12], q=16)
    w, h, px = decode_jpeg(buf)
    assert (w, h) == (8, 8)
    v = _dc_pixel(12, 16)
    assert v == 152  # hand-walked: 128 + (12*16*4 + 16) >> 5 = 128 + 24
    assert px == bytes([v, v, v]) * 64


def test_golden_negative_dc_and_444():
    buf = _dc_only_jpeg(8, 8, [(1, 1, 1), (2, 1, 1), (3, 1, 1)], [-9, 4, -3], q=10)
    w, h, px = decode_jpeg(buf)
    y, cb, cr = _dc_pixel(-9, 10), _dc_pixel(4, 10), _dc_pixel(-3, 10)
    exp = _inv_color(y, cb, cr)
    assert (w, h) == (8, 8)
    assert set(
        (px[i], px[i + 1], px[i + 2]) for i in range(0, len(px), 3)
    ) == {exp}


@pytest.mark.parametrize(
    "samp,dims",
    [((2, 2), (16, 16)), ((2, 1), (16, 8)), ((1, 2), (8, 16))],
)
def test_golden_subsampled_layouts(samp, dims):
    """4:2:0, 4:2:2 and the transposed variant decode through the
    generic MCU walk + replication upsampling."""
    comps = [(1, samp[0], samp[1]), (2, 1, 1), (3, 1, 1)]
    buf = _dc_only_jpeg(dims[0], dims[1], comps, [7, -5, 6], q=16)
    w, h, px = decode_jpeg(buf)
    exp = _inv_color(_dc_pixel(7, 16), _dc_pixel(-5, 16), _dc_pixel(6, 16))
    assert (w, h) == dims
    assert set(
        (px[i], px[i + 1], px[i + 2]) for i in range(0, len(px), 3)
    ) == {exp}


# ── encoder↔decoder round trips ──────────────────────────────────────────


def _smooth(w, h):
    out = bytearray()
    for y in range(h):
        for x in range(w):
            out += bytes([100 + 3 * x, 80 + 2 * y, 60 + x + y])
    return bytes(out)


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("quality", [75, 95])
def test_smooth_roundtrip_error_bound(sub, quality):
    w, h = 32, 32
    pix = _smooth(w, h)
    got_w, got_h, out = decode_jpeg(encode_jpeg(pix, w, h, quality, sub))
    assert (got_w, got_h) == (w, h)
    err = max(abs(a - b) for a, b in zip(pix, out))
    assert err <= 8, f"smooth-image max error {err} too large for q={quality}"


def test_odd_dimensions_crop():
    w, h = 21, 13  # not multiples of any MCU size
    pix = _smooth(w, h)
    for sub in ("444", "420"):
        got_w, got_h, out = decode_jpeg(encode_jpeg(pix, w, h, 95, sub))
        assert (got_w, got_h) == (w, h)
        assert len(out) == 3 * w * h
        err = max(abs(a - b) for a, b in zip(pix, out))
        assert err <= 12  # edge replication keeps padding from bleeding


def test_restart_markers_roundtrip_and_wrong_marker_raises():
    w, h = 24, 17
    pix = _smooth(w, h)
    buf = encode_jpeg(pix, w, h, 95, "444", restart_interval=2)
    assert b"\xff\xd0" in buf  # RST0 actually emitted
    _, _, out = decode_jpeg(buf)
    assert max(abs(a - b) for a, b in zip(pix, out)) <= 8
    # corrupt the first restart marker's index: RST0 -> RST5
    bad = buf.replace(b"\xff\xd0", b"\xff\xd5", 1)
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(bad)


def test_solid_closed_form_sweep():
    for rgb in [(0, 0, 0), (255, 255, 255), (255, 0, 0), (1, 2, 3), (17, 200, 91)]:
        for sub in ("420", "444"):
            buf = encode_jpeg(bytes(rgb) * 256, 16, 16, JPEG_QUALITY, sub)
            _, _, px = decode_jpeg(buf)
            exp = solid_roundtrip_rgb(*rgb, JPEG_QUALITY)
            assert set(
                (px[i], px[i + 1], px[i + 2]) for i in range(0, len(px), 3)
            ) == {exp}


# ── quality scaling ──────────────────────────────────────────────────────


def test_quant_table_scaling_and_bounds():
    assert quant_table(LUM_QUANT_BASE, 50) == list(LUM_QUANT_BASE)
    assert all(v == 1 for v in quant_table(LUM_QUANT_BASE, 100))
    assert all(1 <= v <= 255 for v in quant_table(CHR_QUANT_BASE, 1))
    with pytest.raises(ValueError, match="quality"):
        quant_table(LUM_QUANT_BASE, 0)
    with pytest.raises(ValueError, match="quality"):
        quant_table(LUM_QUANT_BASE, 101)


# ── corrupt / unsupported inputs fail loudly ─────────────────────────────


def test_corrupt_inputs_raise():
    good = encode_jpeg(b"\x10\x20\x30" * 64, 8, 8, 90, "444")
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00" + good)
    with pytest.raises(ValueError, match="truncated|segment length"):
        decode_jpeg(good[:40])  # inside the marker segments
    with pytest.raises(ValueError, match="truncated|marker"):
        decode_jpeg(good[:-12])  # inside the entropy-coded data
    # progressive SOF2 refused
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(prog)
    with pytest.raises(ValueError):
        encode_jpeg(b"\x00" * 10, 8, 8)  # wrong buffer size
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(b"\x00" * 192, 8, 8, 90, "422")


def test_decode_image_dispatch():
    buf = encode_jpeg(b"\x40\x80\xc0" * 256, 16, 16, 90, "420")
    w, h, px = decode_image(buf)
    assert (w, h) == (16, 16) and len(px) == 3 * 256
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF....WEBPVP8 ")


# ── the registry gate helper ─────────────────────────────────────────────


def test_jpeg_px_sum_matches_closed_form_and_pads():
    payload = b"\x11\x99\x33whatever-else"
    exp = solid_roundtrip_rgb(0x11, 0x99, 0x33, JPEG_QUALITY)
    assert _jpeg_px_sum(payload) == (JPEG_W * JPEG_H * sum(exp)) % CHECKSUM_MOD
    # short payloads zero-pad: b"" -> rgb(0,0,0)
    exp0 = solid_roundtrip_rgb(0, 0, 0, JPEG_QUALITY)
    assert _jpeg_px_sum(b"") == (JPEG_W * JPEG_H * sum(exp0)) % CHECKSUM_MOD
    assert _jpeg_px_sum(b"\xff") == (
        JPEG_W * JPEG_H * sum(solid_roundtrip_rgb(255, 0, 0, JPEG_QUALITY))
    ) % CHECKSUM_MOD


# ── hypothesis fuzz ──────────────────────────────────────────────────────


@settings(max_examples=40, deadline=None)
@given(
    r=st.integers(0, 255),
    g=st.integers(0, 255),
    b=st.integers(0, 255),
    quality=st.sampled_from([25, 50, 75, 90, 100]),
    sub=st.sampled_from(["420", "444"]),
)
def test_fuzz_solid_color_closed_form(r, g, b, quality, sub):
    buf = encode_jpeg(bytes((r, g, b)) * 256, 16, 16, quality, sub)
    _, _, px = decode_jpeg(buf)
    assert set(
        (px[i], px[i + 1], px[i + 2]) for i in range(0, len(px), 3)
    ) == {solid_roundtrip_rgb(r, g, b, quality)}


@settings(max_examples=20, deadline=None)
@given(
    data=st.binary(min_size=3 * 8 * 8, max_size=3 * 8 * 8),
    quality=st.sampled_from([50, 90]),
    sub=st.sampled_from(["420", "444"]),
)
def test_fuzz_arbitrary_bytes_roundtrip_shape(data, quality, sub):
    """Arbitrary (noisy) pixels: decode(encode(x)) must keep dimensions
    and never crash; values are lossy by design so only shape is pinned."""
    w, h, out = decode_jpeg(encode_jpeg(data, 8, 8, quality, sub))
    assert (w, h) == (8, 8) and len(out) == len(data)


def test_corrupt_restart_boundary_raises_value_error():
    """r14 review: a stuffed FF 00 where the RST marker belongs, or a
    truncation at the boundary, must raise ValueError — never
    UnboundLocalError/IndexError."""
    pix = _smooth(24, 17)
    buf = encode_jpeg(pix, 24, 17, 95, "444", restart_interval=2)
    i = buf.find(b"\xff\xd0")
    assert i > 0
    with pytest.raises(ValueError, match="restart|truncated|marker"):
        decode_jpeg(buf[:i] + b"\xff\x00" + buf[i + 2 :])
    with pytest.raises(ValueError, match="restart|truncated|marker"):
        decode_jpeg(buf[: i + 1])  # cut right after the FF
    with pytest.raises(ValueError, match="restart|truncated|marker"):
        decode_jpeg(buf[:i] + b"\x12\x34" + buf[i + 2 :])  # no FF at all
