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
    # SOF2 decodes since r15 — a baseline-parameter scan under a
    # progressive header is now diagnosed as a CORRUPT progressive file
    # (a DC scan must have Se=0), not as unsupported
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="Ss=0 must have Se=0"):
        decode_jpeg(prog)
    # genuinely unsupported SOF flavors still refuse loudly
    arith = good.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(arith)
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


# ── progressive JPEG (r15): spectral selection + successive approximation ─


def test_progressive_decode_equals_baseline_decode():
    """The strongest cross-check: both forms carry the SAME quantized
    coefficients, so decode must be bit-identical — any drift in scan
    scripts, EOB runs, point transforms or refinement bits breaks it."""
    import random

    rng = random.Random(42)
    for w, h, sub, q in [
        (8, 8, "444", 90), (16, 16, "420", 90), (24, 16, "420", 75),
        (17, 9, "420", 85), (20, 12, "444", 50), (1, 1, "444", 90),
    ]:
        for kind in ("rand", "grad", "solid"):
            if kind == "rand":
                px = bytes(rng.randrange(256) for _ in range(3 * w * h))
            elif kind == "grad":
                px = bytes(
                    (x * 7 + y * 3 + c * 11) % 256
                    for y in range(h) for x in range(w) for c in range(3)
                )
            else:
                px = bytes((200, 10, 99)) * (w * h)
            base = decode_jpeg(encode_jpeg(px, w, h, q, sub))
            prog = decode_jpeg(encode_jpeg(px, w, h, q, sub, progressive=True))
            assert base == prog, (w, h, sub, q, kind)


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=3 * 8 * 8, max_size=3 * 8 * 8), st.sampled_from([35, 75, 90]))
def test_progressive_equals_baseline_fuzz(px, q):
    base = decode_jpeg(encode_jpeg(px, 8, 8, q, "444"))
    prog = decode_jpeg(encode_jpeg(px, 8, 8, q, "444", progressive=True))
    assert base == prog


def test_progressive_file_structure():
    buf = encode_jpeg(bytes(192), 8, 8, 90, "444", progressive=True)
    assert b"\xff\xc2" in buf and b"\xff\xc0" not in buf
    assert buf.count(b"\xff\xda") == 10  # the classic 10-scan script
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(bytes(192), 8, 8, 90, "444", restart_interval=2, progressive=True)


def test_ac_flat_table_covers_all_symbols_without_all_ones():
    from kafka_streams_dead_letter_publishing_spark.functions.jpeg import (
        AC_FLAT_SPEC,
        _huff_codes,
    )

    codes = _huff_codes(AC_FLAT_SPEC)
    assert set(codes) == set(range(256))
    for code, size in codes.values():
        assert code != (1 << size) - 1  # no all-ones code at any length


def _prog_seg(tag, body):
    return bytes([0xFF, tag]) + (len(body) + 2).to_bytes(2, "big") + body


def test_progressive_hand_assembled_golden():
    """Four hand-built scans over a 16x8 grayscale (2 blocks): DC first
    at Al=1, AC first at Al=1 (with an EOB-2 run), DC refinement, AC
    refinement (buffered correction bits crossing an EOB run + a
    newly-nonzero coefficient).  Every bit below is written by hand —
    nothing depends on the module's progressive ENCODER — and the
    expected pixels come from the already-golden-pinned IDCT over the
    target coefficients."""
    from kafka_streams_dead_letter_publishing_spark.functions.jpeg import (
        ZIGZAG,
        idct8x8,
    )

    q = 16
    # target quantized coefficients (zigzag order)
    blk0 = {0: 6, 1: 3, 5: -2}
    blk1 = {0: -5, 2: 1}
    # custom tables: DC cats 0..7 as 3-bit codes; AC symbols at 3 bits
    ac_vals = [0x00, 0x01, 0x31, 0x10, 0x11]
    ac_code = {v: (i, 3) for i, v in enumerate(ac_vals)}
    out = bytearray(b"\xff\xd8")
    out += _prog_seg(0xDB, b"\x00" + bytes([q] * 64))
    out += _prog_seg(0xC4, b"\x00" + _DC_BITS + _DC_VALS)
    out += _prog_seg(
        0xC4, b"\x10" + bytes([0, 0, len(ac_vals)] + [0] * 13) + bytes(ac_vals)
    )
    out += _prog_seg(
        0xC2, bytes([8]) + (8).to_bytes(2, "big") + (16).to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0])
    )

    def scan(ss, se, ah, al, bits: "_TestBits"):
        return (
            _prog_seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
            + bits.tobytes()
        )

    # scan 1: DC first, Al=1 — v0 = 6>>1 = 3 (diff 3), v1 = -5>>1 = -3
    # (diff -6); categories 2 and 3
    b = _TestBits()
    b.put(2, 3); b.put(3, 2)            # diff +3
    b.put(3, 3); b.put(-6 + 7, 3)       # diff -6 (two's trick: 1)
    out += scan(0, 0, 0, 1, b)
    # scan 2: AC first 1..63, Al=1 — blk0: +1 at zz1 (0x01, sign 1),
    # -1 at zz5 after run 3 (0x31, sign-bit 0), trailing zeros → EOB;
    # blk1 band empty → EOB run grows to 2 → flush 0x10 + 1 ext bit (0)
    b = _TestBits()
    b.put(ac_code[0x01][0], 3); b.put(1, 1)
    b.put(ac_code[0x31][0], 3); b.put(0, 1)
    b.put(ac_code[0x10][0], 3); b.put(0, 1)
    out += scan(1, 63, 0, 1, b)
    # scan 3: DC refinement Ah=1, Al=0 — bit0 of 6 is 0, of -5 is 1
    b = _TestBits()
    b.put(0, 1); b.put(1, 1)
    out += scan(0, 0, 1, 0, b)
    # scan 4: AC refinement 1..63, Ah=1, Al=0 — blk0 has only OLD
    # nonzeros (|3|,|−2| > 1): correction bits 1 and 0 buffer into the
    # EOB run; blk1's zz2 is NEWLY nonzero: flush EOB0 + the two
    # buffered bits, then (run 1 << 4)|1 with sign bit 1
    b = _TestBits()
    b.put(ac_code[0x00][0], 3)          # EOB0 (covers blk0's remainder)
    b.put(1, 1); b.put(0, 1)            # buffered correction bits
    b.put(ac_code[0x11][0], 3); b.put(1, 1)  # new +1 at zz2 after run 1
    b.put(ac_code[0x00][0], 3)          # EOB0 for blk1's trailing zeros
    out += scan(1, 63, 1, 0, b)
    out += b"\xff\xd9"

    w, h, px = decode_jpeg(bytes(out))
    assert (w, h) == (16, 8)
    qt = [q] * 64
    expect = []
    for blk in (blk0, blk1):
        nat = [0] * 64
        for zz_i, v in blk.items():
            nat[ZIGZAG[zz_i]] = v
        expect.append(idct8x8(nat, qt))
    for yy in range(8):
        for xx in range(16):
            v = expect[xx // 8][8 * yy + (xx % 8)]
            o = 3 * (16 * yy + xx)
            assert px[o] == px[o + 1] == px[o + 2] == v, (xx, yy)


def test_progressive_restart_markers_hand_assembled():
    """DC-only progressive scan over three grayscale blocks with DRI=1:
    restart markers between every block, predictors reset each time
    (each block codes its ABSOLUTE DC)."""
    q = 16
    dcs = [5, -3, 2]
    out = bytearray(b"\xff\xd8")
    out += _prog_seg(0xDB, b"\x00" + bytes([q] * 64))
    out += _prog_seg(0xC4, b"\x00" + _DC_BITS + _DC_VALS)
    out += _prog_seg(
        0xC2, bytes([8]) + (8).to_bytes(2, "big") + (24).to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0])
    )
    out += _prog_seg(0xDD, (1).to_bytes(2, "big"))
    out += _prog_seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    for i, dc in enumerate(dcs):
        b = _TestBits()
        size = abs(dc).bit_length()
        b.put(size, 3)
        b.put(dc if dc >= 0 else dc + (1 << size) - 1, size)
        out += b.tobytes()
        if i < len(dcs) - 1:
            out += bytes([0xFF, 0xD0 + i])
    out += b"\xff\xd9"
    w, h, px = decode_jpeg(bytes(out))
    assert (w, h) == (24, 8)
    for i, dc in enumerate(dcs):
        v = _dc_pixel(dc, q)
        assert px[3 * (8 * i + 4)] == v, i  # sample mid-block, row 0
    # a wrong restart index fails loudly
    bad = bytes(out).replace(bytes([0xFF, 0xD1]), bytes([0xFF, 0xD4]))
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(bad)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(st.integers(1, 63), st.integers(-200, 200).filter(bool)),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=5,
    ),
    st.integers(1, 3),
)
def test_progressive_band_scans_reconstruct_any_coefficients(blocks_spec, top_al):
    """Band-level fuzz of the progressive AC machinery: arbitrary
    coefficient patterns (old-nonzero bits scattered among long zero
    runs — the exact class where a buffered correction bit crossing a
    16-zero ZRL window would desync encoder and decoder) pushed through
    first pass at Al=top_al then refinements down to 0 must reconstruct
    the coefficients exactly."""
    from kafka_streams_dead_letter_publishing_spark.functions import jpeg as J

    blocks = []
    for spec in blocks_spec:
        zz = [0] * 64
        for k, v in spec:
            zz[k] = v
        blocks.append(zz)
    comp = {"id": 1, "h": 1, "v": 1, "tq": 0}
    frame = (8 * len(blocks), 8, [comp])
    ac_codes = J._huff_codes(J.AC_FLAT_SPEC)
    adec = J._HuffDecoder(*J.AC_FLAT_SPEC)
    coefs = {1: [[[0] * 64 for _ in blocks]]}
    scans = [("first", 0, top_al)] + [
        ("refine", al + 1, al) for al in range(top_al - 1, -1, -1)
    ]
    for kind, ah, al in scans:
        bw = J._BitWriter()
        if kind == "first":
            J._emit_ac_first_scan(blocks, 1, 63, al, ac_codes, bw)
        else:
            J._emit_ac_refine_scan(blocks, 1, 63, al, ac_codes, bw)
        bw.pad_to_byte()
        data = bytes(bw.buf) + b"\xff\xd9"
        J._decode_scan(
            data, 0, frame, [(comp, None, adec)],
            1, 63, ah, al, 0, coefs, {1: 0}, True,
        )
    for i, zz in enumerate(blocks):
        assert coefs[1][0][i][1:] == zz[1:], i


def test_golden_baseline_ac_runlengths():
    """Hand-assembled SEQUENTIAL scan with nonzero ACs (r15 verdict #5 —
    until now the baseline AC run-length/EOB path was pinned only through
    the module's own encoder): two grayscale blocks exercising a run-0
    coefficient, a ZRL (16-zero run), a run-after-ZRL coefficient, a
    mid-block EOB, and a block whose last coefficient lands EXACTLY at
    zz63 (spec: no EOB follows a full block).  Every bit is written by
    hand with this file's private Huffman tables; expected pixels come
    from the golden-pinned IDCT over the target coefficients."""
    from kafka_streams_dead_letter_publishing_spark.functions.jpeg import (
        ZIGZAG,
        idct8x8,
    )

    q = 16
    blk0 = {0: 4, 1: 3, 19: -1}   # zigzag index -> quantized value
    blk1 = {0: -2, 63: 1}
    # AC table: EOB, (run 0, size 2), ZRL, (run 1, size 1), (run 14, size 1)
    ac_vals = [0x00, 0x02, 0xF0, 0x11, 0xE1]
    ac = {v: (i, 3) for i, v in enumerate(ac_vals)}
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, b"\x00" + bytes([q] * 64))
    out += _seg(0xC4, b"\x00" + _DC_BITS + _DC_VALS)
    out += _seg(
        0xC4, b"\x10" + bytes([0, 0, len(ac_vals)] + [0] * 13) + bytes(ac_vals)
    )
    out += _seg(
        0xC0,
        bytes([8]) + (8).to_bytes(2, "big") + (16).to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    b = _TestBits()
    # blk0: DC 4 (cat 3), +3 at zz1, ZRL (zz2..zz17), run-1 -1 at zz19, EOB
    b.put(3, 3); b.put(4, 3)
    b.put(ac[0x02][0], 3); b.put(3, 2)
    b.put(ac[0xF0][0], 3)
    b.put(ac[0x11][0], 3); b.put(0, 1)     # -1: extend(0, 1)
    b.put(ac[0x00][0], 3)
    # blk1: DC -2 (diff -6, cat 3), 62 zeros = ZRL x3 + run 14, then +1
    # at zz63 — k passes 63, so NO EOB is coded for this block
    b.put(3, 3); b.put(-6 + 7, 3)
    for _ in range(3):
        b.put(ac[0xF0][0], 3)
    b.put(ac[0xE1][0], 3); b.put(1, 1)     # +1: extend(1, 1)
    out += b.tobytes()
    out += b"\xff\xd9"

    w, h, px = decode_jpeg(bytes(out))
    assert (w, h) == (16, 8)
    qt = [q] * 64
    expect = []
    for blk in (blk0, blk1):
        nat = [0] * 64
        for zz_i, v in blk.items():
            nat[ZIGZAG[zz_i]] = v
        expect.append(idct8x8(nat, qt))
    for yy in range(8):
        for xx in range(16):
            v = expect[xx // 8][8 * yy + (xx % 8)]
            o = 3 * (16 * yy + xx)
            assert px[o] == px[o + 1] == px[o + 2] == v, (xx, yy)
    # the run-past-end guard: blk1 rebuilt with a 4th ZRL pushes k to 65
    # before the final coefficient — the decoder must raise, never write
    # out of range or silently drop the tail
    bad2 = _TestBits()
    bad2.put(3, 3); bad2.put(4, 3); bad2.put(ac[0x00][0], 3)  # blk0: DC only
    bad2.put(3, 3); bad2.put(-6 + 7, 3)
    for _ in range(4):
        bad2.put(ac[0xF0][0], 3)
    bad2.put(ac[0xE1][0], 3); bad2.put(1, 1)
    bad_buf = bytes(out[: out.index(b"\xff\xda")])
    bad_buf += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bad_buf += bad2.tobytes() + b"\xff\xd9"
    with pytest.raises(ValueError, match="run past block end"):
        decode_jpeg(bad_buf)


def test_annex_k_specs_structural_invariants():
    """The Annex K transcription cannot be cross-checked against an
    external decoder in this container (functions/jpeg.py docstring), but
    its STRUCTURE is derivable from the spec's semantics without
    re-typing the listing: DC tables carry categories 0..11 exactly once;
    AC tables carry exactly the 162 legal symbols — EOB, ZRL, and every
    (run 0..15, size 1..10) pair — exactly once; every BITS array sums to
    its HUFFVAL length and builds a canonical prefix code with no
    all-ones codeword (the decoder's marker-byte guard).  A typo'd value
    lands outside the legal set or duplicates; only a same-bucket
    permutation could survive (that would need the external cross-check
    the caveat documents)."""
    from kafka_streams_dead_letter_publishing_spark.functions.jpeg import (
        AC_CHR_SPEC,
        AC_LUM_SPEC,
        DC_CHR_SPEC,
        DC_LUM_SPEC,
        _huff_codes,
    )

    legal_ac = {0x00, 0xF0} | {
        (r << 4) | s for r in range(16) for s in range(1, 11)
    }
    assert len(legal_ac) == 162
    for bits, vals in (DC_LUM_SPEC, DC_CHR_SPEC):
        assert sum(bits) == len(vals) == 12
        assert sorted(vals) == list(range(12))
    for bits, vals in (AC_LUM_SPEC, AC_CHR_SPEC):
        assert sum(bits) == len(vals) == 162
        assert set(vals) == legal_ac and len(set(vals)) == len(vals)
    for spec in (DC_LUM_SPEC, DC_CHR_SPEC, AC_LUM_SPEC, AC_CHR_SPEC):
        codes = _huff_codes(spec)
        # canonical completeness: Kraft sum < 1 (JPEG reserves all-ones)
        kraft = sum(1 / (1 << size) for _, size in codes.values())
        assert kraft < 1
        for code, size in codes.values():
            assert code != (1 << size) - 1
        # prefix property: no code is a prefix of a longer one
        as_bits = sorted(
            (format(c, f"0{s}b") for c, s in codes.values()), key=len
        )
        for i, a in enumerate(as_bits):
            for b in as_bits[i + 1 :]:
                assert not b.startswith(a), (a, b)
