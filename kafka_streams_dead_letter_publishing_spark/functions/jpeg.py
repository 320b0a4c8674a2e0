"""Pure-Python JPEG codec ([EXT] — the THIRD compressed format, after
PNG/deflate and GIF/LZW, and the first LOSSY one): baseline sequential
DCT plus, since r15, PROGRESSIVE DCT (SOF2 — spectral selection,
successive approximation with the G.1.2.3 correction-bit algorithm,
EOB runs, multi-scan coefficient accumulation) on both the encode and
decode side.

Everything here is public knowledge: the container format, markers,
zigzag order, quantization and Huffman coding follow ITU-T T.81
(Annex B/F/G); the default quantization and
Huffman tables are T.81 Annex K; the 8x8 DCT pair is the classic
Loeffler-Ligtenberg-Moshovitz fixed-point decomposition (CONST_BITS=13
scaled-integer arithmetic, the jfdctint/jidctint shape every baseline
codec uses).  Zero dependencies — plain ints and bytes.

Why INTEGER DCTs and not float: the decoder's output must be a
deterministic integer function of the input bytes so the registry hash
gate can replay a decode in SQL.  JPEG is lossy, so the PNG/GIF
"decoded == source bytes" round-trip discipline cannot apply; instead,
for a SOLID-COLOR image every 8x8 block is DC-only and the whole
encode→decode chain collapses to a closed-form integer expression
(color transform → level shift → DC quantize → dequantize → IDCT DC
shortcut → inverse color transform) that a DuckDB oracle replays
exactly — see ``solid_roundtrip_rgb`` and the ``docs_payload_features``
``jpeg_px_sum`` column.  The general AC path (Huffman run-length, the
full butterfly, subsampling of non-constant chroma, restart markers)
is pytest-pinned with round-trip error bounds and hand-assembled golden
streams that never touch this module's encoder: DC-only sequential
layouts, a sequential AC stream (run-length coefficients, ZRL, mid-block
EOB, a block ending exactly at zz63 — r16), a 4-scan progressive stream
with AC-first EOB runs and refinement correction bits, and progressive
restart markers (tests/test_jpeg.py).

Interop caveat (documented, narrowed r16): the decoder builds its
Huffman tables from the file's own DHT segments and the golden streams
carry their OWN hand-built tables, so neither round-trips nor the
decode paths depend on the Annex K transcription — the remaining
uncrosschecked surface is ONLY the Annex K table constants an external
encoder would reference, and no external JPEG exists in this container
to check them against.
"""

from __future__ import annotations

# ── tables (T.81 Annex K) ────────────────────────────────────────────────

#: zigzag scan: position in zigzag order -> position in natural order
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

#: Annex K.1/K.2 base quantization tables, natural (row-major) order
LUM_QUANT_BASE = (
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
)
CHR_QUANT_BASE = (
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
)

#: Annex K.3 standard Huffman specs: (BITS[1..16], HUFFVAL)
DC_LUM_SPEC = (
    (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
DC_CHR_SPEC = (
    (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
AC_LUM_SPEC = (
    (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125),
    (
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ),
)
AC_CHR_SPEC = (
    (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119),
    (
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ),
)

# ── fixed-point DCT constants (Loeffler, CONST_BITS=13) ──────────────────

CONST_BITS = 13
PASS1_BITS = 2
_F_0_298631336 = 2446
_F_0_390180644 = 3196
_F_0_541196100 = 4433
_F_0_765366865 = 6270
_F_0_899976223 = 7373
_F_1_175875602 = 9633
_F_1_501321110 = 12299
_F_1_847759065 = 15137
_F_1_961570560 = 16069
_F_2_053119869 = 16819
_F_2_562915447 = 20995
_F_3_072711026 = 25172


def _descale(x: int, n: int) -> int:
    """Round-to-nearest scaled-integer descale: (x + 2^(n-1)) >> n.
    Python's ``>>`` on negative ints is an arithmetic (floor) shift —
    exactly the two's-complement semantics the decomposition assumes."""
    return (x + (1 << (n - 1))) >> n


def fdct8x8(block: list[int]) -> list[int]:
    """Forward 8x8 DCT on level-shifted samples, output scaled by 8
    relative to the true T.81 DCT (the standard scaled-integer
    convention — the quantizer divides by 8*Q to compensate).  For a
    constant block of value a the output is exactly [64*a, 0, ..., 0]:
    every odd/difference term cancels in integer arithmetic, which is
    what makes the solid-color closed form exact."""
    out = [0] * 64
    # pass 1: rows
    for r in range(8):
        o = 8 * r
        d0, d1, d2, d3, d4, d5, d6, d7 = block[o : o + 8]
        tmp0, tmp7 = d0 + d7, d0 - d7
        tmp1, tmp6 = d1 + d6, d1 - d6
        tmp2, tmp5 = d2 + d5, d2 - d5
        tmp3, tmp4 = d3 + d4, d3 - d4
        tmp10, tmp13 = tmp0 + tmp3, tmp0 - tmp3
        tmp11, tmp12 = tmp1 + tmp2, tmp1 - tmp2
        out[o] = (tmp10 + tmp11) << PASS1_BITS
        out[o + 4] = (tmp10 - tmp11) << PASS1_BITS
        z1 = (tmp12 + tmp13) * _F_0_541196100
        out[o + 2] = _descale(
            z1 + tmp13 * _F_0_765366865, CONST_BITS - PASS1_BITS
        )
        out[o + 6] = _descale(
            z1 - tmp12 * _F_1_847759065, CONST_BITS - PASS1_BITS
        )
        z1, z2 = tmp4 + tmp7, tmp5 + tmp6
        z3, z4 = tmp4 + tmp6, tmp5 + tmp7
        z5 = (z3 + z4) * _F_1_175875602
        tmp4 *= _F_0_298631336
        tmp5 *= _F_2_053119869
        tmp6 *= _F_3_072711026
        tmp7 *= _F_1_501321110
        z1 *= -_F_0_899976223
        z2 *= -_F_2_562915447
        z3 = z3 * -_F_1_961570560 + z5
        z4 = z4 * -_F_0_390180644 + z5
        out[o + 7] = _descale(tmp4 + z1 + z3, CONST_BITS - PASS1_BITS)
        out[o + 5] = _descale(tmp5 + z2 + z4, CONST_BITS - PASS1_BITS)
        out[o + 3] = _descale(tmp6 + z2 + z3, CONST_BITS - PASS1_BITS)
        out[o + 1] = _descale(tmp7 + z1 + z4, CONST_BITS - PASS1_BITS)
    # pass 2: columns
    for c in range(8):
        d0, d1, d2, d3, d4, d5, d6, d7 = (out[c + 8 * i] for i in range(8))
        tmp0, tmp7 = d0 + d7, d0 - d7
        tmp1, tmp6 = d1 + d6, d1 - d6
        tmp2, tmp5 = d2 + d5, d2 - d5
        tmp3, tmp4 = d3 + d4, d3 - d4
        tmp10, tmp13 = tmp0 + tmp3, tmp0 - tmp3
        tmp11, tmp12 = tmp1 + tmp2, tmp1 - tmp2
        out[c] = _descale(tmp10 + tmp11, PASS1_BITS)
        out[c + 32] = _descale(tmp10 - tmp11, PASS1_BITS)
        z1 = (tmp12 + tmp13) * _F_0_541196100
        out[c + 16] = _descale(
            z1 + tmp13 * _F_0_765366865, CONST_BITS + PASS1_BITS
        )
        out[c + 48] = _descale(
            z1 - tmp12 * _F_1_847759065, CONST_BITS + PASS1_BITS
        )
        z1, z2 = tmp4 + tmp7, tmp5 + tmp6
        z3, z4 = tmp4 + tmp6, tmp5 + tmp7
        z5 = (z3 + z4) * _F_1_175875602
        tmp4 *= _F_0_298631336
        tmp5 *= _F_2_053119869
        tmp6 *= _F_3_072711026
        tmp7 *= _F_1_501321110
        z1 *= -_F_0_899976223
        z2 *= -_F_2_562915447
        z3 = z3 * -_F_1_961570560 + z5
        z4 = z4 * -_F_0_390180644 + z5
        out[c + 56] = _descale(tmp4 + z1 + z3, CONST_BITS + PASS1_BITS)
        out[c + 40] = _descale(tmp5 + z2 + z4, CONST_BITS + PASS1_BITS)
        out[c + 24] = _descale(tmp6 + z2 + z3, CONST_BITS + PASS1_BITS)
        out[c + 8] = _descale(tmp7 + z1 + z4, CONST_BITS + PASS1_BITS)
    return out


def idct8x8(coefs: list[int], quant: list[int]) -> list[int]:
    """Inverse 8x8 DCT over quantized coefficients with in-loop
    dequantization (natural order), output = clamped samples 0..255.
    All-AC-zero columns and rows take the DC shortcut — for a DC-only
    block every output pixel is exactly
    ``clamp(128 + descale(dequant_dc << PASS1_BITS, PASS1_BITS + 3))``,
    the closed form the SQL oracle replays (the full butterfly reduces
    to the same value on that input, so the shortcut is an
    optimization, not a semantics fork)."""
    ws = [0] * 64
    for c in range(8):
        if all(coefs[c + 8 * i] == 0 for i in range(1, 8)):
            dcval = (coefs[c] * quant[c]) << PASS1_BITS
            for i in range(8):
                ws[c + 8 * i] = dcval
            continue
        d0, d1, d2, d3, d4, d5, d6, d7 = (
            coefs[c + 8 * i] * quant[c + 8 * i] for i in range(8)
        )
        # even part
        z2, z3 = d2, d6
        z1 = (z2 + z3) * _F_0_541196100
        tmp2 = z1 + z3 * -_F_1_847759065
        tmp3 = z1 + z2 * _F_0_765366865
        tmp0 = (d0 + d4) << CONST_BITS
        tmp1 = (d0 - d4) << CONST_BITS
        tmp10, tmp13 = tmp0 + tmp3, tmp0 - tmp3
        tmp11, tmp12 = tmp1 + tmp2, tmp1 - tmp2
        # odd part
        tmp0, tmp1, tmp2, tmp3 = d7, d5, d3, d1
        z1, z2 = tmp0 + tmp3, tmp1 + tmp2
        z3, z4 = tmp0 + tmp2, tmp1 + tmp3
        z5 = (z3 + z4) * _F_1_175875602
        tmp0 *= _F_0_298631336
        tmp1 *= _F_2_053119869
        tmp2 *= _F_3_072711026
        tmp3 *= _F_1_501321110
        z1 *= -_F_0_899976223
        z2 *= -_F_2_562915447
        z3 = z3 * -_F_1_961570560 + z5
        z4 = z4 * -_F_0_390180644 + z5
        tmp0 += z1 + z3
        tmp1 += z2 + z4
        tmp2 += z2 + z3
        tmp3 += z1 + z4
        ws[c] = _descale(tmp10 + tmp3, CONST_BITS - PASS1_BITS)
        ws[c + 56] = _descale(tmp10 - tmp3, CONST_BITS - PASS1_BITS)
        ws[c + 8] = _descale(tmp11 + tmp2, CONST_BITS - PASS1_BITS)
        ws[c + 48] = _descale(tmp11 - tmp2, CONST_BITS - PASS1_BITS)
        ws[c + 16] = _descale(tmp12 + tmp1, CONST_BITS - PASS1_BITS)
        ws[c + 40] = _descale(tmp12 - tmp1, CONST_BITS - PASS1_BITS)
        ws[c + 24] = _descale(tmp13 + tmp0, CONST_BITS - PASS1_BITS)
        ws[c + 32] = _descale(tmp13 - tmp0, CONST_BITS - PASS1_BITS)
    out = [0] * 64
    for r in range(8):
        o = 8 * r
        if all(ws[o + i] == 0 for i in range(1, 8)):
            v = _clamp8(128 + _descale(ws[o], PASS1_BITS + 3))
            for i in range(8):
                out[o + i] = v
            continue
        d0, d1, d2, d3, d4, d5, d6, d7 = ws[o : o + 8]
        z2, z3 = d2, d6
        z1 = (z2 + z3) * _F_0_541196100
        tmp2 = z1 + z3 * -_F_1_847759065
        tmp3 = z1 + z2 * _F_0_765366865
        tmp0 = (d0 + d4) << CONST_BITS
        tmp1 = (d0 - d4) << CONST_BITS
        tmp10, tmp13 = tmp0 + tmp3, tmp0 - tmp3
        tmp11, tmp12 = tmp1 + tmp2, tmp1 - tmp2
        tmp0, tmp1, tmp2, tmp3 = d7, d5, d3, d1
        z1, z2 = tmp0 + tmp3, tmp1 + tmp2
        z3, z4 = tmp0 + tmp2, tmp1 + tmp3
        z5 = (z3 + z4) * _F_1_175875602
        tmp0 *= _F_0_298631336
        tmp1 *= _F_2_053119869
        tmp2 *= _F_3_072711026
        tmp3 *= _F_1_501321110
        z1 *= -_F_0_899976223
        z2 *= -_F_2_562915447
        z3 = z3 * -_F_1_961570560 + z5
        z4 = z4 * -_F_0_390180644 + z5
        tmp0 += z1 + z3
        tmp1 += z2 + z4
        tmp2 += z2 + z3
        tmp3 += z1 + z4
        shift = CONST_BITS + PASS1_BITS + 3
        out[o] = _clamp8(128 + _descale(tmp10 + tmp3, shift))
        out[o + 7] = _clamp8(128 + _descale(tmp10 - tmp3, shift))
        out[o + 1] = _clamp8(128 + _descale(tmp11 + tmp2, shift))
        out[o + 6] = _clamp8(128 + _descale(tmp11 - tmp2, shift))
        out[o + 2] = _clamp8(128 + _descale(tmp12 + tmp1, shift))
        out[o + 5] = _clamp8(128 + _descale(tmp12 - tmp1, shift))
        out[o + 3] = _clamp8(128 + _descale(tmp13 + tmp0, shift))
        out[o + 4] = _clamp8(128 + _descale(tmp13 - tmp0, shift))
    return out


def _clamp8(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


# ── color transforms (16-bit fixed point, always-positive operands) ──────


def rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[int, int, int]:
    """JFIF RGB→YCbCr in 16-bit fixed point.  The Y weights sum to
    exactly 65536 and the Cb/Cr rounding constant is 2^15 - 1, so every
    output is provably in 0..255 with NO clamp — and the whole
    expression is plain integer arithmetic both engines replay
    identically (the operand is always non-negative, so ``>> 16`` is
    unambiguous floor division by 65536)."""
    y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
    cb = (-11059 * r - 21709 * g + 32768 * b + (128 << 16) + 32767) >> 16
    cr = (32768 * r - 27439 * g - 5329 * b + (128 << 16) + 32767) >> 16
    return y, cb, cr


def ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    """Inverse JFIF transform, 16-bit fixed point with round-to-nearest
    descale (floor shift on possibly-negative operands) and 0..255
    clamps — the exact integer chain the SQL closed form mirrors."""
    r = _clamp8(y + ((91881 * (cr - 128) + 32768) >> 16))
    g = _clamp8(
        y + ((-22554 * (cb - 128) - 46802 * (cr - 128) + 32768) >> 16)
    )
    b = _clamp8(y + ((116130 * (cb - 128) + 32768) >> 16))
    return r, g, b


# ── quantization ─────────────────────────────────────────────────────────


def quant_table(base: tuple[int, ...], quality: int) -> list[int]:
    """libjpeg-convention quality scaling: scale = 5000/Q below 50 else
    200 - 2Q; q = clamp((base*scale + 50) DIV 100, 1, 255).  All
    integer, so the oracle recomputes the table entries exactly."""
    if not 1 <= quality <= 100:
        raise ValueError(f"jpeg quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(max((b * scale + 50) // 100, 1), 255) for b in base]


def _quantize(coef: int, q8: int) -> int:
    """Symmetric round-half-away-from-zero division of the x8-scaled
    DCT coefficient by 8*Q — integer-exact, sign handled explicitly so
    the SQL replay needs no floor/trunc ambiguity."""
    if coef >= 0:
        return (coef + (q8 >> 1)) // q8
    return -((-coef + (q8 >> 1)) // q8)


# ── Huffman machinery ────────────────────────────────────────────────────


def _huff_codes(spec: tuple[tuple[int, ...], tuple[int, ...]]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (T.81 Annex C): value -> (code, size)."""
    bits, vals = spec
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    """MSB-first bit packer with 0xFF byte stuffing (B.1.1.5)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, size: int) -> None:
        self.acc = (self.acc << size) | (code & ((1 << size) - 1))
        self.n += size
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-bits pad


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker and exposes it."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("jpeg: entropy data exhausted at marker")
        if self.pos >= len(self.data):
            raise ValueError("jpeg: truncated entropy-coded data")
        byte = self.data[self.pos]
        if byte == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("jpeg: truncated after 0xFF in scan")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                raise ValueError("jpeg: entropy data exhausted at marker")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def get(self, size: int) -> int:
        while self.n < size:
            self._fill()
        self.n -= size
        v = (self.acc >> self.n) & ((1 << size) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def align_and_expect_rst(self, idx: int) -> None:
        """Consume a restart marker (byte-aligned) between intervals.
        Every malformed shape — truncation at the boundary, a stuffed
        FF 00 where the marker belongs, no FF at all — raises
        ValueError (never UnboundLocalError/IndexError; r14 review)."""
        self.acc = 0
        self.n = 0
        if self.marker is not None:
            m = self.marker
            self.marker = None
        elif (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] != 0x00
        ):
            m = self.data[self.pos + 1]
            self.pos += 2
        else:
            raise ValueError("jpeg: expected restart marker")
        if m != 0xD0 + (idx & 7):
            raise ValueError(
                f"jpeg: wrong restart marker {m:#x}, expected {0xD0 + (idx & 7):#x}"
            )


class _HuffDecoder:
    """Length-ordered canonical decode (T.81 F.2.2.3): MINCODE/MAXCODE
    walk, one bit at a time — O(code length), fine at thumbnail scale."""

    def __init__(self, bits: tuple[int, ...], vals: tuple[int, ...]) -> None:
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.get(1)
        length = 1
        while code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("jpeg: invalid Huffman code in scan")
            code = (code << 1) | br.get(1)
        return self.vals[self.valptr[length] + code - self.mincode[length]]


def _magnitude_category(v: int) -> int:
    return abs(v).bit_length()


def _extend(v: int, size: int) -> int:
    """F.2.2.1 EXTEND: map the low-order ``size`` bits back to the
    signed coefficient value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ── encoder ──────────────────────────────────────────────────────────────


def _zz_block(samples: list[int], qtab: list[int]) -> list[int]:
    """FDCT + quantize + zigzag one 8x8 block of level-shifted samples."""
    coefs = fdct8x8(samples)
    return [_quantize(coefs[ZIGZAG[i]], qtab[ZIGZAG[i]] << 3) for i in range(64)]


def _encode_block(
    samples: list[int],
    qtab: list[int],
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    bw: _BitWriter,
) -> int:
    """FDCT + quantize + zigzag + Huffman-encode one 8x8 block of
    level-shifted samples; returns the new DC predictor."""
    zz = _zz_block(samples, qtab)
    diff = zz[0] - pred
    size = _magnitude_category(diff)
    code, length = dc_codes[size]
    bw.put(code, length)
    if size:
        bw.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    for i in range(1, 64):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.put(c, ln)
            run -= 16
        size = _magnitude_category(zz[i])
        c, ln = ac_codes[(run << 4) | size]
        bw.put(c, ln)
        bw.put(zz[i] if zz[i] >= 0 else zz[i] + (1 << size) - 1, size)
        run = 0
    if run:
        c, ln = ac_codes[0x00]  # EOB
        bw.put(c, ln)
    return zz[0]


# ── progressive emission (T.81 Annex G, the jcphuff shape) ───────────────

#: complete-coverage AC Huffman table for progressive scans: the Annex K
#: AC tables define only EOB0 and ZRL among the size-0 symbols, so EOB
#: runs (EOBn, n>=1) and arbitrary refinement runs are NOT encodable
#: with them — progressive files carry their own DHT.  254 symbols at
#: 8 bits + 2 at 9 keeps every code off the all-ones pattern.  Terrible
#: compression, exact correctness — the encoder exists to exercise the
#: decoder, not to win size benchmarks.
AC_FLAT_SPEC = (
    (0, 0, 0, 0, 0, 0, 0, 254, 2, 0, 0, 0, 0, 0, 0, 0),
    tuple(range(256)),
)


def _emit_value_bits(bw: _BitWriter, v: int, size: int) -> None:
    bw.put(v if v >= 0 else v + (1 << size) - 1, size)


def _emit_eobrun(state: dict, ac_codes, bw: _BitWriter) -> None:
    """Flush a pending EOB run: the EOBn symbol (n = floor(log2 run)),
    its n low extension bits, then every buffered correction bit (the
    BE bits of jcphuff — refinement bits for blocks wholly inside the
    run)."""
    r = state["eobrun"]
    if r:
        e = r.bit_length() - 1
        c, ln = ac_codes[e << 4]
        bw.put(c, ln)
        if e:
            bw.put(r - (1 << e), e)
        state["eobrun"] = 0
    for b in state["pending"]:
        bw.put(b, 1)
    state["pending"] = []


def _emit_ac_first_scan(blocks, ss, se, al, ac_codes, bw: _BitWriter) -> None:
    """Spectral-selection first pass (Ah=0): run/size coding of the
    point-transformed band with EOB-run accumulation across blocks."""
    state = {"eobrun": 0, "pending": []}
    for zz in blocks:
        vals = []
        for k in range(ss, se + 1):
            t = abs(zz[k]) >> al
            vals.append(t if zz[k] >= 0 else -t)
        if not any(vals):
            state["eobrun"] += 1
            if state["eobrun"] == 0x7FFF:
                _emit_eobrun(state, ac_codes, bw)
            continue
        _emit_eobrun(state, ac_codes, bw)
        r = 0
        for t in vals:
            if t == 0:
                r += 1
                continue
            while r > 15:
                c, ln = ac_codes[0xF0]
                bw.put(c, ln)
                r -= 16
            size = abs(t).bit_length()
            c, ln = ac_codes[(r << 4) | size]
            bw.put(c, ln)
            _emit_value_bits(bw, t, size)
            r = 0
        if r:
            state["eobrun"] += 1
            if state["eobrun"] == 0x7FFF:
                _emit_eobrun(state, ac_codes, bw)
    _emit_eobrun(state, ac_codes, bw)


def _emit_ac_refine_scan(blocks, ss, se, al, ac_codes, bw: _BitWriter) -> None:
    """Successive-approximation refinement pass (Ah=Al+1): newly-nonzero
    coefficients as run|1 symbols with a sign bit, one buffered
    correction bit per already-nonzero coefficient the run passes —
    buffered bits flush after each emitted symbol, and the ZRL check
    runs at EVERY nonzero position so a buffered bit can never cross a
    16-zero window boundary (the jcphuff invariant that keeps encoder
    and decoder bit-synchronized)."""
    state = {"eobrun": 0, "pending": []}
    for zz in blocks:
        t = [abs(zz[k]) >> al for k in range(ss, se + 1)]
        eob = -1
        for i, ti in enumerate(t):
            if ti == 1:
                eob = i
        r = 0
        bits_this: list[int] = []
        for i, ti in enumerate(t):
            if ti == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                _emit_eobrun(state, ac_codes, bw)
                c, ln = ac_codes[0xF0]
                bw.put(c, ln)
                r -= 16
                for b in bits_this:
                    bw.put(b, 1)
                bits_this = []
            if ti > 1:
                bits_this.append(ti & 1)
                continue
            _emit_eobrun(state, ac_codes, bw)
            c, ln = ac_codes[(r << 4) | 1]
            bw.put(c, ln)
            bw.put(1 if zz[ss + i] >= 0 else 0, 1)
            for b in bits_this:
                bw.put(b, 1)
            bits_this = []
            r = 0
        if r > 0 or bits_this:
            state["eobrun"] += 1
            state["pending"].extend(bits_this)
            if state["eobrun"] == 0x7FFF:
                _emit_eobrun(state, ac_codes, bw)
    _emit_eobrun(state, ac_codes, bw)


def _marker(tag: int, body: bytes = b"") -> bytes:
    if body:
        return bytes([0xFF, tag]) + (len(body) + 2).to_bytes(2, "big") + body
    return bytes([0xFF, tag])


def _dht_body(tclass: int, tid: int, spec) -> bytes:
    bits, vals = spec
    return bytes([tclass << 4 | tid]) + bytes(bits) + bytes(vals)


def encode_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    quality: int = 90,
    subsampling: str = "420",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """JPEG encoder (T.81): JFIF APP0, quality-scaled Annex K quant
    tables, 4:2:0 (2x2-average chroma subsampling, integer
    ``(a+b+c+d+2) >> 2``) or 4:4:4.  ``pixels`` is RGB row-major
    top-down.  The image is edge-replicated to the MCU grid, so a
    solid-color input stays solid through padding — the closed-form
    hash-gate precondition.

    ``progressive=False`` (default): baseline sequential, standard
    Annex K Huffman tables, optional restart markers.
    ``progressive=True`` (r15): SOF2 with the classic 10-scan script
    (interleaved DC first pass at Al=1 + refinement; per-component AC
    spectral bands with successive approximation down to Al=0) —
    exactly the same quantized coefficients as baseline, so
    ``decode_jpeg`` of both forms is bit-identical; AC scans carry a
    complete-coverage DHT because the Annex K tables cannot express
    EOB runs.  Restart markers are baseline-only here (the decoder
    handles progressive restarts; this encoder does not emit them)."""
    if len(pixels) != 3 * width * height:
        raise ValueError(
            f"encode_jpeg: need {3 * width * height} RGB bytes, got {len(pixels)}"
        )
    if subsampling not in ("420", "444"):
        raise ValueError(f"encode_jpeg: subsampling must be 420 or 444, got {subsampling}")
    if progressive and restart_interval:
        raise ValueError(
            "encode_jpeg: restart markers are not supported with "
            "progressive=True (decode-side progressive restarts are)"
        )
    h2 = subsampling == "420"
    lq = quant_table(LUM_QUANT_BASE, quality)
    cq = quant_table(CHR_QUANT_BASE, quality)
    # plane extraction with edge replication to the MCU grid
    mcu_px = 16 if h2 else 8
    pw = (width + mcu_px - 1) // mcu_px * mcu_px
    ph = (height + mcu_px - 1) // mcu_px * mcu_px
    yp = [[0] * pw for _ in range(ph)]
    cbp = [[0] * pw for _ in range(ph)]
    crp = [[0] * pw for _ in range(ph)]
    for yy in range(ph):
        sy = min(yy, height - 1)
        row = 3 * width * sy
        for xx in range(pw):
            sx = min(xx, width - 1)
            o = row + 3 * sx
            y, cb, cr = rgb_to_ycbcr(pixels[o], pixels[o + 1], pixels[o + 2])
            yp[yy][xx] = y - 128
            cbp[yy][xx] = cb
            crp[yy][xx] = cr
    if h2:
        cw, ch = pw // 2, ph // 2
        cbs = [
            [
                (
                    cbp[2 * j][2 * i]
                    + cbp[2 * j][2 * i + 1]
                    + cbp[2 * j + 1][2 * i]
                    + cbp[2 * j + 1][2 * i + 1]
                    + 2
                )
                >> 2
                for i in range(cw)
            ]
            for j in range(ch)
        ]
        crs = [
            [
                (
                    crp[2 * j][2 * i]
                    + crp[2 * j][2 * i + 1]
                    + crp[2 * j + 1][2 * i]
                    + crp[2 * j + 1][2 * i + 1]
                    + 2
                )
                >> 2
                for i in range(cw)
            ]
            for j in range(ch)
        ]
    else:
        cbs, crs = cbp, crp
    for plane in (cbs, crs):
        for row_ in plane:
            for i, v in enumerate(row_):
                row_[i] = v - 128

    dc_l = _huff_codes(DC_LUM_SPEC)
    ac_l = _huff_codes(AC_LUM_SPEC)
    dc_c = _huff_codes(DC_CHR_SPEC)
    ac_c = _huff_codes(AC_CHR_SPEC)

    def block(plane: list[list[int]], bx: int, by: int) -> list[int]:
        return [plane[by + j][bx + i] for j in range(8) for i in range(8)]

    if progressive:
        # quantized-coefficient grids over the padded MCU grid — the SAME
        # values the sequential path would emit, so decode of either form
        # is bit-identical (the round-trip cross-check in tests)
        cw, ch = (pw // 2, ph // 2) if h2 else (pw, ph)
        grids = [
            [
                [_zz_block(block(yp, 8 * bx, 8 * by), lq) for bx in range(pw // 8)]
                for by in range(ph // 8)
            ],
            [
                [_zz_block(block(cbs, 8 * bx, 8 * by), cq) for bx in range(cw // 8)]
                for by in range(ch // 8)
            ],
            [
                [_zz_block(block(crs, 8 * bx, 8 * by), cq) for bx in range(cw // 8)]
                for by in range(ch // 8)
            ],
        ]
        s2 = 2 if h2 else 1
        comps_meta = [
            {"id": 1, "h": s2, "v": s2, "tq": 0},
            {"id": 2, "h": 1, "v": 1, "tq": 1},
            {"id": 3, "h": 1, "v": 1, "tq": 1},
        ]
        frame = (width, height, comps_meta)
        ac_flat = _huff_codes(AC_FLAT_SPEC)
        dc_tabs = [dc_l, dc_c, dc_c]

        def raster_blocks(ci: int) -> list[list[int]]:
            # non-interleaved scans cover the component's TRUE block grid
            tbw, tbh = _comp_true_blocks(frame, comps_meta[ci])
            return [
                grids[ci][by][bx] for by in range(tbh) for bx in range(tbw)
            ]

        # the classic 10-scan progressive script (the jcparam default):
        # (components, Ss, Se, Ah, Al)
        script = [
            ((0, 1, 2), 0, 0, 0, 1),
            ((0,), 1, 5, 0, 2),
            ((1,), 1, 63, 0, 1),
            ((2,), 1, 63, 0, 1),
            ((0,), 6, 63, 0, 2),
            ((0,), 1, 63, 2, 1),
            ((0, 1, 2), 0, 0, 1, 0),
            ((1,), 1, 63, 1, 0),
            ((2,), 1, 63, 1, 0),
            ((0,), 1, 63, 1, 0),
        ]
        zz_lq = bytes(lq[ZIGZAG[i]] for i in range(64))
        zz_cq = bytes(cq[ZIGZAG[i]] for i in range(64))
        samp = 0x22 if h2 else 0x11
        out = bytearray()
        out += _marker(0xD8)
        out += _marker(
            0xE0, b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01" + b"\x00\x00"
        )
        out += _marker(0xDB, b"\x00" + zz_lq)
        out += _marker(0xDB, b"\x01" + zz_cq)
        out += _marker(
            0xC2,
            bytes([8])
            + height.to_bytes(2, "big")
            + width.to_bytes(2, "big")
            + bytes([3, 1, samp, 0, 2, 0x11, 1, 3, 0x11, 1]),
        )
        out += _marker(0xC4, _dht_body(0, 0, DC_LUM_SPEC))
        out += _marker(0xC4, _dht_body(0, 1, DC_CHR_SPEC))
        out += _marker(0xC4, _dht_body(1, 0, AC_FLAT_SPEC))
        for comp_idxs, ss, se, ah, al_ in script:
            sosb = bytearray([len(comp_idxs)])
            for ci in comp_idxs:
                sosb += bytes([comps_meta[ci]["id"], ((0 if ci == 0 else 1) << 4) | 0])
            sosb += bytes([ss, se, (ah << 4) | al_])
            out += _marker(0xDA, bytes(sosb))
            sbw = _BitWriter()
            if ss == 0:
                scan_comps = [(comps_meta[ci], None, None) for ci in comp_idxs]
                preds = [0] * len(comp_idxs)
                for si, by, bx in _scan_blocks_interleaved(frame, scan_comps):
                    zz = grids[comp_idxs[si]][by][bx]
                    if ah == 0:
                        v = zz[0] >> al_  # arithmetic shift (G.1.2.1)
                        diff = v - preds[si]
                        preds[si] = v
                        size = _magnitude_category(diff)
                        c, ln = dc_tabs[comp_idxs[si]][size]
                        sbw.put(c, ln)
                        if size:
                            _emit_value_bits(sbw, diff, size)
                    else:
                        sbw.put((zz[0] >> al_) & 1, 1)
            elif ah == 0:
                _emit_ac_first_scan(
                    raster_blocks(comp_idxs[0]), ss, se, al_, ac_flat, sbw
                )
            else:
                _emit_ac_refine_scan(
                    raster_blocks(comp_idxs[0]), ss, se, al_, ac_flat, sbw
                )
            sbw.pad_to_byte()
            out += sbw.buf
        out += _marker(0xD9)
        return bytes(out)

    bw = _BitWriter()
    preds = [0, 0, 0]
    mcus_x = pw // mcu_px
    mcus_y = ph // mcu_px
    n_mcu = 0
    rst_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.pad_to_byte()
                bw.buf += bytes([0xFF, 0xD0 + (rst_idx & 7)])
                rst_idx += 1
                preds = [0, 0, 0]
            if h2:
                for j in range(2):
                    for i in range(2):
                        preds[0] = _encode_block(
                            block(yp, mcu_px * mx + 8 * i, mcu_px * my + 8 * j),
                            lq, preds[0], dc_l, ac_l, bw,
                        )
                preds[1] = _encode_block(
                    block(cbs, 8 * mx, 8 * my), cq, preds[1], dc_c, ac_c, bw
                )
                preds[2] = _encode_block(
                    block(crs, 8 * mx, 8 * my), cq, preds[2], dc_c, ac_c, bw
                )
            else:
                preds[0] = _encode_block(
                    block(yp, 8 * mx, 8 * my), lq, preds[0], dc_l, ac_l, bw
                )
                preds[1] = _encode_block(
                    block(cbs, 8 * mx, 8 * my), cq, preds[1], dc_c, ac_c, bw
                )
                preds[2] = _encode_block(
                    block(crs, 8 * mx, 8 * my), cq, preds[2], dc_c, ac_c, bw
                )
            n_mcu += 1
    bw.pad_to_byte()

    zz_lq = bytes(lq[ZIGZAG[i]] for i in range(64))
    zz_cq = bytes(cq[ZIGZAG[i]] for i in range(64))
    samp = 0x22 if h2 else 0x11
    out = bytearray()
    out += _marker(0xD8)  # SOI
    out += _marker(
        0xE0, b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01" + b"\x00\x00"
    )
    out += _marker(0xDB, b"\x00" + zz_lq)
    out += _marker(0xDB, b"\x01" + zz_cq)
    out += _marker(
        0xC0,
        bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([3, 1, samp, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _marker(0xC4, _dht_body(0, 0, DC_LUM_SPEC))
    out += _marker(0xC4, _dht_body(1, 0, AC_LUM_SPEC))
    out += _marker(0xC4, _dht_body(0, 1, DC_CHR_SPEC))
    out += _marker(0xC4, _dht_body(1, 1, AC_CHR_SPEC))
    if restart_interval:
        out += _marker(0xDD, restart_interval.to_bytes(2, "big"))
    out += _marker(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bw.buf
    out += _marker(0xD9)  # EOI
    return bytes(out)


# ── decoder ──────────────────────────────────────────────────────────────
#
# r15: coefficient-buffer architecture — every scan (baseline's single
# interleaved one, or a progressive file's many) decodes into per-block
# zigzag coefficient arrays; the IDCT/upsample/color tail runs once at
# EOI.  This is what lets SOF2 progressive decode reuse the whole
# baseline machinery: a baseline scan is just Ss=0..63, Ah=Al=0.


def _scan_blocks_interleaved(frame, scan_comps):
    """MCU-ordered (comp_index, by, bx) walk over the PADDED block grid
    (interleaved scans cover whole MCUs, per A.2.3)."""
    width, height, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for si, (comp, _, _) in enumerate(scan_comps):
                for bj in range(comp["v"]):
                    for bi in range(comp["h"]):
                        yield si, my * comp["v"] + bj, mx * comp["h"] + bi


def _comp_true_blocks(frame, comp) -> tuple[int, int]:
    """A component's TRUE block grid (non-interleaved scans cover only
    this, per A.2.2 — the padded MCU grid can be larger)."""
    width, height, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    cw = (width * comp["h"] + hmax - 1) // hmax
    ch = (height * comp["v"] + vmax - 1) // vmax
    return (cw + 7) // 8, (ch + 7) // 8


def _decode_scan(
    buf: bytes,
    pos: int,
    frame,
    scan_comps,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
    coefs,
    preds,
    progressive: bool,
) -> int:
    """Decode one scan's entropy-coded data into the coefficient buffers;
    returns the stream position after the scan.  ``scan_comps`` is a
    list of (comp, dc_decoder_or_None, ac_decoder_or_None)."""
    br = _BitReader(buf, pos)
    eobrun = 0

    def dc_first(zz, comp, ddec):
        nonlocal br
        size = ddec.decode(br)
        if size > 11:
            raise ValueError("jpeg: DC category > 11")
        diff = _extend(br.get(size), size) if size else 0
        preds[comp["id"]] += diff
        zz[0] = preds[comp["id"]] << al

    def sequential_block(zz, comp, ddec, adec):
        dc_first(zz, comp, ddec)
        k = 1
        while k < 64:
            rs = adec.decode(br)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    # k == 64 exactly (16 zeros through zz63) is decodable
                    # even though an encoder would use EOB; PAST that is a
                    # corrupt run, same contract as the coefficient path
                    if k > 64:
                        raise ValueError("jpeg: AC run past block end")
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("jpeg: AC run past block end")
            zz[k] = _extend(br.get(s), s)
            k += 1

    def ac_first(zz, adec):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = adec.decode(br)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.get(r)
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("jpeg: AC run past band end")
            zz[k] = _extend(br.get(s), s) << al
            k += 1

    def ac_refine(zz, adec):
        # T.81 G.1.2.3 / the jdphuff shape: newly-nonzero coefficients
        # arrive as run|1 symbols; already-nonzero ones consume one
        # correction bit each as the run advances past them
        nonlocal eobrun
        p1, m1 = 1 << al, -1 << al
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = adec.decode(br)
                r, s = rs >> 4, rs & 15
                val = 0
                if s == 0:
                    if r < 15:
                        # NOTE the convention difference from the first
                        # pass: a refinement EOB run INCLUDES the current
                        # block (its remaining coefficients still consume
                        # correction bits below), so no -1 here — the
                        # apply branch decrements after processing
                        eobrun = 1 << r
                        if r:
                            eobrun += br.get(r)
                        break
                    # r == 15: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError(
                            "jpeg: refinement scan with magnitude > 1"
                        )
                    val = p1 if br.get(1) else m1
                while k <= se:
                    if zz[k] != 0:
                        if br.get(1) and (zz[k] & p1) == 0:
                            zz[k] += p1 if zz[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    zz[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                if zz[k] != 0 and br.get(1) and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
                k += 1
            eobrun -= 1

    def dc_refine(zz):
        if br.get(1):
            zz[0] |= 1 << al

    def decode_unit(si: int, by: int, bx: int) -> None:
        comp, ddec, adec = scan_comps[si]
        zz = coefs[comp["id"]][by][bx]
        if not progressive:
            sequential_block(zz, comp, ddec, adec)
        elif ss == 0:
            dc_refine(zz) if ah else dc_first(zz, comp, ddec)
        else:
            ac_refine(zz, adec) if ah else ac_first(zz, adec)

    interleaved = len(scan_comps) > 1
    if interleaved:
        units = list(_scan_blocks_interleaved(frame, scan_comps))
    else:
        comp = scan_comps[0][0]
        tbw, tbh = _comp_true_blocks(frame, comp)
        units = [(0, by, bx) for by in range(tbh) for bx in range(tbw)]
    n_unit = 0
    rst_idx = 0
    # units per restart interval: MCUs when interleaved, blocks otherwise
    if interleaved:
        per_mcu = sum(c["h"] * c["v"] for c, _, _ in scan_comps)
    else:
        per_mcu = 1
    for si, by, bx in units:
        if (
            restart_interval
            and n_unit
            and n_unit % (restart_interval * per_mcu) == 0
        ):
            br.align_and_expect_rst(rst_idx)
            rst_idx += 1
            for c, _, _ in scan_comps:
                preds[c["id"]] = 0
            eobrun = 0
        decode_unit(si, by, bx)
        n_unit += 1
    # resync: the scan's entropy data may end with at most one unread pad
    # byte before the next marker — an all-ones 0xFF pad is emitted with
    # its stuffed 0x00, so the ONLY legal skip is a single FF 00 pair
    # (r15 advice: the old loop skipped up to 4 ARBITRARY bytes, which
    # silently tolerated garbage and weakened the corrupt-input contract)
    pos = br.pos
    if pos + 1 < len(buf) and buf[pos] == 0xFF and buf[pos + 1] == 0x00:
        pos += 2  # stuffed all-ones pad byte
    if pos + 1 < len(buf) and buf[pos] == 0xFF and buf[pos + 1] != 0x00:
        return pos
    raise ValueError("jpeg: expected a marker after scan data")


def decode_jpeg(buf: bytes) -> tuple[int, int, bytes]:
    """JPEG decoder — baseline sequential (SOF0/1) and PROGRESSIVE
    (SOF2, r15): marker walk (APPn/COM skipped), 8-/16-bit DQT, DHT,
    DRI, any number of scans decoding into per-block coefficient
    buffers — spectral selection, successive approximation (DC and the
    AC correction-bit algorithm of G.1.2.3), EOB runs, restart markers
    in any scan — then one IDCT/upsample/color pass at EOI.  Supports
    1-component grayscale and 3-component 4:4:4 / 4:2:2 / 4:2:0.
    Corrupt or truncated input raises ``ValueError``; capabilities
    outside that (12-bit, arithmetic coding, lossless, hierarchical)
    raise too — loudly, never a wrong image."""
    if len(buf) < 4 or buf[0] != 0xFF or buf[1] != 0xD8:
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None
    progressive = False
    coefs: dict[int, list[list[list[int]]]] | None = None
    preds: dict[int, int] = {}
    saw_scan = False
    while True:
        if pos + 2 > len(buf):
            raise ValueError("jpeg: truncated before SOS")
        if buf[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}, got {buf[pos]:#x}")
        tag = buf[pos + 1]
        if tag == 0xD9:  # EOI
            if not saw_scan:
                raise ValueError("jpeg: EOI before any scan")
            break
        if pos + 4 > len(buf):
            raise ValueError("jpeg: truncated before SOS")
        seglen = int.from_bytes(buf[pos + 2 : pos + 4], "big")
        if seglen < 2 or pos + 2 + seglen > len(buf):
            raise ValueError(f"jpeg: bad segment length for marker {tag:#x}")
        body = buf[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if tag == 0xDB:  # DQT (possibly several tables per marker)
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 15
                bp += 1
                if pq == 0:
                    raw = list(body[bp : bp + 64])
                    bp += 64
                elif pq == 1:
                    raw = [
                        int.from_bytes(body[bp + 2 * i : bp + 2 * i + 2], "big")
                        for i in range(64)
                    ]
                    bp += 128
                else:
                    raise ValueError(f"jpeg: bad DQT precision {pq}")
                if len(raw) < 64:
                    raise ValueError("jpeg: truncated DQT")
                nat = [0] * 64
                for i in range(64):
                    nat[ZIGZAG[i]] = raw[i]
                qtabs[tq] = nat
        elif tag == 0xC4:  # DHT (possibly several tables per marker)
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 15
                bits = tuple(body[bp + 1 : bp + 17])
                nv = sum(bits)
                vals = tuple(body[bp + 17 : bp + 17 + nv])
                if len(vals) < nv:
                    raise ValueError("jpeg: truncated DHT")
                bp += 17 + nv
                dec = _HuffDecoder(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
        elif tag in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if frame is not None:
                raise ValueError("jpeg: multiple SOF markers")
            progressive = tag == 0xC2
            prec = body[0]
            if prec != 8:
                raise ValueError(f"jpeg: only 8-bit precision, got {prec}")
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise ValueError(f"jpeg: {ncomp} components unsupported")
            comps = []
            for i in range(ncomp):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 15, "tq": tq}
                )
            frame = (width, height, comps)
            for c in comps:
                if not (1 <= c["h"] <= 2 and 1 <= c["v"] <= 2):
                    raise ValueError(
                        f"jpeg: sampling factors {c['h']}x{c['v']} unsupported"
                    )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
            coefs = {
                c["id"]: [
                    [[0] * 64 for _ in range(mcus_x * c["h"])]
                    for _ in range(mcus_y * c["v"])
                ]
                for c in comps
            }
            preds = {c["id"]: 0 for c in comps}
        elif tag in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"jpeg: non-baseline SOF marker {tag:#x} (arithmetic/"
                "lossless/hierarchical) unsupported"
            )
        elif tag == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[:2], "big")
        elif tag == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            width, height, comps = frame
            by_id = {c["id"]: c for c in comps}
            ns = body[0]
            if len(body) < 4 + 2 * ns:
                raise ValueError("jpeg: truncated SOS header")
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 15
            if not progressive:
                if (ss, se, ah, al) != (0, 63, 0, 0):
                    raise ValueError(
                        "jpeg: sequential scan with progressive parameters"
                    )
                if ns != len(comps):
                    raise ValueError(
                        "jpeg: scan component count != frame "
                        "(one interleaved scan only)"
                    )
            else:
                if ss == 0 and se != 0:
                    raise ValueError(
                        "jpeg: progressive scan with Ss=0 must have Se=0"
                    )
                if ss > 0 and (ns != 1 or se < ss or se > 63):
                    raise ValueError(
                        "jpeg: progressive AC scan must be one component "
                        "with a valid Ss..Se band"
                    )
            scan_comps = []
            for i in range(ns):
                cs, tabs = body[1 + 2 * i], body[2 + 2 * i]
                td, ta = tabs >> 4, tabs & 15
                if cs not in by_id:
                    raise ValueError(
                        f"jpeg: scan references unknown component {cs}"
                    )
                need_dc = (not progressive) or (ss == 0 and ah == 0)
                need_ac = (not progressive) or ss > 0
                if need_dc and td not in huff_dc:
                    raise ValueError(
                        "jpeg: scan references missing Huffman table"
                    )
                if need_ac and ta not in huff_ac:
                    raise ValueError(
                        "jpeg: scan references missing Huffman table"
                    )
                scan_comps.append(
                    (by_id[cs], huff_dc.get(td), huff_ac.get(ta))
                )
            pos = _decode_scan(
                buf,
                pos,
                frame,
                scan_comps,
                ss,
                se,
                ah,
                al,
                restart_interval,
                coefs,
                preds,
                progressive,
            )
            saw_scan = True
        # APPn / COM / anything else with a length: skipped

    width, height, comps = frame
    for c in comps:
        if c["tq"] not in qtabs:
            raise ValueError(f"jpeg: missing quant table {c['tq']}")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = {}
    for c in comps:
        grid = coefs[c["id"]]
        plane = [[0] * (len(grid[0]) * 8) for _ in range(len(grid) * 8)]
        for by, row in enumerate(grid):
            for bx, zz in enumerate(row):
                nat = [0] * 64
                for i in range(64):
                    nat[ZIGZAG[i]] = zz[i]
                out = idct8x8(nat, qtabs[c["tq"]])
                for j in range(8):
                    plane[8 * by + j][8 * bx : 8 * bx + 8] = out[
                        8 * j : 8 * j + 8
                    ]
        planes[c["id"]] = plane

    rgb = bytearray(3 * width * height)
    if len(comps) == 1:
        plane = planes[comps[0]["id"]]
        for yy in range(height):
            for xx in range(width):
                o = 3 * (width * yy + xx)
                v = plane[yy][xx]
                rgb[o] = rgb[o + 1] = rgb[o + 2] = v
        return width, height, bytes(rgb)
    cy, ccb, ccr = (comps[0], comps[1], comps[2])
    py_, pcb, pcr = planes[cy["id"]], planes[ccb["id"]], planes[ccr["id"]]
    for yy in range(height):
        for xx in range(width):
            o = 3 * (width * yy + xx)
            y = py_[yy * cy["v"] // vmax][xx * cy["h"] // hmax]
            cb = pcb[yy * ccb["v"] // vmax][xx * ccb["h"] // hmax]
            cr = pcr[yy * ccr["v"] // vmax][xx * ccr["h"] // hmax]
            rgb[o], rgb[o + 1], rgb[o + 2] = ycbcr_to_rgb(y, cb, cr)
    return width, height, bytes(rgb)


# ── the oracle-replayable closed form ────────────────────────────────────


def solid_roundtrip_rgb(
    r: int, g: int, b: int, quality: int = 90
) -> tuple[int, int, int]:
    """The closed-form integer prediction of what ``decode_jpeg(
    encode_jpeg(<solid r,g,b>))`` returns for EVERY pixel: a solid image
    is DC-only in every block, so the whole lossy chain is

        (y,cb,cr) = fixed-point forward transform
        qdc       = round_away(64*(v-128) / (8*q00))   per component
        recon     = clamp(128 + descale((qdc*q00) << 2, 5))
        (r,g,b)   = fixed-point inverse transform

    with q00 = the quality-scaled [0][0] quant entry.  This function is
    the Python transcription of the SQL the registry oracle runs — the
    ``jpeg_px_sum`` gate passes only when the REAL encoder+decoder
    agree with it on every row."""
    lq00 = quant_table(LUM_QUANT_BASE, quality)[0]
    cq00 = quant_table(CHR_QUANT_BASE, quality)[0]
    y, cb, cr = rgb_to_ycbcr(r, g, b)

    def dc_chain(v: int, q00: int) -> int:
        num = 64 * (v - 128)
        q8 = 8 * q00
        qdc = (num + q8 // 2) // q8 if num >= 0 else -((-num + q8 // 2) // q8)
        return _clamp8(128 + _descale((qdc * q00) << PASS1_BITS, PASS1_BITS + 3))

    return ycbcr_to_rgb(dc_chain(y, lq00), dc_chain(cb, cq00), dc_chain(cr, cq00))
