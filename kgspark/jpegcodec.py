"""Stdlib-only baseline JPEG codec (subset) — the fourth REAL media format.

Pairs with :mod:`kgspark.datagen_media` (emits valid files) and
:mod:`kgspark.multimodal` (decodes any conforming file of this profile).
Spec-derived from ITU-T T.81 (the public JPEG specification) plus the JFIF
container note.  Supported profile:

  * baseline sequential DCT (SOF0), 8-bit precision;
  * one grayscale component, OR three YCbCr components at 1x1 sampling
    (4:4:4), OR three YCbCr components with chroma at 1x1 and Y at 2x2
    (4:2:0 — the layout virtually every camera/tool emits) or 2x1
    (4:2:2 — the broadcast-video layout);
  * DRI restart intervals with byte-aligned cycling RST0-7 markers and
    DC-predictor resets (the error-resilience layout most camera JPEGs
    carry) — emitted on request, always honored on decode;
  * no progressive / arithmetic coding — the decoder raises a clear
    :class:`ValueError` on those rather than guessing;
  * T.81 Annex K.1/K.2 quantization tables and Annex K.3 luminance +
    chrominance Huffman tables (the interchange-standard tables every
    JPEG tool ships).

Color is DEFINED over integer fixed-point JFIF transforms: the decoder's
YCbCr→RGB is ``R = Y + ((91881*(Cr-128) + 32768) >> 16)`` etc. (constants
``round(c * 2**16)`` of the CCIR 601 full-range matrix), all in exact
integer arithmetic, so independent implementations of the same definition
reproduce RGB BIT-EXACTLY — the same property the integer IDCT provides
for the grayscale path.  Subsampled chroma is DEFINED the same way on
both sides: the encoder downsample is the exact rounded mean of the cell
(2x2 ``(a+b+c+d+2) >> 2`` for 4:2:0, 2x1 ``(a+b+1) >> 1`` for 4:2:2,
clamp-to-edge on odd dims) and the decoder upsample is pixel replication
(``C[y//2][x//2]`` / ``C[y][x//2]``) — both pure integer, so subsampled
decode stays bit-exact across independent implementations.

Decode is DEFINED over an integer fixed-point IDCT: the 1-D basis constants
are ``round(alpha(u) * cos((2x+1)*u*pi/16) * 2**20)`` (:data:`IDCT_FIX`),
the separable 2-D transform accumulates in exact integers (Python ints never
overflow), and the final pixel is ``((s + 2**41) >> 42) + 128`` clamped to
[0, 255].  Every term is integer arithmetic, so any independent
implementation of the same definition reproduces pixels BIT-EXACTLY — the
property kgspark.media_oracles relies on for digest oracles (floating-point
IDCTs cannot promise this across summation orders).

The encoder's forward DCT is float64 (its rounding only shapes which valid
file is emitted, not how files decode); quantized coefficients are coded
with standard DC-difference / AC run-length Huffman entropy coding, 0xFF
bytes stuffed with 0x00 per the spec.

No third-party codec exists in the sandbox; correctness is pinned by
round-trip property tests (tests/test_multimodal.py) plus independent
byte-layout restatement in kgspark.media_oracles.
"""

from __future__ import annotations

import math
import struct

# --------------------------------------------------------------- constants

# zigzag scan: position k in the coded stream -> natural (row-major) index
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

# T.81 Annex K.1 luminance quantization table, natural (row-major) order
QTABLE = (
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
)

# T.81 Annex K.3 luminance Huffman specs: BITS (codes per length 1..16) and
# the values in code order.
DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_VALS = tuple(range(12))
AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_VALS = (
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
)

# T.81 Annex K.2 chrominance quantization table, natural (row-major) order
QTABLE_C = (
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
)

# T.81 Annex K.3 chrominance Huffman specs
DC_BITS_C = (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
DC_VALS_C = tuple(range(12))
AC_BITS_C = (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
AC_VALS_C = (
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
)

_FIX_SHIFT = 20

# JFIF / CCIR 601 full-range color matrix at 2^16 fixed point — the DEFINED
# integer transforms (floor-shift with +32768 pre-add = round-half-up, exact
# over Python ints, so independent implementations agree bit-exactly).
# Computed from the defining formula, never hard-coded: a transcribed
# constant drifted from round() once (22554 vs the true 22553 for 0.344136,
# caught by the Hypothesis decode-vs-independent-oracle roundtrip) and a
# ±1 constant shows up only as a rare ±1 pixel on rounding boundaries.
_C_RV = round(1.402 * 2**16)
_C_GU = round(0.344136 * 2**16)
_C_GV = round(0.714136 * 2**16)
_C_BU = round(1.772 * 2**16)
_C_YR, _C_YG, _C_YB = (round(c * 2**16) for c in (0.299, 0.587, 0.114))
_C_UR, _C_UG = (round(c * 2**16) for c in (0.168736, 0.331264))
_C_VG, _C_VB = (round(c * 2**16) for c in (0.418688, 0.081312))


def _clamp8(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def rgb_to_ycbcr(r: int, g: int, b: int) -> tuple:
    """Integer JFIF forward transform (encoder side)."""
    y = (_C_YR * r + _C_YG * g + _C_YB * b + 32768) >> 16
    cb = 128 + ((-_C_UR * r - _C_UG * g + 32768 * b + 32768) >> 16)
    cr = 128 + ((32768 * r - _C_VG * g - _C_VB * b + 32768) >> 16)
    return _clamp8(y), _clamp8(cb), _clamp8(cr)


def ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple:
    """The DEFINED integer inverse transform (decoder side): bit-exact by
    construction for any independent implementation of the same formula."""
    cb -= 128
    cr -= 128
    r = y + ((_C_RV * cr + 32768) >> 16)
    g = y - ((_C_GU * cb + _C_GV * cr + 32768) >> 16)
    b = y + ((_C_BU * cb + 32768) >> 16)
    return _clamp8(r), _clamp8(g), _clamp8(b)

# the DEFINED integer IDCT basis: alpha(u)*cos((2x+1)*u*pi/16) at 2^20 scale
IDCT_FIX = tuple(
    tuple(
        round(
            (math.sqrt(0.5) if u == 0 else 1.0)
            * math.cos((2 * x + 1) * u * math.pi / 16)
            * (1 << _FIX_SHIFT)
        )
        for x in range(8)
    )
    for u in range(8)
)

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
    for u in range(8)
]


def huff_codes(bits, vals) -> dict:
    """Canonical Huffman assignment per T.81 Annex C: value -> (code, size)."""
    codes = {}
    code, k = 0, 0
    for size in range(1, 17):
        for _ in range(bits[size - 1]):
            codes[vals[k]] = (code, size)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits, vals) -> dict:
    """(size, code) -> value map for the bit-at-a-time decoder."""
    return {(s, c): v for v, (c, s) in huff_codes(bits, vals).items()}


# ----------------------------------------------------------------- encoder


class _BitWriter:
    """MSB-first bit packer with 0xFF -> 0xFF 0x00 byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, size: int) -> None:
        self.acc = (self.acc << size) | (code & ((1 << size) - 1))
        self.n += size
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 B.2.5) — the state a
        restart marker must be emitted in."""
        if self.n:
            pad = 8 - self.n
            b = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.acc = self.n = 0

    def marker(self, m: int) -> None:
        """Append a raw (unstuffed) marker, byte-aligned."""
        self.align()
        self.buf += bytes([0xFF, m])

    def flushed(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _fdct_quant(pix: list, qtable: tuple = QTABLE) -> list:
    """Level shift, float separable forward DCT, quantize by ``qtable``.

    Returns 64 natural-order coefficients."""
    t = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        row = pix[y * 8 : (y + 1) * 8]
        for u in range(8):
            cu = _COS[u]
            t[y][u] = sum((row[x] - 128) * cu[x] for x in range(8))
    out = [0] * 64
    r2 = math.sqrt(0.5)
    for v in range(8):
        cv = _COS[v]
        for u in range(8):
            s = sum(t[y][u] * cv[y] for y in range(8))
            a = (r2 if u == 0 else 1.0) * (r2 if v == 0 else 1.0)
            out[v * 8 + u] = round(s * a / (4.0 * qtable[v * 8 + u]))
    return out


def _magnitude(v: int) -> tuple:
    """(category, value-bits) for DC-diff / AC coefficient coding."""
    cat = abs(v).bit_length()
    return cat, (v if v >= 0 else v + (1 << cat) - 1)


def _encode_block(bw: "_BitWriter", coef: list, prev_dc: int, dc: dict, ac: dict) -> int:
    """Entropy-code one quantized block (DC-diff + AC run-length); returns
    this block's DC for the caller's per-component predictor."""
    cat, bits = _magnitude(coef[0] - prev_dc)
    code, size = dc[cat]
    bw.write(code, size)
    if cat:
        bw.write(bits, cat)
    run = 0
    for k in range(1, 64):
        v = coef[ZIGZAG[k]]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, size = ac[0xF0]  # ZRL
            bw.write(code, size)
            run -= 16
        cat, bits = _magnitude(v)
        code, size = ac[(run << 4) | cat]
        bw.write(code, size)
        bw.write(bits, cat)
        run = 0
    if run:
        code, size = ac[0x00]  # EOB
        bw.write(code, size)
    return coef[0]


def _block_pixels(plane, w: int, h: int, bx: int, by: int) -> list:
    """8x8 block at (bx, by), clamp-to-edge padded."""
    return [
        plane[min(h - 1, by * 8 + j) * w + min(w - 1, bx * 8 + i)]
        for j in range(8)
        for i in range(8)
    ]


def _seg(marker: int, data: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data


_JFIF_APP0 = b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"


def make_jpeg(w: int, h: int, gray: bytes, restart_interval: int = 0) -> bytes:
    """A VALID baseline JFIF file: SOI, APP0, DQT, SOF0 (grayscale, 1x1),
    DHT (Annex K luminance DC+AC), SOS, entropy-coded MCUs, EOI.  Edge
    blocks pad by clamp-to-edge replication.  ``restart_interval`` > 0
    additionally emits a DRI segment and a byte-aligned RST0-7 marker
    (cycling) after every that-many MCUs, resetting the DC predictor —
    the T.81 error-resilience layout most camera JPEGs carry."""
    if w <= 0 or h <= 0:
        # Mirror the decoder's dims guard: 0x0 would pass the length check
        # with an empty buffer yet emit a file decode_jpeg itself rejects.
        raise ValueError("JPEG dims outside supported profile")
    if len(gray) != w * h:
        raise ValueError("gray buffer does not match dims")
    dc = huff_codes(DC_BITS, DC_VALS)
    ac = huff_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    mcu = 0
    total = ((h + 7) // 8) * ((w + 7) // 8)
    for by in range((h + 7) // 8):
        for bx in range((w + 7) // 8):
            coef = _fdct_quant(_block_pixels(gray, w, h, bx, by))
            prev_dc = _encode_block(bw, coef, prev_dc, dc, ac)
            mcu += 1
            if (
                restart_interval
                and mcu % restart_interval == 0
                and mcu < total
            ):
                bw.marker(0xD0 + (mcu // restart_interval - 1) % 8)
                prev_dc = 0

    dri = (
        _seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xFF\xD8"
        + _seg(0xE0, _JFIF_APP0)
        + _seg(0xDB, b"\x00" + bytes(QTABLE[ZIGZAG[k]] for k in range(64)))
        + _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        + _seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
        + _seg(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
        + dri
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bw.flushed()
        + b"\xFF\xD9"
    )


def downsample_420(plane, w: int, h: int) -> tuple:
    """The DEFINED integer 4:2:0 chroma downsample: each chroma sample is
    the rounded mean ``(a+b+c+d+2) >> 2`` of its 2x2 cell, clamp-to-edge
    replicated on odd dims.  Exact integer arithmetic — independent
    implementations agree bit-exactly.  Returns (bytes, cw, ch)."""
    cw, ch = (w + 1) // 2, (h + 1) // 2
    out = bytearray(cw * ch)
    for cy in range(ch):
        y0 = 2 * cy
        y1 = min(h - 1, y0 + 1)
        for cx in range(cw):
            x0 = 2 * cx
            x1 = min(w - 1, x0 + 1)
            s = (
                plane[y0 * w + x0]
                + plane[y0 * w + x1]
                + plane[y1 * w + x0]
                + plane[y1 * w + x1]
            )
            out[cy * cw + cx] = (s + 2) >> 2
    return bytes(out), cw, ch


def downsample_422(plane, w: int, h: int) -> tuple:
    """The DEFINED integer 4:2:2 chroma downsample: each chroma sample is
    the rounded horizontal mean ``(a+b+1) >> 1`` of its 2x1 cell,
    clamp-to-edge on odd widths.  Returns (bytes, cw, h)."""
    cw = (w + 1) // 2
    out = bytearray(cw * h)
    for y in range(h):
        for cx in range(cw):
            x0 = 2 * cx
            x1 = min(w - 1, x0 + 1)
            out[y * cw + cx] = (plane[y * w + x0] + plane[y * w + x1] + 1) >> 1
    return bytes(out), cw, h


def make_jpeg_color(
    w: int,
    h: int,
    rgb: bytes,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """A VALID baseline JFIF COLOR file: 3-component YCbCr, interleaved
    MCUs.  Y uses the Annex K.1 quant + K.3 luminance Huffman tables (ids
    0), Cb/Cr the Annex K.2 quant + K.3 chrominance tables (ids 1) — the
    standard two-table layout every JPEG tool emits for color.

    ``subsampling="444"`` (default): all components 1x1, one block each
    per 8x8 MCU — byte-identical to the pre-4:2:0 encoder.
    ``subsampling="420"``: Y at 2x2, chroma at 1x1 over the
    :func:`downsample_420` planes — 16x16 MCUs of four Y blocks (raster
    order per T.81 A.2.3) then one Cb and one Cr block.
    ``subsampling="422"``: Y at 2x1, chroma at 1x1 over the
    :func:`downsample_422` planes — 16x8 MCUs of two Y blocks then one
    Cb and one Cr block (the broadcast-video layout).
    ``restart_interval`` > 0: DRI + cycling byte-aligned RST0-7 after
    every that-many MCUs, all DC predictors reset (see make_jpeg)."""
    if w <= 0 or h <= 0:
        raise ValueError("JPEG dims outside supported profile")
    if len(rgb) != 3 * w * h:
        raise ValueError("rgb buffer does not match dims")
    if subsampling not in ("444", "422", "420"):
        raise ValueError("subsampling must be '444', '422' or '420'")
    n = w * h
    planes = [bytearray(n), bytearray(n), bytearray(n)]
    for i in range(n):
        y, cb, cr = rgb_to_ycbcr(rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2])
        planes[0][i], planes[1][i], planes[2][i] = y, cb, cr
    dc_l, ac_l = huff_codes(DC_BITS, DC_VALS), huff_codes(AC_BITS, AC_VALS)
    dc_c, ac_c = huff_codes(DC_BITS_C, DC_VALS_C), huff_codes(AC_BITS_C, AC_VALS_C)
    bw = _BitWriter()
    prev = [0, 0, 0]
    mcu = 0

    def _restart(total: int) -> None:
        nonlocal mcu
        mcu += 1
        if restart_interval and mcu % restart_interval == 0 and mcu < total:
            bw.marker(0xD0 + (mcu // restart_interval - 1) % 8)
            prev[0] = prev[1] = prev[2] = 0

    if subsampling == "444":
        y_samp = 0x11
        tabs = [(dc_l, ac_l, QTABLE), (dc_c, ac_c, QTABLE_C), (dc_c, ac_c, QTABLE_C)]
        total = ((h + 7) // 8) * ((w + 7) // 8)
        for by in range((h + 7) // 8):
            for bx in range((w + 7) // 8):
                for ci, (dc, ac, q) in enumerate(tabs):
                    coef = _fdct_quant(_block_pixels(planes[ci], w, h, bx, by), q)
                    prev[ci] = _encode_block(bw, coef, prev[ci], dc, ac)
                _restart(total)
    else:
        yh, yv = (2, 2) if subsampling == "420" else (2, 1)
        y_samp = (yh << 4) | yv
        down = downsample_420 if subsampling == "420" else downsample_422
        cb, cw_, ch_ = down(planes[1], w, h)
        cr, _, _ = down(planes[2], w, h)
        mcux = (w + 8 * yh - 1) // (8 * yh)
        mcuy = (h + 8 * yv - 1) // (8 * yv)
        total = mcux * mcuy
        for my in range(mcuy):
            for mx in range(mcux):
                for v in range(yv):  # Y blocks, raster order (T.81 A.2.3)
                    for u in range(yh):
                        coef = _fdct_quant(
                            _block_pixels(
                                planes[0], w, h, yh * mx + u, yv * my + v
                            )
                        )
                        prev[0] = _encode_block(bw, coef, prev[0], dc_l, ac_l)
                coef = _fdct_quant(_block_pixels(cb, cw_, ch_, mx, my), QTABLE_C)
                prev[1] = _encode_block(bw, coef, prev[1], dc_c, ac_c)
                coef = _fdct_quant(_block_pixels(cr, cw_, ch_, mx, my), QTABLE_C)
                prev[2] = _encode_block(bw, coef, prev[2], dc_c, ac_c)
                _restart(total)

    dri = (
        _seg(0xDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xFF\xD8"
        + _seg(0xE0, _JFIF_APP0)
        + _seg(0xDB, b"\x00" + bytes(QTABLE[ZIGZAG[k]] for k in range(64)))
        + _seg(0xDB, b"\x01" + bytes(QTABLE_C[ZIGZAG[k]] for k in range(64)))
        + _seg(
            0xC0,
            struct.pack(">BHHB", 8, h, w, 3)
            + bytes([1, y_samp, 0, 2, 0x11, 1, 3, 0x11, 1]),
        )
        + _seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
        + _seg(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
        + _seg(0xC4, b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C))
        + _seg(0xC4, b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALS_C))
        + dri
        + _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        + bw.flushed()
        + b"\xFF\xD9"
    )


# ----------------------------------------------------------------- decoder

_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}  # SOFn minus DHT/JPG/DAC


def parse_dims(payload: bytes) -> tuple:
    """(width, height) from the REAL frame header: walk marker segments to
    the first SOFn and read the big-endian u16 dims at offsets 3/1 of its
    body — the true byte layout any JPEG tool parses."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG stream")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        while pos + 2 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1  # T.81 B.1.1.2: optional 0xFF fill bytes before a marker
        marker = payload[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2  # standalone markers carry no length
            continue
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker in _SOF_MARKERS:
            _prec, h, w = struct.unpack(">BHH", payload[pos + 4 : pos + 9])
            return w, h
        pos += 2 + ln
    raise ValueError("JPEG missing SOF")


def _parse_scan(payload: bytes) -> tuple:
    """Walk segments to SOS; returns (w, h, comps, entropy bytes,
    restart interval in MCUs — 0 when no DRI segment) where
    ``comps`` is a list — in frame order — of
    (qtable, dc_table, ac_table, hi, vi) per component (length 1 for
    grayscale, 3 for color).  Sampling profiles accepted: all components
    1x1 (grayscale / 4:4:4), or chroma 1x1 with Y 2x2 (4:2:0) or 2x1
    (4:2:2).  Raises on non-baseline / other-sampling /
    other-component-count streams."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG stream")
    pos = 2
    qtables: dict = {}
    dc_tabs: dict = {}
    ac_tabs: dict = {}
    sof = None
    ri = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        while pos + 2 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1  # T.81 B.1.1.2: optional 0xFF fill bytes before a marker
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        data = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = [0] * 64
                for k in range(64):
                    tbl[ZIGZAG[k]] = data[i + 1 + k]
                qtables[tq] = tbl
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 0x0F
                bits = tuple(data[i + 1 : i + 17])
                nv = sum(bits)
                vals = tuple(data[i + 17 : i + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack(">BHHB", data[:6])
            if prec != 8 or nc not in (1, 3):
                raise ValueError(
                    "unsupported JPEG profile (8-bit, 1 or 3 components only)"
                )
            if len(data) < 6 + 3 * nc:
                raise ValueError("JPEG SOF component list truncated")
            if not w or not h or w * h > (1 << 24):
                # cap BEFORE the decoder allocates w*h: a crafted SOF0
                # claiming 65535x65535 must not reserve 4 GB per row
                raise ValueError("JPEG dims outside supported profile")
            comps = []
            for c in range(nc):
                cid, samp, tq = data[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, tq, samp >> 4, samp & 0x0F))
            samps = [(hi, vi) for _cid, _tq, hi, vi in comps]
            if samps not in (
                [(1, 1)] * nc,  # grayscale / 4:4:4
                [(2, 2), (1, 1), (1, 1)],  # 4:2:0
                [(2, 1), (1, 1), (1, 1)],  # 4:2:2
            ):
                raise ValueError(
                    "sampling unsupported (4:4:4, 4:2:2 or 4:2:0 YCbCr only)"
                )
            sof = (w, h, comps)
        elif marker in _SOF_MARKERS:
            raise ValueError("not a baseline-sequential JPEG")
        elif marker == 0xDD:
            if ln != 4:
                raise ValueError("bad DRI segment length")
            (ri,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            w, h, fcomps = sof
            ns = data[0]
            if ns != len(fcomps):
                raise ValueError("JPEG scan component count != frame")
            comps = []
            for c in range(ns):
                cs, sel = data[1 + 2 * c], data[2 + 2 * c]
                if cs != fcomps[c][0]:
                    # interleaved decode assumes scan order == frame order
                    # (what every baseline encoder emits)
                    raise ValueError("JPEG scan component order != frame")
                td, ta = sel >> 4, sel & 0x0F
                tq = fcomps[c][1]
                if tq not in qtables or td not in dc_tabs or ta not in ac_tabs:
                    raise ValueError("JPEG scan references undefined tables")
                comps.append(
                    (qtables[tq], dc_tabs[td], ac_tabs[ta],
                     fcomps[c][2], fcomps[c][3])
                )
            return w, h, comps, payload[pos + 2 + ln :], ri
        pos += 2 + ln
    raise ValueError("JPEG missing SOS")


class _BitReader:
    """MSB-first bit reader over entropy-coded data; un-stuffs 0xFF 0x00 and
    stops (raises) at any real marker — the EOI that trails the scan is
    never consumed because the caller reads exactly the MCU count."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG scan")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else -1
                if nxt != 0x00:
                    raise ValueError("unexpected marker inside JPEG scan")
                self.pos += 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self, m: int) -> None:
        """Consume the byte-aligned RSTm marker (T.81 E.2.4): drop the
        current byte's padding bits, then require exactly 0xFF 0xD0+m."""
        self.n = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("truncated JPEG scan at restart")
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + m:
            raise ValueError("missing JPEG restart marker")
        self.pos += 2


def _read_code(br: _BitReader, table: dict) -> int:
    code = 0
    for size in range(1, 17):
        code = (code << 1) | br.bit()
        v = table.get((size, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, cat: int) -> int:
    """T.81 F.2.2.1 EXTEND: map cat raw bits to the signed coefficient."""
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def idct_block(coef: list) -> list:
    """The DEFINED integer IDCT: 64 natural-order dequantized coefficients
    -> 64 natural-order pixels in [0, 255].  Exact integer arithmetic over
    :data:`IDCT_FIX`; final rounding is ``((s + 2**41) >> 42) + 128``."""
    g = [[0] * 8 for _ in range(8)]
    for v in range(8):
        row = coef[v * 8 : (v + 1) * 8]
        for x in range(8):
            g[v][x] = sum(row[u] * IDCT_FIX[u][x] for u in range(8))
    out = [0] * 64
    half = 1 << (2 * _FIX_SHIFT + 1)
    shift = 2 * _FIX_SHIFT + 2
    for y in range(8):
        for x in range(8):
            s = sum(g[v][x] * IDCT_FIX[v][y] for v in range(8))
            p = ((s + half) >> shift) + 128
            out[y * 8 + x] = 0 if p < 0 else 255 if p > 255 else p
    return out


def _decode_block(br: "_BitReader", q: list, dc: dict, ac: dict, pred: int) -> tuple:
    """One entropy-coded block → (64 dequantized natural-order coefficients,
    new DC predictor)."""
    coef = [0] * 64
    cat = _read_code(br, dc)
    pred += _extend(br.bits(cat), cat) if cat else 0
    coef[0] = pred * q[0]
    k = 1
    while k < 64:
        sym = _read_code(br, ac)
        if sym == 0x00:  # EOB
            break
        run, cat = sym >> 4, sym & 0x0F
        if cat == 0:
            if run != 15:
                raise ValueError("invalid JPEG AC symbol")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        nat = ZIGZAG[k]
        coef[nat] = _extend(br.bits(cat), cat) * q[nat]
        k += 1
    return coef, pred


def decode_jpeg(payload: bytes) -> tuple:
    """REAL baseline JPEG decode for the supported profile: Huffman entropy
    decode, dequantize, inverse zigzag, integer IDCT, crop the MCU padding;
    3-component streams additionally run the defined integer YCbCr→RGB
    (after replicated chroma upsample for 4:2:0 / 4:2:2).  Returns (width, height,
    pixel bytes row-major) — ``w*h`` grayscale bytes for 1 component,
    ``3*w*h`` interleaved RGB bytes for 3."""
    w, h, comps, scan, ri = _parse_scan(payload)
    br = _BitReader(scan)
    hmax = max(c[3] for c in comps)
    vmax = max(c[4] for c in comps)
    # per-component plane dims: ceil(w*hi/hmax) x ceil(h*vi/vmax) (T.81
    # A.1.1); for all-1x1 profiles this is w x h and the MCU walk below is
    # exactly the old per-8x8-block raster
    dims = [(-(-w * hi // hmax), -(-h * vi // vmax)) for _q, _d, _a, hi, vi in comps]
    planes = [bytearray(cw * ch) for cw, ch in dims]
    preds = [0] * len(comps)
    mcu = 0
    for my in range(-(-h // (8 * vmax))):
        for mx in range(-(-w // (8 * hmax))):
            if ri and mcu and mcu % ri == 0:
                # T.81 E.2.4: byte-aligned cycling RST marker between
                # restart intervals; all DC predictors reset
                br.restart((mcu // ri - 1) % 8)
                preds = [0] * len(comps)
            mcu += 1
            for ci, (q, dc, ac, hi, vi) in enumerate(comps):
                cw, ch = dims[ci]
                plane = planes[ci]
                for v in range(vi):  # hi*vi data units, raster (T.81 A.2.3)
                    for u in range(hi):
                        coef, preds[ci] = _decode_block(br, q, dc, ac, preds[ci])
                        pix = idct_block(coef)
                        bx, by = mx * hi + u, my * vi + v
                        for j in range(8):
                            y = by * 8 + j
                            if y >= ch:
                                break
                            row = pix[j * 8 : (j + 1) * 8]
                            for i in range(8):
                                x = bx * 8 + i
                                if x >= cw:
                                    break
                                plane[y * cw + x] = row[i]
    if len(planes) == 1:
        return w, h, bytes(planes[0])
    out = bytearray(3 * w * h)
    py, pcb, pcr = planes
    if hmax == 1 and vmax == 1:  # 4:4:4 — the pre-subsampling flat loop
        for i in range(w * h):
            out[3 * i], out[3 * i + 1], out[3 * i + 2] = ycbcr_to_rgb(
                py[i], pcb[i], pcr[i]
            )
        return w, h, bytes(out)
    cbw = dims[1][0]
    crw = dims[2][0]
    _, _, _, chh, chv = comps[1]
    for y in range(h):
        yrow = y * w
        cbrow = (y * chv // vmax) * cbw
        crrow = (y * chv // vmax) * crw
        for x in range(w):
            cx = x * chh // hmax
            o = 3 * (yrow + x)
            out[o], out[o + 1], out[o + 2] = ycbcr_to_rgb(
                py[yrow + x], pcb[cbrow + cx], pcr[crrow + cx]
            )
    return w, h, bytes(out)
