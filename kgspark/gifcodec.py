"""Stdlib-only GIF89a codec (subset) — the second REAL media format.

Pairs with :mod:`kgspark.datagen_media` (emits valid files) and
:mod:`kgspark.multimodal` (decodes any conforming file of this profile).
Supported profile: one image block, 8-bit global color table, plain or
INTERLACED row order (the appendix-E four-pass layout, de-interlaced on
decode); the parser additionally skips GIF89a extension blocks and honors a
local color table, so files from standard encoders within this profile
decode too.

LZW per the GIF89a specification, appendix F:
  * variable code width starting at ``min_code_size + 1`` bits, LSB-first
    bit packing into the byte stream;
  * the "early change" width pairing — the encoder widens after assigning
    code ``2^width``, the decoder (which runs one table entry behind)
    widens after assigning code ``2^width - 1``;
  * width caps at 12 bits; when the table would exceed 4096 entries the
    encoder emits a Clear code and both sides reset.

No third-party codec exists in the sandbox; correctness is pinned by
round-trip property tests plus independent byte-layout restatement in
kgspark.media_oracles (header fields, palette, seeded pixel pattern).
"""

from __future__ import annotations

import struct

_MAX_WIDTH = 12
_TABLE_CAP = 1 << _MAX_WIDTH  # 4096


def lzw_encode(data: bytes, min_code_size: int = 8) -> bytes:
    """GIF-flavor LZW: index stream → packed code bytes (no sub-blocking)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < _TABLE_CAP:
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < _MAX_WIDTH:
                width += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        w = bytes([byte])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decode(
    data: bytes, min_code_size: int = 8, max_out: int | None = None
) -> bytes:
    """GIF-flavor LZW: packed code bytes → index stream.  ``max_out``
    bounds the decoded size (callers know it from the image descriptor) so
    a crafted high-expansion stream cannot balloon memory — a decode that
    would exceed it raises instead of allocating."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0

    def read() -> int | None:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = read()
        if code is None or code == end:
            break
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream: code {code}")
        out.extend(entry)
        if max_out is not None and len(out) > max_out:
            raise ValueError("LZW output exceeds declared image size")
        if prev is not None and len(table) < _TABLE_CAP:
            table.append(prev + entry[:1])
            # early change: widen one entry before the encoder's assignment
            if len(table) == (1 << width) and width < _MAX_WIDTH:
                width += 1
        prev = entry
    return bytes(out)


def interlace_order(h: int) -> list:
    """GIF89a appendix E four-pass row order: the y coordinates of stored
    rows in transmission sequence (pass 1: every 8th row from 0, pass 2:
    every 8th from 4, pass 3: every 4th from 2, pass 4: every 2nd from 1).
    Pure arithmetic — independent implementations agree exactly."""
    return (
        [y for y in range(0, h, 8)]
        + [y for y in range(4, h, 8)]
        + [y for y in range(2, h, 4)]
        + [y for y in range(1, h, 2)]
    )


def make_gif(
    w: int, h: int, palette: bytes, indices: bytes, interlace: bool = False
) -> bytes:
    """A VALID single-image GIF89a: logical screen descriptor, 256-entry
    global color table, image descriptor, LZW-compressed index data in
    255-byte sub-blocks, trailer.  ``interlace=True`` stores rows in the
    appendix-E four-pass order and sets the image-descriptor flag."""
    if len(palette) != 768:
        raise ValueError("palette must be 256 RGB entries (768 bytes)")
    if len(indices) != w * h:
        raise ValueError("index stream must be w*h bytes")
    # packed LSD: GCT present, 8 bits/channel color resolution, GCT size 7
    # (2^(7+1) = 256 entries)
    head = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0xF7, 0, 0]) + palette
    ipacked = 0x40 if interlace else 0x00
    img = (
        b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + bytes([ipacked]) + b"\x08"
    )
    if interlace:
        indices = b"".join(
            indices[y * w : (y + 1) * w] for y in interlace_order(h)
        )
    lzw = lzw_encode(indices, 8)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        part = lzw[i : i + 255]
        blocks.append(len(part))
        blocks.extend(part)
    blocks.append(0)
    return head + img + bytes(blocks) + b"\x3B"


def parse_gif(payload: bytes) -> tuple[int, int, bytes, bytes]:
    """Parse a conforming GIF of the supported profile.

    Returns (width, height, palette bytes, index stream w*h in LOGICAL row
    order — interlaced images are de-interlaced) for the FIRST image block;
    skips 0x21 extension blocks; honors a local color table.  Raises
    ValueError outside the profile (no image, bad magic).
    """
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    w, h = struct.unpack("<HH", payload[6:10])
    packed = payload[10]
    pos = 13
    palette = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:  # extension: introducer, label, then sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:
            iw, ih = struct.unpack("<HH", payload[pos + 5 : pos + 9])
            ipacked = payload[pos + 9]
            pos += 10
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                palette = payload[pos : pos + 3 * n]
                pos += 3 * n
            if not iw or not ih or iw * ih > (1 << 24):
                raise ValueError("GIF dims outside supported profile")
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data.extend(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            # bound: exact pixels + one table-cap entry of slack (the
            # final LZW entry lands whole before the size check)
            idx = lzw_decode(bytes(data), mcs, max_out=iw * ih + _TABLE_CAP)
            if len(idx) < iw * ih:
                raise ValueError("GIF pixel data truncated")
            idx = idx[: iw * ih]
            if ipacked & 0x40:
                # de-interlace: stored row k is logical row
                # interlace_order(ih)[k]
                out = bytearray(iw * ih)
                for k, y in enumerate(interlace_order(ih)):
                    out[y * iw : (y + 1) * iw] = idx[k * iw : (k + 1) * iw]
                idx = bytes(out)
            return iw, ih, palette, idx
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    raise ValueError("GIF has no image block")
