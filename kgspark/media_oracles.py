"""VALUES-based DuckDB oracles for the multimodal (binary-column) operators.

The media corpus is synthesized (kgspark.datagen_media), so expected rows are
computed driver-side from the same deterministic generator and inlined as SQL
``VALUES`` — the driver's DuckDB run then independently re-materializes them
against the Spark results (same mechanism as kgspark.web_oracles).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from . import datagen_media, multimodal

MEDIA_N = 40
MEDIA_SEED = 42


def _cell(v, t: str) -> str:
    if v is None:
        return f"CAST(NULL AS {'VARCHAR' if t == 's' else 'INTEGER'})"
    if t == "s":
        return "'" + str(v).replace("'", "''") + "'"
    return str(int(v))


def _values(rows: list[tuple], cols: list[str], types: list[str]) -> str:
    body = ",\n".join(
        "(" + ", ".join(_cell(c, t) for c, t in zip(r, types)) + ")"
        for r in sorted(rows, key=lambda r: tuple(str(x) for x in r))
    )
    return f"SELECT * FROM (VALUES\n{body}\n) AS t({', '.join(cols)})"


def _png_dims_independent(payload: bytes) -> tuple[int, int]:
    """Independent restatement of the TRUE PNG header layout: u32 width and
    height at byte offsets 16 and 20, inside the IHDR chunk that follows the
    8-byte signature.  Deliberately NOT a call into kgspark.multimodal."""
    import struct

    assert payload[12:16] == b"IHDR", "oracle: payload is not a valid PNG"
    return struct.unpack(">II", payload[16:24])


def _png_rows_independent(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Independent PNG pixel restatement: inflate IDAT, unfilter the
    scanlines (all five spec filters, recurrences restated from the PNG
    spec section 9 with an inline Paeth — not a call into the kernel),
    merge Adam7 passes when the IHDR says interlaced (pass geometry
    restated from spec 8.2).  Returns (w, h, RGB rows)."""
    import struct
    import zlib

    w, h = _png_dims_independent(payload)
    interlaced = payload[28]  # IHDR interlace byte (sig 8 + len/type 8 + 12)
    # collect IDAT payloads by scanning chunk headers
    idat, pos = b"", 8
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)

    def unfilter(off: int, pw: int, ph: int) -> list:
        sub: list = []
        for y in range(ph):
            f = raw[off + y * (1 + 3 * pw)]
            line = list(
                raw[off + y * (1 + 3 * pw) + 1 : off + (y + 1) * (1 + 3 * pw)]
            )
            above = sub[y - 1] if y else [0] * (3 * pw)
            for i in range(3 * pw):
                a = line[i - 3] if i >= 3 else 0  # left (already unfiltered)
                b = above[i]  # up
                c = above[i - 3] if i >= 3 else 0  # up-left
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    assert f == 4, f"oracle: bad PNG filter {f}"
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    )
                line[i] = (line[i] + pred) & 0xFF
            sub.append(line)
        return sub

    if not interlaced:
        rows = [bytes(r) for r in unfilter(0, w, h)]
    else:
        grid = [[0] * (3 * w) for _ in range(h)]
        off = 0
        for x0, y0, dx, dy in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            for j, line in enumerate(unfilter(off, pw, ph)):
                for i in range(pw):
                    x = x0 + i * dx
                    grid[y0 + j * dy][3 * x : 3 * x + 3] = line[
                        3 * i : 3 * i + 3
                    ]
            off += ph * (1 + 3 * pw)
        rows = [bytes(r) for r in grid]
    return w, h, rows


def _png_resize_independent(payload: bytes, tw: int, th: int) -> tuple:
    """Independent PNG thumbnail restatement on top of
    :func:`_png_rows_independent`: nearest-neighbour sample, re-encode,
    digest — row-slicing formulation vs the kernel's chunk-walk +
    flat-offset sampling."""
    import struct
    import zlib

    w, h, rows = _png_rows_independent(payload)
    # fit-within box (no upscale), then nearest-neighbour by row slices
    if w <= tw and h <= th:
        ow, oh = w, h
    elif w * th >= h * tw:
        ow, oh = tw, max(1, (h * tw) // w)
    else:
        ow, oh = max(1, (w * th) // h), th
    pix = b"".join(
        rows[j * h // oh][(i * w // ow) * 3 : (i * w // ow) * 3 + 3]
        for j in range(oh)
        for i in range(ow)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    scan = b"".join(b"\x00" + pix[j * 3 * ow : (j + 1) * 3 * ow] for j in range(oh))
    png = (
        bytes.fromhex("89504E470D0A1A0A")
        + chunk(b"IHDR", struct.pack(">IIBBBBB", ow, oh, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    return w, h, ow, oh, hashlib.sha256(png).hexdigest()


def _gif_dims_independent(payload: bytes) -> tuple[int, int]:
    """Independent restatement of the TRUE GIF header layout: little-endian
    u16 width/height at byte offsets 6 and 8 of the logical screen
    descriptor.  Deliberately NOT a call into kgspark.multimodal/gifcodec."""
    import struct

    assert payload[:6] == b"GIF89a", "oracle: payload is not a GIF89a"
    return struct.unpack("<HH", payload[6:10])


def _gif_resize_independent(i: int, payload: bytes, tw: int, th: int) -> tuple:
    """Independent GIF thumbnail restatement: the expected thumbnail is
    reconstructed ANALYTICALLY from the seeded generative spec (palette +
    index pattern re-derived from the corpus seed, never decoded from the
    payload), so this checks the kernel's whole decode→sample→re-encode
    chain end-to-end: an LZW decode bug, a sampling bug, or a palette mixup
    each breaks digest equality.  Dims come from the independent header
    parse above; only the final file framing reuses gifcodec.make_gif."""
    import hashlib as _hl

    from . import gifcodec

    w, h = _gif_dims_independent(payload)
    hsh = _hl.sha256(f"{MEDIA_SEED}:media:{i}".encode()).digest()
    if w <= tw and h <= th:
        ow, oh = w, h
    elif w * th >= h * tw:
        ow, oh = tw, max(1, (h * tw) // w)
    else:
        ow, oh = max(1, (w * th) // h), th
    idx = bytes(
        datagen_media.gif_index(i_ * w // ow, j * h // oh, hsh)
        for j in range(oh)
        for i_ in range(ow)
    )
    gif = gifcodec.make_gif(ow, oh, datagen_media.gif_palette(hsh), idx)
    return w, h, ow, oh, _hl.sha256(gif).hexdigest()


def _jpeg_dims_independent(payload: bytes) -> tuple[int, int]:
    """Independent restatement of the TRUE JPEG frame-header layout: walk
    the FFxx marker-segment stream (big-endian u16 lengths) from SOI to the
    first SOF0 and read height/width as big-endian u16s at body offsets
    1 and 3.  Deliberately NOT a call into kgspark.jpegcodec."""
    import struct

    assert payload[:2] == b"\xff\xd8", "oracle: payload is not a JPEG"
    pos = 2
    while pos + 4 <= len(payload):
        assert payload[pos] == 0xFF, "oracle: bad JPEG marker stream"
        while pos + 2 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1  # T.81 B.1.1.2 fill bytes
        marker = payload[pos + 1]
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker == 0xC0:
            h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
            return w, h
        pos += 2 + ln
    raise AssertionError("oracle: JPEG missing SOF0")


def _jpeg_zigzag_independent() -> list:
    """Zigzag scan order re-derived algorithmically (anti-diagonal walk,
    alternating direction) rather than restating the codec's literal
    table."""
    order = []
    for s in range(15):
        rows = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rows if s % 2 else reversed(rows)):
            order.append(r * 8 + (s - r))
    return order


def _jpeg_decode_independent(payload: bytes) -> tuple[int, int, bytes]:
    """Independent restatement of the baseline JPEG decode path (grayscale,
    4:4:4, 4:2:0 AND 4:2:2 YCbCr color), written against ITU-T T.81 + the JFIF
    note, not against the kernel: its own marker walk, algorithmically
    derived zigzag, canonical Huffman codes keyed by 1-prefixed integers
    (vs the kernel's (size, code) tuples), up-front RST0-7 scan splitting
    + per-segment 0xFF00 un-stuffing for DRI streams (vs the kernel's
    streaming byte-aligned marker consume), the defined integer IDCT
    with independently recomputed fixed-point constants in the opposite
    separable pass order, MCU-PADDED component planes cropped only at the
    final sampling step (vs the kernel's crop-on-block-write), and the
    defined integer YCbCr→RGB with its constants recomputed inline from
    the CCIR 601 matrix; 4:2:0 chroma upsampling is the defined
    ``C[y//2][x//2]`` replication.  JPEG decode is DEFINED over exact
    integer arithmetic (kgspark.jpegcodec docstring), so both
    formulations must agree bit-exactly — any Huffman, dequant, zigzag,
    IDCT, sampling, or color-transform bug on either side breaks digest
    equality.  Returns (w, h, gray w*h bytes | RGB 3*w*h bytes)."""
    import math
    import struct

    import re

    zz = _jpeg_zigzag_independent()
    assert payload[:2] == b"\xff\xd8", "oracle: payload is not a JPEG"
    pos, qts, frame, huff, scan, sels = 2, {}, None, {}, None, None
    dri = 0
    while scan is None:
        assert payload[pos] == 0xFF, "oracle: bad JPEG marker stream"
        while pos + 2 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1  # T.81 B.1.1.2 fill bytes
        marker = payload[pos + 1]
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                assert body[i] >> 4 == 0, "oracle: expected 8-bit qtable"
                q = [0] * 64
                for k in range(64):
                    q[zz[k]] = body[i + 1 + k]
                qts[body[i] & 15] = q
                i += 65
        elif marker == 0xC0:
            _prec, hh, ww, nc = struct.unpack(">BHHB", body[:6])
            assert nc in (1, 3), "oracle: expected 1- or 3-component JPEG"
            comps = [
                (
                    body[6 + 3 * c],  # component id
                    body[8 + 3 * c],  # qtable id
                    body[7 + 3 * c] >> 4,  # Hi
                    body[7 + 3 * c] & 15,  # Vi
                )
                for c in range(nc)
            ]
            samps = [(c[2], c[3]) for c in comps]
            assert samps in (
                [(1, 1)] * nc,
                [(2, 2), (1, 1), (1, 1)],
                [(2, 1), (1, 1), (1, 1)],
            ), "oracle: expected 4:4:4, 4:2:2 or 4:2:0 sampling"
            frame = (ww, hh, comps)
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, counts = body[i], body[i + 1 : i + 17]
                nv = sum(counts)
                vals = body[i + 17 : i + 17 + nv]
                tab, code, vi = {}, 0, 0
                for ln_ in range(1, 17):
                    for _ in range(counts[ln_ - 1]):
                        tab[(1 << ln_) | code] = vals[vi]
                        code += 1
                        vi += 1
                    code <<= 1
                huff[cls >> 4, cls & 15] = tab
                i += 17 + nv
        elif marker == 0xDD:
            dri = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:
            assert frame is not None, "oracle: SOS before SOF"
            ns = body[0]
            assert ns == len(frame[2]), "oracle: scan/frame component count"
            sels = {body[1 + 2 * c]: body[2 + 2 * c] for c in range(ns)}
            scan = payload[pos + 2 + ln :]
        pos += 2 + ln
    w, h, comps = frame
    # restart handling restated DIFFERENTLY from the kernel: in a valid
    # scan a raw 0xFF is always stuffed (0xFF00), so the two-byte RST0-7
    # sequences are exactly the restart markers — split the scan on them
    # up front and decode one entropy segment per restart interval (vs the
    # kernel's streaming byte-aligned marker consume)
    segs = re.split(rb"\xff[\xd0-\xd7]", scan) if dri else [scan]
    st = {"data": segs[0].replace(b"\xff\x00", b"\xff"), "bit": 0, "seg": 0}

    def next_segment() -> None:
        st["seg"] += 1
        assert st["seg"] < len(segs), "oracle: missing restart segment"
        st["data"] = segs[st["seg"]].replace(b"\xff\x00", b"\xff")
        st["bit"] = 0

    def bits(n: int) -> int:
        v = 0
        data, bitpos = st["data"], st["bit"]
        for _ in range(n):
            v = (v << 1) | ((data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        st["bit"] = bitpos
        return v

    def read_code(tab: dict) -> int:
        code = 1
        while code not in tab:
            code = (code << 1) | bits(1)
            assert code < (1 << 17), "oracle: bad Huffman code"
        return tab[code]

    def recv_ext(n: int) -> int:
        if n == 0:
            return 0
        v = bits(n)
        return v if v >= (1 << (n - 1)) else v - (1 << n) + 1

    cf = [
        [
            round(
                (math.sqrt(0.5) if u == 0 else 1.0)
                * math.cos((2 * x + 1) * u * math.pi / 16)
                * (1 << 20)
            )
            for x in range(8)
        ]
        for u in range(8)
    ]
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # MCU-PADDED planes (full block grid, no crop-on-write) — the crop to
    # the T.81 A.1.1 component dims happens only at the sampling step below
    pads = [(mcux * hi * 8, mcuy * vi * 8) for _cid, _tq, hi, vi in comps]
    planes = [bytearray(pw * ph) for pw, ph in pads]
    preds = [0] * len(comps)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu and mcu % dri == 0:
                next_segment()
                preds = [0] * len(comps)
            mcu += 1
            for ci, (cid, tq, hi, vi) in enumerate(comps):
                q = qts[tq]
                sel = sels[cid]
                pw = pads[ci][0]
                plane = planes[ci]
                for dv in range(vi):
                    for du in range(hi):
                        c = [0] * 64
                        preds[ci] += recv_ext(read_code(huff[0, sel >> 4]))
                        c[0] = preds[ci] * q[0]
                        k = 1
                        while k < 64:
                            sym = read_code(huff[1, sel & 15])
                            run, n = sym >> 4, sym & 15
                            if n == 0:
                                if run != 15:
                                    break
                                k += 16
                                continue
                            k += run
                            c[zz[k]] = recv_ext(n) * q[zz[k]]
                            k += 1
                        # defined integer IDCT, opposite pass order
                        # (u first, then v)
                        g = [
                            [
                                sum(c[v * 8 + u] * cf[v][y] for v in range(8))
                                for y in range(8)
                            ]
                            for u in range(8)
                        ]
                        x0 = (mx * hi + du) * 8
                        y0 = (my * vi + dv) * 8
                        for j in range(8):
                            for i in range(8):
                                s = sum(g[u][j] * cf[u][i] for u in range(8))
                                p = ((s + (1 << 41)) >> 42) + 128
                                plane[(y0 + j) * pw + x0 + i] = (
                                    0 if p < 0 else 255 if p > 255 else p
                                )
    if len(planes) == 1:
        pw = pads[0][0]
        return w, h, bytes(
            planes[0][y * pw + x] for y in range(h) for x in range(w)
        )
    # defined integer YCbCr→RGB, constants recomputed inline (CCIR 601);
    # per-component sample index (y*Vi//Vmax, x*Hi//Hmax) — identity for
    # 4:4:4, the defined //2 replication for 4:2:0 chroma
    c_rv = round(1.402 * 65536)
    c_gu, c_gv = round(0.344136 * 65536), round(0.714136 * 65536)
    c_bu = round(1.772 * 65536)

    def cl(v: int) -> int:
        return 0 if v < 0 else 255 if v > 255 else v

    out = bytearray(3 * w * h)
    (_, _, yh, yv_), (_, _, cbh, cbv), (_, _, crh, crv) = comps
    ypw, cbpw, crpw = pads[0][0], pads[1][0], pads[2][0]
    for y in range(h):
        for x in range(w):
            i = y * w + x
            yv = planes[0][(y * yv_ // vmax) * ypw + (x * yh // hmax)]
            cb = planes[1][(y * cbv // vmax) * cbpw + (x * cbh // hmax)] - 128
            cr = planes[2][(y * crv // vmax) * crpw + (x * crh // hmax)] - 128
            out[3 * i] = cl(yv + ((c_rv * cr + 32768) >> 16))
            out[3 * i + 1] = cl(yv - ((c_gu * cb + c_gv * cr + 32768) >> 16))
            out[3 * i + 2] = cl(yv + ((c_bu * cb + 32768) >> 16))
    return w, h, bytes(out)


def _jpeg_resize_independent(payload: bytes, tw: int, th: int) -> tuple:
    """Independent JPEG thumbnail restatement: decode via the independent
    T.81 decoder above, fit-within + nearest-neighbour sample in row-slice
    formulation, digest; only the final file framing reuses
    jpegcodec.make_jpeg (the GIF/WAV precedent)."""
    import hashlib as _hl

    from . import jpegcodec

    w, h, dec = _jpeg_decode_independent(payload)
    nch = len(dec) // (w * h)  # 1 grayscale, 3 RGB
    if w <= tw and h <= th:
        ow, oh = w, h
    elif w * th >= h * tw:
        ow, oh = tw, max(1, (h * tw) // w)
    else:
        ow, oh = max(1, (w * th) // h), th
    rows = [dec[y * nch * w : (y + 1) * nch * w] for y in range(h)]
    pix = b"".join(
        rows[j * h // oh][nch * (i * w // ow) : nch * (i * w // ow) + nch]
        for j in range(oh)
        for i in range(ow)
    )
    enc = (
        jpegcodec.make_jpeg_color(ow, oh, pix)
        if nch == 3
        else jpegcodec.make_jpeg(ow, oh, pix)
    )
    dig = _hl.sha256(enc).hexdigest()
    return w, h, ow, oh, dig


def _mkv_meta_independent(payload: bytes) -> tuple[int, int, int]:
    """Independent restatement of the TRUE Matroska/EBML layout, written
    against RFC 8794 + the Matroska element registry, not against the
    kernel: its own vint reader (mask shift-loop rather than bit_length
    arithmetic) and a recursive descent keyed by restated element IDs (vs
    the kernel's generator walk).  Returns (width, height, n_frames)."""

    def vint(pos: int, strip: bool) -> tuple[int, int]:
        b0 = payload[pos]
        n, mask = 1, 0x80
        while mask and not (b0 & mask):
            n += 1
            mask >>= 1
        assert mask, "oracle: invalid EBML vint"
        v = (b0 & (mask - 1)) if strip else b0
        for k in range(1, n):
            v = (v << 8) | payload[pos + k]
        return v, pos + n

    state = {"w": None, "h": None, "n": 0}
    masters = {0x1A45DFA3, 0x18538067, 0x1549A966, 0x1654AE6B, 0xAE, 0xE0,
               0x1F43B675}

    def walk(start: int, end: int) -> None:
        pos = start
        while pos < end:
            eid, pos = vint(pos, strip=False)
            size, pos = vint(pos, strip=True)
            assert pos + size <= end, "oracle: EBML element overrun"
            if eid in masters:
                walk(pos, pos + size)
            elif eid == 0xB0:  # PixelWidth
                state["w"] = int.from_bytes(payload[pos : pos + size], "big")
            elif eid == 0xBA:  # PixelHeight
                state["h"] = int.from_bytes(payload[pos : pos + size], "big")
            elif eid == 0xA3:  # SimpleBlock
                # restated block header (Matroska 10.3): track vint, s16
                # timestamp, flags; lacing bits 0x06 mean the frame count
                # rides in the next byte as count-minus-one
                _track, q = vint(pos, strip=True)
                flags = payload[q + 2]
                state["n"] += payload[q + 3] + 1 if flags & 0x06 else 1
            pos += size

    walk(0, len(payload))
    assert state["w"] and state["h"], "oracle: no video dims in EBML tree"
    return state["w"], state["h"], state["n"]


def _wav_meta_independent(payload: bytes) -> tuple[int, int]:
    """Independent restatement of the TRUE canonical WAV layout: the PCM
    ``fmt `` chunk sits at byte offset 12 (sample rate LE u32 at offset 24,
    block align LE u16 at 32) and the ``data`` chunk at offset 36 (byte
    length LE u32 at 40).  Fixed-offset reads against the canonical-form
    spec — deliberately NOT the kernel's chunk walk.  Returns
    (sample_rate, n_samples)."""
    import struct

    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE", "not WAVE"
    assert payload[12:16] == b"fmt " and payload[36:40] == b"data", (
        "oracle: payload is not canonical-layout WAV"
    )
    (rate,) = struct.unpack("<I", payload[24:28])
    (block_align,) = struct.unpack("<H", payload[32:34])
    (data_len,) = struct.unpack("<I", payload[40:44])
    assert block_align > 0, "oracle: WAV declares zero block align"
    return rate, data_len // block_align


def _wav_resample_independent(i: int, payload: bytes, target_rate: int) -> tuple:
    """Independent WAV resample restatement: the expected output is
    reconstructed ANALYTICALLY from the seeded generative spec (samples
    re-derived from the corpus seed via datagen_media.wav_sample, never
    decoded from the payload), so this checks the kernel's whole
    decode→sample→re-encode chain end-to-end: a PCM decode bug, an index
    mapping bug, or an fmt mixup each breaks digest equality.  Rate/count
    come from the independent fixed-offset parse above; only the final
    file framing reuses datagen_media.make_wav."""
    import hashlib as _hl
    import struct

    rate, n = _wav_meta_independent(payload)
    (channels,) = struct.unpack("<H", payload[22:24])
    (bits,) = struct.unpack("<H", payload[34:36])
    # the mono() map below is written for exactly the corpus layouts; an
    # unlisted combination (e.g. stereo 8-bit, which the KERNEL would
    # happily decode) must fail loudly here rather than silently restate
    # the wrong analytic expectation
    assert (channels, bits) in ((1, 16), (2, 16), (1, 8)), (
        f"oracle: unexpected WAV layout {channels}ch/{bits}bit"
    )
    hsh = _hl.sha256(f"{MEDIA_SEED}:media:{i}".encode()).digest()

    def mono(j: int) -> int:
        # the ANALYTIC canonical mono-16 sample at frame j per variant:
        # stereo downmixes the floor mean of the interleaved L/R raw
        # indices; 8-bit widens the narrowed byte back by *256
        if channels == 2:
            return (
                datagen_media.wav_sample(2 * j, hsh)
                + datagen_media.wav_sample(2 * j + 1, hsh)
            ) >> 1
        if bits == 8:
            return (datagen_media.wav_sample(j, hsh) >> 8) * 256
        return datagen_media.wav_sample(j, hsh)

    if rate <= target_rate:
        out_rate, idx = rate, range(n)
    else:
        out_rate = target_rate
        out_n = max(1, (n * target_rate) // rate)
        idx = [j * n // out_n for j in range(out_n)]
    pcm = b"".join(struct.pack("<h", mono(j)) for j in idx)
    dig = _hl.sha256(datagen_media.make_wav(out_rate, pcm)).hexdigest()
    return rate, n, out_rate, len(pcm) // 2, dig


def _ahash_independent(w: int, h: int, gray: list) -> int:
    """Independent restatement of the 64-bit average hash: same defining
    boundary/compare formulas (the hash is DEFINED over exact integer
    arithmetic, like the IDCT), assembled column-major with precomputed
    boundary tables vs the kernel's row-major running slices."""
    total = sum(gray)
    npix = w * h
    rb = [(k * h) // 8 for k in range(9)]
    cb = [(k * w) // 8 for k in range(9)]
    bits = 0
    for j in range(8):
        c0, c1 = cb[j], min(w, max(cb[j] + 1, cb[j + 1]))
        for i in range(8):
            r0, r1 = rb[i], min(h, max(rb[i] + 1, rb[i + 1]))
            s = sum(
                gray[y * w + x] for x in range(c0, c1) for y in range(r0, r1)
            )
            if s * npix >= total * ((r1 - r0) * (c1 - c0)):
                bits |= 1 << (i * 8 + j)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def _gray601(rgb_triples) -> list:
    return [
        (rgb_triples[3 * i] * 299
         + rgb_triples[3 * i + 1] * 587
         + rgb_triples[3 * i + 2] * 114) // 1000
        for i in range(len(rgb_triples) // 3)
    ]


@lru_cache(maxsize=1)
def build() -> dict[str, str]:
    rows = datagen_media.media_rows(MEDIA_N, MEDIA_SEED)

    meta_rows = []
    decode_rows = []
    frame_rows = []
    for media_id, kind, payload in rows:
        meta_rows.append(
            (media_id, kind, len(payload), hashlib.sha256(payload).hexdigest())
        )
        if kind == "png":
            w, h = _png_dims_independent(payload)
            decode_rows.append((media_id, "png", w, h, None, None))
        elif kind == "gif":
            w, h = _gif_dims_independent(payload)
            decode_rows.append((media_id, "gif", w, h, None, None))
        elif kind == "riff":
            _rate, n = _wav_meta_independent(payload)
            decode_rows.append((media_id, "riff", None, None, n, None))
        elif kind == "jpeg":
            w, h = _jpeg_dims_independent(payload)
            decode_rows.append((media_id, "jpeg", w, h, None, None))
        else:  # matroska
            w, h, nf = _mkv_meta_independent(payload)
            decode_rows.append((media_id, "matroska", w, h, None, nf))
            # frame samples restated from the independent demux count
            for fi in range(0, nf, 10):
                frame_rows.append((media_id, fi))

    resize_rows = []
    for i, (media_id, kind, payload) in enumerate(rows):
        if kind == "png":
            w, h, ow, oh, dig = _png_resize_independent(payload, 64, 64)
            resize_rows.append((media_id, "png", w, h, ow, oh, dig))
            continue
        if kind == "gif":
            w, h, ow, oh, dig = _gif_resize_independent(i, payload, 64, 64)
            resize_rows.append((media_id, "gif", w, h, ow, oh, dig))
            continue
        if kind == "jpeg":
            w, h, ow, oh, dig = _jpeg_resize_independent(payload, 64, 64)
            resize_rows.append((media_id, "jpeg", w, h, ow, oh, dig))
            continue
        r = multimodal.resize_py(payload, 64, 64)
        if r is not None:
            resize_rows.append(
                (
                    media_id, r["kind"], r["src_width"], r["src_height"],
                    r["out_width"], r["out_height"], r["resized_sha256"],
                )
            )

    resample_rows = []
    for i, (media_id, kind, payload) in enumerate(rows):
        if kind == "riff":
            sr, sn, orate, on, dig = _wav_resample_independent(i, payload, 8000)
            resample_rows.append((media_id, "riff", sr, sn, orate, on, dig))

    # Perceptual hashes of the still-image rows: pixels via the independent
    # decode paths (PNG spec unfilter, analytic-from-seed GIF, T.81 decoder),
    # hash via the column-major restatement above.
    phash_rows = []
    for i, (media_id, kind, payload) in enumerate(rows):
        if kind == "png":
            w, h, prows = _png_rows_independent(payload)
            phash_rows.append(
                (media_id, "png",
                 _ahash_independent(w, h, _gray601(b"".join(prows))))
            )
        elif kind == "gif":
            w, h = _gif_dims_independent(payload)
            hsh = hashlib.sha256(f"{MEDIA_SEED}:media:{i}".encode()).digest()
            pal = datagen_media.gif_palette(hsh).ljust(768, b"\x00")
            gray = [
                (pal[3 * p] * 299 + pal[3 * p + 1] * 587
                 + pal[3 * p + 2] * 114) // 1000
                for p in (
                    datagen_media.gif_index(x, y, hsh)
                    for y in range(h) for x in range(w)
                )
            ]
            phash_rows.append((media_id, "gif", _ahash_independent(w, h, gray)))
        elif kind == "jpeg":
            w, h, dec = _jpeg_decode_independent(payload)
            gray = list(dec) if len(dec) == w * h else _gray601(dec)
            phash_rows.append(
                (media_id, "jpeg", _ahash_independent(w, h, gray))
            )

    return {
        "media_phash": _values(
            phash_rows, ["media_id", "kind", "phash"], ["s", "s", "i"]
        ),
        "media_audio_resample": _values(
            resample_rows,
            ["media_id", "kind", "src_rate", "src_samples",
             "out_rate", "out_samples", "resampled_sha256"],
            ["s", "s", "i", "i", "i", "i", "s"],
        ),
        "media_resize": _values(
            resize_rows,
            ["media_id", "kind", "src_width", "src_height",
             "out_width", "out_height", "resized_sha256"],
            ["s", "s", "i", "i", "i", "i", "s"],
        ),
        "media_metadata": _values(
            meta_rows,
            ["media_id", "kind", "n_bytes", "payload_sha256"],
            ["s", "s", "i", "s"],
        ),
        "media_decode": _values(
            decode_rows,
            ["media_id", "kind", "width", "height", "n_samples", "n_frames"],
            ["s", "s", "i", "i", "i", "i"],
        ),
        "media_frame_samples": _values(
            frame_rows, ["media_id", "frame_index"], ["s", "i"]
        ),
    }
