"""Deterministic synthetic media corpus (binary payloads with real magics).

Pairs with :mod:`kgspark.multimodal`.  PNG, GIF, and WAV payloads are REAL
files:

  * PNG — signature, IHDR with correct dimensions and CRC32, one
    zlib-compressed IDAT of RGB scanlines rotating plain filter-0 rows /
    a cycling None-Sub-Up-Average-Paeth filter mix / Adam7 interlaced
    passes by png ordinal, IEND;
  * GIF — GIF89a logical screen descriptor, 256-entry global color table,
    LZW-compressed index data (:mod:`kgspark.gifcodec`), trailer —
    alternating plain / appendix-E interlaced row order by gif ordinal;
  * WAV — canonical RIFF/WAVE container: PCM ``fmt `` chunk followed by
    a ``data`` chunk of seeded samples, rotating mono-16 / stereo-16 /
    mono-8 layouts by wav ordinal;

  * JPEG — baseline JFIF, rotating grayscale / 4:4:4 / 4:2:0 / 4:2:2
    YCbCr by jpeg ordinal with DRI restart markers on an independent
    parity axis: SOI/APP0/DQT/SOF0/DHT/[DRI]/SOS with T.81 Annex K
    tables and real DCT-coded entropy data (:mod:`kgspark.jpegcodec`);
  * Matroska — a genuine EBML tree (header, Segment, Info, one
    V_UNCOMPRESSED video track, Clusters of raw-grayscale SimpleBlocks)
    via :mod:`kgspark.mkvcodec`, rotating plain / Xiph-laced /
    fixed-laced / EBML-laced block storage by mkv ordinal;

all decodable by any standards-conforming reader (pixel/sample values
follow a seeded deterministic pattern shared with the oracle restatement).
Everything is seeded, so driver-side expected rows for VALUES oracles are
exact.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

from . import gifcodec, jpegcodec, mkvcodec
from .multimodal import PNG_ADAM7, _paeth as _png_paeth

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("declared_kind", StringType(), False),
        StructField("payload", BinaryType(), True),
    ]
)

_MAGICS = {
    "jpeg": bytes.fromhex("FFD8FFE000104A46"),
    "png": bytes.fromhex("89504E470D0A1A0A"),
    "gif": b"GIF89a\x00\x00",
    "riff": b"RIFF\x00\x00\x00\x00",
    "matroska": bytes.fromhex("1A45DFA3"),  # true EBML magic (4 bytes)
}
_KINDS = list(_MAGICS)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def png_pixel(x: int, y: int, h: bytes) -> tuple[int, int, int]:
    """Seeded deterministic RGB pattern — shared with the independent
    oracle restatement so resize digests are checkable end-to-end."""
    return (
        (x * 3 + y * 5 + h[2]) % 256,
        (x * 7 + y * 11 + h[3]) % 256,
        (x * 13 + y * 17 + h[4]) % 256,
    )


def _png_filter_rows(rows: list, filtered: bool) -> bytearray:
    """Forward-filter one (sub)image's rows into raw scanline bytes:
    filter-0 throughout, or the per-row None/Sub/Up/Average/Paeth cycle."""
    raw = bytearray()
    zero = bytes(len(rows[0])) if rows else b""
    for y, cur in enumerate(rows):
        f = (y % 5) if filtered else 0
        raw.append(f)
        up = rows[y - 1] if y else zero
        if f == 0:
            raw.extend(cur)
        elif f == 1:
            raw.extend(
                (cur[i] - (cur[i - 3] if i >= 3 else 0)) % 256
                for i in range(len(cur))
            )
        elif f == 2:
            raw.extend((cur[i] - up[i]) % 256 for i in range(len(cur)))
        elif f == 3:
            raw.extend(
                (cur[i] - (((cur[i - 3] if i >= 3 else 0) + up[i]) >> 1)) % 256
                for i in range(len(cur))
            )
        else:
            raw.extend(
                (
                    cur[i]
                    - _png_paeth(
                        cur[i - 3] if i >= 3 else 0,
                        up[i],
                        up[i - 3] if i >= 3 else 0,
                    )
                )
                % 256
                for i in range(len(cur))
            )
    return raw


def make_png(
    w: int,
    h_px: int,
    h: bytes,
    filtered: bool = False,
    interlaced: bool = False,
) -> bytes:
    """A VALID minimal PNG: signature, IHDR (8-bit RGB, CRC-correct), one
    IDAT of zlib-compressed scanlines, IEND.  ``filtered=True`` cycles the
    scanline filter type per row (None/Sub/Up/Average/Paeth, y % 5);
    ``interlaced=True`` stores the seven Adam7 sub-images (spec 8.2 pass
    geometry, each filtered independently) — the shapes foreign encoders
    emit; decode is lossless in every combination."""
    ihdr = struct.pack(">IIBBBBB", w, h_px, 8, 2, 0, 0, 1 if interlaced else 0)
    rows = [
        bytes(c for x in range(w) for c in png_pixel(x, y, h))
        for y in range(h_px)
    ]
    if not interlaced:
        raw = _png_filter_rows(rows, filtered)
    else:
        raw = bytearray()
        for x0, y0, dx, dy in PNG_ADAM7:
            sub = [
                bytes(
                    b
                    for x in range(x0, w, dx)
                    for b in rows[y][3 * x : 3 * x + 3]
                )
                for y in range(y0, h_px, dy)
            ]
            if sub and sub[0]:
                raw += _png_filter_rows(sub, filtered)
    return (
        _MAGICS["png"]
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def gif_index(x: int, y: int, h: bytes) -> int:
    """Seeded deterministic palette index — shared with the independent
    oracle restatement so resize digests are checkable end-to-end."""
    return (x * 3 + y * 7 + h[1]) % 256


def gif_palette(h: bytes) -> bytes:
    """Seeded deterministic 256-entry RGB palette (768 bytes)."""
    return bytes(
        c
        for i in range(256)
        for c in (
            (i * (1 + h[5] % 7) + h[2]) % 256,
            (i * (1 + h[6] % 11) + h[3]) % 256,
            (i * (1 + h[7] % 13) + h[4]) % 256,
        )
    )


def make_gif_file(
    w: int, h_px: int, h: bytes, interlace: bool = False
) -> bytes:
    """A VALID single-image GIF89a with the seeded palette/index pattern,
    plain or appendix-E interlaced row order on request."""
    idx = bytes(gif_index(x, y, h) for y in range(h_px) for x in range(w))
    return gifcodec.make_gif(w, h_px, gif_palette(h), idx, interlace)


def mkv_pixel(f: int, x: int, y: int, h: bytes) -> int:
    """Seeded deterministic grayscale frame pattern — shared with the
    independent oracle restatement (raw V_UNCOMPRESSED frames, lossless,
    so decoded bytes reproduce this exactly)."""
    return (x * 2 + y * 3 + f * 5 + h[4]) % 256


def make_mkv_file(
    w: int, h_px: int, n_frames: int, h: bytes, lacing: str | None = None
) -> bytes:
    """A VALID Matroska file: one raw-grayscale video track, seeded frames,
    optionally with Xiph / fixed / EBML laced clusters."""
    frames = [
        bytes(mkv_pixel(f, x, y, h) for y in range(h_px) for x in range(w))
        for f in range(n_frames)
    ]
    return mkvcodec.make_mkv(w, h_px, frames, lacing)


def jpeg_pixel(x: int, y: int, h: bytes) -> int:
    """Seeded deterministic grayscale pattern — shared with the independent
    oracle restatement.  NOTE: JPEG is lossy, so unlike png_pixel/gif_index
    this is the ENCODER-INPUT pattern; decoded pixels are checked via the
    codec's defined integer IDCT, not against this function."""
    return (x * 3 + y * 5 + (x // 8) * h[2] + (y // 8) * h[3]) % 256


def make_jpeg_file(
    w: int, h_px: int, h: bytes, restart_interval: int = 0
) -> bytes:
    """A VALID baseline JFIF grayscale file with the seeded pixel pattern."""
    gray = bytes(jpeg_pixel(x, y, h) for y in range(h_px) for x in range(w))
    return jpegcodec.make_jpeg(w, h_px, gray, restart_interval)


def jpeg_rgb_pixel(x: int, y: int, h: bytes) -> tuple[int, int, int]:
    """Seeded deterministic RGB pattern for COLOR JPEGs (encoder input;
    lossy — see the jpeg_pixel note)."""
    return (
        (x * 3 + y * 5 + (x // 8) * h[2]) % 256,
        (x * 7 + y * 3 + (y // 8) * h[3]) % 256,
        (x * 5 + y * 7 + h[4]) % 256,
    )


def make_jpeg_color_file(
    w: int,
    h_px: int,
    h: bytes,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """A VALID baseline JFIF YCbCr COLOR file, seeded RGB pattern —
    4:4:4 by default, 4:2:0 (Y 2x2, 16x16 MCUs) or 4:2:2 (Y 2x1, 16x8
    MCUs) and DRI restart markers on request."""
    rgb = bytes(
        c
        for y in range(h_px)
        for x in range(w)
        for c in jpeg_rgb_pixel(x, y, h)
    )
    return jpegcodec.make_jpeg_color(w, h_px, rgb, subsampling, restart_interval)


_WAV_RATES = (8000, 11025, 16000, 22050)


def wav_sample(i: int, h: bytes) -> int:
    """Seeded deterministic int16 PCM sample — shared with the independent
    oracle restatement so resample digests are checkable end-to-end."""
    return ((i * i * (1 + h[5] % 3) + i * (3 + h[2]) + h[3] * 257) % 65536) - 32768


def make_wav(
    sample_rate: int, pcm: bytes, channels: int = 1, bits: int = 16
) -> bytes:
    """A VALID canonical RIFF/WAVE file: PCM ``fmt `` chunk at offset 12,
    ``data`` chunk at offset 36.  Any conforming WAV reader (including
    stdlib :mod:`wave`) decodes it.  Defaults to the mono-16 profile;
    ``channels``/``bits`` produce the stereo and 8-bit foreign variants."""
    n_bytes = len(pcm)
    block = channels * bits // 8
    # RIFF chunks are word-aligned: an odd-size data chunk (possible for
    # 8-bit PCM) carries a trailing pad byte NOT counted in its size field
    pad = b"\x00" if n_bytes % 2 else b""
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n_bytes + len(pad))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH",
            16, 1, channels, sample_rate, sample_rate * block, block, bits,
        )
        + b"data"
        + struct.pack("<I", n_bytes)
        + pcm
        + pad
    )


def make_wav_file(
    n_samples: int,
    sample_rate: int,
    h: bytes,
    channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Seeded PCM: raw sample index i carries wav_sample(i) regardless of
    layout (stereo interleaves consecutive indices as L/R; 8-bit stores
    the DEFINED narrowing ``((s >> 8) + 128) & 0xFF``), so the decoded
    canonical mono-16 stream stays analytically derivable per variant."""
    n_raw = n_samples * channels
    if bits == 16:
        pcm = b"".join(
            struct.pack("<h", wav_sample(i, h)) for i in range(n_raw)
        )
    else:
        pcm = bytes(((wav_sample(i, h) >> 8) + 128) & 0xFF for i in range(n_raw))
    return make_wav(sample_rate, pcm, channels, bits)


def _payload(seed: int, i: int) -> tuple[str, str, bytes]:
    kind = _KINDS[i % len(_KINDS)]
    h = hashlib.sha256(f"{seed}:media:{i}".encode()).digest()
    if kind == "png":
        # real decodable file; dims kept <=127 so pixel data stays small.
        # Rotate plain / filter-cycled / Adam7-interlaced-and-filtered by
        # png ordinal so every foreign storage shape lives in the corpus.
        variant = (i // len(_KINDS)) % 3
        payload = make_png(
            24 + h[0] % 104,
            24 + h[1] % 104,
            h,
            filtered=variant >= 1,
            interlaced=variant == 2,
        )
        return "media-" + hashlib.sha256(payload).hexdigest()[:16], kind, payload
    if kind == "gif":
        # alternate plain / interlaced row order by gif ordinal so both
        # storage layouts live in the corpus (decode must de-interlace —
        # the analytic-from-seed resize oracle checks the logical pixels)
        payload = make_gif_file(
            24 + h[0] % 104,
            24 + h[1] % 104,
            h,
            interlace=bool((i // len(_KINDS)) % 2),
        )
        return "media-" + hashlib.sha256(payload).hexdigest()[:16], kind, payload
    if kind == "riff":
        # real decodable WAV; seeded sample count and rate — rotating the
        # canonical mono-16 / stereo-16 / mono-8 PCM layouts by wav
        # ordinal so the downmix and widening decode paths are corpus-fed
        ch, bits = ((1, 16), (2, 16), (1, 8))[(i // len(_KINDS)) % 3]
        payload = make_wav_file(
            4000 + h[0] * 64,
            _WAV_RATES[h[1] % len(_WAV_RATES)],
            h,
            channels=ch,
            bits=bits,
        )
        return "media-" + hashlib.sha256(payload).hexdigest()[:16], kind, payload
    if kind == "jpeg":
        # real decodable file; dims kept <=127 so DCT block count stays small.
        # Rotate grayscale / 4:4:4 / 4:2:0 / 4:2:2 by jpeg ordinal
        # (i // len(_KINDS) counts this kind's rows) so all four entropy
        # layouts — one-component, three-component 1x1, 2x2+1x1 16x16-MCU,
        # and 2x1+1x1 16x8-MCU — appear within any 20 consecutive corpus
        # rows; alternate DRI restart intervals on an INDEPENDENT axis —
        # (ordinal // 4) parity, coprime with the 4-way layout cycle — so
        # every layout occurs both with and without RST0-7 markers across
        # 8 jpeg ordinals (review catch: ordinal % 2 was fully determined
        # by layout parity, leaving gray/4:2:0 never restart-marked).
        ordinal = i // len(_KINDS)
        layout = ordinal % 4
        ri = 3 if (ordinal // 4) % 2 else 0
        if layout == 0:
            payload = make_jpeg_file(
                24 + h[0] % 104, 24 + h[1] % 104, h, restart_interval=ri
            )
        else:
            payload = make_jpeg_color_file(
                24 + h[0] % 104,
                24 + h[1] % 104,
                h,
                ("444", "420", "422")[layout - 1],
                restart_interval=ri,
            )
        return "media-" + hashlib.sha256(payload).hexdigest()[:16], kind, payload
    # matroska: real EBML container, raw-grayscale frames, seeded count/
    # dims — rotating plain / Xiph / fixed / EBML lacing by mkv ordinal so
    # every SimpleBlock storage layout lives in the corpus
    payload = make_mkv_file(
        16 + h[1] % 24,
        12 + h[2] % 20,
        24 * (1 + h[0] % 10),
        h,
        lacing=(None, "xiph", "fixed", "ebml")[(i // len(_KINDS)) % 4],
    )
    media_id = "media-" + hashlib.sha256(payload).hexdigest()[:16]
    return media_id, kind, payload


def media_rows(n: int, seed: int = 42) -> list[tuple[str, str, bytes]]:
    return [_payload(seed, i) for i in range(n)]


def media_files(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """media_files(media_id, declared_kind, payload binary) — seeded corpus."""
    return spark.createDataFrame(media_rows(n, seed), MEDIA_SCHEMA)
