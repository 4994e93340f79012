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


def _png_resize_independent(payload: bytes, tw: int, th: int) -> tuple:
    """Independent PNG thumbnail restatement: inflate IDAT, slice filter-0
    scanlines, nearest-neighbour sample, re-encode, digest — written against
    the PNG spec, not against the kernel (row-slicing formulation vs the
    kernel's chunk-walk + flat-offset sampling)."""
    import struct
    import zlib

    w, h = _png_dims_independent(payload)
    # collect IDAT payloads by scanning chunk headers
    idat, pos = b"", 8
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)
    rows = [
        raw[y * (1 + 3 * w) + 1 : (y + 1) * (1 + 3 * w)] for y in range(h)
    ]
    assert all(raw[y * (1 + 3 * w)] == 0 for y in range(h)), "filter != 0"
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
    hsh = _hl.sha256(f"{MEDIA_SEED}:media:{i}".encode()).digest()
    if rate <= target_rate:
        out_rate, idx = rate, range(n)
    else:
        out_rate = target_rate
        out_n = max(1, (n * target_rate) // rate)
        idx = [j * n // out_n for j in range(out_n)]
    pcm = b"".join(
        struct.pack("<h", datagen_media.wav_sample(j, hsh)) for j in idx
    )
    dig = _hl.sha256(datagen_media.make_wav(out_rate, pcm)).hexdigest()
    return rate, n, out_rate, len(pcm) // 2, dig


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
        else:
            d = multimodal.decode_header_py(payload)
            decode_rows.append(
                (
                    media_id, d["kind"], d["width"], d["height"],
                    d["n_samples"], d["n_frames"],
                )
            )
        for fi in multimodal.frame_sample_py(payload):
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

    return {
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
