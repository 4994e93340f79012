"""Stdlib-only Matroska (EBML) muxer/demuxer (subset) — the fifth REAL
media format.

Pairs with :mod:`kgspark.datagen_media` (emits valid files) and
:mod:`kgspark.multimodal` (reads any conforming file of this profile).
Spec-derived from the public Matroska/EBML specifications (IETF RFC 8794
for EBML framing; the Matroska element registry for IDs).  Supported
profile:

  * one Segment with known (non-unknown-size) element lengths;
  * one video track (TrackType 1), ``V_UNCOMPRESSED`` CodecID — frames are
    raw row-major grayscale bytes, so no video *codec* is involved, only
    genuine container demuxing (the same shape real pipelines use for raw
    capture);
  * frames carried as SimpleBlocks inside any number of Clusters — one
    frame per block, or Xiph / fixed / EBML LACED blocks (Matroska spec
    section 10.3: count byte, per-type size data for all but the last
    frame, last size implicit from the block end); the muxer emits laced
    clusters on request and the demuxer splits all three lace types.

The demuxer walks real EBML structure: variable-length element IDs (marker
bit kept, per RFC 8794 §5), variable-length sizes (marker stripped),
nested master elements (Segment → Tracks → TrackEntry → Video →
PixelWidth/PixelHeight; Segment → Cluster → SimpleBlock), and skips any
unknown element by its declared size — so conforming files from other
muxers parse too, not just our own output.

No third-party demuxer exists in the sandbox; correctness is pinned by
round-trip property tests (tests/test_multimodal.py) plus an independent
EBML restatement in kgspark.media_oracles.
"""

from __future__ import annotations

import struct

# Matroska element IDs (public registry), stored with the EBML marker bit.
EBML_HEADER = 0x1A45DFA3
DOCTYPE = 0x4282
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMESTAMP_SCALE = 0x2AD7B1
MUXING_APP = 0x4D80
WRITING_APP = 0x5741
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_UID = 0x73C5
TRACK_TYPE = 0x83
CODEC_ID = 0x86
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
CLUSTER = 0x1F43B675
TIMESTAMP = 0xE7
SIMPLE_BLOCK = 0xA3

_MASTERS = {EBML_HEADER, SEGMENT, INFO, TRACKS, TRACK_ENTRY, VIDEO, CLUSTER}


def _id_bytes(eid: int) -> bytes:
    """Element IDs are stored verbatim (marker bit included)."""
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def vint_encode(value: int, min_len: int = 1) -> bytes:
    """EBML variable-length SIZE: length-marker bit + value bits."""
    for n in range(min_len, 9):
        if value < (1 << (7 * n)) - 1:  # all-ones is the unknown-size form
            return ((1 << (7 * n)) | value).to_bytes(n, "big")
    raise ValueError("EBML size too large")


def vint_parse(
    buf: bytes, pos: int, keep_marker: bool, allow_all_ones: bool = False
) -> tuple:
    """(value, new_pos) for an EBML vint at ``pos``: the leading byte's
    marker-bit position gives the length; IDs keep the marker, sizes strip
    it.  ``allow_all_ones`` is for non-size vints (block track numbers),
    where the all-ones form is an ordinary value, not "unknown size"."""
    if pos >= len(buf):
        raise ValueError("EBML vint past end of stream")
    first = buf[pos]
    if first == 0:
        raise ValueError("invalid EBML vint")
    n = 9 - first.bit_length()
    if pos + n > len(buf):
        raise ValueError("EBML vint truncated")
    v = int.from_bytes(buf[pos : pos + n], "big")
    if not keep_marker:
        v &= (1 << (7 * n)) - 1  # strip the n-bit length-marker prefix
        if v == (1 << (7 * n)) - 1 and not allow_all_ones:
            # RFC 8794 all-ones form: "unknown size" (streamed live-mux
            # output) — refuse cleanly instead of walking garbage
            raise ValueError("unknown-size EBML elements unsupported")
    return v, pos + n


def element(eid: int, payload: bytes) -> bytes:
    return _id_bytes(eid) + vint_encode(len(payload)) + payload


def _uint(eid: int, value: int) -> bytes:
    n = max(1, (value.bit_length() + 7) // 8)
    return element(eid, value.to_bytes(n, "big"))


def _lace_block(frames: list, lacing: str) -> bytes:
    """One laced SimpleBlock body for track 1 at relative timestamp 0:
    flags lacing bits 0x02 (Xiph), 0x04 (fixed), or 0x06 (EBML), the
    frame-count-minus-one byte, the per-type size data, then the
    concatenated frames (Matroska spec section 10.3)."""
    n = len(frames)
    if lacing == "xiph":
        flags, sizes = 0x82, bytearray()
        for f in frames[:-1]:  # last frame size is implicit
            q, r = divmod(len(f), 255)
            sizes += b"\xff" * q + bytes([r])
    elif lacing == "fixed":
        flags, sizes = 0x84, bytearray()
        if len({len(f) for f in frames}) > 1:
            raise ValueError("fixed lacing needs equal-size frames")
    else:  # ebml: first size unsigned vint, then signed-vint deltas
        flags, sizes = 0x86, bytearray()
        if n > 1:  # sizes cover frames 0..n-2; a lone frame has none
            sizes += vint_encode(len(frames[0]))
            for prev, cur in zip(frames, frames[1:-1]):
                delta = len(cur) - len(prev)
                # signed vint: bias 2^(7L-1)-1 for the SMALLEST L that
                # holds |delta| (range shifting per the Matroska lacing
                # spec) — a fixed width would silently widen past the
                # bias for large deltas and corrupt the stream
                ln = 1
                while abs(delta) > (1 << (7 * ln - 1)) - 1:
                    ln += 1
                sizes += vint_encode(delta + (1 << (7 * ln - 1)) - 1, ln)
    return (
        b"\x81"
        + struct.pack(">h", 0)
        + bytes([flags, n - 1])
        + bytes(sizes)
        + b"".join(frames)
    )


def make_mkv(w: int, h: int, frames: list, lacing: str | None = None) -> bytes:
    """A VALID minimal Matroska file: EBML header (DocType matroska), one
    Segment with Info, one V_UNCOMPRESSED video track at (w, h), and one
    Cluster per 8 frames of raw grayscale SimpleBlocks.  With ``lacing``
    ("xiph" | "fixed" | "ebml") each cluster's frames ride in ONE laced
    SimpleBlock instead of one block per frame."""
    if lacing not in (None, "xiph", "fixed", "ebml"):
        raise ValueError("lacing must be None, 'xiph', 'fixed', or 'ebml'")
    for f in frames:
        if len(f) != w * h:
            raise ValueError("frame buffer does not match dims")
    header = element(
        EBML_HEADER,
        element(DOCTYPE, b"matroska"),
    )
    info = element(
        INFO,
        _uint(TIMESTAMP_SCALE, 1_000_000)
        + element(MUXING_APP, b"kgspark")
        + element(WRITING_APP, b"kgspark"),
    )
    tracks = element(
        TRACKS,
        element(
            TRACK_ENTRY,
            _uint(TRACK_NUMBER, 1)
            + _uint(TRACK_UID, 1)
            + _uint(TRACK_TYPE, 1)  # video
            + element(CODEC_ID, b"V_UNCOMPRESSED")
            + element(VIDEO, _uint(PIXEL_WIDTH, w) + _uint(PIXEL_HEIGHT, h)),
        ),
    )
    clusters = b""
    for base in range(0, len(frames), 8):
        body = _uint(TIMESTAMP, base)
        group = [bytes(f) for f in frames[base : base + 8]]
        if lacing:
            body += element(SIMPLE_BLOCK, _lace_block(group, lacing))
        else:
            for k, frame in enumerate(group):
                # SimpleBlock: track vint (0x81 = track 1), s16 relative
                # timestamp, flags (0x80 keyframe, no lacing), frame data
                body += element(
                    SIMPLE_BLOCK,
                    b"\x81" + struct.pack(">h", k) + b"\x80" + frame,
                )
        clusters += element(CLUSTER, body)
    return header + element(SEGMENT, info + tracks + clusters)


def _walk(buf: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) for the children of a
    master element spanning [start, end)."""
    pos = start
    while pos < end:
        eid, pos = vint_parse(buf, pos, keep_marker=True)
        size, pos = vint_parse(buf, pos, keep_marker=False)
        if pos + size > end:
            raise ValueError("EBML element overruns its parent")
        yield eid, pos, pos + size
        pos += size


def parse_mkv(payload: bytes) -> tuple:
    """REAL Matroska demux for the supported profile: walk the EBML tree,
    return (width, height, frames) where frames are the raw SimpleBlock
    payloads in stream order — laced blocks (Xiph / fixed / EBML) split
    into their individual frames.  Raises ValueError on non-matroska
    DocTypes and truncated structure rather than guessing."""
    return _scan(payload, collect=True)


def _scan(payload: bytes, collect: bool) -> tuple:
    w = h = None
    n_frames = 0
    frames: list = []
    doctype = None
    for eid, s, e in _walk(payload, 0, len(payload)):
        if eid == EBML_HEADER:
            for cid, cs, ce in _walk(payload, s, e):
                if cid == DOCTYPE:
                    doctype = payload[cs:ce].split(b"\x00")[0]
        elif eid == SEGMENT:
            if doctype not in (b"matroska", b"webm"):
                raise ValueError("not a matroska/webm EBML stream")
            for cid, cs, ce in _walk(payload, s, e):
                if cid == TRACKS:
                    for tid, ts, te in _walk(payload, cs, ce):
                        if tid != TRACK_ENTRY:
                            continue
                        for vid, vs, ve in _walk(payload, ts, te):
                            if vid == VIDEO:
                                for pid, ps, pe in _walk(payload, vs, ve):
                                    v = int.from_bytes(payload[ps:pe], "big")
                                    if pid == PIXEL_WIDTH:
                                        w = v
                                    elif pid == PIXEL_HEIGHT:
                                        h = v
                elif cid == CLUSTER:
                    for bid, bs, be in _walk(payload, cs, ce):
                        if bid != SIMPLE_BLOCK:
                            continue
                        _track, p = vint_parse(
                            payload, bs, keep_marker=False, allow_all_ones=True
                        )
                        p += 2  # s16 relative timestamp
                        if p + 1 > be:
                            raise ValueError("truncated SimpleBlock header")
                        flags = payload[p]
                        p += 1
                        lace = flags & 0x06
                        if not lace:
                            if collect:
                                frames.append(payload[p:be])
                            else:
                                n_frames += 1
                            continue
                        # laced block (Matroska 10.3): count byte, then
                        # per-type size data for frames 0..n-2, last
                        # frame's size implicit from the block end
                        if p >= be:
                            raise ValueError("truncated lace header")
                        n = payload[p] + 1
                        p += 1
                        sizes = []
                        if lace == 0x02:  # Xiph: 255-runs + terminator
                            for _ in range(n - 1):
                                sz = 0
                                while True:
                                    if p >= be:
                                        raise ValueError(
                                            "truncated Xiph lace sizes"
                                        )
                                    sz += payload[p]
                                    last = payload[p] != 0xFF
                                    p += 1
                                    if last:
                                        break
                                sizes.append(sz)
                        elif lace == 0x06:  # EBML: vint + signed deltas
                            if n > 1:
                                # all-ones is a legal lace-size value (the
                                # unknown-size form has no meaning here),
                                # same as the track-number vint above
                                sz, p = vint_parse(
                                    payload,
                                    p,
                                    keep_marker=False,
                                    allow_all_ones=True,
                                )
                                sizes.append(sz)
                                for _ in range(n - 2):
                                    raw, q = vint_parse(
                                        payload,
                                        p,
                                        keep_marker=False,
                                        allow_all_ones=True,
                                    )
                                    # signed vint: bias 2^(7*len)-1... the
                                    # marker-stripped width is (q - p)
                                    sz += raw - ((1 << (7 * (q - p) - 1)) - 1)
                                    p = q
                                    if sz < 0:
                                        raise ValueError(
                                            "negative EBML lace size"
                                        )
                                    sizes.append(sz)
                        else:  # 0x04 fixed: equal sizes, no size data
                            if (be - p) % n:
                                raise ValueError(
                                    "fixed lacing with non-divisible body"
                                )
                            sizes = [(be - p) // n] * (n - 1)
                        if p + sum(sizes) > be:
                            raise ValueError("lace sizes overrun block")
                        for sz in sizes:
                            if collect:
                                frames.append(payload[p : p + sz])
                            p += sz
                        if collect:
                            frames.append(payload[p:be])  # implicit last
                        else:
                            n_frames += n
    if w is None or h is None:
        raise ValueError("matroska stream has no video track dims")
    return (w, h, frames) if collect else (w, h, n_frames)


def parse_meta(payload: bytes) -> tuple:
    """(width, height, n_frames) — full structural walk with the same
    validation as :func:`parse_mkv`, but SimpleBlock bodies are counted by
    declared size, never copied (the mapInPandas decode hot path calls
    this per row)."""
    return _scan(payload, collect=False)
