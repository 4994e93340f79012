"""Property fuzz for the media kernels: arbitrary bytes must NEVER raise.

At 100 TB, malformed payloads are a certainty, and one uncaught exception
in a mapInPandas kernel kills the whole Spark job — so the row-skip /
null-degrade contract of kgspark.multimodal is pinned here with Hypothesis
over three input families: pure random bytes behind each real magic,
random mutations of valid corpus files, and adversarial allocation shapes
(giant declared dims, decompression bombs) that must fail CHEAPLY (bounded
work) as well as cleanly.

Pure-Python kernels only — no SparkSession — so the fuzz stays fast enough
for the default gate.
"""

from __future__ import annotations

import struct
import zlib

from hypothesis import example, given, settings
from hypothesis import strategies as st

from kgspark import datagen_media, gifcodec, jpegcodec, mkvcodec, multimodal

MAGICS = [
    b"",
    b"\xff\xd8\xff\xe0",
    bytes.fromhex("89504E470D0A1A0A"),
    b"GIF89a",
    b"GIF87a",
    b"RIFF",
    b"RIFF\x00\x00\x00\x00WAVE",
    bytes.fromhex("1A45DFA3"),
]

# one valid file of each kind, mutated by the second family below
_CORPUS = [p for _m, _k, p in datagen_media.media_rows(5, 42)]


@given(st.sampled_from(MAGICS), st.binary(max_size=300))
@settings(max_examples=250, deadline=None)
def test_decode_header_never_raises_on_garbage(magic, junk):
    d = multimodal.decode_header_py(magic + junk)
    assert isinstance(d, dict) and "kind" in d


@given(st.sampled_from(MAGICS), st.binary(max_size=300))
@settings(max_examples=150, deadline=None)
def test_resize_resample_framesample_never_raise_on_garbage(magic, junk):
    payload = magic + junk
    multimodal.resize_py(payload, 16, 16)
    multimodal.resample_py(payload, 8000)
    multimodal.frame_sample_py(payload)
    multimodal.feature_py(payload)


@given(
    st.integers(0, len(_CORPUS) - 1),
    st.lists(
        st.tuples(st.integers(0, 1 << 30), st.integers(0, 255)),
        min_size=1,
        max_size=8,
    ),
)
@settings(max_examples=150, deadline=None)
def test_mutated_valid_files_never_raise(idx, flips):
    """Byte-flip mutations of real corpus files: every kernel either still
    succeeds or skips/nulls the row — never an exception."""
    buf = bytearray(_CORPUS[idx])
    for pos, val in flips:
        buf[pos % len(buf)] = val
    payload = bytes(buf)
    d = multimodal.decode_header_py(payload)
    assert isinstance(d, dict)
    multimodal.resize_py(payload, 16, 16)
    multimodal.resample_py(payload, 8000)
    multimodal.frame_sample_py(payload)


@given(
    st.integers(0, len(_CORPUS) - 1),
    st.integers(0, 1 << 30),
)
@settings(max_examples=100, deadline=None)
def test_truncated_valid_files_never_raise(idx, cut):
    payload = _CORPUS[idx][: cut % (len(_CORPUS[idx]) + 1)]
    multimodal.decode_header_py(payload)
    multimodal.resize_py(payload, 16, 16)
    multimodal.resample_py(payload, 8000)
    multimodal.frame_sample_py(payload)


def _png_chunk(t: bytes, d: bytes) -> bytes:
    return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))


def test_allocation_shapes_fail_cheaply():
    """Adversarial allocation shapes: giant declared dims and decompression
    bombs must raise ValueError from the codec (and skip the row in the
    kernels) without doing work proportional to the CLAIMED size."""
    # JPEG SOF0 claiming 65535x65535 (a 4 GB pixel buffer if honored)
    f = datagen_media.make_jpeg_file(16, 16, bytes(range(32)))
    i = f.index(b"\xff\xc0")
    big = f[: i + 5] + struct.pack(">HH", 65535, 65535) + f[i + 9 :]
    try:
        jpegcodec.decode_jpeg(big)
        assert False
    except ValueError:
        pass
    assert multimodal.resize_py(big, 16, 16) is None
    # parse_dims (header-only, no allocation) still reports the raw header
    assert jpegcodec.parse_dims(big) == (65535, 65535)

    # PNG IHDR 4x4 whose IDAT inflates to 100 MB (deflate bomb)
    bomb = (
        bytes.fromhex("89504E470D0A1A0A")
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(bytes(100_000_000), 9))
        + _png_chunk(b"IEND", b"")
    )
    try:
        multimodal.png_decode_pixels(bomb)
        assert False
    except ValueError:
        pass
    assert multimodal.resize_py(bomb, 16, 16) is None

    # GIF descriptor 8x8 whose LZW stream decodes to 200k indices
    lzw = gifcodec.lzw_encode(bytes(200_000))
    crafted = (
        b"GIF89a" + struct.pack("<HH", 8, 8) + bytes([0x87, 0, 0]) + bytes(768)
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 8, 8) + b"\x00" + b"\x08"
        + b"".join(
            bytes([min(255, len(lzw) - i)]) + lzw[i : i + 255]
            for i in range(0, len(lzw), 255)
        )
        + b"\x00\x3b"
    )
    try:
        gifcodec.parse_gif(crafted)
        assert False
    except ValueError:
        pass
    assert multimodal.resize_py(crafted, 16, 16) is None

    # Matroska element declaring a size far past the buffer
    hdr = mkvcodec.element(
        mkvcodec.EBML_HEADER, mkvcodec.element(mkvcodec.DOCTYPE, b"matroska")
    )
    huge = hdr + mkvcodec._id_bytes(mkvcodec.SEGMENT) + mkvcodec.vint_encode(
        1 << 40
    )
    try:
        mkvcodec.parse_mkv(huge)
        assert False
    except ValueError:
        pass
    d = multimodal.decode_header_py(huge)
    assert d["kind"] == "matroska" and d["width"] is None


@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_encoder_roundtrip_arbitrary_dims(w, h, seed):
    """make_jpeg emits a decodable file at ANY dims (including non-multiple
    of 8 edges) whose decode is deterministic and dimension-exact."""
    gray = bytes((seed + 37 * i) % 256 for i in range(w * h))
    f = jpegcodec.make_jpeg(w, h, gray)
    dw, dh, dec = jpegcodec.decode_jpeg(f)
    assert (dw, dh) == (w, h) and len(dec) == w * h
    assert jpegcodec.decode_jpeg(f)[2] == dec
    assert jpegcodec.parse_dims(f) == (w, h)


@given(
    st.integers(1, 32),
    st.integers(1, 32),
    st.integers(0, 2**32 - 1),
)
# regression: _C_GU was transcribed as 22554 (true round(0.344136*2^16) is
# 22553); the ±1 constant surfaced as a single ±1 green byte on a rounding
# boundary only at this example before the constants became computed.
@example(w=4, h=8, seed=160)
@settings(max_examples=30, deadline=None)
def test_jpeg_color_encoder_roundtrip_arbitrary_dims(w, h, seed):
    """make_jpeg_color emits a decodable 4:4:4 file at ANY dims whose decode
    is deterministic, dimension-exact, and 3-channel — and bit-identical to
    the independent T.81 oracle restatement (integer-defined decode)."""
    from kgspark import media_oracles

    rgb = bytes((seed + 11 * i) % 256 for i in range(3 * w * h))
    f = jpegcodec.make_jpeg_color(w, h, rgb)
    dw, dh, dec = jpegcodec.decode_jpeg(f)
    assert (dw, dh) == (w, h) and len(dec) == 3 * w * h
    assert jpegcodec.decode_jpeg(f)[2] == dec
    assert media_oracles._jpeg_decode_independent(f) == (w, h, dec)
    assert jpegcodec.parse_dims(f) == (w, h)


@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 2**32 - 1),
)
# w=1 makes left/up-left neighbours vanish except channel 0; h>=6 cycles
# through every filter type at least once
@example(w=1, h=6, seed=0)
@settings(max_examples=30, deadline=None)
def test_png_filtered_roundtrip_arbitrary_dims(w, h, seed):
    """Filter-cycled and Adam7-interlaced PNGs decode byte-equal to their
    sequential filter-0 twins at any dims — unfiltering and the pass
    merge are lossless."""
    hsh = bytes((seed + i) % 256 for i in range(32))
    plain = multimodal.png_decode_pixels(datagen_media.make_png(w, h, hsh))
    for filt, il in ((True, False), (False, True), (True, True)):
        got = multimodal.png_decode_pixels(
            datagen_media.make_png(w, h, hsh, filtered=filt, interlaced=il)
        )
        assert got == plain, (filt, il)


@given(
    st.integers(1, 32),
    st.integers(1, 32),
    st.integers(0, 16),
    st.integers(0, 2**32 - 1),
)
# ri=1 restarts after EVERY MCU (maximum marker density); an interval
# larger than the MCU count must emit no markers at all
@example(w=24, h=24, ri=1, seed=0)
@example(w=8, h=8, ri=16, seed=1)
@settings(max_examples=30, deadline=None)
def test_jpeg_restart_interval_roundtrip(w, h, ri, seed):
    """Files with DRI restart intervals decode bit-identically to their
    plain twins in all three layouts, on both the kernel and the
    independent oracle (RST splitting + DC predictor resets cancel)."""
    from kgspark import media_oracles

    gray = bytes((seed + 37 * i) % 256 for i in range(w * h))
    rgb = bytes((seed + 11 * i) % 256 for i in range(3 * w * h))
    for plain, rst in (
        (jpegcodec.make_jpeg(w, h, gray), jpegcodec.make_jpeg(w, h, gray, ri)),
        (
            jpegcodec.make_jpeg_color(w, h, rgb),
            jpegcodec.make_jpeg_color(w, h, rgb, restart_interval=ri),
        ),
        (
            jpegcodec.make_jpeg_color(w, h, rgb, "420"),
            jpegcodec.make_jpeg_color(w, h, rgb, "420", restart_interval=ri),
        ),
        (
            jpegcodec.make_jpeg_color(w, h, rgb, "422"),
            jpegcodec.make_jpeg_color(w, h, rgb, "422", restart_interval=ri),
        ),
    ):
        dec = jpegcodec.decode_jpeg(plain)
        assert jpegcodec.decode_jpeg(rst) == dec
        assert media_oracles._jpeg_decode_independent(rst) == dec


@given(
    st.integers(1, 32),
    st.integers(1, 32),
    st.integers(0, 2**32 - 1),
)
# odd dims make the chroma plane clamp-to-edge and the Y plane end
# mid-16x16-MCU — the two edge behaviors specific to 4:2:0
@example(w=17, h=9, seed=7)
@example(w=1, h=1, seed=0)
@settings(max_examples=30, deadline=None)
def test_jpeg_subsampled_encoder_roundtrip_arbitrary_dims(w, h, seed):
    """make_jpeg_color with 4:2:0 (16x16 MCUs, four Y blocks) or 4:2:2
    (16x8 MCUs, two Y blocks) emits a decodable file at ANY dims whose
    decode is deterministic, dimension-exact, 3-channel — and bit-identical
    to the independent T.81 oracle restatement (integer-defined downsample,
    IDCT, replicated upsample, and color transform)."""
    from kgspark import media_oracles

    rgb = bytes((seed + 11 * i) % 256 for i in range(3 * w * h))
    for ss in ("420", "422"):
        f = jpegcodec.make_jpeg_color(w, h, rgb, subsampling=ss)
        dw, dh, dec = jpegcodec.decode_jpeg(f)
        assert (dw, dh) == (w, h) and len(dec) == 3 * w * h, ss
        assert jpegcodec.decode_jpeg(f)[2] == dec, ss
        assert media_oracles._jpeg_decode_independent(f) == (w, h, dec), ss
        assert jpegcodec.parse_dims(f) == (w, h), ss


@given(
    st.integers(1, 48),
    st.integers(1, 48),
    st.integers(0, 2**32 - 1),
)
# heights below 5 leave passes 1-3 short or empty; 8/9 straddle the pass-2
# boundary — the interlace edge cases
@example(w=3, h=1, seed=0)
@example(w=7, h=9, seed=1)
@settings(max_examples=30, deadline=None)
def test_gif_interlaced_roundtrip_arbitrary_dims(w, h, seed):
    """make_gif(interlace=True) emits a decodable file at ANY dims whose
    parse returns the LOGICAL pixel order — identical to the plain file's
    parse (de-interlacing is lossless for every height)."""
    pal = bytes((seed + i) % 256 for i in range(768))
    idx = bytes((seed + 31 * i) % 256 for i in range(w * h))
    plain = gifcodec.parse_gif(gifcodec.make_gif(w, h, pal, idx))
    inter = gifcodec.parse_gif(gifcodec.make_gif(w, h, pal, idx, interlace=True))
    assert plain == inter == (w, h, pal, idx)


@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.integers(0, 20),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_mkv_encoder_roundtrip_arbitrary_shapes(w, h, n_frames, seed):
    """make_mkv emits a demuxable file for any dims/frame count (0 frames,
    cluster boundaries at 8) with LOSSLESS frame round-trip — in every
    block storage: plain, Xiph-laced, fixed-laced, and EBML-laced."""
    frames = [
        bytes((seed + f * 31 + i) % 256 for i in range(w * h))
        for f in range(n_frames)
    ]
    for lacing in (None, "xiph", "fixed", "ebml"):
        payload = mkvcodec.make_mkv(w, h, frames, lacing)
        pw, ph, pf = mkvcodec.parse_mkv(payload)
        assert (pw, ph) == (w, h) and pf == frames, lacing
        assert mkvcodec.parse_meta(payload) == (w, h, n_frames), lacing


# ---------------------------------------------------------------- WARC codec
# Same contract as the media kernels: the Spark kernel (kgspark.warc)
# catches per file, so the codec must fail with ValueError (clean, cheap)
# or succeed — never hang, never raise anything else, never allocate
# unboundedly on a lying Content-Length.


@given(st.binary(max_size=4096))
@settings(max_examples=200, deadline=None)
def test_fuzz_parse_warc_random_bytes(data):
    from kgspark import warccodec

    try:
        recs = warccodec.parse_warc(data)
    except ValueError:
        return
    assert isinstance(recs, list)


@given(st.data())
@settings(max_examples=100, deadline=None)
def test_fuzz_parse_warc_mutated_valid_file(data):
    """Single-byte mutations of a real member-per-record gzip WARC:
    ValueError or a successful (possibly shorter) parse — nothing else."""
    from kgspark import datagen, warccodec

    blob = bytearray(datagen.warc_files_rows(6, 1)[0][1])
    pos = data.draw(st.integers(0, len(blob) - 1))
    blob[pos] ^= data.draw(st.integers(1, 255))
    try:
        recs = warccodec.parse_warc(bytes(blob))
    except ValueError:
        return
    assert isinstance(recs, list)


def test_fuzz_warc_lying_length_fails_cheaply():
    """A declared Content-Length of MAX_RECORD_BYTES with 50 actual bytes
    must reject without allocating the declared size, and an
    over-the-cap declaration rejects outright."""
    from kgspark import warccodec

    import re

    base = warccodec.make_response_record("https://x.test/", "2026-01-01T00:00:00Z", b"hi")
    for n in (warccodec.MAX_RECORD_BYTES - 1, warccodec.MAX_RECORD_BYTES + 1):
        lying = re.sub(
            rb"Content-Length: \d+\r\n\r\n", b"Content-Length: %d\r\n\r\n" % n,
            base, count=1,
        )
        assert lying != base
        try:
            warccodec.parse_warc(lying)
            assert False, "lying length accepted"
        except ValueError:
            pass
