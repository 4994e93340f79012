"""Multimodal binary-column plumbing: sniffing, decode stubs, features, frames."""

from __future__ import annotations

import hashlib

from kgspark import datagen_media, multimodal

N = 25


def test_media_rows_deterministic():
    a = datagen_media.media_rows(N, seed=7)
    b = datagen_media.media_rows(N, seed=7)
    assert a == b
    assert len({mid for mid, _, _ in a}) == N  # ids content-addressed, unique


def test_decode_header_kernel_parses_synthetic_headers():
    for _mid, kind, payload in datagen_media.media_rows(N):
        d = multimodal.decode_header_py(payload)
        assert d["kind"] == kind
        if kind in ("jpeg", "png", "gif"):
            assert d["width"] > 0 and d["height"] > 0
            assert d["n_samples"] is None and d["n_frames"] is None
        elif kind == "riff":
            assert d["n_samples"] >= 4000
        else:  # matroska
            assert d["n_frames"] >= 24 and d["width"] > 0 and d["height"] > 0


def test_media_metadata_matches_kernel(spark):
    df = datagen_media.media_files(spark, N)
    rows = {r["media_id"]: r for r in multimodal.media_metadata(df).collect()}
    assert len(rows) == N
    for mid, kind, payload in datagen_media.media_rows(N):
        r = rows[mid]
        assert r["kind"] == kind  # magic sniff agrees with generator
        assert r["n_bytes"] == len(payload)
        assert r["payload_sha256"] == hashlib.sha256(payload).hexdigest()


def test_decode_media_distributed_equals_kernel(spark):
    df = datagen_media.media_files(spark, N).repartition(5)
    got = {r["media_id"]: r.asDict() for r in multimodal.decode_media(df).collect()}
    for mid, _kind, payload in datagen_media.media_rows(N):
        expect = multimodal.decode_header_py(payload)
        row = got[mid]
        for k in ("kind", "width", "height", "n_samples", "n_frames"):
            assert row[k] == expect[k], (mid, k)


def test_media_features_shape_and_determinism(spark):
    df = datagen_media.media_files(spark, N)
    feats = {r["media_id"]: r["feature"] for r in multimodal.media_features(df).collect()}
    assert len(feats) == N
    for mid, _kind, payload in datagen_media.media_rows(N):
        vec = feats[mid]
        assert len(vec) == 8
        assert all(-1.0 <= x < 1.0 for x in vec)
        expect = multimodal.feature_py(payload)
        assert [round(float(x), 6) for x in vec] == expect


def test_sample_frames_only_videos(spark):
    df = datagen_media.media_files(spark, N)
    out = multimodal.sample_frames(df).collect()
    kinds = {mid: kind for mid, kind, _ in datagen_media.media_rows(N)}
    assert out, "expected at least one matroska payload in the corpus"
    assert {kinds[r["media_id"]] for r in out} == {"matroska"}
    for r in out:
        assert r["frame_index"] % 10 == 0


def test_png_payloads_are_real_decodable_files():
    """Corpus PNGs round-trip through the real stdlib decoder: chunk walk,
    IDAT inflate, unfilter — pixels reproduce the seeded pattern exactly."""
    import hashlib

    pngs = [
        (mid, payload)
        for mid, kind, payload in datagen_media.media_rows(N)
        if kind == "png"
    ]
    assert pngs, "expected png payloads in the corpus"
    seen_filters = set()
    for i, (mid, payload) in enumerate(pngs):
        w, h, rgb = multimodal.png_decode_pixels(payload)
        assert len(rgb) == w * h * 3
        # find the generator hash for this row to check the pattern
        seed_hash = next(
            hashlib.sha256(f"42:media:{j}".encode()).digest()
            for j, (m2, _, _) in enumerate(datagen_media.media_rows(N))
            if m2 == mid
        )
        # the pattern check is ALSO the unfilter check (and for interlaced
        # files the Adam7 pass-merge check): a wrong Sub/Up/Average/Paeth
        # recurrence corrupts every later pixel of the row, a wrong pass
        # geometry scatters pixels to wrong coordinates
        for (x, y) in ((0, 0), (w - 1, h - 1), (w // 2, h // 3)):
            k = (y * w + x) * 3
            assert tuple(rgb[k : k + 3]) == datagen_media.png_pixel(x, y, seed_hash)
        interlaced = payload[28]  # IHDR interlace byte
        seen_filters.add("interlaced" if interlaced else "sequential")
        if not interlaced:
            # filter byte per scanline (IDAT inflates to 1+3w per row)
            import zlib as _z

            idat, pos = b"", 8
            while pos < len(payload):
                (ln,) = __import__("struct").unpack(
                    ">I", payload[pos : pos + 4]
                )
                if payload[pos + 4 : pos + 8] == b"IDAT":
                    idat += payload[pos + 8 : pos + 8 + ln]
                pos += 12 + ln
            raw = _z.decompress(idat)
            seen_filters.update(raw[y * (1 + 3 * w)] for y in range(h))
    # the corpus must exercise ALL FIVE scanline filters and BOTH storage
    # orders (sequential and Adam7 interlaced)
    assert seen_filters == {0, 1, 2, 3, 4, "sequential", "interlaced"}


def test_png_resize_emits_valid_png_thumbnail():
    """resize_py's PNG branch re-encodes a VALID PNG at the fit-within box:
    the digest must equal sha256 of a file our own real decoder accepts."""
    import hashlib

    for mid, kind, payload in datagen_media.media_rows(N):
        if kind != "png":
            continue
        r = multimodal.resize_py(payload, 16, 16)
        sw, sh = r["src_width"], r["src_height"]
        assert (r["out_width"], r["out_height"]) == multimodal.fit_within(
            sw, sh, 16, 16
        )
        # rebuild the thumbnail the same way and verify digest + decodability
        _, _, rgb = multimodal.png_decode_pixels(payload)
        out = bytearray()
        for j in range(r["out_height"]):
            sy = j * sh // r["out_height"]
            for i in range(r["out_width"]):
                sx = i * sw // r["out_width"]
                out.extend(rgb[(sy * sw + sx) * 3 : (sy * sw + sx) * 3 + 3])
        thumb = multimodal.png_encode(r["out_width"], r["out_height"], bytes(out))
        assert hashlib.sha256(thumb).hexdigest() == r["resized_sha256"]
        tw2, th2, trgb = multimodal.png_decode_pixels(thumb)
        assert (tw2, th2) == (r["out_width"], r["out_height"])
        assert len(trgb) == tw2 * th2 * 3


def test_gif_lzw_roundtrip_properties():
    """kgspark.gifcodec LZW: round-trip across run-heavy, cycling, random,
    and small-alphabet streams — including lengths that force the 12-bit
    width cap and the 4096-entry dictionary reset."""
    import random

    from kgspark import gifcodec

    rng = random.Random(11)
    cases = [
        b"",
        b"\x07",
        bytes(5000),                                      # uniform run
        bytes([i % 256 for i in range(10000)]),           # cycling
        bytes(rng.randrange(256) for _ in range(30000)),  # forces dict reset
        bytes([1, 1, 1, 2, 2, 2] * 900),                  # KwKwK-rich
    ]
    for c in cases:
        assert gifcodec.lzw_decode(gifcodec.lzw_encode(c)) == c
    small = bytes(rng.randrange(4) for _ in range(6000))
    assert gifcodec.lzw_decode(gifcodec.lzw_encode(small, 2), 2) == small


def test_gif_payloads_are_real_decodable_files():
    """Corpus GIFs are valid GIF89a: true little-endian LSD dims, 256-entry
    GCT, LZW index data reproducing the seeded pattern exactly."""
    from kgspark import gifcodec

    gifs = [
        (j, mid, payload)
        for j, (mid, kind, payload) in enumerate(datagen_media.media_rows(N))
        if kind == "gif"
    ]
    assert gifs, "expected gif payloads in the corpus"
    seen_layouts = set()
    for j, mid, payload in gifs:
        w, h, palette, idx = gifcodec.parse_gif(payload)
        seed_hash = hashlib.sha256(f"42:media:{j}".encode()).digest()
        assert palette == datagen_media.gif_palette(seed_hash)
        assert len(idx) == w * h
        # the pattern check below is ALSO the de-interlace check: an
        # interlaced payload whose rows were not unshuffled would place
        # pattern row 8 at logical row 1
        for (x, y) in ((0, 0), (w - 1, h - 1), (w // 2, h // 3), (0, 1)):
            assert idx[y * w + x] == datagen_media.gif_index(x, y, seed_hash)
        d = multimodal.decode_header_py(payload)
        assert (d["width"], d["height"]) == (w, h)
        # image-descriptor packed byte: signature(6) + LSD(7) + GCT(768) +
        # separator/geometry(9)
        seen_layouts.add(
            "interlaced" if payload[13 + 768 + 9] & 0x40 else "plain"
        )
    # the corpus must exercise BOTH storage layouts
    assert seen_layouts == {"plain", "interlaced"}


def test_gif_resize_emits_valid_gif_thumbnail():
    """resize_py's GIF branch re-encodes a VALID GIF at the fit-within box;
    the digest equals sha256 of a file our own conforming parser accepts,
    with the source palette preserved."""
    from kgspark import gifcodec

    for mid, kind, payload in datagen_media.media_rows(N):
        if kind != "gif":
            continue
        r = multimodal.resize_py(payload, 16, 16)
        sw, sh = r["src_width"], r["src_height"]
        assert (r["out_width"], r["out_height"]) == multimodal.fit_within(
            sw, sh, 16, 16
        )
        _, _, palette, idx = gifcodec.parse_gif(payload)
        sampled = bytes(
            idx[(j * sh // r["out_height"]) * sw + (i * sw // r["out_width"])]
            for j in range(r["out_height"])
            for i in range(r["out_width"])
        )
        thumb = gifcodec.make_gif(
            r["out_width"], r["out_height"], palette, sampled
        )
        assert hashlib.sha256(thumb).hexdigest() == r["resized_sha256"]
        tw2, th2, tpal, tidx = gifcodec.parse_gif(thumb)
        assert (tw2, th2) == (r["out_width"], r["out_height"])
        assert tpal == palette and tidx == sampled


def test_gif_parser_reads_foreign_profile():
    """The parser is spec-conforming beyond the corpus profile: GIF87a
    signature, 4-color table with min code size 2, an extension block to
    skip — and an INTERLACED variant of the same image (flag 0x40, rows
    stored in the appendix-E four-pass order)."""
    import struct

    from kgspark import gifcodec

    pal4 = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = bytes([(x + y) % 4 for y in range(9) for x in range(7)])
    lzw = gifcodec.lzw_encode(idx, 2)
    foreign = (
        b"GIF87a" + struct.pack("<HH", 7, 9) + bytes([0x81, 0, 0]) + pal4
        + b"\x21\xfe\x03abc\x00"  # comment extension, skipped
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 7, 9) + b"\x00" + b"\x02"
        + bytes([len(lzw)]) + lzw + b"\x00" + b"\x3b"
    )
    w, h, p, ix = gifcodec.parse_gif(foreign)
    assert (w, h) == (7, 9) and p == pal4 and ix == idx

    # interlaced: stored rows follow passes 0,8.. / 4,12.. / 2,6.. / 1,3..
    shuffled = b"".join(
        idx[y * 7 : (y + 1) * 7] for y in gifcodec.interlace_order(9)
    )
    lzw_i = gifcodec.lzw_encode(shuffled, 2)
    foreign_i = (
        b"GIF87a" + struct.pack("<HH", 7, 9) + bytes([0x81, 0, 0]) + pal4
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 7, 9) + b"\x40" + b"\x02"
        + bytes([len(lzw_i)]) + lzw_i + b"\x00" + b"\x3b"
    )
    w, h, p, ix = gifcodec.parse_gif(foreign_i)
    assert (w, h) == (7, 9) and p == pal4 and ix == idx


def test_gif_interlace_order_is_a_permutation_and_roundtrips():
    """interlace_order(h) is a permutation of range(h) for every height,
    and interlaced encode -> parse returns the LOGICAL row order
    byte-identically (plain and interlaced files decode equal)."""
    from kgspark import gifcodec

    for h in list(range(1, 40)) + [127, 128]:
        assert sorted(gifcodec.interlace_order(h)) == list(range(h)), h
    pal = bytes(range(256)) * 3
    for (w, h) in ((24, 24), (17, 9), (1, 1), (5, 2), (3, 8)):
        idx = bytes((x * 3 + y * 7) % 256 for y in range(h) for x in range(w))
        plain = gifcodec.parse_gif(gifcodec.make_gif(w, h, pal, idx))
        inter = gifcodec.parse_gif(
            gifcodec.make_gif(w, h, pal, idx, interlace=True)
        )
        assert plain == inter == (w, h, pal, idx)


def test_wav_payloads_are_real_decodable_files():
    """Corpus WAVs are standards-conforming: stdlib wave reads all three
    PCM layouts (mono-16, stereo-16, mono-8), and the decoded canonical
    mono-16 stream reproduces the seeded pattern through the DEFINED
    downmix/widening maps exactly."""
    import hashlib
    import io
    import wave

    wavs = [
        (j, payload)
        for j, (mid, kind, payload) in enumerate(datagen_media.media_rows(N))
        if kind == "riff"
    ]
    assert wavs, "expected wav payloads in the corpus"
    seen_layouts = set()
    for j, payload in wavs:
        w = wave.open(io.BytesIO(payload))
        ch, sw = w.getnchannels(), w.getsampwidth()
        seen_layouts.add((ch, sw))
        rate, samples = multimodal.wav_decode_pcm(payload)
        assert rate == w.getframerate() and len(samples) == w.getnframes()
        seed_hash = hashlib.sha256(f"42:media:{j}".encode()).digest()

        def expected(i: int) -> int:
            if ch == 2:  # floor-mean downmix of interleaved L/R
                return (
                    datagen_media.wav_sample(2 * i, seed_hash)
                    + datagen_media.wav_sample(2 * i + 1, seed_hash)
                ) >> 1
            if sw == 1:  # 8-bit narrow + defined (b-128)*256 widening
                return (datagen_media.wav_sample(i, seed_hash) >> 8) * 256
            return datagen_media.wav_sample(i, seed_hash)

        for i in (0, len(samples) // 2, len(samples) - 1):
            assert samples[i] == expected(i)
    # the corpus must exercise all three PCM layouts
    assert seen_layouts == {(1, 2), (2, 2), (1, 1)}


def test_wav_kernel_reads_stdlib_wave_written_file():
    """The RIFF chunk walk decodes a file written by stdlib wave — the
    kernel is a real WAV reader, not a corpus-layout parser."""
    import io
    import wave

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(16000)
    w.writeframes(
        b"".join(int(v).to_bytes(2, "little", signed=True) for v in range(-50, 50))
    )
    w.close()
    rate, samples = multimodal.wav_decode_pcm(buf.getvalue())
    assert rate == 16000 and samples == list(range(-50, 50))
    d = multimodal.decode_header_py(buf.getvalue())
    assert d["kind"] == "riff" and d["n_samples"] == 100


def test_wav_resample_emits_valid_wav():
    """resample_py re-encodes a VALID WAV at the target rate: the digest must
    equal sha256 of a file our own real decoder (and stdlib wave) accepts,
    with nearest-neighbour samples of the source PCM."""
    import hashlib

    for mid, kind, payload in datagen_media.media_rows(N):
        if kind != "riff":
            continue
        r = multimodal.resample_py(payload, 8000)
        src_rate, samples = multimodal.wav_decode_pcm(payload)
        assert r["src_rate"] == src_rate and r["src_samples"] == len(samples)
        if src_rate <= 8000:
            expect = samples
            assert r["out_rate"] == src_rate
        else:
            n = len(samples)
            out_n = max(1, (n * 8000) // src_rate)
            expect = [samples[i * n // out_n] for i in range(out_n)]
            assert r["out_rate"] == 8000
        import struct as _s

        rebuilt = datagen_media.make_wav(
            r["out_rate"], _s.pack(f"<{len(expect)}h", *expect)
        )
        assert r["resampled_sha256"] == hashlib.sha256(rebuilt).hexdigest()
        # the re-encoded file round-trips through the real decoder
        rr, ss = multimodal.wav_decode_pcm(rebuilt)
        assert rr == r["out_rate"] and ss == expect


def test_resample_media_distributed_equals_kernel(spark):
    df = datagen_media.media_files(spark, N).repartition(5)
    got = {
        r["media_id"]: r.asDict()
        for r in multimodal.resample_media(df).collect()
    }
    kinds = {mid: kind for mid, kind, _ in datagen_media.media_rows(N)}
    assert got and all(kinds[m] == "riff" for m in got)
    for mid, kind, payload in datagen_media.media_rows(N):
        if kind == "riff":
            expect = multimodal.resample_py(bytes(payload), 8000)
            row = got[mid]
            assert {k: row[k] for k in expect} == expect


def test_corrupt_media_rows_are_skipped_not_fatal():
    """A valid magic with a malformed body must skip the row (None), never
    raise out of the kernel and kill the whole Spark job."""
    import struct
    import zlib

    # PNG: valid signature+IHDR, truncated IDAT stream
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))
    bad_png = (
        bytes.fromhex("89504E470D0A1A0A")
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"x" * 52)[:5])  # truncated stream
        + chunk(b"IEND", b"")
    )
    assert multimodal.resize_py(bad_png, 16, 16) is None

    # GIF: valid header, image data cut mid-sub-block
    good = datagen_media.make_gif_file(8, 8, bytes(range(32)))
    bad_gif = good[: len(good) // 2]
    assert multimodal.resize_py(bad_gif, 16, 16) is None

    # WAV: fmt chunk declares 16 bytes but the stream ends after 4
    bad_wav = (
        b"RIFF" + struct.pack("<I", 20) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + b"\x01\x00\x01\x00"
    )
    d = multimodal.decode_header_py(bad_wav)
    assert d["kind"] == "riff" and d["n_samples"] is None
    assert multimodal.resample_py(bad_wav, 8000) is None

    # healthy rows still resize after the guards
    for _mid, kind, payload in datagen_media.media_rows(8):
        if kind in ("png", "gif"):
            assert multimodal.resize_py(payload, 16, 16) is not None


def test_jpeg_codec_roundtrip_properties():
    """kgspark.jpegcodec: encode->decode across uniform, gradient, and noisy
    images — dims exact, uniform blocks reconstruct within 1 gray level,
    smooth gradients within a small tolerance, decode fully deterministic,
    non-baseline streams rejected with a clear error."""
    import random
    import struct

    from kgspark import jpegcodec

    for val in (0, 37, 128, 255):
        g = bytes([val]) * (16 * 16)
        w, h, dec = jpegcodec.decode_jpeg(jpegcodec.make_jpeg(16, 16, g))
        assert (w, h) == (16, 16)
        assert max(abs(a - b) for a, b in zip(g, dec)) <= 1

    g = bytes((x * 2 + y) % 256 for y in range(29) for x in range(37))
    f = jpegcodec.make_jpeg(37, 29, g)
    w, h, dec = jpegcodec.decode_jpeg(f)
    assert (w, h) == (37, 29) == jpegcodec.parse_dims(f)
    errs = [abs(a - b) for a, b in zip(g, dec)]
    assert max(errs) <= 8 and sum(errs) / len(errs) <= 2

    rng = random.Random(5)
    g = bytes(rng.randrange(256) for _ in range(41 * 53))
    f = jpegcodec.make_jpeg(41, 53, g)
    assert jpegcodec.decode_jpeg(f)[2] == jpegcodec.decode_jpeg(f)[2]

    # progressive SOF2 must be rejected, not misdecoded
    prog = f.replace(b"\xff\xc0", b"\xff\xc2", 1)
    try:
        jpegcodec.decode_jpeg(prog)
        assert False, "expected ValueError on progressive JPEG"
    except ValueError:
        pass
    # 2-component SOF must be rejected (header claims what we can't decode)
    i = f.index(b"\xff\xc0")
    bad = f[: i + 9] + b"\x03" + f[i + 10 :]
    try:
        jpegcodec.decode_jpeg(bad)
        assert False, "expected ValueError on multi-component JPEG"
    except ValueError:
        pass


def test_jpeg_payloads_are_real_decodable_files():
    """Corpus JPEGs are valid baseline JFIF: true marker stream (APP0/DQT/
    SOF0/DHT/SOS), real SOF0 dims, and the decoded pixels reproduce the
    seeded encoder-input pattern within JPEG's lossy envelope."""
    from kgspark import jpegcodec

    jpegs = [
        (j, mid, payload)
        for j, (mid, kind, payload) in enumerate(datagen_media.media_rows(N))
        if kind == "jpeg"
    ]
    assert jpegs, "expected jpeg payloads in the corpus"
    seen_layouts = set()
    for j, mid, payload in jpegs:
        assert payload[:4] == b"\xff\xd8\xff\xe0" and payload[6:11] == b"JFIF\x00"
        w, h = jpegcodec.parse_dims(payload)
        d = multimodal.decode_header_py(payload)
        assert (d["width"], d["height"]) == (w, h) and w * h > 0
        dw, dh, pix = jpegcodec.decode_jpeg(payload)
        nch = len(pix) // (w * h)
        assert (dw, dh) == (w, h) and nch in (1, 3) and len(pix) == nch * w * h
        if nch == 1:
            seen_layouts.add("gray")
        else:
            # Y sampling byte inside the SOF0 component list (SOF0 precedes
            # entropy data, and no earlier segment of these files can
            # contain 0xFFC0: APP0 is fixed JFIF bytes, Annex K quant
            # values max out at 121)
            sof = payload.index(b"\xff\xc0")
            seen_layouts.add(
                {0x11: "444", 0x22: "420", 0x21: "422"}[payload[sof + 11]]
            )
        seed_hash = hashlib.sha256(f"42:media:{j}".encode()).digest()
        if nch == 1:
            errs = [
                abs(pix[y * w + x] - datagen_media.jpeg_pixel(x, y, seed_hash))
                for y in range(h)
                for x in range(w)
            ]
        else:
            errs = [
                abs(
                    pix[3 * (y * w + x) + c]
                    - datagen_media.jpeg_rgb_pixel(x, y, seed_hash)[c]
                )
                for y in range(h)
                for x in range(w)
                for c in range(3)
            ]
        # color tolerance is wider: chroma quantization (Annex K.2's 99s)
        # is much coarser than luma, by design of the standard tables
        tol = 8 if nch == 1 else 24
        assert sum(errs) / len(errs) <= tol, (mid, sum(errs) / len(errs))
    # the corpus must exercise ALL FOUR entropy layouts: one-component,
    # three-component 1x1 (4:4:4), 2x2+1x1 (4:2:0), and 2x1+1x1 (4:2:2)
    assert seen_layouts == {"gray", "444", "420", "422"}


def test_jpeg_oracle_corpus_covers_every_layout_restart_combo():
    """At the ORACLE corpus size (MEDIA_N=40: 8 jpeg ordinals) every
    (layout, restart) combination must appear AND decode bit-identically
    on the kernel and the independent oracle — the restart axis must stay
    independent of the layout axis (review catch: an ordinal%2 restart
    parity was fully determined by a 4-way layout cycle, leaving half the
    layouts never restart-marked in any driver-oracled file)."""
    from kgspark import jpegcodec
    from kgspark.media_oracles import (
        MEDIA_N,
        MEDIA_SEED,
        _jpeg_decode_independent,
    )

    combos = set()
    for i, (mid, kind, payload) in enumerate(
        datagen_media.media_rows(MEDIA_N, MEDIA_SEED)
    ):
        if kind != "jpeg":
            continue
        assert jpegcodec.decode_jpeg(payload) == _jpeg_decode_independent(
            payload
        ), mid
        ordinal = i // 5
        combos.add((ordinal % 4, bool((ordinal // 4) % 2)))
    assert combos == {(lay, ri) for lay in range(4) for ri in (False, True)}


def test_jpeg_resize_emits_valid_jpeg_thumbnail():
    """resize_py's JPEG branch re-encodes a VALID baseline JPEG at the
    fit-within box: the digest equals sha256 of a file our own conforming
    decoder accepts at the expected dims."""
    from kgspark import jpegcodec

    for mid, kind, payload in datagen_media.media_rows(N):
        if kind != "jpeg":
            continue
        r = multimodal.resize_py(payload, 16, 16)
        sw, sh = r["src_width"], r["src_height"]
        ow, oh = r["out_width"], r["out_height"]
        assert (ow, oh) == multimodal.fit_within(sw, sh, 16, 16)
        _, _, pix = jpegcodec.decode_jpeg(payload)
        nch = len(pix) // (sw * sh)
        sampled = b"".join(
            pix[
                nch * ((j * sh // oh) * sw + (i * sw // ow))
                : nch * ((j * sh // oh) * sw + (i * sw // ow)) + nch
            ]
            for j in range(oh)
            for i in range(ow)
        )
        thumb = (
            jpegcodec.make_jpeg_color(ow, oh, sampled)
            if nch == 3
            else jpegcodec.make_jpeg(ow, oh, sampled)
        )
        assert hashlib.sha256(thumb).hexdigest() == r["resized_sha256"]
        tw2, th2, _ = jpegcodec.decode_jpeg(thumb)
        assert (tw2, th2) == (ow, oh)


def test_jpeg_parser_reads_foreign_profile():
    """The marker walk is spec-conforming beyond our own encoder's output:
    T.81 B.1.1.2 fill bytes (repeated 0xFF) before markers and a COM
    segment to skip — both in the kernel codec and in the independent
    oracle restatement."""
    from kgspark import jpegcodec, media_oracles

    f = datagen_media.make_jpeg_file(24, 16, bytes(range(32)))
    # inject a fill byte before APP0 and a comment segment after it
    i = f.index(b"\xff\xdb")
    foreign = (
        f[:2] + b"\xff" + f[2:i] + b"\xff\xfe\x00\x05abc" + f[i:]
    )
    assert jpegcodec.parse_dims(foreign) == (24, 16)
    assert jpegcodec.decode_jpeg(foreign)[2] == jpegcodec.decode_jpeg(f)[2]
    assert media_oracles._jpeg_dims_independent(foreign) == (24, 16)
    assert (
        media_oracles._jpeg_decode_independent(foreign)[2]
        == jpegcodec.decode_jpeg(f)[2]
    )


def test_corrupt_jpeg_rows_are_skipped_not_fatal():
    """A valid JPEG magic with a malformed body must skip the row (None),
    and header decode must degrade to null dims, never raise."""
    good = datagen_media.make_jpeg_file(32, 24, bytes(range(32)))
    # scan truncated mid-entropy-data
    bad = good[: len(good) - len(good) // 3]
    assert multimodal.resize_py(bad, 16, 16) is None
    # header cut before SOF0: dims become null, kind still sniffs as jpeg
    headerless = good[:12]
    d = multimodal.decode_header_py(headerless)
    assert d["kind"] == "jpeg" and d["width"] is None and d["height"] is None
    assert multimodal.resize_py(headerless, 16, 16) is None
    # scan referencing tables that were never defined: DQT+DHT stripped out
    # (valid marker walk, undefined table ids) must skip, not KeyError-abort
    import struct as _s

    pos, kept = 2, bytearray(good[:2])
    while good[pos + 1] != 0xDA:
        (ln,) = _s.unpack(">H", good[pos + 2 : pos + 4])
        if good[pos + 1] not in (0xDB, 0xC4):
            kept += good[pos : pos + 2 + ln]
        pos += 2 + ln
    kept += good[pos:]
    assert multimodal.resize_py(bytes(kept), 16, 16) is None


def test_mkv_codec_roundtrip_properties():
    """kgspark.mkvcodec: mux->demux round-trips dims and raw frame bytes
    exactly (lossless), multi-cluster files work, unknown elements are
    skipped by declared size, and truncation / foreign DocTypes raise."""
    from kgspark import mkvcodec

    w, h = 16, 12
    frames = [
        bytes((x + y + f) % 256 for y in range(h) for x in range(w))
        for f in range(37)  # > 8 => multiple Clusters
    ]
    payload = mkvcodec.make_mkv(w, h, frames)
    pw, ph, pf = mkvcodec.parse_mkv(payload)
    assert (pw, ph) == (w, h) and pf == frames
    assert mkvcodec.parse_meta(mkvcodec.make_mkv(8, 8, [])) == (8, 8, 0)

    # a foreign-muxer shape: Void element inside Segment, minimal track
    header = mkvcodec.element(
        mkvcodec.EBML_HEADER, mkvcodec.element(mkvcodec.DOCTYPE, b"matroska")
    )
    inner = mkvcodec.element(0xEC, b"\x00" * 9) + mkvcodec.element(
        mkvcodec.TRACKS,
        mkvcodec.element(
            mkvcodec.TRACK_ENTRY,
            mkvcodec._uint(mkvcodec.TRACK_TYPE, 1)
            + mkvcodec.element(
                mkvcodec.VIDEO,
                mkvcodec._uint(mkvcodec.PIXEL_WIDTH, 99)
                + mkvcodec._uint(mkvcodec.PIXEL_HEIGHT, 7),
            ),
        ),
    )
    foreign = header + mkvcodec.element(mkvcodec.SEGMENT, inner)
    assert mkvcodec.parse_meta(foreign) == (99, 7, 0)

    for bad in (payload[: len(payload) // 2],
                payload.replace(b"matroska", b"notmatro")):
        try:
            mkvcodec.parse_mkv(bad)
            assert False, "expected ValueError"
        except ValueError:
            pass

    # r4 review hardening: a SimpleBlock whose declared size truncates its
    # own header must raise ValueError (never IndexError / a bogus frame),
    # an unknown-size (all-ones) element is refused cleanly, and the
    # all-ones form as a block TRACK NUMBER (track 127) still parses.
    def _mkv_with_block(block: bytes) -> bytes:
        inner = mkvcodec.element(
            mkvcodec.TRACKS,
            mkvcodec.element(
                mkvcodec.TRACK_ENTRY,
                mkvcodec._uint(mkvcodec.TRACK_TYPE, 1)
                + mkvcodec.element(
                    mkvcodec.VIDEO,
                    mkvcodec._uint(mkvcodec.PIXEL_WIDTH, 4)
                    + mkvcodec._uint(mkvcodec.PIXEL_HEIGHT, 4),
                ),
            ),
        ) + mkvcodec.element(
            mkvcodec.CLUSTER, mkvcodec._uint(mkvcodec.TIMESTAMP, 0) + block
        )
        return header + mkvcodec.element(mkvcodec.SEGMENT, inner)

    short = _mkv_with_block(mkvcodec.element(mkvcodec.SIMPLE_BLOCK, b"\x81\x00"))
    for fn in (mkvcodec.parse_mkv, mkvcodec.parse_meta):
        try:
            fn(short)
            assert False, "expected ValueError on truncated SimpleBlock"
        except ValueError:
            pass
    unk = header + mkvcodec._id_bytes(mkvcodec.SEGMENT) + b"\xff" + bytes(10)
    try:
        mkvcodec.parse_mkv(unk)
        assert False, "expected ValueError on unknown-size element"
    except ValueError as e:
        assert "unknown-size" in str(e)
    t127 = _mkv_with_block(
        mkvcodec.element(mkvcodec.SIMPLE_BLOCK, b"\xff\x00\x00\x80" + bytes(16))
    )
    assert mkvcodec.parse_meta(t127) == (4, 4, 1)


def test_mkv_payloads_are_real_decodable_files():
    """Corpus Matroska files are valid EBML: true element tree, real video
    dims, and the demuxed raw frames reproduce the seeded pattern exactly
    (lossless, unlike JPEG)."""
    from kgspark import mkvcodec

    mkvs = [
        (j, mid, payload)
        for j, (mid, kind, payload) in enumerate(datagen_media.media_rows(N))
        if kind == "matroska"
    ]
    assert mkvs, "expected matroska payloads in the corpus"
    seen_lacing = set()
    for j, mid, payload in mkvs:
        assert payload[:4] == bytes.fromhex("1A45DFA3")
        w, h, frames = mkvcodec.parse_mkv(payload)
        assert frames and all(len(f) == w * h for f in frames)
        seed_hash = hashlib.sha256(f"42:media:{j}".encode()).digest()
        # the pattern check is ALSO the lace-split check: a wrong Xiph/
        # fixed/EBML size walk shifts every frame boundary
        for f in (0, len(frames) // 2, len(frames) - 1):
            for (x, y) in ((0, 0), (w - 1, h - 1), (w // 2, h // 3)):
                assert frames[f][y * w + x] == datagen_media.mkv_pixel(
                    f, x, y, seed_hash
                )
        d = multimodal.decode_header_py(payload)
        assert (d["width"], d["height"], d["n_frames"]) == (w, h, len(frames))
        # frame sampling indexes the genuinely demuxed block count
        assert multimodal.frame_sample_py(payload) == list(
            range(0, len(frames), 10)
        )
        for eid, bs, be in _simpleblocks(payload):
            _t, p = mkvcodec.vint_parse(
                payload, bs, keep_marker=False, allow_all_ones=True
            )
            seen_lacing.add(payload[p + 2] & 0x06)
    # the corpus must exercise ALL FOUR block storages: plain, Xiph,
    # fixed, and EBML lacing
    assert seen_lacing == {0x00, 0x02, 0x04, 0x06}


def _simpleblocks(payload):
    """Yield (id, body_start, body_end) of every SimpleBlock in the tree."""
    from kgspark import mkvcodec

    def rec(start, end):
        for eid, s, e in mkvcodec._walk(payload, start, end):
            if eid == mkvcodec.SIMPLE_BLOCK:
                yield eid, s, e
            elif eid in (
                mkvcodec.SEGMENT,
                mkvcodec.CLUSTER,
            ):
                yield from rec(s, e)

    yield from rec(0, len(payload))


def test_mkv_foreign_laced_blocks_variable_sizes():
    """Foreign-style laced SimpleBlocks with VARIABLE frame sizes (our
    muxer only emits equal-size video frames) split correctly: Xiph
    255-run sizes, EBML signed deltas spanning vint widths (+8192 needs a
    2-byte delta; review-caught: a fixed-width encode corrupted it), and
    the all-ones minimal lace vints (127 as 1-byte 0xFF) that are legal
    lace sizes despite being the reserved unknown-size SIZE form."""
    from kgspark import mkvcodec as mc

    hdr = mc.element(mc.EBML_HEADER, mc.element(mc.DOCTYPE, b"matroska"))
    info = mc.element(mc.INFO, mc._uint(mc.TIMESTAMP_SCALE, 1_000_000))
    tracks = mc.element(
        mc.TRACKS,
        mc.element(
            mc.TRACK_ENTRY,
            mc._uint(mc.TRACK_NUMBER, 1)
            + mc._uint(mc.TRACK_TYPE, 1)
            + mc.element(mc.CODEC_ID, b"V_UNCOMPRESSED")
            + mc.element(
                mc.VIDEO,
                mc._uint(mc.PIXEL_WIDTH, 3) + mc._uint(mc.PIXEL_HEIGHT, 2),
            ),
        ),
    )

    def wrap(block_body: bytes) -> bytes:
        clus = mc.element(
            mc.CLUSTER,
            mc._uint(mc.TIMESTAMP, 0)
            + mc.element(mc.SIMPLE_BLOCK, block_body),
        )
        return hdr + mc.element(mc.SEGMENT, info + tracks + clus)

    for frames in (
        [b"a" * 300, b"b" * 5, b"c" * 123, b"d"],  # multi-run Xiph sizes
        [b"a" * 127, b"b" * 5, b"c" * 3],  # all-ones 1-byte lace vint
        [b"x" * 10, b"y" * 8202, b"z" * 5, b"w" * 9000],  # wide deltas
        [b"only"],  # lone laced frame: no size data at all
    ):
        for lacing in ("xiph", "ebml"):
            payload = wrap(mc._lace_block(frames, lacing))
            assert mc.parse_mkv(payload)[2] == frames, (lacing, frames)
            assert mc.parse_meta(payload)[2] == len(frames)


def test_corrupt_mkv_rows_are_skipped_not_fatal():
    """A valid EBML magic with a malformed body must degrade to null dims
    in decode_header_py, never raise out of the kernel."""
    good = datagen_media.make_mkv_file(8, 6, 12, bytes(range(32)))
    for bad in (good[: len(good) // 3], good[:6]):
        d = multimodal.decode_header_py(bad)
        assert d["kind"] == "matroska"
        assert d["width"] is None and d["n_frames"] is None


def test_features_are_content_derived():
    """feature_py computes moments of the DECODED content: two different
    files with identical decoded pixels (a GIF with an extra comment
    extension) share every content dimension; only the log-size dimension
    moves.  Undecodable payloads fall back to sha floats without raising."""
    from kgspark import gifcodec

    gif = next(
        p for _m, k, p in datagen_media.media_rows(N) if k == "gif"
    )
    with_ext = gif[: 13 + 768] + b"\x21\xfe\x03abc\x00" + gif[13 + 768 :]
    assert gif != with_ext
    assert gifcodec.parse_gif(gif)[3] == gifcodec.parse_gif(with_ext)[3]
    a, b = multimodal.feature_py(gif), multimodal.feature_py(with_ext)
    assert a[:6] == b[:6]

    # every corpus kind decodes to content features (no fallback needed)
    for _mid, kind, payload in datagen_media.media_rows(10):
        kidx, vals = multimodal._decoded_samples(payload)
        assert vals is not None, kind
        assert len(vals) <= 4096 and all(0.0 <= v <= 1.0 for v in vals)

    # garbage and truncated files take the sha fallback, never raise
    for junk in (b"\x00\x01garbage", gif[:40], b""):
        f = multimodal.feature_py(junk)
        assert len(f) == 8 and all(-1.0 <= x < 1.0 for x in f)


def test_ahash_near_dup_vs_distinct_images():
    """The pHash contract on hand-built PNGs: a few edited pixels flip at
    most a few of the 64 bits, while a structurally different image is far
    away; the hash is integer-defined so re-hashing is bit-identical."""
    from kgspark import multimodal

    w, h = 32, 32
    base = bytes(
        c
        for y in range(h)
        for x in range(w)
        for c in ((x * 255) // (w - 1),) * 3  # horizontal gradient
    )
    edited = bytearray(base)
    for k in range(6):  # touch 2 pixels (6 bytes)
        edited[k] = 255 - edited[k]
    inverted = bytes(255 - b for b in base)

    ha = multimodal.ahash_py(multimodal.png_encode(w, h, base))
    hb = multimodal.ahash_py(multimodal.png_encode(w, h, bytes(edited)))
    hc = multimodal.ahash_py(multimodal.png_encode(w, h, inverted))
    assert ha is not None and hb is not None and hc is not None

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(ha, hb) <= 4, "near-dup edit moved too many bits"
    assert hamming(ha, hc) >= 32, "inverted image should be far away"
    # signed 64-bit range (fits a BIGINT column) and deterministic re-hash
    for v in (ha, hb, hc):
        assert -(1 << 63) <= v < (1 << 63)
    assert multimodal.ahash_py(multimodal.png_encode(w, h, base)) == ha
    # audio payloads are not images: no hash row
    rows = datagen_media.media_rows(8, 42)
    riff = next(p for _m, k, p in rows if k == "riff")
    assert multimodal.ahash_py(bytes(riff)) is None
