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
            assert d["n_samples"] >= 8000
        else:  # matroska
            assert d["n_frames"] > 0 and d["width"] >= 640


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
