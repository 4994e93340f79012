"""Multimodal columns: opaque ``binary`` payloads with typed metadata.

A 100 TB training-data pipeline carries images/audio/video next to text.  The
pattern here: media is an opaque ``binary`` column; metadata extraction is a
pure-Catalyst projection (magic-byte sniffing — stays in whole-stage codegen);
decode / feature-extract runs through ``mapInPandas`` so each Arrow batch is
processed vectorized with bounded memory (never a per-row Python UDF).

The sandbox ships no image/audio libraries, so the *decode* step is a
clearly-marked deterministic stand-in: headers of the synthetic payloads are
parsed directly (width/height/sample counts), and "features" are sha-derived
floats.  Swapping in Pillow/ffmpeg changes only the kernel body — the Spark
plumbing (schema, batch shape, partitioning) is the real, tested part.

The reference has no media path at all; this module is part of the
beyond-reference training-pipeline surface the build calls for.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Magic-byte prefixes (hex) → container kind.  Real formats, real magics.
MAGIC_KINDS: list[tuple[str, str]] = [
    ("FFD8FF", "jpeg"),
    ("89504E47", "png"),
    ("47494638", "gif"),
    ("52494646", "riff"),   # WAV/AVI container
    ("1A45DFA3", "matroska"),
]


def sniff_kind(binary_col: Column) -> Column:
    """Container kind from magic bytes — pure Catalyst (hex prefix match)."""
    prefix = F.hex(F.substring(binary_col, 1, 8))
    expr = F.lit("unknown")
    for magic, kind in reversed(MAGIC_KINDS):
        expr = F.when(prefix.startswith(magic), F.lit(kind)).otherwise(expr)
    return expr


def media_metadata(df: DataFrame, id_col: str = "media_id", binary_col: str = "payload") -> DataFrame:
    """Typed metadata for an opaque binary column: kind, size, digest.

    Narrow projection — no shuffle, no Python; the digest doubles as the
    content-addressed identity for media dedup (same invariant system as
    doc ids, reference pipeline/utils.rs:130-136).
    """
    b = F.col(binary_col)
    return df.select(
        F.col(id_col),
        sniff_kind(b).alias("kind"),
        F.length(b).cast("long").alias("n_bytes"),
        F.sha2(b, 256).alias("payload_sha256"),
    )


# ------------------------------------------------------------- decode stubs

_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

_FEATURE_DIM = 8

_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def decode_header_py(payload: bytes) -> dict:
    """DETERMINISTIC DECODE STAND-IN — not a real media decoder.

    Parses only the fixed header layout of the synthetic corpus
    (:func:`kgspark.datagen_media.media_rows`): bytes [8:16] hold two
    big-endian u32 dims.  A production build replaces this body with
    Pillow / soundfile / pyav; everything around it stays unchanged.
    """
    magic = payload[:8].hex().upper()
    kind = "unknown"
    for m, k in MAGIC_KINDS:
        if magic.startswith(m):
            kind = k
            break
    w = h = samples = frames = None
    if len(payload) >= 16:
        a, b = struct.unpack(">II", payload[8:16])
        if kind in ("jpeg", "png", "gif"):
            w, h = a, b
        elif kind == "riff":
            samples = a
        elif kind == "matroska":
            frames = a
            w, h = b >> 16, b & 0xFFFF
    return {
        "kind": kind,
        "width": w,
        "height": h,
        "n_samples": samples,
        "n_frames": frames,
    }


def feature_py(payload: bytes, dim: int = _FEATURE_DIM) -> list[float]:
    """Deterministic fake embedding: sha256-derived floats in [-1, 1).

    Stand-in for a real vision/audio encoder; keeps the downstream ANN /
    near-dup operators (kgspark.vecops) exercisable on media columns.
    """
    out = []
    for i in range(dim):
        h = hashlib.sha256(payload + i.to_bytes(4, "big")).digest()
        u = struct.unpack(">Q", h[:8])[0] / 2**64
        out.append(round(2.0 * u - 1.0, 6))
    return out


def decode_media(df: DataFrame, id_col: str = "media_id", binary_col: str = "payload") -> DataFrame:
    """mapInPandas decode: (media_id, kind, width, height, n_samples, n_frames).

    Arrow-batched; each batch decodes vectorized driver-free.  Input column
    pruning matters at scale: only (id, payload) cross into Python.
    """
    pruned = df.select(F.col(id_col).alias("media_id"), F.col(binary_col).alias("payload"))

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {"media_id": mid, **decode_header_py(bytes(p))}
                for mid, p in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in _DECODE_SCHEMA.fields])

    return pruned.mapInPandas(_decode, schema=_DECODE_SCHEMA)


def media_features(df: DataFrame, id_col: str = "media_id", binary_col: str = "payload") -> DataFrame:
    """mapInPandas feature extraction → (media_id, feature array<float>)."""
    pruned = df.select(F.col(id_col).alias("media_id"), F.col(binary_col).alias("payload"))

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [feature_py(bytes(p)) for p in pdf["payload"]],
                }
            )

    return pruned.mapInPandas(_feat, schema=_FEATURE_SCHEMA)


def frame_sample_py(payload: bytes, every: int = 10) -> list[int]:
    """Frame-sampling stand-in: indices of sampled frames for video payloads."""
    meta = decode_header_py(payload)
    n = meta["n_frames"] or 0
    return list(range(0, n, every))


def sample_frames(df: DataFrame, id_col: str = "media_id", binary_col: str = "payload", every: int = 10) -> DataFrame:
    """Video frame sampling via mapInPandas → one row per sampled frame index."""
    pruned = df.select(F.col(id_col).alias("media_id"), F.col(binary_col).alias("payload"))
    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("frame_index", IntegerType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx = [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for fi in frame_sample_py(bytes(p), every):
                    out_ids.append(mid)
                    out_idx.append(fi)
            yield pd.DataFrame({"media_id": out_ids, "frame_index": out_idx})

    return pruned.mapInPandas(_sample, schema=schema)


def fit_within(src_w: int, src_h: int, tw: int, th: int) -> tuple[int, int]:
    """Aspect-preserving thumbnail fit (no upscale), integer-exact."""
    if src_w <= tw and src_h <= th:
        return src_w, src_h
    if src_w * th >= src_h * tw:  # width is the binding constraint
        return tw, max(1, (src_h * tw) // src_w)
    return max(1, (src_w * th) // src_h), th


def resize_py(payload: bytes, tw: int, th: int) -> dict | None:
    """DETERMINISTIC RESIZE STAND-IN — real geometry, fake pixels.

    The output DIMENSIONS are the real aspect-preserving fit-within
    arithmetic any thumbnailer computes; the resized BYTES are a
    deterministic digest stand-in (sha256 of payload + target box) because
    the sandbox ships no Pillow — a production build swaps only the digest
    line for the actual encoder.  Non-image payloads return None.
    """
    d = decode_header_py(payload)
    if d["kind"] not in ("jpeg", "png", "gif") or d["width"] is None:
        return None
    out_w, out_h = fit_within(d["width"], d["height"], tw, th)
    digest = hashlib.sha256(
        payload + f":resize:{out_w}x{out_h}".encode()
    ).hexdigest()
    return {
        "kind": d["kind"],
        "src_width": d["width"],
        "src_height": d["height"],
        "out_width": out_w,
        "out_height": out_h,
        "resized_sha256": digest,
    }


_RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("src_width", IntegerType()),
        StructField("src_height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("resized_sha256", StringType()),
    ]
)


def resize_media(
    df: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    id_col: str = "media_id",
    binary_col: str = "payload",
) -> DataFrame:
    """mapInPandas resize: one row per IMAGE payload with source/output dims
    and the resized-bytes digest.  Column pruning: only (id, payload) cross
    into Python; non-image rows drop out inside the kernel."""
    pruned = df.select(
        F.col(id_col).alias("media_id"), F.col(binary_col).alias("payload")
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                r = resize_py(bytes(p), target_w, target_h)
                if r is not None:
                    rows.append({"media_id": mid, **r})
            yield pd.DataFrame(
                rows, columns=[f.name for f in _RESIZE_SCHEMA.fields]
            )

    return pruned.mapInPandas(_resize, schema=_RESIZE_SCHEMA)
