"""Chunking: token-window (Catalyst) and sentence-segmented (pandas UDF) paths.

The reference chunks by sliding tiktoken windows, size 500 / overlap 50
(runtime/src/pipeline/utils.rs:49-128, defaults pipeline/pipeline.rs:55-64),
with ``chunk_order_index`` = emission order and ``chunk-<sha256(text)>`` ids
(pipeline/chunker.rs:72).  The chunk window is *within one row's text*, so a
Spark ``Window`` does not apply; instead:

  * :func:`token_window_chunks` — sliding whitespace-token windows (size /
    overlap, the reference's default 500/50 shape) as a pure narrow array
    projection (``transform``+``slice``+``posexplode``).  Zero shuffles,
    zero Python; this is the oracle-checkable path.
  * :func:`sentence_chunks` — the north-star sentence-segmented chunker as a
    vectorized pandas UDF (sentences grouped N-at-a-time, optional sentence
    overlap), used on the web_pages pipeline.

Both emit the same shape: (chunk_id, doc_id, chunk_order_index, content,
n_tokens) — mirroring text_chunks (SURVEY.md §1).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from . import ids, spec

_CHUNK_STRUCT = ArrayType(
    StructType(
        [
            StructField("chunk_order_index", IntegerType()),
            StructField("content", StringType()),
            StructField("n_tokens", IntegerType()),
        ]
    )
)


def token_window_chunks(
    docs: DataFrame,
    text_col: str = "text",
    size: int = spec.CHUNK_TOKENS,
    overlap: int = 0,
) -> DataFrame:
    """Sliding token windows of ``size`` tokens stepping ``size - overlap`` —
    Catalyst-only (W1, the reference's DEFAULT chunking: 500-token windows
    stepping 450, utils.rs:102-125, defaults pipeline/pipeline.rs:55-64).

    Exact reference emission semantics: window c starts at ``c*step`` and
    covers ``[start, min(start+size, n))``; the loop breaks after the window
    that reaches the end, so the window count is
    ``1 + ceil(max(0, n - size) / step)`` (which reduces to ``ceil(n/size)``
    at overlap=0).  ``chunk_order_index`` = emission order; content is the
    tokens re-joined with single spaces (the whitespace-normalized
    contract).  Raises when overlap >= size (utils.rs:57-61 parity).
    """
    if overlap >= size:
        raise ValueError("overlap must be smaller than chunk size")
    step = size - overlap
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = (
        F.lit(1) + F.ceil(F.greatest(F.size(t) - size, F.lit(0)) / F.lit(step))
    ).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda c: F.array_join(F.slice(t, c * step + 1, size), " "),
    )
    base = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            ids.doc_id(F.trim(F.col(text_col))).alias("doc_id"),
            F.posexplode(chunk_arr).alias("chunk_order_index", "content"),
        )
    )
    return base.select(
        ids.chunk_id(F.col("content")).alias("chunk_id"),
        "doc_id",
        F.col("chunk_order_index").cast("long").alias("chunk_order_index"),
        "content",
        F.size(F.split(F.col("content"), " ")).cast("long").alias("n_tokens"),
    )


_ASCII_WS = " \t\n\r\f\v"

_SENT_RE = re.compile(r"(?<=[.!?])\s+")


def split_sentences(text: str) -> list[str]:
    """Deterministic sentence segmentation (shared with tests/datagen)."""
    text = text.strip()
    if not text:
        return []
    return [s for s in _SENT_RE.split(text) if s.strip()]


def chunk_sentences_py(
    text: str,
    group: int = spec.CHUNK_SENTENCES,
    overlap: int = spec.CHUNK_OVERLAP,
) -> list[tuple[int, str, int]]:
    """Pure-Python sentence chunker (the UDF kernel; unit-testable directly).

    Groups ``group`` consecutive sentences per chunk, stepping
    ``group - overlap`` sentences (mirrors the reference's window/step
    arithmetic at utils.rs:102-125, with sentences instead of tokens).
    Raises ValueError when overlap >= group (utils.rs:57-61 parity).
    """
    if overlap >= group:
        raise ValueError("overlap must be smaller than chunk size")
    sents = split_sentences(text)
    step = group - overlap
    out: list[tuple[int, str, int]] = []
    idx = 0
    for start in range(0, max(len(sents), 0), step):
        piece = " ".join(sents[start : start + group]).strip()
        if not piece:
            continue
        out.append((idx, piece, len(piece.split())))
        idx += 1
        if start + group >= len(sents):
            break
    return out


def chunk_by_delimiter_py(
    text: str,
    delimiter: str = "\n\n",
    max_tokens: int = spec.CHUNK_TOKENS,
    overlap: int = 0,
    split_by_delimiter_only: bool = False,
) -> list[tuple[int, str, int]]:
    """W2 (reference utils.rs:65-101): delimiter pre-split chunking.

    Split on ``delimiter``; pieces within ``max_tokens`` whitespace tokens
    emit as-is, oversized pieces are re-windowed with token windows of size
    ``max_tokens`` stepping ``max_tokens - overlap`` — unless
    ``split_by_delimiter_only`` (the reference's ``split_by_character_only``),
    which keeps oversized pieces whole.  ``chunk_order_index`` = emission
    order; raises when overlap >= max_tokens (utils.rs:57-61 parity).

    Whitespace discipline: pieces are trimmed/tokenized by ASCII whitespace
    only — the engine-portable convention every operator in this repo uses
    (Spark ``F.trim``/ASCII ``\\s``, DuckDB ``trim``/RE2 ``\\s``).  The
    reference's Rust ``str::trim`` strips unicode whitespace (documented
    deviation; unicode-only-whitespace pieces survive here on all engines
    identically instead of diverging between Python and SQL).
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than chunk size")
    out: list[tuple[int, str, int]] = []
    idx = 0
    for piece in (text or "").split(delimiter):
        piece = piece.strip(_ASCII_WS)
        if not piece:
            continue
        toks = [t for t in re.split(r"\s+", piece, flags=re.ASCII) if t]
        if split_by_delimiter_only or len(toks) <= max_tokens:
            out.append((idx, piece, len(toks)))
            idx += 1
            continue
        step = max_tokens - overlap
        for start in range(0, len(toks), step):
            window = toks[start : start + max_tokens]
            out.append((idx, " ".join(window), len(window)))
            idx += 1
            if start + max_tokens >= len(toks):
                break
    return out


def delimiter_chunks(
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    delimiter: str = "\n\n",
    max_tokens: int = spec.CHUNK_TOKENS,
    overlap: int = 0,
    split_by_delimiter_only: bool = False,
) -> DataFrame:
    """W2 as a vectorized pandas UDF + posexplode (same shape as W1)."""

    @F.pandas_udf(_CHUNK_STRUCT)
    def _chunk(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in texts:
            yield batch.map(
                lambda t: [
                    {"chunk_order_index": i, "content": c, "n_tokens": n}
                    for i, c, n in chunk_by_delimiter_py(
                        t or "", delimiter, max_tokens, overlap,
                        split_by_delimiter_only,
                    )
                ]
            )

    exploded = (
        docs.withColumn("_chunks", _chunk.asNondeterministic()(F.col(text_col)))
        .select(doc_id_col, F.explode("_chunks").alias("ch"))
    )
    return exploded.select(
        ids.chunk_id(F.col("ch.content")).alias("chunk_id"),
        F.col(doc_id_col).alias("doc_id"),
        F.col("ch.chunk_order_index").cast("long").alias("chunk_order_index"),
        F.col("ch.content").alias("content"),
        F.col("ch.n_tokens").cast("long").alias("n_tokens"),
    )


def sentence_chunks(
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    group: int = spec.CHUNK_SENTENCES,
    overlap: int = spec.CHUNK_OVERLAP,
) -> DataFrame:
    """Sentence-segmented chunking via a vectorized pandas UDF + posexplode."""

    @F.pandas_udf(_CHUNK_STRUCT)
    def _chunk(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in texts:
            yield batch.map(
                lambda t: [
                    {"chunk_order_index": i, "content": c, "n_tokens": n}
                    for i, c, n in chunk_sentences_py(t or "", group, overlap)
                ]
            )

    # deterministic kernel; the flag stops Catalyst duplicating the UDF into
    # the explode's pushed-down size()>0 filter (double evaluation).
    _chunk_nd = _chunk.asNondeterministic()

    exploded = (
        docs.withColumn("_chunks", _chunk_nd(F.col(text_col)))
        .select(doc_id_col, F.explode("_chunks").alias("ch"))
    )
    return exploded.select(
        ids.chunk_id(F.col("ch.content")).alias("chunk_id"),
        F.col(doc_id_col).alias("doc_id"),
        F.col("ch.chunk_order_index").cast("long").alias("chunk_order_index"),
        F.col("ch.content").alias("content"),
        F.col("ch.n_tokens").cast("long").alias("n_tokens"),
    )
