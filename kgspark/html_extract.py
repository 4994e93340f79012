"""Deterministic HTML→text extraction as a vectorized pandas/Arrow UDF.

Replaces the reference's UTF-8 document extractor (the ``extract`` seam,
runtime/src/pipeline/extractor.rs:33-58) with the web analog: a pure-stdlib
(html.parser) boilerplate-stripping text extractor.  The contract is
BYTE-IDENTICAL output per url — the synthetic web_pages generator
(kgspark.datagen) renders html from the same contract, and the pipeline
enforces equality via a per-url sha256 digest check (the north rule's
invariant).

Extraction contract (EXTRACT_VERSION 1):
  * content elements: <title> <h1>..<h6> <p> <li> — their text is kept.
  * <script> <style> <nav> <footer> <header> <aside> subtrees are dropped.
  * character/entity references are unescaped (&amp; → &).
  * within one content element, whitespace runs collapse to single spaces and
    the result is stripped.
  * non-empty element texts are joined with a single '\n'.
  * malformed/unclosed tags follow html.parser's deterministic recovery.

Scale: runs as an Arrow-batched pandas UDF (mapInPandas-compatible); the only
Python in the hot loop is the parser itself, amortized per batch.  At 100 TB
this stage is embarrassingly parallel (per-row, no shuffle); partition count
follows the input splits, and we repartition *before* it only if the source
produced pathological partition sizes.
"""

from __future__ import annotations

import html
import re
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

EXTRACT_VERSION = 1

_SKIP_TAGS = {"script", "style", "nav", "footer", "header", "aside"}
_CONTENT_TAGS = {"title", "h1", "h2", "h3", "h4", "h5", "h6", "p", "li"}
_WS_RE = re.compile(r"\s+")


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._content_depth = 0
        self._buf: list[str] = []
        self.blocks: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _CONTENT_TAGS and self._skip_depth == 0:
            if self._content_depth == 0:
                self._buf = []
            self._content_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _CONTENT_TAGS and self._skip_depth == 0:
            self._content_depth = max(0, self._content_depth - 1)
            if self._content_depth == 0:
                text = _WS_RE.sub(" ", "".join(self._buf)).strip()
                if text:
                    self.blocks.append(text)
                self._buf = []

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and self._content_depth > 0:
            self._buf.append(data)


def extract_text_err_py(html_bytes: bytes | str | None) -> tuple[str, str | None]:
    """The UDF kernel: bytes/str html → (extracted text, error-or-None).

    Failure classes mirror the reference's extractor rejections
    (extractor.rs:33-58: empty, non-UTF-8, whitespace-only) plus parser
    faults; every class becomes a per-doc error RECORD downstream
    (error_reporter.rs:50 analog) instead of a silent empty extraction.
    """
    if html_bytes is None:
        return "", "empty_input"
    if isinstance(html_bytes, (bytes, bytearray)):
        try:
            raw = bytes(html_bytes).decode("utf-8")
        except UnicodeDecodeError:
            # Reference rejects non-UTF-8 documents (extractor.rs:44-50).
            return "", "utf8_decode_error"
    else:
        raw = html_bytes
    if not raw.strip():
        return "", "empty_input"
    parser = _TextExtractor()
    try:
        parser.feed(raw)
        parser.close()
    except Exception as e:  # html.parser rarely throws; record if it does
        return "", f"parse_error: {type(e).__name__}"
    text = "\n".join(parser.blocks)
    if not text.strip():
        # non-empty html yielding no content: the whitespace-only rejection
        return "", "empty_extraction"
    return text, None


def extract_text_py(html_bytes: bytes | str | None) -> str:
    """Text-only view of the kernel (back-compat; unit-test surface)."""
    return extract_text_err_py(html_bytes)[0]


_EXTRACT_STRUCT = StructType(
    [
        StructField("text", StringType()),
        StructField("error", StringType()),
    ]
)


@F.pandas_udf(_EXTRACT_STRUCT)
def _extract_text_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    for batch in batches:
        pairs = [extract_text_err_py(h) for h in batch]
        yield pd.DataFrame(
            {"text": [p[0] for p in pairs], "error": [p[1] for p in pairs]}
        )


# The kernel IS deterministic; the flag is an optimizer fence.  Without it
# Catalyst duplicates the UDF call into pushed-down filters and the plan
# parses every page TWICE (measured: two ArrowEvalPython nodes per stage).
extract_text_udf = _extract_text_udf.asNondeterministic()


def extract_stage(web_pages: DataFrame, html_col: str = "html") -> DataFrame:
    """web_pages → + extracted_text + extract_error + text_sha256 digest.

    The digest column is what the byte-identity gate compares against the
    table's golden ``text`` column (or the reference's digests);
    ``extract_error`` feeds the per-doc error-record table.
    """
    return (
        web_pages.withColumn("_ex", extract_text_udf(F.col(html_col)))
        .withColumn("extracted_text", F.col("_ex.text"))
        .withColumn("extract_error", F.col("_ex.error"))
        .drop("_ex")
        .withColumn("text_sha256", F.sha2(F.col("extracted_text"), 256))
    )


def digest_check(extracted: DataFrame) -> DataFrame:
    """Rows whose extracted text is NOT byte-identical to the golden text.

    Empty result == the north rule's per-url digest invariant holds.
    """
    return extracted.filter(
        F.sha2(F.col("extracted_text"), 256) != F.sha2(F.col("text"), 256)
    ).select("url", "text_sha256")
