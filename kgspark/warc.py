"""WARC ingestion operators — Common-Crawl-style container → pages table.

The engine's authoritative input is the pages table
``(url, warc_ts, html, text, lang)`` (BASELINE input_hint); real crawl
corpora arrive as WARC files.  This module is the bridge: a mapInPandas
kernel over ``(file_name, content binary)`` rows splits the member-per-record
gzip stream (:mod:`kgspark.warccodec`), parses each record, and emits the
record table; projections derive the CDX-style index (the offset/length
locator pairs that make a 100 TB archive range-readable) and the
pages-shaped response view that feeds the existing extraction pipeline.

Scale shape: file-level parallelism — ``spark.read.format("binaryFile")``
(or a manifest of object-store paths) gives one row per WARC file; the
kernel is per-file, no shuffle, and emits only pruned columns, so the
stage is embarrassingly parallel and its partition count follows the file
listing.  Whole-file bytes bound executor memory at one file per task
(crawl WARCs are ~1 GiB by convention); finer grain comes from the CDX
index itself — once built, (offset, length) locators let any later stage
range-read single records instead of whole files
(:func:`kgspark.warccodec.parse_record_at`).

Reference seam: this replaces the reference's upload/filesystem document
source (runtime/src/routes/documents.rs upload + extract entry) for the
web analog — the reference reads loose files; a web-scale crawl reads WARC.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import warccodec

_RECORDS_SCHEMA = StructType(
    [
        StructField("file_name", StringType()),
        StructField("rec_offset", LongType()),
        StructField("rec_length", LongType()),
        StructField("warc_type", StringType()),
        StructField("record_id", StringType()),
        StructField("url", StringType()),
        StructField("warc_date", StringType()),
        StructField("http_status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("payload_digest", StringType()),
        StructField("html", BinaryType()),
        StructField("error", StringType()),
    ]
)


def warc_records(files: DataFrame) -> DataFrame:
    """(file_name, content) → one row per WARC record (+ per-file error rows).

    Structural corruption surfaces as a row with ``error`` set and the rest
    null (the html_extract error-record convention) — a bad file never
    kills the job, and the error rows are the crawl-health metric surface.
    """
    pruned = files.select("file_name", "content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in _RECORDS_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fname, blob in zip(pdf["file_name"], pdf["content"]):
                try:
                    recs = warccodec.parse_warc(bytes(blob))
                except Exception as e:
                    rows.append(
                        (fname, None, None, None, None, None, None, None,
                         None, None, None, f"{type(e).__name__}: {e}")
                    )
                    continue
                for r in recs:
                    rows.append(
                        (
                            fname,
                            r["offset"],
                            r["length"],
                            r["warc_type"],
                            r["record_id"],
                            r["url"],
                            r["warc_date"],
                            r["http_status"],
                            r["content_type"],
                            r["payload_digest"],
                            r["body"],
                            None,
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return pruned.mapInPandas(_parse, schema=_RECORDS_SCHEMA)


def surt_key(url: Column) -> Column:
    """SURT-style sort-friendly URL key, pure Catalyst (codegen, no Python).

    ``https://www.Sub.Example.test/a/b?z=1&a=2`` →
    ``test,example,sub)/a/b?a=2&z=1``: host lowercased, one leading
    ``www.`` dropped, labels reversed comma-joined, ``)`` + path (default
    ``/``), query params sorted.  Keys for the same logical resource
    cluster lexicographically — the web-archive index ordering that turns
    per-host scans into contiguous range reads.
    """
    host = F.regexp_replace(
        F.lower(F.parse_url(url, F.lit("HOST"))), r"^www\.", ""
    )
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.coalesce(F.nullif(F.parse_url(url, F.lit("PATH")), F.lit("")), F.lit("/"))
    q = F.parse_url(url, F.lit("QUERY"))
    sorted_q = F.array_join(F.array_sort(F.split(q, "&")), "&")
    return F.concat(
        rev,
        F.lit(")"),
        path,
        F.when(q.isNotNull() & (q != ""), F.concat(F.lit("?"), sorted_q)).otherwise(
            F.lit("")
        ),
    )


def warc_index(files: DataFrame) -> DataFrame:
    """CDX-style capture index: one row per response record.

    ``(urlkey, warc_date, url, file_name, rec_offset, rec_length,
    payload_digest, http_status)`` — urlkey is the SURT sort key, ``url``
    the original URI (CDX's ``original`` field), the locator pair the
    range-read handle.  At archive scale this table is written
    sorted/partitioned by urlkey so lookups and per-host scans prune
    partitions; the digest column is the cross-crawl dedup key.
    """
    return (
        warc_records(files)
        .filter((F.col("warc_type") == "response") & F.col("error").isNull())
        .select(
            surt_key(F.col("url")).alias("urlkey"),
            "warc_date",
            "url",
            "file_name",
            "rec_offset",
            "rec_length",
            "payload_digest",
            "http_status",
        )
    )


def plan_revisits(prior_index: DataFrame, new_records: DataFrame) -> DataFrame:
    """Identical-payload-digest revisit planning (WARC 1.0 revisit profile).

    A recrawl fetch whose payload digest equals a prior capture of the
    same resource need not be stored again — the archive writes a
    ``revisit`` record pointing at the prior capture
    (``WARC-Refers-To-Target-URI`` / ``WARC-Refers-To-Date``) instead of
    a second copy; that is how crawl archives stay sublinear in refetch
    volume.  This operator computes the verdict: for each response in the
    new crawl, ``is_revisit`` plus the latest prior capture it refers to.

    Scale shape: the prior side is the CDX index (urlkey-partitioned,
    digest column only — no bodies), pre-aggregated to one row per
    (urlkey, digest); one equi-join on (urlkey, payload_digest) against
    the new crawl's records.  Both sides shuffle on the same compound
    key; nothing carries page content.
    """
    prior = (
        prior_index.groupBy("urlkey", "payload_digest")
        .agg(
            F.max(
                F.struct(F.col("warc_date").alias("d"), F.col("url").alias("u"))
            ).alias("m")
        )
        .select(
            "urlkey",
            "payload_digest",
            F.col("m.d").alias("refers_to_date"),
            F.col("m.u").alias("refers_to_url"),
        )
    )
    new = (
        new_records.filter(
            (F.col("warc_type") == "response") & F.col("error").isNull()
        )
        .select(
            "url",
            "warc_date",
            "payload_digest",
            surt_key(F.col("url")).alias("urlkey"),
        )
    )
    return new.join(prior, ["urlkey", "payload_digest"], "left").select(
        "url",
        "warc_date",
        "payload_digest",
        F.col("refers_to_date").isNotNull().alias("is_revisit"),
        "refers_to_url",
        "refers_to_date",
    )


def warc_pages(
    files: DataFrame, only_ok: bool = True, html_only: bool = True
) -> DataFrame:
    """Response records → the engine's pages input shape
    ``(url, warc_ts timestamp, html binary)`` — the WARC-side entry to the
    extraction pipeline; downstream stages are unchanged.

    Real crawls capture EVERY fetch — 404 error pages, 301 redirect
    stubs, PDFs, images — but only successful HTML belongs in the HTML
    extractor: ``only_ok`` keeps status-200 responses, ``html_only``
    keeps declared ``text/html`` (or undeclared) content types.  The CDX
    index intentionally does NOT apply these filters — archives index
    every capture; it is the *extraction* entry that narrows.
    """
    recs = warc_records(files).filter(
        (F.col("warc_type") == "response") & F.col("error").isNull()
    )
    if only_ok:
        recs = recs.filter(F.col("http_status") == 200)
    if html_only:
        recs = recs.filter(
            F.col("content_type").isNull()
            | F.col("content_type").startswith("text/html")
        )
    return recs.select(
        "url",
        F.to_timestamp("warc_date", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_ts"),
        "html",
    )


def read_warc_dir(spark, path: str, glob: str = "*.warc.gz") -> DataFrame:
    """WARC files on disk/object store → the (file_name, content) frame the
    record kernel consumes, via Spark's ``binaryFile`` source.

    This is the deployment entry: a 100 TB archive is a listing of ~1 GiB
    objects; ``binaryFile`` gives one row per object with the bytes as a
    binary column, partition count follows the listing, and the kernel
    stays file-parallel.  (Whole-file rows bound executor memory at one
    file per task — finer grain comes from the CDX index the first parse
    emits, via :func:`kgspark.warccodec.parse_record_at` range reads.)
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
            F.col("content"),
        )
    )


# Charsets Catalyst's decode/encode supports (CharsetProvider); anything
# else (gbk, windows-1252, shift_jis, ...) passes through UNTOUCHED with
# status 'unsupported_charset' and dies honestly at the extractor's UTF-8
# gate as a per-doc error record — never a silent mojibake decode.
_TRANSCODE_CHARSETS = ("iso-8859-1", "utf-16", "utf-16be", "utf-16le", "utf-32")


def transcode_pages(records: DataFrame) -> DataFrame:
    """Response records → pages with html normalized to UTF-8 bytes.

    Real crawls declare charsets in the HTTP ``Content-Type``; the
    extraction contract is UTF-8.  This stage reads the declared charset
    and transcodes the supported set — PURE Catalyst (`decode`/`encode`
    per literal-charset branch, whole-stage codegen, no Python) — so the
    downstream byte-identity digest is defined on the normalized bytes.

    Charset resolution is two-tier, like browsers: the HTTP
    ``Content-Type`` token wins; when HTTP is silent, the first 1024
    bytes are sniffed (as ISO-8859-1, byte-lossless for ASCII attrs) for
    ``<meta charset=…>`` / ``<meta http-equiv … charset=…>``.
    ``charset_source`` records which tier decided (http/meta/none).

    ``transcode_status``: ``utf8`` (effective utf-8/us-ascii/absent —
    passthrough), ``transcoded`` (supported non-UTF-8 charset), or
    ``unsupported_charset`` (passthrough; the UTF-8 gate downstream
    reports it per doc).
    """
    http_cs = F.lower(
        F.regexp_extract(F.coalesce("content_type", F.lit("")), r"charset=([A-Za-z0-9_\-]+)", 1)
    )
    head = F.decode(F.substring(F.col("html"), 1, 1024), "ISO-8859-1")
    meta_cs = F.lower(
        F.regexp_extract(
            head, r"""(?i)<meta[^>]*charset\s*=\s*["']?([A-Za-z0-9_\-]+)""", 1
        )
    )
    cs = F.when(http_cs != "", http_cs).otherwise(meta_cs)
    transcoded = F.col("html")
    for c in _TRANSCODE_CHARSETS:
        transcoded = F.when(
            cs == c, F.encode(F.decode(F.col("html"), c.upper()), "UTF-8")
        ).otherwise(transcoded)
    passthrough = cs.isin("", "utf-8", "utf8", "us-ascii")
    return (
        records.filter((F.col("warc_type") == "response") & F.col("error").isNull())
        .select(
            "url",
            F.to_timestamp("warc_date", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_ts"),
            cs.alias("charset"),
            F.when(http_cs != "", F.lit("http"))
            .when(meta_cs != "", F.lit("meta"))
            .otherwise(F.lit("none"))
            .alias("charset_source"),
            F.when(passthrough, F.col("html")).otherwise(transcoded).alias("html"),
            F.when(passthrough, F.lit("utf8"))
            .when(cs.isin(*_TRANSCODE_CHARSETS), F.lit("transcoded"))
            .otherwise(F.lit("unsupported_charset"))
            .alias("transcode_status"),
        )
    )


_FILES_SCHEMA = StructType(
    [
        StructField("file_name", StringType(), False),
        StructField("content", BinaryType(), False),
    ]
)


def build_wet(files: DataFrame) -> DataFrame:
    """Derive the WET sidecar (extracted-text ``conversion`` records) from
    primary WARC files — the Common-Crawl ``.warc.wet.gz`` artifact.

    Response records run the standard extraction stage; per source file,
    the successful extractions are rendered (in source record order) into
    one member-per-record gzip WET blob whose conversion records link
    back to their captures via ``WARC-Refers-To``.  Pages the extractor
    rejects (empty, non-UTF-8) are absent from the WET, exactly like CC's
    sidecars.

    Scale shape: extraction is the usual narrow Arrow stage; the render
    is one ``applyInPandas`` grouped on file_name — state per task is one
    output file's text, the same granularity the primary archive already
    bounds.  Output rows are (file_name, content) — writable straight
    back to the object store next to the sources.
    """
    import pandas as pd

    from . import html_extract, warccodec as wc

    recs = warc_records(files).filter(
        (F.col("warc_type") == "response") & F.col("error").isNull()
    )
    ex = html_extract.extract_stage(
        recs.select("file_name", "rec_offset", "url", "warc_date", "record_id", "html")
    ).filter(F.col("extract_error").isNull())
    entries = ex.select(
        "file_name", "rec_offset", "url", "warc_date", "record_id", "extracted_text"
    )

    def _render(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rec_offset")
        ents = [
            (r.url, r.warc_date, r.extracted_text, r.record_id)
            for r in pdf.itertuples()
        ]
        name = str(pdf["file_name"].iloc[0]).replace(".warc.gz", ".warc.wet.gz")
        return pd.DataFrame([(name, wc.make_wet(ents))], columns=["file_name", "content"])

    return entries.groupBy("file_name").applyInPandas(_render, schema=_FILES_SCHEMA)


def build_wat(files: DataFrame) -> DataFrame:
    """Derive the WAT sidecar (capture-metadata ``metadata`` records) from
    primary WARC files — the Common-Crawl ``.warc.wat.gz`` artifact
    (documented subset of its envelope schema).

    Per response record the JSON payload carries the WARC header echo,
    the HTTP summary, and HTML link metadata (href + anchor text pairs,
    extracted in PURE Catalyst — regexp_extract_all + arrays_zip +
    to_json; no Python touches page bytes).  The only Python is the same
    per-file group render the WET path uses, which sees only the finished
    JSON strings.
    """
    import pandas as pd

    from . import warccodec as wc

    recs = warc_records(files).filter(
        (F.col("warc_type") == "response") & F.col("error").isNull()
    )
    html_s = F.decode(F.col("html"), "UTF-8")
    pat = r'<a\s[^>]*href="([^"]+)"[^>]*>([^<]*)</a>'
    links = F.arrays_zip(
        F.regexp_extract_all(html_s, F.lit(pat), 1).alias("url"),
        F.regexp_extract_all(html_s, F.lit(pat), 2).alias("text"),
    )
    meta = F.to_json(
        F.struct(
            F.struct(
                F.struct(
                    F.col("url").alias("WARC-Target-URI"),
                    F.col("warc_date").alias("WARC-Date"),
                    F.col("record_id").alias("WARC-Record-ID"),
                ).alias("WARC-Header-Metadata"),
                F.struct(
                    F.struct(
                        F.col("http_status").alias("Response-Message-Code"),
                        F.length("html").cast("long").alias("Entity-Length"),
                        F.struct(links.alias("Links")).alias("HTML-Metadata"),
                    ).alias("HTTP-Response-Metadata")
                ).alias("Payload-Metadata"),
            ).alias("Envelope")
        )
    )
    entries = recs.select(
        "file_name", "rec_offset", "url", "warc_date", "record_id",
        meta.alias("meta_json"),
    )

    def _render(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rec_offset")
        records = [wc.make_warcinfo_record(str(pdf["warc_date"].iloc[0]))]
        for r in pdf.itertuples():
            records.append(
                wc.make_metadata_record(
                    r.url, r.warc_date, r.meta_json.encode("utf-8"), r.record_id
                )
            )
        name = str(pdf["file_name"].iloc[0]).replace(".warc.gz", ".warc.wat.gz")
        blob = b"".join(wc.gzip_member(x) for x in records)
        return pd.DataFrame([(name, blob)], columns=["file_name", "content"])

    return entries.groupBy("file_name").applyInPandas(_render, schema=_FILES_SCHEMA)
