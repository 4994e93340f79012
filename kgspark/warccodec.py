"""WARC/1.0 (ISO 28500) container codec — pure stdlib, deterministic.

Common-Crawl-style web corpora ship as WARC files: a concatenation of
records, each ``WARC/1.0`` + named headers + blank line + ``Content-Length``
payload bytes + a ``\\r\\n\\r\\n`` trailer.  Crawl archives gzip EACH RECORD
as its own gzip member ("member-per-record"), so a reader holding a byte
offset can range-read and inflate one record without touching the rest of
the file — that offset/length pair is exactly what the CDX index stores,
and it is what makes a 100 TB WARC corpus randomly addressable from Spark
executors.  This module implements both layouts (plain concatenation and
member-per-record gzip) plus the HTTP response block that ``response``
records carry.

Everything here is defined for bit-exact independent re-implementation:
  * gzip members are written with a FIXED header (mtime=0, XFL=2, OS=255)
    over a level-9 raw-deflate stream, so the same record bytes always
    produce the same member bytes;
  * ``WARC-Record-ID`` is ``uuid5(NAMESPACE_URL, url + '\\n' + date)`` — a
    pure function of the record identity, never wall-clock or random;
  * ``WARC-Payload-Digest`` is ``sha1:<base32>`` of the HTTP body, the
    exact form Common Crawl publishes (and the cross-crawl dedup key);
  * header names are emitted in one fixed order (below) and parsed
    case-insensitively, as the spec requires.

Record grammar written (and expected) by this codec::

    WARC/1.0\\r\\n
    WARC-Type: response\\r\\n
    WARC-Record-ID: <urn:uuid:...>\\r\\n
    WARC-Date: 2026-01-01T00:00:00Z\\r\\n
    WARC-Target-URI: https://...\\r\\n
    WARC-Payload-Digest: sha1:BASE32\\r\\n
    Content-Type: application/http; msgtype=response\\r\\n
    Content-Length: <n>\\r\\n
    \\r\\n
    HTTP/1.1 200 OK\\r\\n            --+
    Content-Type: text/html\\r\\n      | n payload bytes
    Content-Length: <len(body)>\\r\\n  |
    \\r\\n                             |
    <body bytes>                    --+
    \\r\\n\\r\\n

Parsing advances by ``Content-Length`` only — bodies may legally contain
``WARC/1.0`` or ``\\r\\n\\r\\n``, so scanning for markers is wrong, and the
round-trip property test plants exactly those bodies.
"""

from __future__ import annotations

import base64
import hashlib
import struct
import uuid
import zlib

_CRLF = b"\r\n"
_TRAILER = b"\r\n\r\n"
_VERSION = b"WARC/1.0"

# Caps: a lying Content-Length (WARC or HTTP) must fail fast, never
# allocate unbounded memory in an executor kernel.
MAX_RECORD_BYTES = 1 << 26  # 64 MiB per record


def payload_digest(body: bytes) -> str:
    """``sha1:<base32>`` of the HTTP payload — the published CC digest form."""
    return "sha1:" + base64.b32encode(hashlib.sha1(body).digest()).decode("ascii")


def record_id(url: str, date: str) -> str:
    """Deterministic ``urn:uuid`` — a pure function of (target URI, date)."""
    return f"urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, url + chr(10) + date)}"


def gzip_member(data: bytes) -> bytes:
    """One deterministic gzip member: fixed header, raw deflate-9, CRC32+ISIZE."""
    co = zlib.compressobj(9, zlib.DEFLATED, -zlib.MAX_WBITS)
    deflated = co.compress(data) + co.flush()
    header = b"\x1f\x8b\x08\x00" + struct.pack("<I", 0) + b"\x02\xff"
    trailer = struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF, len(data) & 0xFFFFFFFF)
    return header + deflated + trailer


def http_response_block(
    body: bytes,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
    chunked: bool = False,
    chunk_size: int = 97,
) -> bytes:
    """HTTP/1.1 response bytes; ``chunked=True`` stores the body with
    Transfer-Encoding chunked framing (hex size CRLF data CRLF …
    terminated by a zero chunk) — the wire form crawlers capture verbatim
    into WARC.  An odd default chunk size so chunk boundaries land inside
    multi-byte sequences in tests."""
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(status, "OK")
    if chunked:
        head = (
            f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Transfer-Encoding: chunked\r\n\r\n"
        ).encode("ascii")
        chunks = []
        for i in range(0, len(body), chunk_size):
            piece = body[i : i + chunk_size]
            chunks.append(f"{len(piece):x}\r\n".encode("ascii") + piece + b"\r\n")
        chunks.append(b"0\r\n\r\n")
        return head + b"".join(chunks)
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii")
    return head + body


def dechunk(raw: bytes) -> bytes:
    """Decode Transfer-Encoding chunked framing → logical body.  Bounded
    (total ≤ MAX_RECORD_BYTES) and strict: bad hex sizes, missing chunk
    CRLFs, or a missing zero-terminator raise ValueError."""
    out: list[bytes] = []
    total = 0
    pos = 0
    while True:
        nl = raw.find(b"\r\n", pos)
        if nl < 0:
            raise ValueError("chunked body: missing size line terminator")
        size_tok = raw[pos:nl].split(b";", 1)[0].strip()  # ignore extensions
        try:
            n = int(size_tok, 16)
        except ValueError:
            raise ValueError(f"chunked body: bad chunk size {size_tok[:16]!r}")
        if n < 0 or total + n > MAX_RECORD_BYTES:
            raise ValueError("chunked body: size outside bounds")
        if n == 0:
            return b"".join(out)
        piece = raw[nl + 2 : nl + 2 + n]
        if len(piece) != n or raw[nl + 2 + n : nl + 4 + n] != _CRLF:
            raise ValueError("chunked body: truncated chunk or missing CRLF")
        out.append(piece)
        total += n
        pos = nl + 4 + n


def make_record(
    warc_type: str,
    payload: bytes,
    url: str | None = None,
    date: str = "2026-01-01T00:00:00Z",
    content_type: str = "application/http; msgtype=response",
    body_for_digest: bytes | None = None,
) -> bytes:
    """Render one uncompressed WARC record (headers in the fixed order)."""
    headers = [
        (b"WARC-Type", warc_type.encode("ascii")),
        (b"WARC-Record-ID", record_id(url or warc_type, date).encode("ascii")),
        (b"WARC-Date", date.encode("ascii")),
    ]
    if url is not None:
        headers.append((b"WARC-Target-URI", url.encode("ascii")))
    if body_for_digest is not None:
        headers.append(
            (b"WARC-Payload-Digest", payload_digest(body_for_digest).encode("ascii"))
        )
    headers += [
        (b"Content-Type", content_type.encode("ascii")),
        (b"Content-Length", str(len(payload)).encode("ascii")),
    ]
    head = _VERSION + _CRLF + b"".join(k + b": " + v + _CRLF for k, v in headers)
    return head + _CRLF + payload + _TRAILER


def make_response_record(
    url: str,
    date: str,
    html: bytes,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
    chunked: bool = False,
) -> bytes:
    # payload digest is of the LOGICAL body (after transfer decoding),
    # regardless of how the wire framed it — the cross-crawl dedup key
    # must not depend on chunk boundaries.
    return make_record(
        "response",
        http_response_block(
            html, status=status, content_type=content_type, chunked=chunked
        ),
        url=url,
        date=date,
        body_for_digest=html,
    )


def make_revisit_record(
    url: str, date: str, refers_to_url: str, refers_to_date: str, digest: str
) -> bytes:
    """A WARC ``revisit`` record (identical-payload-digest profile): the
    archive's dedup unit — carries the digest and a pointer to the prior
    capture instead of a second body copy."""
    extra = (
        f"WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest\r\n"
        f"WARC-Refers-To-Target-URI: {refers_to_url}\r\n"
        f"WARC-Refers-To-Date: {refers_to_date}\r\n"
        f"WARC-Payload-Digest: {digest}\r\n"
    )
    rec = make_record(
        "revisit",
        b"",
        url=url,
        date=date,
        content_type="application/http; msgtype=response",
    )
    # splice the profile headers just before the Content-Type header
    marker = b"Content-Type: "
    i = rec.find(marker)
    return rec[:i] + extra.encode("ascii") + rec[i:]


def make_warcinfo_record(date: str = "2026-01-01T00:00:00Z") -> bytes:
    fields = b"software: kgspark-warc/1.0\r\nformat: WARC File Format 1.0\r\n"
    return make_record(
        "warcinfo", fields, date=date, content_type="application/warc-fields"
    )


def make_warc(
    pages: list[tuple[str, str, bytes]],
    gzip_members: bool = True,
    warcinfo: bool = True,
    extra_records: list[bytes] | None = None,
    chunk_urls: set[str] | frozenset[str] = frozenset(),
) -> bytes:
    """Assemble a WARC file from (url, rfc3339-date, html) pages.

    ``gzip_members=True`` is the crawl-archive layout: every record its own
    gzip member, members concatenated — splittable at member boundaries.
    ``extra_records`` (already-rendered uncompressed records, e.g. a
    ``request`` record) are appended after the responses.  Pages are
    (url, date, html) or (url, date, html, http-content-type) tuples.
    """
    records: list[bytes] = []
    if warcinfo:
        records.append(make_warcinfo_record(pages[0][1] if pages else "2026-01-01T00:00:00Z"))
    for page in pages:
        url, date, html = page[0], page[1], page[2]
        ct = page[3] if len(page) > 3 else "text/html; charset=utf-8"
        status = page[4] if len(page) > 4 else 200
        records.append(
            make_response_record(
                url, date, html, status=status, content_type=ct,
                chunked=url in chunk_urls,
            )
        )
    records.extend(extra_records or [])
    if gzip_members:
        return b"".join(gzip_member(r) for r in records)
    return b"".join(records)


def _split_members(blob: bytes) -> list[tuple[int, int, bytes]]:
    """Split a multi-member gzip stream → [(offset, member_len, inflated)].

    Uses zlib's member framing (wbits=31) and ``unused_data`` to find each
    member boundary exactly — never scans for magic bytes, which can occur
    inside deflate data.  Feeds bounded chunks off a memoryview so a
    many-member file costs O(total), not O(members × file) copies — the
    kernel may see ~1 GiB crawl files with 10^4+ members.
    """
    out: list[tuple[int, int, bytes]] = []
    mv = memoryview(blob)
    pos = 0
    chunk = 1 << 20
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        parts: list[bytes] = []
        fed = 0
        while not d.eof:
            piece = mv[pos + fed : pos + fed + chunk]
            if len(piece) == 0:
                raise ValueError(f"truncated gzip member at offset {pos}")
            try:
                parts.append(d.decompress(piece, MAX_RECORD_BYTES))
            except zlib.error as e:
                # corrupt deflate/crc must surface as the codec's one
                # error type — kernels catch ValueError per file
                raise ValueError(f"bad gzip member at offset {pos}: {e}")
            if sum(map(len, parts)) > MAX_RECORD_BYTES:
                raise ValueError(f"oversized gzip member at offset {pos}")
            fed += len(piece)
        consumed = fed - len(d.unused_data)
        out.append((pos, consumed, b"".join(parts)))
        pos += consumed
    return out


def _parse_headers(head: bytes) -> dict[str, str]:
    """Case-insensitive WARC/HTTP named-field block → {lower-name: value}."""
    fields: dict[str, str] = {}
    for line in head.split(_CRLF):
        if not line:
            continue
        k, _, v = line.partition(b":")
        fields[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
    return fields


def _parse_one(rec: bytes, offset: int, length: int) -> dict:
    """Parse one uncompressed record's bytes → record dict."""
    if not rec.startswith(_VERSION + _CRLF):
        raise ValueError(f"bad WARC version line at offset {offset}")
    sep = rec.find(_TRAILER)  # first \r\n\r\n = end of WARC header block
    if sep < 0:
        raise ValueError(f"unterminated WARC header block at offset {offset}")
    fields = _parse_headers(rec[len(_VERSION) + 2 : sep])
    try:
        n = int(fields["content-length"])
    except (KeyError, ValueError):
        raise ValueError(f"missing/bad Content-Length at offset {offset}")
    if n < 0 or n > MAX_RECORD_BYTES:
        raise ValueError(f"Content-Length {n} outside bounds at offset {offset}")
    payload = rec[sep + 4 : sep + 4 + n]
    if len(payload) != n or rec[sep + 4 + n : sep + 4 + n + 4] != _TRAILER:
        raise ValueError(f"payload/trailer mismatch at offset {offset}")
    out = {
        "offset": offset,
        "length": length,
        "warc_type": fields.get("warc-type", ""),
        "record_id": fields.get("warc-record-id", ""),
        "url": fields.get("warc-target-uri"),
        "warc_date": fields.get("warc-date", ""),
        "payload_digest": fields.get("warc-payload-digest"),
        "headers": fields,
        "http_status": None,
        "content_type": None,
        "body": None,
        "end": sep + 4 + n + 4,
    }
    # non-http payloads (warcinfo fields, WET conversion text) are the
    # body as-is; http payloads get status/header/body parsing below
    if not fields.get("content-type", "").startswith("application/http"):
        out["body"] = payload
    if n and fields.get("content-type", "").startswith("application/http"):
        hsep = payload.find(_TRAILER)
        if hsep < 0:
            raise ValueError(f"unterminated HTTP head at offset {offset}")
        status_line, _, header_block = payload[:hsep].partition(_CRLF)
        parts = status_line.split(b" ", 2)
        if len(parts) < 2 or not parts[1].isdigit():
            raise ValueError(f"bad HTTP status line at offset {offset}")
        http = _parse_headers(header_block)
        body = payload[hsep + 4 :]
        if http.get("transfer-encoding", "").lower() == "chunked":
            body = dechunk(body)
        else:
            want = http.get("content-length")
            if want is not None and int(want) != len(body):
                raise ValueError(f"HTTP Content-Length mismatch at offset {offset}")
        out["http_status"] = int(parts[1])
        out["content_type"] = http.get("content-type")
        out["body"] = body
    return out


def parse_warc(blob: bytes) -> list[dict]:
    """Parse a WARC file (gzip member-per-record OR plain concatenation).

    Returns one dict per record: offset/length (in the FILE's byte space —
    the CDX locator pair), warc_type, record_id, url, warc_date,
    payload_digest, and for ``application/http`` payloads the parsed
    http_status / content_type / body.  Raises ValueError on structural
    corruption; callers running as Spark kernels catch per record and emit
    error rows (the html_extract error-record convention).
    """
    records: list[dict] = []
    if blob[:2] == b"\x1f\x8b":
        for offset, length, data in _split_members(blob):
            rec = _parse_one(data, offset, length)
            if rec["end"] != len(data):
                raise ValueError(f"trailing bytes inside member at offset {offset}")
            del rec["end"]
            records.append(rec)
        return records
    pos = 0
    while pos < len(blob):
        # Frame the record first (version line + header block + declared
        # Content-Length) so each record is sliced exactly once — O(total)
        # over the file, not O(records × file).
        if not blob.startswith(_VERSION + _CRLF, pos):
            raise ValueError(f"bad WARC version line at offset {pos}")
        sep = blob.find(_TRAILER, pos)
        if sep < 0:
            raise ValueError(f"unterminated WARC header block at offset {pos}")
        fields = _parse_headers(blob[pos + len(_VERSION) + 2 : sep])
        try:
            n = int(fields["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"missing/bad Content-Length at offset {pos}")
        if n < 0 or n > MAX_RECORD_BYTES:
            raise ValueError(f"Content-Length {n} outside bounds at offset {pos}")
        end = sep + 4 + n + 4
        rec = _parse_one(blob[pos:end], pos, end - pos)
        del rec["end"]
        records.append(rec)
        pos = end
    return records


def parse_record_at(blob: bytes, offset: int, length: int) -> dict:
    """Range-read one record by its CDX (offset, length) locator — the
    splittable-access contract: inflating ``blob[offset:offset+length]``
    alone must yield exactly that record."""
    recs = parse_warc(bytes(blob[offset : offset + length]))
    if len(recs) != 1:
        raise ValueError("locator does not frame exactly one record")
    rec = recs[0]
    rec["offset"], rec["length"] = offset, length
    return rec


def make_conversion_record(
    url: str, date: str, text: bytes, refers_to: str | None = None
) -> bytes:
    """A WET-style ``conversion`` record: the extracted plain text of a
    response, linked to the capture it was derived from (WARC-Refers-To).
    Common Crawl ships exactly this as its ``.warc.wet.gz`` sidecar."""
    rec = make_record(
        "conversion",
        text,
        url=url,
        date=date,
        content_type="text/plain",
        body_for_digest=text,
    )
    if refers_to:
        marker = b"Content-Type: "
        i = rec.find(marker)
        extra = f"WARC-Refers-To: {refers_to}\r\n".encode("ascii")
        rec = rec[:i] + extra + rec[i:]
    return rec


def make_wet(
    entries: list[tuple[str, str, str, str | None]], gzip_members: bool = True
) -> bytes:
    """Assemble a WET file from (url, date, extracted-text, refers-to-id)
    entries: warcinfo head + one conversion record per page, member-per-
    record gzip like the primary archive."""
    records = [make_warcinfo_record(entries[0][1] if entries else "2026-01-01T00:00:00Z")]
    for url, date, text, refers in entries:
        records.append(
            make_conversion_record(url, date, text.encode("utf-8"), refers)
        )
    if gzip_members:
        return b"".join(gzip_member(r) for r in records)
    return b"".join(records)


def make_metadata_record(
    url: str, date: str, meta_json: bytes, refers_to: str | None = None
) -> bytes:
    """A WAT-style ``metadata`` record: the JSON envelope describing a
    capture (headers, HTTP summary, extracted link metadata) — Common
    Crawl's ``.warc.wat.gz`` sidecar unit."""
    rec = make_record(
        "metadata",
        meta_json,
        url=url,
        date=date,
        content_type="application/json",
        body_for_digest=meta_json,
    )
    if refers_to:
        marker = b"Content-Type: "
        i = rec.find(marker)
        rec = rec[:i] + f"WARC-Refers-To: {refers_to}\r\n".encode("ascii") + rec[i:]
    return rec
