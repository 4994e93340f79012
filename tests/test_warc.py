"""WARC container codec + ingest operators (kgspark.warccodec / kgspark.warc).

Codec tests are pure Python (spec properties: round-trip, splittable
member access, determinism, marker-proof framing).  Operator tests drive
the Spark kernels: never-crash on garbage, non-response skipping, and the
north-rule byte-identity invariant THROUGH the container path.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from kgspark import datagen, warc, warccodec


def _random_pages(seed: int, n: int) -> list[tuple[str, str, bytes]]:
    r = random.Random(seed)
    pages = []
    for i in range(n):
        # adversarial bodies: WARC markers, CRLF runs, non-UTF8, empty
        body = random.Random(seed * 1000 + i).randbytes(r.randrange(0, 400))
        if i % 4 == 0:
            body = b"WARC/1.0\r\n\r\n" + body + b"\r\n\r\n"
        if i % 7 == 0:
            body = b""
        pages.append(
            (f"https://t{seed}.test/{i}", f"2026-02-0{1 + i % 9}T00:00:0{i % 10}Z", body)
        )
    return pages


def test_roundtrip_both_layouts_marker_proof_bodies():
    """Every record written is parsed back exactly — url, date, body,
    digest — in both the gzip member-per-record and plain layouts, with
    bodies that embed ``WARC/1.0`` and ``\\r\\n\\r\\n`` (framing must advance
    by Content-Length, never by marker scan)."""
    for seed in (1, 2):
        pages = _random_pages(seed, 23)
        for gz in (True, False):
            blob = warccodec.make_warc(pages, gzip_members=gz)
            recs = warccodec.parse_warc(blob)
            assert recs[0]["warc_type"] == "warcinfo"
            resp = [r for r in recs if r["warc_type"] == "response"]
            assert [(r["url"], r["warc_date"], r["body"]) for r in resp] == pages
            for r in resp:
                assert r["payload_digest"] == warccodec.payload_digest(r["body"])


def test_gzip_members_are_independently_addressable():
    """The splittable-access contract: for every record, inflating ONLY
    ``blob[offset : offset+length]`` yields that record — the property the
    CDX locator pair (and 100 TB range reads) depends on."""
    pages = _random_pages(3, 17)
    blob = warccodec.make_warc(pages, gzip_members=True)
    recs = warccodec.parse_warc(blob)
    assert sum(r["length"] for r in recs) == len(blob)
    for r in recs:
        solo = warccodec.parse_record_at(blob, r["offset"], r["length"])
        assert solo["record_id"] == r["record_id"]
        assert solo["body"] == r["body"]


def test_warc_bytes_deterministic():
    pages = _random_pages(4, 9)
    assert warccodec.make_warc(pages) == warccodec.make_warc(pages)
    assert warccodec.make_warc(pages, gzip_members=False) == warccodec.make_warc(
        pages, gzip_members=False
    )


def test_parse_rejects_corruption_with_clear_errors():
    import pytest

    pages = _random_pages(5, 3)
    blob = warccodec.make_warc(pages)
    with pytest.raises(ValueError):
        warccodec.parse_warc(blob[: len(blob) - 7])  # truncated member
    plain = warccodec.make_warc(pages, gzip_members=False)
    with pytest.raises(ValueError):
        warccodec.parse_warc(b"GARBAGE" + plain)
    import re

    rec = warccodec.make_response_record(
        "https://x.test/", "2026-01-01T00:00:00Z", b"hello"
    )
    bad = re.sub(
        rb"Content-Length: (\d+)\r\n\r\n",
        lambda m: b"Content-Length: %d\r\n\r\n" % (int(m.group(1)) + 1),
        rec,
        count=1,
    )
    assert bad != rec
    with pytest.raises(ValueError):
        # lying WARC Content-Length (+1 shifts the trailer check)
        warccodec.parse_warc(bad)


def test_records_kernel_never_crashes_emits_error_rows(spark):
    """Garbage, truncated, and empty blobs become error ROWS, never task
    failures — a bad crawl file cannot kill the ingest job."""
    good = datagen.warc_files_rows(20, 1)[0][1]
    rows = [
        ("good.warc.gz", bytearray(good)),
        ("trunc.warc.gz", bytearray(good[:-9])),
        ("garbage.bin", bytearray(random.Random(0).randbytes(300))),
        ("empty.bin", bytearray(b"")),
    ]
    df = spark.createDataFrame(rows, datagen.WARC_FILES_SCHEMA)
    out = warc.warc_records(df).select("file_name", "error").collect()
    by_file = {}
    for x in out:
        by_file.setdefault(x["file_name"], []).append(x["error"])
    assert all(e is None for e in by_file["good.warc.gz"])
    assert [e for e in by_file["trunc.warc.gz"] if e], "truncation not reported"
    assert [e for e in by_file["garbage.bin"] if e], "garbage not reported"
    assert "empty.bin" not in by_file  # zero records, zero errors


def test_ingest_skips_non_response_and_matches_fixture(spark):
    recs = warc.warc_records(datagen.warc_files(spark))
    counts = {x["warc_type"]: x["n"] for x in recs.groupBy("warc_type").agg(
        F.count("*").alias("n")).collect()}
    assert counts == {"warcinfo": 4, "request": 1, "response": 160}
    assert warc.warc_pages(datagen.warc_files(spark)).count() == 160


def test_byte_identity_through_the_container(spark):
    """North-rule invariant through the WARC path: extraction over
    warc-ingested pages is byte-identical (per url) to the golden text —
    digest_check applied to the container-roundtripped corpus is empty."""
    from kgspark import html_extract

    golden = spark.createDataFrame(
        [(u, t) for u, _ts, _h, t, _l in datagen.web_pages_rows(160, 42)],
        "url string, text string",
    )
    ex = html_extract.extract_stage(warc.warc_pages(datagen.warc_files(spark)))
    joined = ex.join(golden, "url")
    assert joined.count() == 160
    assert html_extract.digest_check(joined).limit(1).count() == 0


def test_surt_key_pins(spark):
    rows = [
        ("https://www.Sub.Example.test/a/b?z=1&a=2",),
        ("https://example.test",),
        ("http://h.test:8080/x",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = [x["k"] for x in df.select(warc.surt_key(F.col("url")).alias("k")).collect()]
    assert got == ["test,example,sub)/a/b?a=2&z=1", "test,example)/", "test,h)/x"]


def test_revisit_record_roundtrip():
    """A revisit record carries zero-length http payload + the
    identical-payload-digest profile headers, and parses back cleanly in a
    mixed file (the headers dict exposes the refers-to pointers)."""
    rev = warccodec.make_revisit_record(
        "https://a.test/x", "2026-03-01T00:00:00Z",
        "https://a.test/x", "2026-01-01T00:00:00Z", "sha1:ABC234",
    )
    pages = [("https://a.test/x", "2026-01-01T00:00:00Z", b"<p>v1</p>")]
    blob = warccodec.make_warc(pages, gzip_members=True, extra_records=[rev])
    recs = warccodec.parse_warc(blob)
    r = [x for x in recs if x["warc_type"] == "revisit"]
    assert len(r) == 1
    h = r[0]["headers"]
    assert h["warc-refers-to-target-uri"] == "https://a.test/x"
    assert h["warc-refers-to-date"] == "2026-01-01T00:00:00Z"
    assert h["warc-profile"].endswith("identical-payload-digest")
    assert r[0]["payload_digest"] == "sha1:ABC234"
    assert r[0]["http_status"] is None  # zero-length payload, nothing to parse


def test_plan_revisits_fixture_counts(spark):
    """The recrawl fixture's verdict census: 136 byte-identical refetches
    are revisits pointing at crawl 1 (152 surviving urls - 16 changed),
    16 changed + 12 new pages are full stores."""
    out = warc.plan_revisits(
        warc.warc_index(datagen.warc_files(spark)),
        warc.warc_records(datagen.warc_files_second(spark)),
    ).collect()
    assert len(out) == 164
    rev = [x for x in out if x["is_revisit"]]
    assert len(rev) == 136
    assert all(x["refers_to_url"] == x["url"] for x in rev)
    assert all(x["refers_to_date"] < x["warc_date"] for x in rev)
    non = [x for x in out if not x["is_revisit"]]
    assert sum(1 for x in non if "example-new.test" in x["url"]) == 12
    assert all(x["refers_to_url"] is None for x in non)


def test_full_kg_construction_from_container_bytes(spark, tmp_path):
    """Full circle: WARC bytes → record kernel → pages → run_pipeline
    warehouse batch → the SAME triples as the direct-table path.  The
    container carries no ``lang`` column (that is table metadata, not WARC
    data), so the ingest tags BCP-47 ``und`` — triples derive from
    extracted text only, so the two paths must agree row-for-row."""
    from kgspark import materialize, pipeline

    pages = warc.warc_pages(datagen.warc_files(spark)).withColumn(
        "lang", F.lit("und")
    )
    wh = materialize.Warehouse(spark, str(tmp_path / "wh"))
    materialize.run_pipeline(spark, pages, wh, run_id="warc-1")
    got = wh.read("triples").select("subj", "pred", "obj")
    want = pipeline.build(
        datagen.web_pages(spark, 160, 42), reuse=False
    )["triples"].select("subj", "pred", "obj")
    assert got.exceptAll(want).limit(1).count() == 0
    assert want.exceptAll(got).limit(1).count() == 0


def test_read_warc_dir_binaryfile_source(spark, tmp_path):
    """binaryFile deployment entry: real .warc.gz files on disk parse to
    the same records as the in-memory fixture frame."""
    import os

    for name, blob in datagen.warc_files_rows(40, 2):
        with open(os.path.join(tmp_path, name), "wb") as f:
            f.write(blob)
    open(os.path.join(tmp_path, "not-a-warc.txt"), "w").write("ignore me")
    files = warc.read_warc_dir(spark, str(tmp_path))
    assert files.count() == 2
    recs = warc.warc_records(files)
    assert recs.filter(F.col("error").isNotNull()).count() == 0
    assert recs.filter(F.col("warc_type") == "response").count() == 40


def test_charset_transcode_pure_catalyst_and_honest_failure(spark):
    """Charset normalization adds ZERO Python to the plan (the container
    kernel is the only MapInPandas; decode/encode are codegen), declared
    ISO-8859-1/UTF-16 pages extract their accented text exactly, and the
    windows-1252 page fails the UTF-8 gate per-doc instead of mojibake."""
    from kgspark import html_extract

    pages = warc.transcode_pages(
        warc.warc_records(datagen.warc_files_charset(spark))
    )
    plan = pages._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    out = {
        x["url"]: x
        for x in html_extract.extract_stage(pages).collect()
    }
    cafe = out["https://charset.test/latin1-cafe"]
    assert cafe["extracted_text"] == "Le café est ouvert à Paris."
    assert cafe["transcode_status"] == "transcoded"
    greek = out["https://charset.test/utf16le-greek"]
    assert greek["extracted_text"].startswith("αβγ")
    euro = out["https://charset.test/cp1252-euro"]
    assert euro["transcode_status"] == "unsupported_charset"
    assert euro["extract_error"] == "utf8_decode_error"
    assert euro["extracted_text"] == ""


def test_chunked_transfer_roundtrip_and_digest_invariance():
    """Chunked-framed responses parse to the LOGICAL body (boundaries
    anywhere, bodies containing CRLF runs and hex-like lines), and the
    payload digest is identical chunked vs content-length framed — the
    dedup key must not depend on wire framing."""
    bodies = [
        b"a" * 500,
        b"ff\r\n<p>looks like a chunk size</p>\r\n0\r\n\r\ntail",
        b"",
        bytes(range(256)) * 3,
    ]
    pages = [
        (f"https://c.test/{i}", "2026-01-01T00:00:00Z", b) for i, b in enumerate(bodies)
    ]
    plain = warccodec.make_warc(pages, gzip_members=True)
    chunked = warccodec.make_warc(
        pages, gzip_members=True, chunk_urls={u for u, _d, _b in pages}
    )
    rp = [r for r in warccodec.parse_warc(plain) if r["warc_type"] == "response"]
    rc = [r for r in warccodec.parse_warc(chunked) if r["warc_type"] == "response"]
    assert [r["body"] for r in rc] == bodies
    assert [r["payload_digest"] for r in rc] == [r["payload_digest"] for r in rp]


def test_dechunk_rejects_malformed():
    import pytest

    for bad in (
        b"zz\r\nhi\r\n0\r\n\r\n",          # bad hex
        b"5\r\nhi\r\n",                     # truncated chunk
        b"5\r\nhello",                      # missing chunk CRLF
        b"4\r\nhi\r\n0\r\n\r\n",            # declared size eats the CRLF
        b"",                                # no size line
    ):
        with pytest.raises(ValueError):
            warccodec.dechunk(bad)
    assert warccodec.dechunk(b"0\r\n\r\n") == b""
    assert warccodec.dechunk(b"3;ext=1\r\nabc\r\n0\r\n\r\n") == b"abc"


def test_meta_charset_tier_and_resolution_order(spark):
    """HTTP-silent pages resolve via <meta charset> / http-equiv sniffing;
    an HTTP token beats a lying meta tag (browser resolution order)."""
    out = {
        x["url"]: x
        for x in warc.transcode_pages(
            warc.warc_records(datagen.warc_files_charset(spark))
        ).collect()
    }
    m1 = out["https://charset.test/meta-latin1"]
    assert (m1["charset"], m1["charset_source"]) == ("iso-8859-1", "meta")
    m2 = out["https://charset.test/meta-httpequiv"]
    assert (m2["charset"], m2["charset_source"]) == ("iso-8859-1", "meta")
    hb = out["https://charset.test/http-beats-meta"]
    assert (hb["charset"], hb["charset_source"]) == ("iso-8859-1", "http")
    assert bytes(hb["html"]).decode("utf-8") .endswith("Über-häufig.</p></body></html>")
    none = out["https://charset.test/none-declared"]
    assert none["charset_source"] == "none"


def test_wet_sidecar_structure(spark):
    """WET blobs mirror CC's sidecars: per-file warcinfo head + one
    conversion record per SUCCESSFUL extraction in source record order,
    each linking its capture via WARC-Refers-To; rejected pages absent."""
    wet = {r["file_name"]: bytes(r["content"])
           for r in warc.build_wet(datagen.warc_files(spark)).collect()}
    assert sorted(wet) == [f"crawl-42-{k:05d}.warc.wet.gz" for k in range(4)]
    src = {r["file_name"]: bytes(r["content"])
           for r in datagen.warc_files(spark).collect()}
    total_conv = 0
    for name, blob in wet.items():
        recs = warccodec.parse_warc(blob)
        assert recs[0]["warc_type"] == "warcinfo"
        conv = [r for r in recs if r["warc_type"] == "conversion"]
        total_conv += len(conv)
        src_recs = warccodec.parse_warc(src[name.replace(".wet", "")])
        by_url = {r["url"]: r for r in src_recs if r["warc_type"] == "response"}
        src_order = [r["url"] for r in src_recs
                     if r["warc_type"] == "response" and r["url"] in
                     {c["url"] for c in conv}]
        assert [c["url"] for c in conv] == src_order  # source record order
        for c in conv:
            assert c["headers"]["warc-refers-to"] == by_url[c["url"]]["record_id"]
            assert c["content_type"] is None  # text/plain, not http
            assert c["payload_digest"] == warccodec.payload_digest(c["body"])
    assert total_conv == 144  # 160 minus the 16 empty/whitespace rejections


def test_wat_sidecar_envelope(spark):
    """WAT metadata records: valid JSON envelopes echoing the capture's
    WARC headers, linking via WARC-Refers-To, HTTP summary present."""
    import json

    wat = warc.build_wat(datagen.warc_files_links(spark)).collect()
    assert sorted(r["file_name"] for r in wat) == [
        "crawl-links-00000.warc.wat.gz", "crawl-links-00001.warc.wat.gz"
    ]
    recs = warccodec.parse_warc(bytes(wat[0]["content"]))
    metas = [r for r in recs if r["warc_type"] == "metadata"]
    assert metas
    for m in metas[:10]:
        env = json.loads(m["body"].decode("utf-8"))["Envelope"]
        hdr = env["WARC-Header-Metadata"]
        assert hdr["WARC-Target-URI"] == m["url"]
        http = env["Payload-Metadata"]["HTTP-Response-Metadata"]
        assert http["Response-Message-Code"] == 200
        assert http["Entity-Length"] > 0
        assert m["headers"]["warc-refers-to"] == hdr["WARC-Record-ID"]
        assert m["payload_digest"] == warccodec.payload_digest(m["body"])


def test_warc_pages_filters_status_and_mime(spark):
    """Mixed-capture crawl file: 404 error pages, a 301 redirect stub, and
    a PDF capture are indexed by the CDX (archives keep every capture) but
    excluded from the extraction entry; opting the filters off restores
    the raw response view."""
    pages = [
        ("https://m.test/ok", "2026-01-01T00:00:00Z", b"<p>fine.</p>"),
        ("https://m.test/gone", "2026-01-01T00:00:01Z",
         b"<p>not found</p>", "text/html; charset=utf-8", 404),
        ("https://m.test/moved", "2026-01-01T00:00:02Z",
         b"", "text/html", 301),
        ("https://m.test/doc.pdf", "2026-01-01T00:00:03Z",
         b"%PDF-1.4 fake", "application/pdf", 200),
    ]
    blob = warccodec.make_warc(pages, gzip_members=True)
    files = spark.createDataFrame([("mixed.warc.gz", blob)], datagen.WARC_FILES_SCHEMA)
    assert warc.warc_index(files).count() == 4  # CDX keeps every capture
    kept = [x["url"] for x in warc.warc_pages(files).collect()]
    assert kept == ["https://m.test/ok"]
    raw = warc.warc_pages(files, only_ok=False, html_only=False)
    assert raw.count() == 4
    st = {x["url"]: x["http_status"] for x in warc.warc_records(files)
          .filter(F.col("warc_type") == "response").collect()}
    assert st["https://m.test/gone"] == 404 and st["https://m.test/moved"] == 301
