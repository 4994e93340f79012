"""Warehouse materialization, lineage metrics, and checkpoint-resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgspark import datagen, materialize, pipeline
from kgspark.materialize import Warehouse


@pytest.fixture()
def web120(spark):
    return datagen.web_pages(spark, 120, 42)


def test_full_run_commits_all_stages(spark, web120, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    entry = materialize.run_pipeline(spark, web120, wh, run_id="run-1")
    for name in (
        "docs", "chunks", "entities", "relations", "triples",
        "doc_status", "canonical_map", "canonical_triples",
    ):
        assert wh.exists(name), name
        m = entry["stages"][name]
        assert m["n_rows"] == wh.read(name).count()
        assert sum(m["partitions"].values()) == m["n_rows"]  # lineage adds up
    assert entry["skipped_docs"] == 0
    assert wh.manifest()["runs"][0]["run_id"] == "run-1"


def test_resume_skips_processed_and_converges(spark, tmp_path):
    full = datagen.web_pages(spark, 120, 42)
    half = datagen.web_pages(spark, 60, 42)  # prefix: same seed ⇒ same rows

    wh_inc = Warehouse(spark, str(tmp_path / "inc"))
    e1 = materialize.run_pipeline(spark, half, wh_inc, run_id="r1")
    e2 = materialize.run_pipeline(spark, full, wh_inc, run_id="r2")
    assert e1["processed_docs"] > 0
    assert e2["skipped_docs"] == e1["processed_docs"]  # J1 anti-join resume
    assert e2["processed_docs"] == e2["input_docs"] - e2["skipped_docs"]

    wh_full = Warehouse(spark, str(tmp_path / "full"))
    materialize.run_pipeline(spark, full, wh_full, run_id="r0")

    for name in ("triples", "entities", "relations", "canonical_triples"):
        inc = sorted(map(tuple, wh_inc.read(name).drop("track_id").collect()))
        ful = sorted(map(tuple, wh_full.read(name).drop("track_id").collect()))
        assert inc == ful, f"resume divergence in {name}"


def test_rerun_is_noop(spark, web120, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    materialize.run_pipeline(spark, web120, wh, run_id="a")
    before = wh.read("triples").count()
    entry = materialize.run_pipeline(spark, web120, wh, run_id="b")
    assert entry["processed_docs"] == 0
    assert wh.read("triples").count() == before


def test_docs_paginated_parity_semantics(spark):
    # doc_status-shaped frame exercising the reference whitelist semantics
    # (json_doc_status.rs:301-355): clamp, fallback field, lowercased
    # file_path with missing -> 'no-file-path', status filter.
    rows = [
        (f"doc-{i:03d}", "PROCESSED" if i % 2 else "PENDING",
         None if i == 0 else f"B{i}" if i % 3 else f"a{i}",
         f"2026-01-{i + 1:02d}T00:00:00Z", f"2026-02-{i + 1:02d}T00:00:00Z")
        for i in range(30)
    ]
    st = spark.createDataFrame(
        rows, "doc_id string, status string, url string, "
              "created_at string, updated_at string"
    )
    # default: updated_at desc, page 1, size clamped up from 3 to 10
    out = materialize.docs_paginated(st, page=1, page_size=3).collect()
    assert len(out) == 10
    assert out[0]["doc_id"] == "doc-029"  # newest updated_at first
    assert [r["row_num"] for r in out] == list(range(1, 11))

    # unknown sort field falls back to updated_at
    fb = materialize.docs_paginated(st, sort_field="nope").collect()
    assert fb[0]["doc_id"] == "doc-029"

    # file_path asc: None sorts as 'no-file-path' (after lowercased a*/b*)
    fp = materialize.docs_paginated(
        st, sort_field="file_path", descending=False
    ).collect()
    assert fp[-1]["doc_id"] == "doc-000"

    # status filter + id sort + page 2
    p2 = materialize.docs_paginated(
        st, status="PROCESSED", sort_field="id", descending=False, page=2,
        page_size=10,
    ).collect()
    assert len(p2) == 5  # 15 PROCESSED rows total
    assert all(r["status"] == "PROCESSED" for r in p2)
    assert [r["row_num"] for r in p2] == list(range(11, 16))


def test_doc_status_and_counts(spark, web120, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    materialize.run_pipeline(spark, web120, wh, run_id="s")
    st = wh.read("doc_status")
    docs = wh.read("docs")
    chunks = wh.read("chunks")
    assert st.count() == docs.count()
    # chunks_list is the ordered chunk ids of the doc
    row = (
        st.filter(F.size("chunks_list") > 1)
        .orderBy("doc_id")
        .limit(1)
        .collect()[0]
    )
    want = [
        r["chunk_id"]
        for r in chunks.filter(F.col("doc_id") == row["doc_id"])
        .orderBy("chunk_order_index")
        .collect()
    ]
    assert row["chunks_list"] == want

    counts = {
        r["status"]: r["n_docs"]
        for r in materialize.status_counts(st).collect()
    }
    assert counts["PROCESSED"] == st.count()
    assert counts["ALL"] == st.count()
