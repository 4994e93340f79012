"""Property tests: partition invariance, KV parity ops, canon under skew."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kgspark import canon, datagen, materialize, pipeline

N = 60
SEED = 9


def _triples(web):
    return {tuple(r) for r in pipeline.build(web, reuse=False)["triples"].collect()}


def test_partition_count_invariance(spark):
    """Same input under different partition counts ⇒ identical output set
    (SURVEY.md §5.5 — the determinism half of the scaling property)."""
    base = datagen.web_pages(spark, N, SEED)
    t3 = _triples(base.repartition(3))
    t17 = _triples(base.repartition(17))
    t1 = _triples(base.coalesce(1))
    assert t3 == t17 == t1 and len(t3) > 0


def test_delete_ids_and_truncate(spark, tmp_path):
    wh = materialize.Warehouse(spark, str(tmp_path))
    web = datagen.web_pages(spark, N, SEED)
    materialize.run_pipeline(spark, web, wh, run_id="r1")

    docs = wh.read("docs")
    n = docs.count()
    victims = docs.select("doc_id").limit(3)
    removed = materialize.delete_ids(wh, "docs", "doc_id", victims)
    assert removed == 3
    assert wh.read("docs").count() == n - 3

    materialize.truncate(wh, "docs")
    assert not wh.exists("docs")


def test_status_lookups(spark, tmp_path):
    wh = materialize.Warehouse(spark, str(tmp_path))
    web = datagen.web_pages(spark, N, SEED)
    materialize.run_pipeline(spark, web, wh, run_id="runA")
    st = wh.read("doc_status")
    assert materialize.docs_by_track_id(st, "runA").count() == st.count()
    assert materialize.docs_by_track_id(st, "nope").count() == 0
    url = st.select("url").first()["url"]
    got = materialize.doc_by_url(st, url).collect()
    assert len(got) == 1 and got[0]["url"] == url
    # RFC-3339 stamps present and parseable
    row = st.first()
    assert "T" in row["created_at"] and row["updated_at"] >= row["created_at"]


def test_canon_skewed_head_entity(spark):
    """Canonicalization under deliberate head-entity skew: one surface-form
    cluster dominating the corpus must still converge and merge correctly."""
    import hashlib

    head = [("I.B.M.",), ("IBM",), ("International Business Machines",)]
    # tail names built from hex digests: char-3-gram Jaccard between any two
    # stays well under the 0.5 merge threshold (names like "Distinct Co N"
    # would be legitimate near-dups of each other and correctly merge).
    tail_names = [
        f"Zv{hashlib.md5(str(i).encode()).hexdigest()[:10]}" for i in range(200)
    ]
    rows = head * 300 + [(n,) for n in tail_names]  # 900 skewed + 200 singleton
    ents = spark.createDataFrame(rows, "entity_name string")
    cmap = canon.canonical_map(spark, ents)
    got = {r["entity_name"]: r["canonical_name"] for r in cmap.collect()}
    assert got["I.B.M."] == got["IBM"] == got["International Business Machines"] == "IBM"
    # singletons untouched, one row per distinct name (no blowup from skew)
    assert got[tail_names[7]] == tail_names[7]
    assert cmap.count() == len(got) == 203


def test_operator_partition_invariance(spark):
    """The round-2 operators are partition-count invariant: vectorized
    minhash (block boundaries shift with batch shape), decimal-summed
    session windows, and sliding token chunks produce identical result sets
    at any parallelism — the determinism half of the scaling criterion."""
    from kgspark import chunking, events, textops

    docs = spark.read.parquet(os.path.join("/root/testdata/sf0.001", "documents.parquet"))
    ev = spark.read.parquet(os.path.join("/root/testdata/sf0.001", "events.parquet"))

    for build in (
        lambda d: textops.minhash_signatures(d),
        lambda d: textops.simhash(d),
        lambda d: chunking.token_window_chunks(d, size=50, overlap=5),
    ):
        a = {tuple(r) for r in build(docs.repartition(13)).collect()}
        b = {tuple(r) for r in build(docs.coalesce(1)).collect()}
        assert a == b and len(a) > 0

    sa = {tuple(r) for r in events.session_windows(ev.repartition(13)).collect()}
    sb = {tuple(r) for r in events.session_windows(ev.coalesce(1)).collect()}
    assert sa == sb and len(sa) > 0
