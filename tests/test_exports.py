"""Export surfaces: DOT render (S9/G8), JSON sink (S8), summaries (P12)."""

from __future__ import annotations

import os

import pytest

from kgspark import datagen, graph, materialize, pipeline

N = 40
SEED = 42


@pytest.fixture(scope="module")
def built(spark):
    web = datagen.web_pages(spark, N, SEED)
    b = pipeline.build(web)
    b["entities"].persist().count()
    b["relations"].persist().count()
    return b


def test_dot_render_clustered(built):
    v, e = graph.vertices(built["entities"]), graph.edges(built["relations"])
    dot = graph.to_dot(v, e)
    assert dot.startswith("digraph knowledge_graph {") and dot.endswith("}")
    assert "subgraph \"cluster_0\"" in dot
    # every vertex id appears; every edge rendered with an arrow
    assert dot.count("->") == e.count()
    for row in v.limit(5).collect():
        assert row["id"] in dot
    # deterministic: same input -> identical string
    assert dot == graph.to_dot(v, e)


def test_dot_render_size_guard(built):
    v, e = graph.vertices(built["entities"]), graph.edges(built["relations"])
    with pytest.raises(ValueError, match="nodes > 1"):
        graph.to_dot(v, e, max_nodes=1)
    # edge ceiling trips independently (multigraphs can exceed any node
    # bound on edges alone) and must raise BEFORE any collect happens
    with pytest.raises(ValueError, match="edges > 1"):
        graph.to_dot(v, e, max_edges=1)
    # just-above-the-bound: n nodes render fine at max_nodes=n, raise at n-1
    n, m = v.count(), e.count()
    assert graph.to_dot(v, e, max_nodes=n, max_edges=m).endswith("}")
    with pytest.raises(ValueError, match="too large"):
        graph.to_dot(v, e, max_nodes=n - 1)


def test_export_json_roundtrip(spark, built, tmp_path):
    path = os.path.join(str(tmp_path), "entities_json")
    materialize.export_json(built["entities"], path)
    back = spark.read.json(path)
    assert back.count() == built["entities"].count()
    assert set(back.columns) == set(built["entities"].columns)


def test_document_summaries(built):
    st = materialize.doc_status(built["docs"], built["chunks"], run_id="t")
    s = materialize.document_summaries(st).collect()
    docs = {r["doc_id"]: r for r in built["docs"].collect()}
    assert len(s) == len(docs)
    for row in s:
        d = docs[row["doc_id"]]
        assert row["status"] == "PROCESSED"
        assert row["content_length"] == d["content_length"]
        assert row["n_chunks"] >= 1
        # summary is content_summary (never empty for non-empty docs)
        assert row["summary"] == d["content_summary"]
        if d["content_length"] > 200:
            assert row["summary"].endswith("…") and len(row["summary"]) == 201


def test_export_ntriples_distributed_text(spark, tmp_path):
    """export_ntriples writes loadable N-Triples text (distributed write,
    no driver collect): read-back equals the to_ntriples frame, every line
    is <iri> <iri> <iri> . with encoded names, round-trippable."""
    import os
    import re
    from urllib.parse import unquote_plus

    from kgspark import datagen, graph, pipeline

    triples = pipeline.build(datagen.web_pages(spark, 60, 42), reuse=False)["triples"]
    out = os.path.join(tmp_path, "kg.nt")
    graph.export_ntriples(triples, out)
    lines = {x["value"] for x in spark.read.text(out).collect()}
    want = {x["ntriple"] for x in graph.to_ntriples(triples).collect()}
    assert lines == want and lines
    pat = re.compile(
        r"^<https://kg\.example/entity/([^ >]+)> <https://kg\.example/prop/([^ >]+)> "
        r"<https://kg\.example/entity/([^ >]+)> \.$"
    )
    names = {t for t in triples.select("subj").toPandas()["subj"]}
    for ln in lines:
        m = pat.match(ln)
        assert m, ln
        assert " " not in m.group(1)  # IRI-legal: no raw spaces
    # decode round-trip recovers original surface forms
    decoded = {unquote_plus(pat.match(ln).group(1)) for ln in lines}
    assert decoded <= {
        t for t in triples.select("subj").toPandas()["subj"]
    } | {t for t in names}
