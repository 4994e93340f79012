"""BFS graph-query tests on a hand-built graph with known paths (SURVEY §5.4)
plus an end-to-end run over the synthetic corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgspark import canon, datagen, graph, pipeline


def _graph(spark, nodes, edge_list):
    v = spark.createDataFrame(
        [(i, i, t, f"{i} desc") for i, t in nodes],
        "id string, name string, entity_type string, description string",
    ).withColumn("doc_id", F.lit("doc-x"))
    e = spark.createDataFrame(
        [(f"r{k}", s, d, f"{s}->{d}") for k, (s, d) in enumerate(edge_list)],
        "id string, src string, dst string, description string",
    ).withColumn("doc_id", F.lit("doc-x"))
    return v, e


@pytest.fixture(scope="module")
def toy(spark):
    nodes = [
        ("s1", "Symptom"), ("s2", "Symptom"),
        ("m1", "Mechanism"),
        ("d1", "Disease"), ("d2", "Disease"), ("d3", "Disease"),
        ("x1", "Mechanism"), ("x2", "Mechanism"), ("x3", "Mechanism"),
        ("x4", "Mechanism"), ("x5", "Mechanism"),
        ("iso", "Disease"),
    ]
    edge_list = [
        ("s1", "m1"), ("m1", "d1"), ("d2", "m1"),  # d2 reachable backward
        ("s2", "x1"), ("x1", "x2"), ("x2", "x3"),
        ("x3", "x4"), ("x4", "x5"), ("x5", "d3"),  # d3 at depth 6
    ]
    return _graph(spark, nodes, edge_list)


def test_bfs_both_directions_and_parent_tree(spark, toy):
    v, e = toy
    got = {
        (r["start"], tuple(r["path"]), r["depth"])
        for r in graph.bfs_paths(v, e, max_depth=3).collect()
        if r["start"] == "s1"
    }
    assert got == {
        ("s1", ("s1", "m1", "d1"), 2),
        ("s1", ("s1", "m1", "d2"), 2),  # backward edge d2->m1 walked
    }


def test_bfs_depth_limit(spark, toy):
    v, e = toy
    at6 = [r for r in graph.bfs_paths(v, e, max_depth=6).collect() if r["start"] == "s2"]
    at5 = [r for r in graph.bfs_paths(v, e, max_depth=5).collect() if r["start"] == "s2"]
    assert len(at6) == 1 and at6[0]["depth"] == 6
    assert at5 == []


def test_bfs_max_paths_cut(spark):
    nodes = [("s3", "Symptom")] + [(f"da{i}", "Disease") for i in range(7)]
    edge_list = [("s3", f"da{i}") for i in range(7)]
    v, e = _graph(spark, nodes, edge_list)
    got = graph.bfs_paths(v, e, max_paths=5).collect()
    assert len(got) == 5
    # deterministic cut: (depth, path) order keeps the smallest ids
    assert sorted(r["path"][1] for r in got) == [f"da{i}" for i in range(5)]


def test_neighbors_directions(spark, toy):
    v, e = toy
    ids = spark.createDataFrame([("m1",)], "id string")
    out = {r["neighbor"] for r in graph.neighbors(e, ids, "out").collect()}
    inn = {r["neighbor"] for r in graph.neighbors(e, ids, "in").collect()}
    both = {r["neighbor"] for r in graph.neighbors(e, ids, "both").collect()}
    assert out == {"d1"}
    assert inn == {"s1", "d2"}
    assert both == {"s1", "d1", "d2"}


def test_render_paths(spark, toy):
    v, e = toy
    p = graph.bfs_paths(v, e, max_depth=3)
    rendered = {
        r["rendered"]
        for r in graph.render_paths(p, v, e).collect()
    }
    assert "s1 --- s1->m1 ---> m1 ----- m1 --- m1->d1 ---> d1" in rendered
    # backward step renders with reversed arrow
    assert "s1 --- s1->m1 ---> m1 ----- m1 <--- d2->m1 --- d2" in rendered


def test_graph_search_on_synthetic_corpus(spark):
    web = datagen.web_pages(spark, 120, 42)
    built = pipeline.build(web)
    hits = graph.graph_search(built["entities"], built["relations"])
    rows = hits.collect()
    assert len(rows) > 0  # the corpus plants Symptom/Disease co-occurrences
    # every path starts at a Symptom and ends at a Disease
    v = graph.vertices(built["entities"])
    types = {r["id"]: r["entity_type"] for r in v.collect()}
    for r in rows:
        assert types[r["path"][0]] == "Symptom"
        assert types[r["path"][-1]] == "Disease"
        assert r["depth"] == len(r["path"]) - 1


def test_count_by_type(spark, toy):
    v, _ = toy
    got = {r["entity_type"]: r["n_entities"] for r in graph.count_by_type(v).collect()}
    assert got == {"symptom": 2, "mechanism": 6, "disease": 4}


def test_reliable_checkpoint_flag(spark, toy, tmp_path):
    """VERDICT r2 item 10: with a checkpoint dir configured, the iterative
    loops use reliable checkpoints (durable across executor loss at cluster
    scale) and produce identical results; default stays localCheckpoint."""
    v, e = toy
    baseline = {
        (r["start"], tuple(r["path"]), r["depth"])
        for r in graph.bfs_paths(v, e, max_depth=3).collect()
    }
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None  # default unchanged
    ckpt = str(tmp_path / "ckpt")
    sc.setCheckpointDir(ckpt)
    try:
        durable = {
            (r["start"], tuple(r["path"]), r["depth"])
            for r in graph.bfs_paths(v, e, max_depth=3).collect()
        }
        assert durable == baseline
        # reliable checkpoint data actually landed in the configured dir
        files = [p for p in (tmp_path / "ckpt").rglob("*") if p.is_file()]
        assert files, "expected RDD checkpoint files under the checkpoint dir"
    finally:
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.apply(None)
        )
    assert sc.getCheckpointDir() is None
