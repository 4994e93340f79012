"""Canonicalization: LSH pair generation, connected components, rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgspark import canon, datagen, pipeline


def _names_df(spark, names):
    return (
        spark.createDataFrame([(n,) for n in names], "entity_name string")
    )


def test_norm_key_merges_punctuation_variants(spark):
    df = _names_df(spark, ["I.B.M.", "IBM", "ibm", "Acme  Corp"])
    got = {
        r["nkey"]
        for r in canon.distinct_names(df).collect()
    }
    assert got == {"ibm", "acme corp"}


def test_exact_key_pairs(spark):
    names = canon.distinct_names(_names_df(spark, ["I.B.M.", "IBM", "Paris"]))
    pairs = {(r["name_a"], r["name_b"]) for r in canon.exact_key_pairs(names).collect()}
    assert pairs == {("I.B.M.", "IBM")}


def test_lsh_pairs_find_near_names(spark):
    names = canon.distinct_names(
        _names_df(spark, ["Acme Corp", "Acme Corpp", "Zebra Inc"])
    )
    pairs = {(r["name_a"], r["name_b"]) for r in canon.lsh_pairs(names).collect()}
    assert ("Acme Corp", "Acme Corpp") in pairs
    assert all("Zebra Inc" not in p for p in pairs)


def test_connected_components_chain_and_island(spark):
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e")], "name_a string, name_b string"
    )
    comp = {r["node"]: r["comp"] for r in canon.connected_components(pairs).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}


def test_canonical_map_merges_ibm_cluster(spark):
    ents = _names_df(
        spark,
        ["IBM", "I.B.M.", "International Business Machines", "Paris", "London"],
    )
    cmap = {
        r["entity_name"]: r["canonical_name"]
        for r in canon.canonical_map(spark, ents).collect()
    }
    assert cmap["IBM"] == "IBM"
    assert cmap["I.B.M."] == "IBM"
    assert cmap["International Business Machines"] == "IBM"
    assert cmap["Paris"] == "Paris"
    assert cmap["London"] == "London"


def test_canonical_triples_end_to_end(spark):
    web = datagen.web_pages(spark, 120, 42)
    built = pipeline.build(web)
    cmap = canon.canonical_map(spark, built["entities"])
    ct = canon.canonical_triples(built["triples"], cmap)
    names = {
        r[0]
        for r in ct.select(F.explode(F.array("subj", "obj"))).distinct().collect()
    }
    # alias surface forms are gone from the canonical graph
    assert "I.B.M." not in names
    assert "International Business Machines" not in names
    # and the canonical graph is no larger than the raw one
    assert ct.count() <= built["triples"].count()
