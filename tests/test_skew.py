"""Salted-join correctness: skewed join == plain join, hot keys detected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgspark import skew


@pytest.fixture(scope="module")
def skewed(spark):
    """Large side: one head key with 5000 rows + 200 cold keys x 10 rows."""
    head = [("HOT", i) for i in range(5000)]
    cold = [(f"k{j}", i) for j in range(200) for i in range(10)]
    large = spark.createDataFrame(head + cold, "k string, payload long")
    small = spark.createDataFrame(
        [("HOT", "head-entity")] + [(f"k{j}", f"dim{j}") for j in range(150)],
        "k string, label string",
    )
    return large, small


def test_hot_keys_detects_head(skewed):
    large, _ = skewed
    hot = skew.hot_keys(large, "k", threshold=1000).collect()
    assert [(r["k"], r["n_rows"]) for r in hot] == [("HOT", 5000)]


def test_salted_join_matches_plain_join(skewed):
    large, small = skewed
    plain = {tuple(r) for r in large.join(small, "k", "inner").collect()}
    salted = {
        tuple(r)
        for r in skew.salted_join(
            large, small, "k", n_salts=8, threshold=1000
        ).collect()
    }
    assert salted == plain and len(plain) == 5000 + 150 * 10


def test_salted_join_spreads_hot_key(spark, skewed):
    large, small = skewed
    hot = skew.hot_keys(large, "k", threshold=1000)
    lh = large.join(F.broadcast(hot.select("k")), "k", "inner")
    salts = (
        lh.withColumn("_salt", skew._salt_col(lh, 8))
        .groupBy("_salt")
        .count()
        .collect()
    )
    # the head key's rows land on every salt, roughly evenly
    assert len(salts) == 8
    assert max(r["count"] for r in salts) < 5000 * 0.25


def test_salted_join_deterministic(skewed):
    large, small = skewed
    a = sorted(
        tuple(r)
        for r in skew.salted_join(large, small, "k", n_salts=8, threshold=1000).collect()
    )
    b = sorted(
        tuple(r)
        for r in skew.salted_join(large, small, "k", n_salts=8, threshold=1000).collect()
    )
    assert a == b
