"""Explicit skew handling: hot-key detection and salted joins.

The north rule calls out head-entity skew as a first-class concern.  Most of
the engine avoids skew structurally — content-hash keys are uniform, alias /
canonical maps are broadcast — but any large⋈large equi-join on a natural key
(entity name, URL host, predicate) can concentrate a head key on one reducer.
AQE's skew-join splitting handles the *sort-merge* case at runtime; this
module is the explicit fallback for when the build side is too big to
broadcast and the skew is known or measured:

  * :func:`hot_keys` — measure: keys whose row count exceeds a threshold.
  * :func:`salted_join` — split the hot keys onto ``n_salts`` reducers by
    salting the large side deterministically and replicating the small
    side's hot rows per salt; cold keys join normally, results union.

Salt derivation is deterministic (xxhash64 of the whole row, not rand()), so
re-runs and resumed stages produce identical partitioning — the same
determinism contract as the rest of the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_HOT_THRESHOLD = 100_000
DEFAULT_SALTS = 16


def hot_keys(df: DataFrame, key: str, threshold: int = DEFAULT_HOT_THRESHOLD) -> DataFrame:
    """Keys whose frequency exceeds ``threshold`` — one aggregation pass."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > threshold)
        .select(key, "n_rows")
    )


def _salt_col(df: DataFrame, n_salts: int):
    """Deterministic per-row salt in [0, n_salts): hash of the full row."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    hot: DataFrame | None = None,
    n_salts: int = DEFAULT_SALTS,
    threshold: int = DEFAULT_HOT_THRESHOLD,
) -> DataFrame:
    """Inner equi-join on ``key`` with hot keys spread over ``n_salts`` reducers.

    Two-path plan: rows with a hot key join on (key, salt) — the large side
    salted by row hash, the small side's hot rows exploded once per salt —
    while cold keys take the ordinary join.  Column set of the result is
    large ⋈ small minus helper columns, same as a plain inner join.

    ``hot`` defaults to :func:`hot_keys` over the large side (pass a
    precomputed/broadcastable frame in production so the measurement scan is
    shared across joins).
    """
    if hot is None:
        hot = hot_keys(large, key, threshold)
    hot_only = F.broadcast(hot.select(key))

    large_hot = large.join(hot_only, key, "inner")
    large_cold = large.join(hot_only, key, "left_anti")
    small_hot = small.join(hot_only, key, "inner")
    small_cold = small.join(hot_only, key, "left_anti")

    lh = large_hot.withColumn("_salt", _salt_col(large_hot, n_salts))
    sh = small_hot.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    hot_joined = lh.join(sh, [key, "_salt"], "inner").drop("_salt")
    cold_joined = large_cold.join(small_cold, key, "inner")
    return hot_joined.unionByName(cold_joined)
