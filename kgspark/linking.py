"""Entity linking: broadcast alias-dictionary candidate generation + scoring.

The reference's only linking mechanism is the per-doc name→id hash map keyed
by ``lower(trim(name))`` (J2, pipeline/pipeline.rs:313-373).  The north star
extends it cross-doc: a small alias dictionary is broadcast to every executor
and entities join it on the normalized surface form; unlinked names
canonicalize to themselves.

Scale: the alias side is tiny (≤10k rows) → ``F.broadcast`` guarantees a
broadcast-hash join, zero shuffle of the (huge) entity side.  Skewed head
entities are harmless here because broadcast joins don't co-locate keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ids, spec


def alias_dictionary(spark: SparkSession) -> DataFrame:
    """The built-in alias dictionary as a DataFrame (broadcast side)."""
    return spark.createDataFrame(
        spec.alias_rows(), schema="alias string, canonical_name string"
    )


def link_entities(
    entities: DataFrame,
    aliases: DataFrame,
    name_col: str = "entity_name",
) -> DataFrame:
    """Left-join entities to the broadcast alias dict on lower(trim(name)).

    Adds canonical_name (self when unlinked), canonical_id, linked flag.
    """
    norm = F.lower(F.trim(F.col(name_col)))
    out = (
        entities.withColumn("_norm_name", norm)
        .join(F.broadcast(aliases), F.col("_norm_name") == aliases["alias"], "left")
        .drop("alias", "_norm_name")
    )
    canonical = F.coalesce(F.col("canonical_name"), F.col(name_col))
    return (
        out.withColumn("canonical_name", canonical)
        .withColumn("canonical_id", ids.canonical_id(F.col("canonical_name")))
        .withColumn("linked", F.col("canonical_name") != F.col(name_col))
    )
