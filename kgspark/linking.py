"""Entity linking: broadcast alias-dictionary candidate generation + scoring.

The reference's only linking mechanism is the per-doc name→id hash map keyed
by ``lower(trim(name))`` (J2, pipeline/pipeline.rs:313-373).  The north star
extends it cross-doc in two steps:

  * candidate generation — a small alias dictionary is broadcast to every
    executor and entities join it on the normalized surface form; unlinked
    names canonicalize to themselves (:func:`link_entities`);
  * entity-link SCORING — when one surface form maps to several candidate
    entities, each (mention, candidate) pair is scored by context-token
    overlap and the argmax wins (:func:`disambiguate`).

Scale: the alias side is tiny (≤10k rows) → ``F.broadcast`` guarantees a
broadcast-hash join, zero shuffle of the (huge) entity side.  Skewed head
entities are harmless here because broadcast joins don't co-locate keys.
The scoring step goes one better: the candidate table folds into the plan
as literals, so disambiguation is a pure NARROW projection — zero shuffles,
zero joins, whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import extraction, ids, spec


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


def disambiguate(
    docs: DataFrame,
    candidates: dict[str, list[tuple[str, tuple[str, ...]]]] | None = None,
    window: int = spec.AMBIG_CONTEXT_WINDOW,
    text_col: str = "text",
) -> DataFrame:
    """Context-scored entity disambiguation (the north-star "entity-link
    scoring" step; beyond the reference, whose per-doc name→id map cannot
    represent an ambiguous surface form at all).

    For every token whose surface is an ambiguous alias, the mention's
    context is the tokens within ±``window`` positions (mention excluded);
    each candidate entity scores ``|distinct(context) ∩ candidate terms|``
    and the winner is the argmax, ties broken by candidate name ascending.

    Returns one row per mention PER SOURCE ROW (``src_row`` = the raw
    ``doc_id`` column, per-row lineage like every tokenizing operator):
    (src_row, kg_doc_id, pos, surface, linked_name, score, margin,
    n_candidates) where ``margin`` = winner score − runner-up score (the
    winner's score itself for a single-candidate alias).

    Scale: a pure narrow projection — the candidate dictionary folds into
    the plan as literal arrays (equivalent to, and cheaper than, a broadcast
    join), context comes from array slices of the already-materialized token
    array, and the argmax is a bounded struct-sort.  Zero shuffles, zero
    Python; one stage at any corpus size.
    """
    cands = spec.AMBIG_CANDIDATES if candidates is None else candidates
    aliases = sorted(cands)
    alias_arr = F.array(*[F.lit(a) for a in aliases])

    tok = extraction.with_tokens(docs, text_col).select(
        F.col("doc_id").alias("src_row"), "kg_doc_id", "toks"
    )
    mention_pos = F.filter(
        F.sequence(F.lit(0), F.size("toks") - 1),
        lambda i: F.array_contains(alias_arr, F.element_at("toks", i + 1)),
    )
    m = tok.select(
        "src_row", "kg_doc_id", "toks", F.explode(mention_pos).alias("pos")
    )

    # Context = distinct tokens at 1-based indices [pos+1-window, pos] and
    # [pos+2, pos+1+window] (the mention itself sits at index pos+1).
    p1 = F.col("pos") + 1  # 1-based mention index
    lo = F.greatest(p1 - window, F.lit(1))
    left = F.slice("toks", lo, p1 - lo)
    right = F.slice(
        "toks", p1 + 1, F.least(F.size("toks"), p1 + window) - p1
    )
    m = m.select(
        "src_row",
        "kg_doc_id",
        "pos",
        F.element_at("toks", p1).alias("surface"),
        F.array_distinct(F.concat(left, right)).alias("ctx"),
    )

    def _scored(alias: str) -> Column:
        """Array of (score, candidate) structs for one alias, sorted so the
        first element is the winner: struct comparison is lexicographic, so
        ordering by (-score, candidate) ascending = score desc, name asc."""
        return F.array(
            *[
                F.struct(
                    (
                        -F.size(
                            F.array_intersect(
                                "ctx", F.array(*[F.lit(t) for t in terms])
                            )
                        )
                    ).cast("long").alias("neg_score"),
                    F.lit(cand).alias("candidate"),
                )
                for cand, terms in sorted(cands[alias])
            ]
        )

    scored = F.lit(None)
    for a in aliases:
        scored = F.when(F.col("surface") == a, F.array_sort(_scored(a))).otherwise(
            scored
        )
    winner = F.element_at("scored", 1)
    runner = F.element_at("scored", 2)
    return (
        m.withColumn("scored", scored)
        .select(
            "src_row",
            "kg_doc_id",
            F.col("pos").cast("int").alias("pos"),
            "surface",
            winner["candidate"].alias("linked_name"),
            (-winner["neg_score"]).alias("score"),
            (
                -winner["neg_score"]
                + F.coalesce(runner["neg_score"], F.lit(0))
            ).alias("margin"),
            F.size("scored").alias("n_candidates"),
        )
    )
