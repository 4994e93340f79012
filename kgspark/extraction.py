"""Deterministic pattern-based entity/relation extraction — Catalyst path.

Replaces the reference's per-chunk LLM extraction
(runtime/src/pipeline/extractor.rs:71-100, schema runtime/src/ai/schemas.rs:77-96)
with the closed-vocabulary spec in :mod:`kgspark.spec`.

Scale design: mention and relation-pair discovery are *narrow* — pure
higher-order array functions (``filter``/``transform``/``slice`` over the
token array) plus map-literal lookups, so a 100 TB scan produces mentions and
relation pairs with ZERO shuffles; the only shuffles in the whole stage are
the final per-(doc, name, type) aggregation (map-side partial agg) — and even
those are skew-safe because doc_id is a content hash (uniform).  No explode →
window → join-back chains, no Python in the hot path.

Entity/relation identity is content-derived (kgspark.ids), so the reference's
name→id resolution hash-join (J2, pipeline/pipeline.rs:313-373) collapses to
an inline expression here; the join formulation (with its drop-unknown
semantics) lives in kgspark.pipeline for the UDF-extracted web_pages path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import ids, spec


def _vocab_map(field: int) -> Column:
    """Map literal surface -> name (field=0) or type (field=1)."""
    pairs: list[Column] = []
    for surface, name, etype in spec.vocab_rows():
        pairs.append(F.lit(surface))
        pairs.append(F.lit(name if field == 0 else etype))
    return F.create_map(*pairs)


def with_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``toks`` (whitespace tokens) and ``kg_doc_id`` columns.

    Drops empty/whitespace-only documents (P4 empty-content filter,
    reference pipeline/pipeline.rs:463-466).
    """
    return (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .withColumn("kg_doc_id", ids.doc_id(F.trim(F.col(text_col))))
        .withColumn("toks", F.split(F.trim(F.col(text_col)), r"\s+"))
    )


def _mention_positions(toks: Column) -> Column:
    """Array of 0-based positions whose token is in the vocabulary."""
    type_map = _vocab_map(1)
    return F.filter(
        F.sequence(F.lit(0), F.size(toks) - 1),
        lambda i: F.element_at(type_map, F.element_at(toks, i + 1)).isNotNull(),
    )


def mentions(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Typed entity mentions: (kg_doc_id, pos, surface, name, entity_type).

    One narrow pass: no shuffle, no UDF.
    """
    name_map, type_map = _vocab_map(0), _vocab_map(1)
    tok = with_tokens(docs, text_col)
    m = tok.select(
        "kg_doc_id",
        F.explode(_mention_positions(F.col("toks"))).alias("pos"),
        F.col("toks"),
    )
    surface = F.element_at("toks", F.col("pos") + 1)
    return m.select(
        "kg_doc_id",
        "pos",
        surface.alias("surface"),
        F.element_at(name_map, surface).alias("name"),
        F.element_at(type_map, surface).alias("entity_type"),
    )


def entities(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document entity fold with first-wins metadata.

    Mirrors the reference's first-chunk-wins entity merge (A5,
    pipeline/pipeline.rs:335-347): one row per (doc, name, type), metadata
    from the smallest mention position, content-addressed entity_id.
    """
    m = mentions(docs, text_col)
    return (
        m.groupBy("kg_doc_id", "name", "entity_type")
        .agg(
            F.min("pos").alias("first_pos"),
            F.count(F.lit(1)).alias("n_mentions"),
        )
        .select(
            ids.entity_id(
                F.col("kg_doc_id"), F.col("name"), F.col("entity_type")
            ).alias("entity_id"),
            F.col("name").alias("entity_name"),
            "entity_type",
            F.concat(
                F.col("name"), F.lit(" is a "), F.col("entity_type")
            ).alias("entity_description"),
            F.col("kg_doc_id").alias("doc_id"),
            "first_pos",
            "n_mentions",
        )
    )


def relation_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adjacent mention pairs with gap <= MAX_GAP and differing names.

    Pure array computation per document — pairs, predicates (intervening
    tokens joined by '_'), and both endpoint entity ids are derived inside
    one projection; still zero shuffles.
    """
    name_map, type_map = _vocab_map(0), _vocab_map(1)
    tok = with_tokens(docs, text_col).withColumn(
        "mpos", _mention_positions(F.col("toks"))
    )
    # Pair up consecutive mention positions: struct(pos, next_pos).
    pairs = F.when(
        F.size("mpos") < 2, F.array().cast("array<struct<pos:int,next_pos:int>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size("mpos") - 2),
            lambda j: F.struct(
                F.element_at("mpos", j + 1).cast("int").alias("pos"),
                F.element_at("mpos", j + 2).cast("int").alias("next_pos"),
            ),
        )
    )
    p = tok.select("kg_doc_id", "toks", F.explode(pairs).alias("pr")).select(
        "kg_doc_id",
        "toks",
        F.col("pr.pos").alias("pos"),
        F.col("pr.next_pos").alias("next_pos"),
    )
    gap = F.col("next_pos") - F.col("pos")
    src_surface = F.element_at("toks", F.col("pos") + 1)
    tgt_surface = F.element_at("toks", F.col("next_pos") + 1)
    predicate = F.when(gap == 1, F.lit(spec.NEAR_PREDICATE)).otherwise(
        F.array_join(F.slice("toks", F.col("pos") + 2, gap - 1), "_")
    )
    out = p.filter((gap > 0) & (gap <= spec.MAX_GAP)).select(
        "kg_doc_id",
        "pos",
        "next_pos",
        F.element_at(name_map, src_surface).alias("subj"),
        F.element_at(type_map, src_surface).alias("subj_type"),
        predicate.alias("predicate"),
        F.element_at(name_map, tgt_surface).alias("obj"),
        F.element_at(type_map, tgt_surface).alias("obj_type"),
    )
    return out.filter(F.col("subj") != F.col("obj"))


def relations(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Full relation rows with content-addressed ids (first-wins on id, A6).

    relation_id hashes (doc, src_id, tgt_id, description), so two identical
    statements in one doc collapse to one row — exactly the reference's
    entry-or-insert fold (pipeline/pipeline.rs:383-393).
    """
    p = relation_pairs(docs, text_col)
    src_id = ids.entity_id(F.col("kg_doc_id"), F.col("subj"), F.col("subj_type"))
    tgt_id = ids.entity_id(F.col("kg_doc_id"), F.col("obj"), F.col("obj_type"))
    desc = F.concat_ws(" ", F.col("subj"), F.col("predicate"), F.col("obj"))
    rows = p.select(
        ids.relation_id(F.col("kg_doc_id"), src_id, tgt_id, desc).alias("relation_id"),
        F.col("kg_doc_id").alias("doc_id"),
        src_id.alias("source_entity_id"),
        tgt_id.alias("target_entity_id"),
        F.col("subj"),
        F.col("predicate"),
        F.col("obj"),
        desc.alias("relationship_description"),
        F.split(F.col("predicate"), "_").alias("relationship_keywords"),
        F.col("pos"),
    )
    # First-wins dedup by relation_id (keep smallest position for lineage).
    return (
        rows.groupBy(
            "relation_id",
            "doc_id",
            "source_entity_id",
            "target_entity_id",
            "subj",
            "predicate",
            "obj",
            "relationship_description",
        )
        .agg(
            F.min("pos").alias("first_pos"),
            F.count(F.lit(1)).alias("n_statements"),
            F.first("relationship_keywords").alias("relationship_keywords"),
        )
    )


def triples(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized (subj, pred, obj, doc_id) view used for the P/R gate."""
    return relations(docs, text_col).select(
        F.col("subj"),
        F.col("predicate").alias("pred"),
        F.col("obj"),
        F.col("doc_id"),
    ).distinct()
