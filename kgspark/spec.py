"""The deterministic extraction specification.

The reference extracts entities/relationships per chunk with an LLM behind a
strict JSON schema and a closed 14-type vocabulary
(reference: runtime/src/ai/schemas.rs:4-75, runtime/src/pipeline/extractor.rs:71-100).
We replace the LLM with a deterministic, closed-vocabulary pattern extractor so
that precision/recall vs the reference *semantics* is measurable and every
stage is reproducible.  This module is the single source of truth for that
spec; the vectorized pandas-UDF path (kgspark.extraction), the built-in
Catalyst path, the DuckDB oracle SQL (__spark_entry__.py) and the synthetic
data generator (kgspark.datagen) all derive from it.

Spec (versioned; bump SPEC_VERSION on any semantic change):

  * tokens(text)      = split(trim(text)) on runs of ASCII whitespace,
                        0-based positions.
  * mention           = token whose lowercase form is a key of ``VOCAB``;
                        carries (pos, surface, name, entity_type).
  * entity (per doc)  = distinct (name, entity_type); first-wins metadata by
                        smallest position (mirrors the reference's first-chunk
                        wins merge, pipeline/pipeline.rs:335-347).
  * entity_id         = 'entity-' + sha256(doc_id || ':' || name || ':' || type)
                        (pipeline/pipeline.rs:322-333).
  * relation          = each *adjacent* pair of mentions (ordered by position)
                        within one document with position gap <= MAX_GAP and
                        different names.  predicate = intervening tokens joined
                        by '_' (or 'near' when adjacent), description =
                        "<subj> <predicate> <obj>".
  * relation_id       = 'relation-' + sha256(doc_id ':' src_id ':' tgt_id ':' desc)
                        (pipeline/pipeline.rs:375-381).
  * doc_id            = 'doc-' + sha256(text)  (pipeline/pipeline.rs:478).
  * chunk_id          = 'chunk-' + sha256(chunk_text)  (pipeline/chunker.rs:72).
"""

from __future__ import annotations

SPEC_VERSION = 1

# Closed entity-type vocabulary for the word-salad `documents` corpus
# (lowercase surface form -> (canonical display name, entity type)).  The
# web-domain analog of the reference's closed biomedical enum
# (runtime/src/ai/schemas.rs:4-21).  Keep Symptom/Disease-style pairs so the
# symptom→disease BFS query shape stays exercisable.
VOCAB: dict[str, tuple[str, str]] = {
    "spark":    ("Spark", "Product"),
    "customer": ("Customer", "Person"),
    "table":    ("Table", "Artifact"),
    "window":   ("Window", "Artifact"),
    "vector":   ("Vector", "Concept"),
    "stream":   ("Stream", "Concept"),
    "hash":     ("Hash", "Concept"),
    "batch":    ("Batch", "Concept"),
}

# Maximum token-position gap between two adjacent mentions for a relation.
MAX_GAP = 4

# Predicate used when the two mentions are adjacent tokens (no words between).
NEAR_PREDICATE = "near"

# Chunking defaults.  The reference windows 500 tokens with 50 overlap
# (pipeline/pipeline.rs:55-64); both the non-overlapping and the sliding
# (reference-default) window shapes are Catalyst-expressible and oracled.
CHUNK_TOKENS = 50
CHUNK_OVERLAP = 0
# Sliding-window overlap mirroring the reference's 500/50 ratio at our size.
CHUNK_WINDOW_OVERLAP = 5

# Delimiter-chunking (W2, utils.rs:65-101) driver-query parameters: split on
# a literal token delimiter, re-window oversized pieces with overlap.
DELIM_CHUNK_DELIMITER = " the "
DELIM_CHUNK_MAX_TOKENS = 16
DELIM_CHUNK_OVERLAP = 4

# Sentence-segmented chunking for web_pages: consecutive sentences grouped
# N-at-a-time (north-star "sentence-segmented chunking").
CHUNK_SENTENCES = 5

# ID prefixes (pipeline/utils.rs:130-136 compute_mdhash_id call sites).
DOC_PREFIX = "doc-"
CHUNK_PREFIX = "chunk-"
ENTITY_PREFIX = "entity-"
RELATION_PREFIX = "relation-"
CANON_PREFIX = "canon-"

# Broadcast alias dictionary for entity linking (FIXTURES.md §2): normalized
# surface form (lower/trim, the reference's name key at
# pipeline/pipeline.rs:317-321) -> canonical display name.  Names without an
# entry canonicalize to themselves.
ALIAS_DICT: dict[str, str] = {
    "spark": "Apache Spark",
    "apache spark": "Apache Spark",
    "stream": "Data Stream",
    "data stream": "Data Stream",
    "customer": "Customer Account",
}


def alias_rows() -> list[tuple[str, str]]:
    return sorted(ALIAS_DICT.items())


def alias_values_sql() -> str:
    rows = ", ".join(f"('{a}', '{c}')" for a, c in alias_rows())
    return f"(VALUES {rows}) AS alias_dict(alias, canonical_name)"


# Broadcast alias dictionary for the web_pages corpus: normalized surface
# form -> canonical display name.  Covers the IBM alias cluster that the
# synthetic corpus plants (kgspark.datagen.WEB_ENTITIES) so entity linking +
# canonicalization have a real merge to perform.
WEB_ALIAS_DICT: dict[str, str] = {
    "ibm": "IBM",
    "i.b.m.": "IBM",
    "international business machines": "IBM",
    "acme corp": "Acme Corp",
    "acme corporation": "Acme Corp",
}


def web_alias_rows() -> list[tuple[str, str]]:
    return sorted(WEB_ALIAS_DICT.items())


# Predicate domain/range ontology for the web corpus — the schema-validation
# analog of the reference's strict extraction JSON schema
# (runtime/src/ai/schemas.rs:4-75: the reference constrains entity TYPES at
# extraction time; a from-scratch KG pipeline additionally wants the
# per-predicate typing rule so ill-typed triples are flaggable AFTER
# extraction).  predicate -> (allowed subject types, allowed object types).
# Domain and range validate independently: a triple can violate either or
# both.  Predicates absent from this table grade as 'unknown_predicate'.
WEB_ONTOLOGY: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    "works_at":          (("Person",), ("Organization",)),
    "founded":           (("Person",), ("Organization",)),
    "lives_in":          (("Person",), ("Place",)),
    "visited":           (("Person", "Organization"), ("Place", "Event")),
    "created":           (("Person", "Organization"), ("Product", "Work")),
    "wrote":             (("Person",), ("Work",)),
    "indicates":         (("Symptom",), ("Disease",)),
    "is_treated_in":     (("Disease", "Symptom"), ("Place", "Organization")),
    "collaborated_with": (("Person", "Organization"), ("Person", "Organization")),
}


# Functional predicates: a subject may assert at most ONE distinct object
# (OWL FunctionalProperty semantics).  A subject with >=2 distinct objects
# under one of these predicates is a cardinality violation worth flagging
# for curation — the synthetic corpus pairs subjects/objects randomly, so
# violations genuinely occur.
FUNCTIONAL_PREDICATES: tuple[str, ...] = ("lives_in", "works_at", "is_treated_in")

# Target language mixture for training-corpus assembly (textops
# mixture_plan): language -> target share in MICRO units (parts per 1e6,
# sums to 1e6).  Languages absent from this table get weight 0 (excluded
# from the mix).  The shape of the table is the static analog of a
# DoReMi-style domain-weight vector.
MIXTURE_TARGETS_MICRO: dict[str, int] = {
    "en": 500_000,
    "zh": 150_000,
    "es": 150_000,
    "de": 100_000,
    "fr": 100_000,
}


def mixture_target_rows() -> list[tuple[str, int]]:
    return sorted(MIXTURE_TARGETS_MICRO.items())


# Salt for deterministic KG-embedding negative sampling (ontology module):
# neg index = sha256(subj:pred:obj:SALT) mod |entity dictionary|.  Version
# the salt to re-draw the whole negative set.
NEG_SAMPLE_SALT = "neg-v1"


def web_ontology_domain_rows() -> list[tuple[str, str]]:
    """Allowed (predicate, subject_type) pairs, sorted."""
    return sorted(
        (p, t) for p, (doms, _) in WEB_ONTOLOGY.items() for t in doms
    )


def web_ontology_range_rows() -> list[tuple[str, str]]:
    """Allowed (predicate, object_type) pairs, sorted."""
    return sorted(
        (p, t) for p, (_, rngs) in WEB_ONTOLOGY.items() for t in rngs
    )


# Ambiguous-alias candidate table for entity-link SCORING (the north-star
# "mention-detect + entity-link scoring" step that the plain alias dict
# cannot express): one surface form maps to SEVERAL candidate entities, and
# the winner is chosen by context-token overlap.  Every context term is
# drawn from the documents-corpus closed word pool (kgspark.datagen) so the
# synthetic corpus genuinely exercises both senses of each alias.
# alias -> [(candidate display name, context-term set)], candidates and
# terms sorted for determinism.  Term sets never contain an alias surface
# (so excluding/keeping neighbouring alias tokens in the context cannot
# change a score).
AMBIG_CANDIDATES: dict[str, list[tuple[str, tuple[str, ...]]]] = {
    "spark": [
        ("Apache Spark", ("agg", "join", "query", "sort", "table")),
        ("Spark Plug", ("big", "fast", "line", "slow", "small")),
    ],
    "stream": [
        ("Data Stream", ("batch", "data", "group", "row")),
        ("River Stream", ("big", "fast", "slow", "small")),
    ],
    "window": [
        ("Window Function", ("agg", "group", "order", "part")),
        ("Window Pane", ("big", "line", "small")),
    ],
}

# Tokens within +/- this many positions of a mention form its context.
AMBIG_CONTEXT_WINDOW = 3


def ambig_rows() -> list[tuple[str, str, str]]:
    """AMBIG_CANDIDATES flattened to (alias, candidate, term) rows, sorted."""
    return sorted(
        (a, cand, t)
        for a, cands in AMBIG_CANDIDATES.items()
        for cand, terms in cands
        for t in terms
    )


def ambig_values_sql() -> str:
    """Inline SQL VALUES table of the candidate terms (for DuckDB parity)."""
    rows = ", ".join(f"('{a}', '{c}', '{t}')" for a, c, t in ambig_rows())
    return f"(VALUES {rows}) AS ambig(alias, candidate, term)"


# Entity-type vocabulary for the synthetic web_pages fixture (FIXTURES.md §1).
WEB_ENTITY_TYPES = [
    "Person", "Organization", "Place", "Product", "Event",
    "Work", "Condition", "Symptom", "Disease",
]


def vocab_rows() -> list[tuple[str, str, str]]:
    """VOCAB as (surface, name, entity_type) rows, sorted for determinism."""
    return sorted((s, n, t) for s, (n, t) in VOCAB.items())


def vocab_values_sql() -> str:
    """Inline SQL VALUES table of the vocabulary (for DuckDB oracle parity)."""
    rows = ", ".join(f"('{s}', '{n}', '{t}')" for s, n, t in vocab_rows())
    return f"(VALUES {rows}) AS vocab(surface, name, entity_type)"


# URL-level quality screening (RefinedWeb-style pre-fetch filtering):
# shared CONFIG between the Spark operator and the oracle — never shared
# logic.  Tokens match against the lowercased full url.
SPAM_URL_TOKENS: tuple[str, ...] = ("casino", "xxx-", "-porn", "viagra", "freebet")
URL_MAX_PATH_DEPTH = 8
URL_MAX_QUERY_PARAMS = 4
URL_MAX_DIGIT_RATIO_MICRO = 500_000


# Page-level curation verdict thresholds (shared config, not logic).
CURATION_MIN_CHARS = 40
