"""Batched OpenIE-style triple extraction for web text — pandas UDF path.

The deterministic replacement of the reference's per-chunk LLM call
(extract_entities_and_relationships, runtime/src/pipeline/extractor.rs:71-100;
output schema EntitiesRelationships, runtime/src/ai/schemas.rs:77-96): a
vectorized pandas UDF that emits, per chunk, typed entity mentions from a
closed multiword vocabulary plus (subject, predicate, object) relationships
from sentence templates.  Missing structured output in the reference degrades
to an empty extraction rather than an error (ai/responses.rs:219-221) — the
UDF mirrors that: unparseable text yields empty arrays.

Unlike :mod:`kgspark.extraction` (single-token vocab, pure Catalyst), this
path handles multiword surface forms and emits relationships by *surface
name*, so the downstream fold must resolve names → entity ids with the
doc-scoped lower(trim) key join and DROP relationships referencing unknown
entities — exactly the reference's J2 semantics (pipeline/pipeline.rs:313-373,
drop-unknown at :364-373).

Scale: Arrow-batched, regex compiled once per executor; per-row work is
O(len(text)); no shuffle introduced by the UDF itself.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from . import datagen

# ---- compiled once per process -------------------------------------------

_VOCAB = {name.lower(): (name, etype) for name, etype in datagen.WEB_ENTITIES}
# Case-insensitive with word-boundary lookarounds: surface variants
# ("ada lovelace", "ACME CORP") resolve through _VOCAB to the canonical
# cased name — the deterministic analog of the reference's naming contract
# (ai/schemas.rs:132-135: the LLM is told to emit canonical-cased names for
# any surface form it reads); the lookarounds stop matches inside words
# ("Parisian" is not Paris) while still allowing "I.B.M." (dot-final names
# have no trailing word character to collide with).
_ENTITY_RE = re.compile(
    "(?<![A-Za-z])(?:"
    + "|".join(
        re.escape(n)
        for n, _ in sorted(datagen.WEB_ENTITIES, key=lambda x: -len(x[0]))
    )
    + ")(?![A-Za-z])",
    re.IGNORECASE,
)
_PRED_ALT = "|".join(
    re.escape(p) for p in sorted(datagen.PREDICATES, key=len, reverse=True)
)
# Relation scan is per sentence (terminated by . ! or ?): predicate phrases
# match case-insensitively between whitespace and are normalized to lowercase
# keywords on emission.  A sentence may carry several predicate "events"
# (coordinated clauses) and passive-voice events; boundaries between
# consecutive events delimit the subject/object spans.
_SENT_RE = re.compile(r"[^.!?]*[.!?]")
_PRED_RE = re.compile(rf"(?<=\s)(?:{_PRED_ALT})(?=\s)", re.IGNORECASE)
# Passive voice: "<patient> was <participle> by <agent>" inverts surface
# order vs semantic direction.  Participles map back to the active predicate
# vocabulary; only predicates with a natural passive form participate.
_PASSIVE_PARTICIPLES = {
    "founded": "founded",
    "created": "created",
    "written": "wrote",
    "visited": "visited",
    "indicated": "indicates",
}
_PASSIVE_RE = re.compile(
    r"(?<=\s)(?:was|were|is|are|has been|have been|had been)\s+(?P<part>"
    + "|".join(_PASSIVE_PARTICIPLES)
    + r")\s+by(?=\s)",
    re.IGNORECASE,
)
# A subject span that ends in a coordinating conjunction ("... Globex and",
# "... London, and") marks a shared-subject coordination: the clause borrows
# the previous event's subject ("X works at A and lives in B").
_COORD_TAIL_RE = re.compile(r"(?:(?:^|\s)and|,)\s*$", re.IGNORECASE)
# Gap between coordinated object entities: ",", "and", ", and" only.
_COORD_GAP_RE = re.compile(r"\s*(?:,|,?\s*and)\s+", re.IGNORECASE)
# Negation polarity: a negator adjoining the predicate on its left flips the
# statement ("X never visited B", "X did not acquire Y", "X was not founded
# by Y" — the broken-passive form falls through to the active scan and is
# caught here too).  The event is dropped, not inverted: the closed relation
# vocabulary has no negative predicates, matching the reference's schema
# (ai/schemas.rs:77-96 carries no polarity field).
_NEG_TAIL_RE = re.compile(
    r"\b(?:not|never|no longer|n't|didn't|doesn't|don't|won't|wouldn't|"
    r"cannot|can't|hasn't|hadn't|haven't|isn't|wasn't|weren't|aren't)"
    r"(?:\s+(?:been|be|yet|ever|again))*\s*$",
    re.IGNORECASE,
)

# Bounded pronoun coreference (subject position only): when the subject
# span's head — the last name-like token before the predicate — is a
# pronoun, it resolves to the most recent type-compatible subject from the
# SAME or the PREVIOUS sentence.  A deterministic, sentence-local rule, not
# a model: He/She want a Person antecedent; It wants a non-Person; They
# takes the most recent subject of any type.  No antecedent in the window →
# the pronoun passes through unresolved and the relationship dies at the J2
# drop-unknown join (a bounded FN, never a wrong triple) — this also fixes
# the pre-coref FP where "X founded A and he visited B" blamed A for the
# second clause (the nearest-mention rule saw A as the closest subject).
_PRONOUN_RE = re.compile(r"\b(?P<p>he|she|it|they)\b", re.IGNORECASE)
_CANONICAL_NAMES = {name for name, _ in datagen.WEB_ENTITIES}


def _pronoun_antecedent(pron: str, candidates: list[tuple[str, str]]) -> str | None:
    """Newest-first scan of (name, type) subject candidates."""
    pron = pron.lower()
    for name, etype in reversed(candidates):
        if pron in ("he", "she"):
            if etype == "Person":
                return name
        elif pron == "it":
            if etype != "Person":
                return name
        else:  # they
            return name
    return None


_PRON_TAIL_RE = re.compile(
    r"^(?:[\s,]+|never|not|no longer|later|then|also|still|again|ever|once|"
    r"soon|first|finally|often|recently|reportedly|previously|subsequently|"
    r"eventually)*$",
    re.IGNORECASE,
)

# Possessive pronoun subject heads ("Its CEO visited ...", "Their engineers
# work at ...") — the r4-verdict-prescribed next bounded coref class: the
# possessive resolves to an antecedent under the SAME one-sentence window and
# type rule as the plain pronouns (his/her → Person, its → non-Person,
# their → any), and the statement is attributed to the antecedent (genitive
# metonymy: "Acme Corp's CEO visited Paris" is knowledge about Acme Corp in
# this closed vocabulary, whose head nouns are never entities).  Safety is
# unchanged: the rule fires only when the subject span contains NO entity
# mention at all (an entity outranks, exactly like _last_pronoun_head's
# guard — this also keeps subordinate-clause possessives from stealing a
# main-clause entity subject) and the possessive NP directly precedes the
# predicate (1-3 plain word tokens); an unresolvable possessive passes the
# raw span through to die at the J2 drop-unknown join — bounded FN, never a
# wrong triple.
_POSS_RE = re.compile(r"^\s*(?P<p>his|her|its|their)\b", re.IGNORECASE)
_POSS_TAIL_RE = re.compile(r"^(?:\s+[A-Za-z][A-Za-z'\-]*){1,3}[\s,]*$")
_POSS_TO_PRON = {"his": "he", "her": "she", "its": "it", "their": "they"}


def _possessive_head(span: str) -> str | None:
    """The possessive pronoun heading a span's subject NP, if any.

    "Heading" is literal: the possessive must be the span's FIRST token
    ("Its CEO visited ..."), not merely precede the predicate.  A
    possessive embedded inside a larger subject NP ("The town and its
    residents visited ...") is NOT a genitive-metonymy subject — firing
    there would attribute the statement to the PREVIOUS sentence's
    subject, a wrong triple; the embedded case passes the raw span
    through to die at the J2 drop-unknown join instead (bounded FN)."""
    m = _POSS_RE.match(span)
    if m is None:
        return None
    if _ENTITY_RE.search(span):
        return None  # an entity mention anywhere in the span outranks
    if not _POSS_TAIL_RE.match(span[m.end() :]):
        return None
    return m.group("p").lower()


# Passive-agent pronouns ("The Engine was created by her."): the object-case
# twin of the subject rule — the agent span after "by" is exactly one object
# pronoun, resolved under the same one-sentence window and type rule
# (him → Person, it → non-Person, them → any).  Strict shape (nothing but
# the pronoun and trailing punctuation) and an unresolved/type-mismatched
# agent passes the raw span to the J2 drop — bounded FN, never a wrong
# triple.  An entity in the agent span never reaches this rule (the span
# fails the pronoun-only shape), so existing passive semantics are intact.
_OBJ_PRON_RE = re.compile(r"^\s*(?P<p>him|her|it|them)[\s,]*$", re.IGNORECASE)
_OBJ_TO_PRON = {"him": "he", "her": "she", "it": "it", "them": "they"}


def _passive_agent(span: str, window: list[tuple[str, str]]) -> str:
    m = _OBJ_PRON_RE.match(span)
    if m is not None:
        return (
            _pronoun_antecedent(_OBJ_TO_PRON[m.group("p").lower()], window)
            or span.strip()
        )
    return _resolve_name(span, last=False)


def _last_pronoun_head(span: str) -> str | None:
    """The subject-head pronoun of a span, if any: the last pronoun token,
    provided (a) no entity mention follows it (an entity nearer the
    predicate outranks the pronoun) and (b) nothing but adverbs/negators
    sits between the pronoun and the predicate — a pronoun buried in a
    subordinate or appositive clause ('Alan Turing, although he was tired,
    visited Paris' / '... Acme Corp, where he worked, indicates ...') is
    the subject of THAT clause, not of the predicate, so the entity rule
    keeps the span ('he later' / 'she never' remain subject heads)."""
    prons = list(_PRONOUN_RE.finditer(span))
    if not prons:
        return None
    last_ent = None
    for m in _ENTITY_RE.finditer(span):
        last_ent = m
    if last_ent is not None and last_ent.end() > prons[-1].start():
        return None
    if not _PRON_TAIL_RE.match(span[prons[-1].end() :]):
        return None
    return prons[-1].group("p")


EXTRACTION_SCHEMA = StructType(
    [
        StructField(
            "entities",
            ArrayType(
                StructType(
                    [
                        StructField("entity_name", StringType()),
                        StructField("entity_type", StringType()),
                        StructField("entity_description", StringType()),
                        StructField("first_offset", IntegerType()),
                    ]
                )
            ),
        ),
        StructField(
            "relationships",
            ArrayType(
                StructType(
                    [
                        StructField("source_entity", StringType()),
                        StructField("target_entity", StringType()),
                        StructField("relationship_keywords", ArrayType(StringType())),
                        StructField("relationship_description", StringType()),
                    ]
                )
            ),
        ),
    ]
)


def _resolve_name(span: str, last: bool) -> str:
    """Resolve a subject/object span to a clean vocabulary entity name.

    Mirrors the reference's naming contract (ai/schemas.rs:132-135: the LLM
    is instructed to emit consistent canonical-cased names, which is what
    makes the downstream name→id join work).  We take the entity mention
    nearest the predicate (last match for subjects, first for objects); spans
    with no known mention pass through trimmed — those relationships then hit
    the drop-unknown path of the J2 join (pipeline/pipeline.rs:364-373).
    """
    matches = list(_ENTITY_RE.finditer(span))
    if not matches:
        return span.strip()
    m = matches[-1] if last else matches[0]
    return _VOCAB[m.group(0).lower()][0]


def _coordinated_objects(span: str) -> list[str]:
    """Resolve an object span that runs to the sentence end.

    Coordinated objects ("X collaborated with A and B") expand to one name
    per entity when the text between consecutive entity mentions is purely a
    conjunction (",", "and", ", and"); otherwise only the mention nearest the
    predicate counts ("X visited Paris, a city of lights" → Paris).
    """
    matches = list(_ENTITY_RE.finditer(span))
    if not matches:
        return [span.strip()]
    names = [_VOCAB[matches[0].group(0).lower()][0]]
    for prev, cur in zip(matches, matches[1:]):
        gap = span[prev.end() : cur.start()]
        if not _COORD_GAP_RE.fullmatch(gap):
            break
        names.append(_VOCAB[cur.group(0).lower()][0])
    return names


def _sentence_rels(
    sent: str, prev_subjects: list[tuple[str, str]] | None = None
) -> tuple[list[dict], list[tuple[str, str]]]:
    """One sentence (with trailing terminator) → (relation dicts, subjects).

    Events are passive-voice matches plus active predicate matches outside
    them, scanned left to right; the span between consecutive events bounds
    each event's subject (left) and object (right) text.  Simple active
    sentences ("X pred Y.") take exactly the single-event path, byte-for-byte
    identical to the pre-coordination scan — the synthetic-corpus oracle
    contract depends on that.

    ``prev_subjects`` carries the previous sentence's resolved vocabulary
    subjects (oldest first) for the bounded pronoun-coreference rule; the
    second return value is this sentence's own resolved subjects, fed to the
    next sentence by :func:`extract_chunk_py`.
    """
    events: list[tuple[int, int, str, str]] = []  # (start, end, kind, pred)
    for m in _PASSIVE_RE.finditer(sent):
        events.append(
            (m.start(), m.end(), "passive", _PASSIVE_PARTICIPLES[m.group("part").lower()])
        )
    passive_spans = [(s, e) for s, e, _, _ in events]
    for m in _PRED_RE.finditer(sent):
        if any(s <= m.start() < e for s, e in passive_spans):
            continue  # participle inside a passive event is not an active verb
        events.append((m.start(), m.end(), "active", m.group(0).lower()))
    events.sort()
    rels: list[dict] = []
    cur_subjects: list[tuple[str, str]] = []  # resolved vocab subjects, in order
    window = list(prev_subjects or [])  # + cur_subjects at lookup time
    prev_subj: str | None = None
    prev_neg = False  # was the previous clause's shared-subject VP negated?
    for i, (start, end, kind, pred) in enumerate(events):
        left = sent[events[i - 1][1] : start] if i else sent[:start]
        last_event = i + 1 == len(events)
        # the final event's object span stops before the sentence terminator
        right = sent[end : events[i + 1][0]] if not last_event else sent[end:-1]
        if kind == "passive":
            # semantic subject (agent) follows "by"; patient precedes the aux.
            # A lone object-pronoun agent resolves through the coref window.
            subj = _passive_agent(right, window + cur_subjects)
            objs = [_resolve_name(left, last=True)]
            neg = False
        else:
            borrowed = bool(
                i and prev_subj is not None and _COORD_TAIL_RE.search(left)
            )
            if borrowed:
                # shared-subject coordination; a negator on the first VP
                # scopes over the whole chain ("X never lived in A and
                # worked at B" negates both conjuncts) — carried by
                # prev_neg, set when the negated clause was skipped (the
                # coordination tail itself ends in "and"/"," so it can
                # never also end in a negator)
                subj = prev_subj
                neg = prev_neg
            else:
                pron = _last_pronoun_head(left)
                poss = _possessive_head(left) if pron is None else None
                if pron is not None:
                    # pronoun is the subject head: resolve it or die at the
                    # J2 drop-unknown join — never fall back to an earlier
                    # entity mention in the span (that's the FP mode)
                    subj = (
                        _pronoun_antecedent(pron, window + cur_subjects)
                        or pron
                    )
                elif poss is not None:
                    # possessive subject head: same window/type rule via the
                    # pronoun mapping; unresolved → raw span → J2 drop
                    subj = (
                        _pronoun_antecedent(
                            _POSS_TO_PRON[poss], window + cur_subjects
                        )
                        or left.strip()
                    )
                else:
                    subj = _resolve_name(left, last=True)
                neg = bool(_NEG_TAIL_RE.search(left))
            if neg:
                # negated statement — no triple (polarity, not span), but the
                # clause still BINDS the sentence subject: a following
                # coordinated VP must borrow the real subject, never fall
                # through to the negated clause's object
                if subj:
                    prev_subj, prev_neg = subj, True
                    if subj in _CANONICAL_NAMES:
                        cur_subjects.append((subj, _VOCAB[subj.lower()][1]))
                continue
            # coordinated objects only when no further event follows — a
            # trailing entity before the next predicate is that clause's
            # subject, not an extra object
            objs = _coordinated_objects(right) if last_event else [_resolve_name(right, last=False)]
        if not subj:
            # degenerate segment (dotted-acronym splits like "I.B.M. works
            # at X" leave a whitespace-only subject span) — nothing to emit;
            # matches the old single-regex scan, which required a non-empty
            # subject token before the predicate
            continue
        prev_subj, prev_neg = subj, neg
        if subj in _CANONICAL_NAMES:
            cur_subjects.append((subj, _VOCAB[subj.lower()][1]))
        for obj in objs:
            if not obj:
                continue
            rels.append(
                {
                    "source_entity": subj,
                    "target_entity": obj,
                    "relationship_keywords": pred.split(),
                    "relationship_description": f"{subj} {'_'.join(pred.split())} {obj}",
                }
            )
    return rels, cur_subjects


def extract_chunk_py(text: str) -> dict:
    """UDF kernel: one chunk's text → {entities, relationships} (testable)."""
    if not text or not text.strip():
        return {"entities": [], "relationships": []}
    ents: dict[str, dict] = {}
    for m in _ENTITY_RE.finditer(text):
        name, etype = _VOCAB[m.group(0).lower()]
        if name not in ents:  # first-wins within chunk
            ents[name] = {
                "entity_name": name,
                "entity_type": etype,
                "entity_description": f"{name} is a {etype}",
                "first_offset": m.start(),
            }
    rels = []
    prev_subjects: list[tuple[str, str]] = []
    for sm in _SENT_RE.finditer(text):
        # pronoun window = previous sentence + earlier events of this one
        sent_rels, prev_subjects = _sentence_rels(sm.group(0), prev_subjects)
        rels.extend(sent_rels)
    return {"entities": list(ents.values()), "relationships": rels}


@F.pandas_udf(EXTRACTION_SCHEMA)
def _extract_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    # Struct-typed pandas UDFs yield DataFrames: one column per struct field.
    for batch in batches:
        results = [extract_chunk_py(t or "") for t in batch]
        yield pd.DataFrame(
            {
                "entities": [r["entities"] for r in results],
                "relationships": [r["relationships"] for r in results],
            }
        )


# Deterministic kernel; flag = optimizer fence so the explode-generated
# size()>0 filter doesn't re-evaluate the extraction a second time
# (measured: duplicate ArrowEvalPython nodes without it).
extract_udf = _extract_udf.asNondeterministic()


def extract_from_chunks(chunks: DataFrame, text_col: str = "content") -> DataFrame:
    """chunks → per-chunk raw extraction result (entities+relationships).

    Carries chunk_id/doc_id/chunk_order_index through the UDF — Spark joins
    by key, never positionally (the reference's zip at pipeline.rs:315 is an
    ordering hazard we deliberately do not reproduce).
    """
    return chunks.withColumn("extraction", extract_udf(F.col(text_col)))
