"""Driver-side pure-Python reference implementation of the construction fold.

An independent, non-Spark restatement of the reference pipeline's semantics
(runtime/src/pipeline/pipeline.rs:204-414: per-doc chunk → extract → fold with
name→id HashMap resolution and entry-or-insert first-wins merges), used to

  * measure triple precision/recall of the distributed pipeline (the
    BASELINE.json P/R >= 0.95 gate — tests/test_pipeline.py), and
  * generate DuckDB ``VALUES`` oracles for the web_* entries in
    ``__spark_entry__.oracle_sql()``.

It shares only the per-row *kernels* (HTML→text, sentence chunking, per-chunk
extraction) with the Spark path; every cross-row semantic — dedup, first-wins
merge order, name resolution, drop-unknown — is re-implemented imperatively,
so agreement between the two is a genuine cross-check of the distributed
joins/aggregations, not a tautology.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from . import chunking, html_extract, spec, web_extraction


def _mdhash(content: str, prefix: str) -> str:
    """compute_mdhash_id analog (reference runtime/src/pipeline/utils.rs:130-136)."""
    return prefix + hashlib.sha256(content.encode("utf-8")).hexdigest()


@dataclass
class KGResult:
    docs: dict[str, dict] = field(default_factory=dict)          # doc_id -> row
    chunks: list[dict] = field(default_factory=list)
    entities: dict[str, dict] = field(default_factory=dict)      # entity_id -> row
    relations: dict[str, dict] = field(default_factory=dict)     # relation_id -> row

    @property
    def triples(self) -> set[tuple[str, str, str, str]]:
        return {
            (r["subj"], "_".join(r["relationship_keywords"]), r["obj"], r["doc_id"])
            for r in self.relations.values()
        }


def run(web_rows) -> KGResult:
    """web_pages rows (url, warc_ts, html, text, lang) → full KG fold.

    Rows are processed in (url, warc_ts) order for deterministic first-wins
    doc dedup; within a doc, chunks in order and extraction results in chunk
    order — the deterministic restatement of the reference's arrival-order
    folds (pipeline.rs:335-347, :383-393).
    """
    out = KGResult()
    seen_content: dict[str, str] = {}  # doc_id -> keeper url

    for url, warc_ts, html_b, _golden, lang in sorted(
        web_rows, key=lambda r: (str(r[0]), str(r[1]))
    ):
        text = html_extract.extract_text_py(html_b)
        content = text.replace("\r", "").strip()
        if not content:
            continue  # P4 empty filter
        doc_id = _mdhash(content, spec.DOC_PREFIX)
        if doc_id in seen_content:
            continue  # A4 first-wins dedup
        seen_content[doc_id] = url
        out.docs[doc_id] = {
            "doc_id": doc_id,
            "url": url,
            "warc_ts": warc_ts,
            "lang": lang,
            "content_length": len(content),
        }

        doc_chunks = chunking.chunk_sentences_py(content)
        name_index: dict[str, tuple[str, str]] = {}  # norm -> (entity_id, name)
        pending_rels: list[tuple[int, dict]] = []

        for idx, chunk_text, n_tokens in doc_chunks:
            chunk_id = _mdhash(chunk_text, spec.CHUNK_PREFIX)
            out.chunks.append(
                {
                    "chunk_id": chunk_id,
                    "doc_id": doc_id,
                    "chunk_order_index": idx,
                    "content": chunk_text,
                    "n_tokens": n_tokens,
                }
            )
            ext = web_extraction.extract_chunk_py(chunk_text)
            for e in ext["entities"]:
                eid = _mdhash(
                    f"{doc_id}:{e['entity_name']}:{e['entity_type']}",
                    spec.ENTITY_PREFIX,
                )
                if eid not in out.entities:  # first-wins (A5)
                    out.entities[eid] = {
                        "entity_id": eid,
                        "entity_name": e["entity_name"],
                        "entity_type": e["entity_type"],
                        "entity_description": e["entity_description"],
                        "doc_id": doc_id,
                        "chunk_id": chunk_id,
                        "chunk_order_index": idx,
                        "first_offset": e["first_offset"],
                    }
                norm = e["entity_name"].strip().lower()
                if norm not in name_index:
                    name_index[norm] = (eid, e["entity_name"])
            for r in ext["relationships"]:
                pending_rels.append((idx, {**r, "chunk_id": chunk_id}))

        for idx, r in pending_rels:
            src = name_index.get(r["source_entity"].strip().lower())
            tgt = name_index.get(r["target_entity"].strip().lower())
            if src is None or tgt is None:
                continue  # J2 drop-unknown (pipeline.rs:364-373)
            rel_id = _mdhash(
                f"{doc_id}:{src[0]}:{tgt[0]}:{r['relationship_description']}",
                spec.RELATION_PREFIX,
            )
            if rel_id not in out.relations:  # first-wins (A6)
                out.relations[rel_id] = {
                    "relation_id": rel_id,
                    "doc_id": doc_id,
                    "chunk_id": r["chunk_id"],
                    "chunk_order_index": idx,
                    "source_entity_id": src[0],
                    "target_entity_id": tgt[0],
                    "subj": src[1],
                    "obj": tgt[1],
                    "relationship_keywords": r["relationship_keywords"],
                    "relationship_description": r["relationship_description"],
                }
    return out


def precision_recall(
    predicted: set[tuple], golden: set[tuple]
) -> tuple[float, float]:
    if not predicted or not golden:
        return (0.0, 0.0)
    tp = len(predicted & golden)
    return tp / len(predicted), tp / len(golden)
