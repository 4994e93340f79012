"""Content-addressed identity columns.

The reference derives every id as ``prefix + hex(sha256(content))``
(``compute_mdhash_id``, reference runtime/src/pipeline/utils.rs:130-136); the
composite keys are:

  doc-      <- full sanitized content           (pipeline/pipeline.rs:478)
  chunk-    <- chunk text                       (pipeline/chunker.rs:72)
  entity-   <- "{doc_id}:{entity_name}:{entity_type}"
                                                (pipeline/pipeline.rs:322-333)
  relation- <- "{doc_id}:{source_id}:{target_id}:{description}"
                                                (pipeline/pipeline.rs:375-381)

All pure built-in Catalyst expressions (``sha2``/``concat_ws``) — JVM-side,
codegen-friendly, and deterministic, which is what makes the whole pipeline
idempotent: re-runs MERGE to the same keys, and resume is an anti-join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import spec


def sha256_hex(col: Column | str) -> Column:
    return F.sha2(F.col(col) if isinstance(col, str) else col, 256)


def _prefixed(prefix: str, payload: Column) -> Column:
    return F.concat(F.lit(prefix), F.sha2(payload, 256))


def doc_id(text: Column | str) -> Column:
    """doc-<sha256(text)> — content identity of a document."""
    c = F.col(text) if isinstance(text, str) else text
    return _prefixed(spec.DOC_PREFIX, c)


def chunk_id(chunk_text: Column | str) -> Column:
    """chunk-<sha256(chunk_text)>."""
    c = F.col(chunk_text) if isinstance(chunk_text, str) else chunk_text
    return _prefixed(spec.CHUNK_PREFIX, c)


def entity_id(doc: Column, name: Column, entity_type: Column) -> Column:
    """entity-<sha256(doc_id:name:type)>."""
    return _prefixed(spec.ENTITY_PREFIX, F.concat_ws(":", doc, name, entity_type))


def relation_id(doc: Column, src_id: Column, tgt_id: Column, description: Column) -> Column:
    """relation-<sha256(doc_id:src_id:tgt_id:description)>."""
    return _prefixed(
        spec.RELATION_PREFIX, F.concat_ws(":", doc, src_id, tgt_id, description)
    )


def canonical_id(name: Column | str) -> Column:
    """canon-<sha256(canonical_name)> — id of a canonicalized entity."""
    c = F.col(name) if isinstance(name, str) else name
    return _prefixed(spec.CANON_PREFIX, c)
