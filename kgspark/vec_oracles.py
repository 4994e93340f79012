"""Driver-computed oracle for the planted-duplicate LSH recall gate.

Independent imperative restatement (pure Python loops, no Spark, no shared
operator code) of: exact cosine pairs at threshold >= 0.9 over the planted
corpus (kgspark.datagen.planted_embeddings_rows), the random-hyperplane
Hamming<=1 candidate set, and the recall of the latter against the former.
Emitted as a constant SELECT the driver runs in DuckDB — the same pattern as
kgspark.media_oracles / web_oracles for fixed-corpus queries.

Float discipline: every dot product is a sequential left fold in index order
(the arithmetic Spark's ``aggregate``/DuckDB's ``list_aggregate`` use), so
sign decisions at the bucket boundary and round-6 cosines agree bit-for-bit
with the DataFrame operators.  Only the plane constants
(:func:`kgspark.vecops.make_planes`) are shared, mirroring how the minhash
oracle shares permutation coefficients.
"""

from __future__ import annotations

import math
from functools import lru_cache

from . import datagen
from .vecops import make_planes

RECALL_THRESHOLD = 0.9
RECALL_N_PLANES = 6  # cosine_pairs_lsh defaults (multiprobe=1 -> Hamming<=1)


def _dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _round6(x: float) -> float:
    # HALF_UP like Spark/DuckDB round() (Python round() is banker's)
    return math.floor(x * 1e6 + 0.5) / 1e6 if x >= 0 else -math.floor(-x * 1e6 + 0.5) / 1e6


@lru_cache(maxsize=1)
def _recall_stats() -> tuple[int, int, float]:
    rows = datagen.planted_embeddings_rows()
    ids = [r[0] for r in rows]
    vecs = [r[1] for r in rows]
    dim = len(vecs[0])
    norms = [math.sqrt(_dot(v, v)) for v in vecs]

    planes = make_planes(dim, RECALL_N_PLANES)
    buckets = []
    for v in vecs:
        sig = 0
        for i, p in enumerate(planes):
            if _dot(v, p) >= 0:
                sig += 1 << i
        buckets.append(sig)

    n_true = 0
    n_found = 0
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            cos = _round6(_dot(vecs[i], vecs[j]) / (norms[i] * norms[j]))
            if cos >= RECALL_THRESHOLD:
                n_true += 1
                if bin(buckets[i] ^ buckets[j]).count("1") <= 1:
                    n_found += 1
    assert ids == sorted(ids)
    recall = _round6(n_found / n_true) if n_true else 0.0
    return n_true, n_found, recall


def build() -> dict[str, str]:
    n_true, n_found, recall = _recall_stats()
    return {
        "dedup_embedding_recall": (
            f"SELECT CAST({n_true} AS BIGINT) AS n_true_pairs, "
            f"CAST({n_found} AS BIGINT) AS n_found, "
            f"CAST({recall!r} AS DOUBLE) AS recall"
        )
    }
