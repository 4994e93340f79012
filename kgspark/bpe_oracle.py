"""Driver-computed oracle for the learned-BPE token counts (fixed corpus).

The merge table is shared metadata (trained once, deterministically — the
same status as the LSH plane constants and minhash coefficients); the
APPLICATION is what the oracle independently re-derives: it replays the
merge list in training order (textbook formulation), while the distributed
kernel merges greedily by lowest rank.  The two formulations are provably
equivalent for BPE, so agreement cross-checks the distributed path without
shared application code.
"""

from __future__ import annotations

from functools import lru_cache

from . import datagen
from .bpe import _words, apply_bpe_replay, train_bpe
from .web_oracles import WEB_N, WEB_SEED

N_MERGES = 200


@lru_cache(maxsize=1)
def corpus_and_merges() -> tuple[list[tuple[str, str]], list[tuple[str, str]]]:
    """((url, text) rows in url order, trained merge list)."""
    rows = sorted(
        datagen.web_pages_rows(WEB_N, WEB_SEED), key=lambda r: str(r[0])
    )
    # ASCII-space trim mirrors the Spark-side F.trim filter exactly
    kept = [(r[0], r[3]) for r in rows if (r[3] or "").strip(" ")]
    merges = train_bpe([t for _, t in kept], N_MERGES)
    return kept, merges


@lru_cache(maxsize=1)
def build() -> dict[str, str]:
    kept, merges = corpus_and_merges()
    values = []
    for url, text in kept:
        ws = _words(text)
        n_tok = sum(len(apply_bpe_replay(w, merges)) for w in ws)
        u = url.replace("'", "''")
        values.append(f"('{u}', {n_tok}, {len(ws)})")
    rows_sql = ", ".join(values)
    return {
        "web_bpe_token_counts": (
            "SELECT url, CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens, "
            "CAST(n_words AS BIGINT) AS n_words "
            f"FROM (VALUES {rows_sql}) AS t(url, n_bpe_tokens, n_words)"
        )
    }
