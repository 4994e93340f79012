"""Training-data text operations: dedup family, language ID, quality, fingerprints.

These are the large-scale corpus-pipeline operators layered on top of the KG
engine (the reference's only cross-doc linking idea is a commented-out ANN
prototype, runtime/src/examples/deduplication.rs:109-163 — here the family is
real and tested).

Scale design notes:
  * Everything except MinHash banding is a narrow projection (higher-order
    array functions) — zero shuffles until the final group/join.
  * MinHash signatures are computed per-row (narrow); LSH banding turns the
    O(n²) pair space into a per-band groupBy — ONE shuffle on band keys; the
    candidate self-join happens within buckets only.
  * The shared hash primitive is md5-derived 60-bit ints (`_hash60`), chosen
    because it is reproducible in any engine (the DuckDB oracle recomputes it
    exactly) — no dependence on Spark-internal hash functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import ids

# English function words used by the n-gram/stopword language heuristic.
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

MINHASH_K = 16          # number of minhash permutations
LSH_BAND_ROWS = 4       # rows per band → 4 bands of 4
SHINGLE_N = 3           # token-shingle width
MINHASH_P = 2147483647  # 2^31-1: affine-permutation modulus (fits int64 math)


def minhash_perm_coeffs(j: int) -> tuple[int, int]:
    """Seeded (a_j, b_j) for the j-th affine permutation, a_j != 0.

    Derived from md5 so any engine (the DuckDB oracle included) can
    reproduce them; exposed so oracle SQL generation shares the constants.
    """
    import hashlib

    a = int(hashlib.md5(f"mh-a:{j}".encode()).hexdigest()[:15], 16) % (MINHASH_P - 1) + 1
    b = int(hashlib.md5(f"mh-b:{j}".encode()).hexdigest()[:15], 16) % MINHASH_P
    return a, b


def _toks(text_col: str = "text") -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def with_doc_identity(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """kg_doc_id + text digest columns (the per-url digest check surface)."""
    return docs.withColumn(
        "kg_doc_id", ids.doc_id(F.trim(F.col(text_col)))
    ).withColumn("text_sha256", F.sha2(F.col(text_col), 256))


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting + type-token ratio per document (narrow, no shuffle)."""
    t = _toks(text_col)
    return docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        ids.doc_id(F.trim(F.col(text_col))).alias("kg_doc_id"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_distinct_tokens"),
        F.round(
            F.size(F.array_distinct(t)) / F.size(t), 6
        ).alias("type_token_ratio"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: length, mean token length, stopword ratio.

    The classic pre-training quality filters (C4/Gopher-style) re-expressed
    as pure Catalyst projections.
    """
    t = _toks(text_col)
    stop = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop, x)))
    return docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        ids.doc_id(F.trim(F.col(text_col))).alias("kg_doc_id"),
        F.size(t).cast("long").alias("n_tokens"),
        F.round(F.length(F.trim(F.col(text_col))) / F.size(t), 6).alias(
            "mean_token_len"
        ),
        F.round(n_stop / F.size(t), 6).alias("stopword_ratio"),
        (
            (F.size(t) >= 10)
            & (n_stop / F.size(t) >= 0.05)
        ).alias("passes_quality"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio language heuristic (en vs unknown).

    A real fastText-style model would ride in a pandas UDF; the heuristic is
    the deterministic, oracle-checkable stand-in with the same plan shape.
    """
    t = _toks(text_col)
    stop = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    score = F.round(
        F.size(F.filter(t, lambda x: F.array_contains(stop, x))) / F.size(t), 6
    )
    return docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        ids.doc_id(F.trim(F.col(text_col))).alias("kg_doc_id"),
        score.alias("en_score"),
        F.when(score >= 0.05, F.lit("en")).otherwise(F.lit("unknown")).alias(
            "predicted_lang"
        ),
    )


# BPE-ish pre-tokenization classes: letter runs, digit runs, single
# punctuation marks (the GPT-2 pattern family minus unicode categories).
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting under a BPE-ish pre-tokenizer regex (narrow, no UDF).

    ``regexp_extract_all`` stays in codegen; counts approximate what a real
    BPE vocabulary would see far better than whitespace splits (punctuation
    detaches, digit runs separate).
    """
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_PATTERN), 0)
    return docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        ids.doc_id(F.trim(F.col(text_col))).alias("kg_doc_id"),
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_bpe_tokens"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-insensitive document fingerprint: sha256 of the sorted vocab set."""
    t = _toks(text_col)
    return docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        ids.doc_id(F.trim(F.col(text_col))).alias("kg_doc_id"),
        F.sha2(F.array_join(F.array_sort(F.array_distinct(t)), " "), 256).alias(
            "vocab_fingerprint"
        ),
    )


def dedup_exact(docs: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash, first-wins by smallest source key.

    Mirrors the reference's enqueue dedup (A4, pipeline/pipeline.rs:461-470:
    ``unique_contents`` keeps the first file_path per content).  One shuffle
    on the content hash (uniform by construction — no skew).
    """
    return (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .groupBy(F.sha2(F.trim(F.col(text_col)), 256).alias("content_sha256"))
        .agg(
            F.min(key_col).alias("keep_key"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _hash60(col: Column) -> Column:
    """Engine-portable 60-bit hash: int(md5(x)[0:15], 16).

    Reproducible in DuckDB as CAST('0x' || substr(md5(x),1,15) AS BIGINT);
    60 bits keeps it inside a signed int64 in every engine.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _shingles(t: Column, n: int = SHINGLE_N) -> Column:
    """Distinct n-token shingles of a token array (empty if < n tokens)."""
    return F.array_distinct(
        F.when(F.size(t) < n, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(t) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + 1 + j) for j in range(n)]
                ),
            )
        )
    )


def minhash_row_py(text: str, k: int = MINHASH_K) -> list[int] | None:
    """Kernel: one document's minhash signature (None if < SHINGLE_N tokens).

    Arithmetic is engine-portable and shared verbatim with the DuckDB oracle:
    shingle -> int(md5[:15],16) % (2^31-1), then k affine permutations
    (a_j*h + b_j) mod p, min per permutation.
    """
    import hashlib
    import re

    toks = re.split(r"\s+", text.strip(), flags=re.ASCII) if text and text.strip() else []
    if len(toks) < SHINGLE_N:
        return None
    shingles = {
        " ".join(toks[i : i + SHINGLE_N]) for i in range(len(toks) - SHINGLE_N + 1)
    }
    hs = [
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P
        for s in shingles
    ]
    out = []
    for j in range(k):
        a, b = minhash_perm_coeffs(j)
        out.append(min((a * h + b) % MINHASH_P for h in hs))
    return out


def minhash_signatures(docs: DataFrame, text_col: str = "text", k: int = MINHASH_K) -> DataFrame:
    """K-permutation MinHash signature over token 3-gram shingles.

    Arrow-batched mapInPandas over the pruned text column.  A pure-Catalyst
    formulation exists but loses: shingle construction + k permutation scans
    run as *interpreted* higher-order-function lambdas (never codegen'd) —
    measured 7x slower than this kernel at sf0.1.  Only (text) crosses into
    Python; the signature is (k+1) longs per row out.  Columns mh0..mh{k-1}
    stay flat so downstream banding and the DuckDB oracle are trivial.
    """
    import pandas as pd

    fields = ", ".join(["kg_doc_id string"] + [f"mh{j} long" for j in range(k)])

    def gen(batches):
        import hashlib

        for pdf in batches:
            rows = []
            for text in pdf["_text"]:
                t = (text or "").strip()
                if not t:
                    continue
                sig = minhash_row_py(t, k)
                if sig is None:
                    continue
                doc_id = "doc-" + hashlib.sha256(t.encode()).hexdigest()
                rows.append([doc_id, *sig])
            yield pd.DataFrame(
                rows, columns=["kg_doc_id"] + [f"mh{j}" for j in range(k)]
            )

    pruned = docs.select(F.col(text_col).alias("_text"))
    return pruned.mapInPandas(gen, schema=fields)


def lsh_candidate_pairs(
    docs: DataFrame, text_col: str = "text", k: int = MINHASH_K, band_rows: int = LSH_BAND_ROWS
) -> DataFrame:
    """Near-duplicate candidate pairs via LSH banding of minhash signatures.

    Docs sharing any band hash become a candidate pair.  Plan: signatures
    (narrow) → explode k/band_rows band keys → self-join within band buckets
    (shuffle on band hash only) → distinct pairs.  This is the
    O(n²)→O(n·bucket) reduction that makes near-dup feasible at 100 TB.
    """
    sig = minhash_signatures(docs, text_col, k)
    n_bands = k // band_rows
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.sha2(
                    F.concat_ws(
                        ":",
                        *[F.col(f"mh{b * band_rows + r}") for r in range(band_rows)],
                    ),
                    256,
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = sig.select("kg_doc_id", F.explode(bands).alias("b")).select(
        "kg_doc_id", F.col("b.band").alias("band"), F.col("b.band_hash").alias("band_hash")
    )
    # Explicit shuffle on the band key: the self-join's two branches then
    # share ONE identical exchange (ReuseExchange), so the signature pipeline
    # is computed once instead of once per side — measured ~2x on the full
    # operator — and the join itself needs no further shuffle.
    exploded = exploded.repartition("band", "band_hash")
    left = exploded.alias("l")
    right = exploded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.kg_doc_id") < F.col("r.kg_doc_id")),
        )
        .select(
            F.col("l.kg_doc_id").alias("doc_a"),
            F.col("r.kg_doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return pairs


def shingle_sets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(kg_doc_id, shingles array<string>) via an Arrow-batched kernel.

    Same rationale as minhash_signatures: Catalyst's higher-order-function
    shingle construction runs interpreted (measured ~7x slower)."""
    import pandas as pd

    def gen(batches):
        import hashlib
        import re

        for pdf in batches:
            ids_, shs = [], []
            for text in pdf["_text"]:
                t = (text or "").strip()
                if not t:
                    continue
                toks = re.split(r"\s+", t, flags=re.ASCII)
                if len(toks) < SHINGLE_N:
                    continue
                seen, ordered = set(), []
                for i in range(len(toks) - SHINGLE_N + 1):
                    s = " ".join(toks[i : i + SHINGLE_N])
                    if s not in seen:
                        seen.add(s)
                        ordered.append(s)
                ids_.append("doc-" + hashlib.sha256(t.encode()).hexdigest())
                shs.append(ordered)
            yield pd.DataFrame({"kg_doc_id": ids_, "shingles": shs})

    return docs.select(F.col(text_col).alias("_text")).mapInPandas(
        gen, schema="kg_doc_id string, shingles array<string>"
    )


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.8
) -> DataFrame:
    """Exact n-gram Jaccard over LSH candidate pairs (verify step of MinHash).

    Candidate generation is the LSH join above; this stage re-joins the
    shingle sets for candidates only and computes exact Jaccard — the
    standard two-phase near-dup at scale.
    """
    sh = shingle_sets(docs, text_col)
    pairs = lsh_candidate_pairs(docs, text_col)
    j = (
        pairs.join(sh.withColumnRenamed("kg_doc_id", "doc_a").withColumnRenamed("shingles", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("kg_doc_id", "doc_b").withColumnRenamed("shingles", "sh_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold)


def simhash_row_py(text: str, bits: int = 32) -> int | None:
    """Kernel: one document's simhash (None for empty text).

    Engine-portable arithmetic shared with the DuckDB oracle: per distinct
    token h = int(md5[:15],16); bit b votes +1 if (h>>b)&1 else -1; the
    fingerprint sets bit b where the vote is positive.
    """
    import hashlib
    import re

    t = (text or "").strip()
    if not t:
        return None
    toks = re.split(r"\s+", t, flags=re.ASCII)
    # list (not set) over first-occurrence-distinct tokens: mirrors the
    # oracle's list_transform(list_distinct(toks), ...) exactly
    hs = [
        int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        for tok in dict.fromkeys(toks)
    ]
    sim = 0
    for b in range(bits):
        vote = sum(1 if (h >> b) & 1 else -1 for h in hs)
        if vote > 0:
            sim |= 1 << b
    return sim


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 32) -> DataFrame:
    """SimHash fingerprint from per-token 60-bit hashes (default 32 bits).

    Arrow-batched kernel (the pure-Catalyst bit-vote fold runs 32 interpreted
    ``aggregate`` lambdas per row — measured ~8x slower).  Hamming-distance
    bucketing downstream can reuse the same banding trick as MinHash.
    """
    import pandas as pd

    def gen(batches):
        import hashlib

        for pdf in batches:
            ids_, sims = [], []
            for text in pdf["_text"]:
                s = simhash_row_py(text, bits)
                if s is None:
                    continue
                ids_.append(
                    "doc-" + hashlib.sha256(text.strip().encode()).hexdigest()
                )
                sims.append(s)
            yield pd.DataFrame({"kg_doc_id": ids_, "simhash": sims})

    return docs.select(F.col(text_col).alias("_text")).mapInPandas(
        gen, schema="kg_doc_id string, simhash long"
    )
