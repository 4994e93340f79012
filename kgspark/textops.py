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


def minhash_signatures(docs: DataFrame, text_col: str = "text", k: int = MINHASH_K) -> DataFrame:
    """K-permutation MinHash signature over token 3-gram shingles.

    Narrow: per row, K minima over the shingle array — no shuffle, no UDF.
    Columns mh0..mh{k-1} (flat columns, not an array, so downstream banding
    and the DuckDB oracle both stay trivial).
    """
    t = _toks(text_col)

    # NB: PySpark higher-order-function lambdas are arity-inspected (a second
    # parameter receives the element index), so loop variables must be bound
    # via a factory, never via default args.
    def _perm_hash(j: int):
        return lambda s: _hash60(F.concat(F.lit(f"{j}:"), s))

    # Materialize the shingle array ONCE behind a projection: inlining the
    # expression into each of the k min-hash columns (and the filter) makes
    # Catalyst re-derive it k+1 times per row — measured 10x slowdown.
    base = docs.select(
        ids.doc_id(F.trim(F.col(text_col))).alias("kg_doc_id"),
        _shingles(t).alias("_sh"),
    ).filter(F.size("_sh") > 0)
    cols = [F.col("kg_doc_id")]
    for j in range(k):
        cols.append(F.array_min(F.transform("_sh", _perm_hash(j))).alias(f"mh{j}"))
    return base.select(*cols)


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


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.8
) -> DataFrame:
    """Exact n-gram Jaccard over LSH candidate pairs (verify step of MinHash).

    Candidate generation is the LSH join above; this stage re-joins the
    shingle sets for candidates only and computes exact Jaccard — the
    standard two-phase near-dup at scale.
    """
    t = _toks(text_col)
    sh = docs.filter(F.size(_shingles(_toks(text_col))) > 0).select(
        ids.doc_id(F.trim(F.col(text_col))).alias("kg_doc_id"),
        _shingles(t).alias("shingles"),
    )
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


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 32) -> DataFrame:
    """SimHash fingerprint from per-token 60-bit hashes (default 32 bits).

    Per-row bit-vote fold via ``aggregate`` over the token array — narrow, no
    shuffle, no UDF.  Hamming-distance bucketing downstream can reuse the
    same banding trick as MinHash.
    """
    t = _toks(text_col)
    hashes = F.transform(F.array_distinct(t), _hash60)

    def _vote(b: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    votes = [
        F.aggregate(hashes, F.lit(0).cast("long"), _vote(b)) for b in range(bits)
    ]
    sim = None
    for b, v in enumerate(votes):
        term = F.when(v > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        ids.doc_id(F.trim(F.col(text_col))).alias("kg_doc_id"),
        sim.alias("simhash"),
    )
