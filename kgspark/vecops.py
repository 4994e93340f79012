"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

The reference prototyped (and commented out) LanceDB ANN top-5 with a 0.5
distance cutoff for entity dedup (runtime/src/examples/deduplication.rs:109-163).
Here both the exact baseline and the scale path are real DataFrame operators
over an ``array<float>`` column.

Scale design: the query side is broadcast (top-k is almost always
few-queries × huge-corpus); dot products run as ``aggregate(zip_with(...))``
inside whole-stage codegen — no Python, no shuffle on the corpus; only the
final per-query top-k window shuffles (tiny: k rows per query).  The
random-hyperplane LSH variant buckets the corpus once (narrow projection) and
probes only matching buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double") * x))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, neighbor_id, cosine, rank).

    Self-matches excluded.  Queries are broadcast; ties broken by neighbor id
    so results are fully deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _rp_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: one sign bit per plane, packed to a long."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        sig = sig + F.when(_dot(vec, plane) >= 0, F.lit(2 ** i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def make_planes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy RNG state leakage)."""
    import hashlib
    import struct

    planes = []
    for i in range(n_planes):
        vals = []
        for j in range(dim):
            h = hashlib.sha256(f"{seed}:{i}:{j}".encode()).digest()
            # map first 8 bytes to (-1, 1)
            u = struct.unpack(">Q", h[:8])[0] / 2 ** 64
            vals.append(2.0 * u - 1.0)
        planes.append(vals)
    return planes


def cosine_exact_py(va, vb) -> float:
    """Sequential left-fold cosine — the exact arithmetic of the SQL oracle
    (and of Spark's ``aggregate``): products and sums in source order."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(va, vb):
        dot += float(x) * float(y)
    for x in va:
        na += float(x) * float(x)
    for y in vb:
        nb += float(y) * float(y)
    import math

    return dot / (math.sqrt(na) * math.sqrt(nb))


def cosine_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
    meter=None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a < b) with cosine >= t.

    The exact baseline of embedding near-dup (the commented-out intent of
    reference examples/deduplication.rs:109-163, distance<0.5 there) as a
    distributed BLOCK GRID: the corpus is hashed into ``n_blocks`` row
    blocks, each of the B(B+1)/2 block pairs becomes one ``applyInPandas``
    group whose kernel matmuls the two blocks (numpy float64 SIMD) and
    re-scores only candidates at/above threshold-1e-6 with the oracle's
    exact sequential left-fold arithmetic, so emitted values hash-match the
    SQL oracle while the O(n²·d) multiply-adds stay vectorized.  Nothing is
    collected to the driver; shuffle volume is O(n·B) (each block ships to
    its ~B grid cells).  A pure-Catalyst ``aggregate(zip_with(...))`` pair
    join measured ~20x slower (higher-order lambdas are interpreted per
    element).  Exact all-pairs is inherently O(n²) compute — the
    correctness baseline; :func:`cosine_pairs_lsh` below is the
    sub-quadratic scale path (bucketed candidates, same verify arithmetic).

    Per-cell memory is bounded by the block size, not the corpus: the
    kernel's working set is (|A|+|B|)·d·8 + |A|·|B|·8 bytes, so scaling
    ``n_blocks`` with n keeps it constant as n grows (evidenced by the
    slow-tier spill test, numbers in BENCH/BASELINE.md).  ``meter``, when
    given, is a max-accumulator the kernel feeds ``(working_set_bytes,
    worker_peak_rss_bytes)`` per cell — measurement only, off by default.
    """
    import pandas as pd

    spark = corpus.sparkSession
    cells = [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)]
    cell_df = spark.createDataFrame(cells, "bi int, bj int")
    c = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    a_side = c.join(F.broadcast(cell_df), c["blk"] == cell_df["bi"]).select(
        "bi", "bj", "vid", "vec", F.lit(0).alias("side")
    )
    b_side = c.join(F.broadcast(cell_df), c["blk"] == cell_df["bj"]).select(
        "bi", "bj", "vid", "vec", F.lit(1).alias("side")
    )
    both = a_side.unionByName(b_side)
    thr = float(threshold)

    def score(key, pdf):
        import numpy as np

        bi, bj = int(key[0]), int(key[1])
        A = pdf[pdf["side"] == 0]
        B = pdf[pdf["side"] == 1]
        empty = pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
        if not len(A) or not len(B):
            return empty
        MA = np.asarray([np.asarray(v, dtype=np.float64) for v in A["vec"]])
        MB = np.asarray([np.asarray(v, dtype=np.float64) for v in B["vec"]])
        na = np.sqrt((MA * MA).sum(axis=1))
        nb = np.sqrt((MB * MB).sum(axis=1))
        fast = (MA @ MB.T) / np.outer(na, nb)
        if meter is not None:
            import resource

            meter.add(
                (
                    MA.nbytes + MB.nbytes + fast.nbytes,
                    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024,
                )
            )
        a_ids = A["vid"].to_numpy()
        b_ids = B["vid"].to_numpy()
        a_vecs = list(A["vec"])
        b_vecs = list(B["vec"])
        out = []
        for i, j in zip(*np.nonzero(fast >= thr - 1e-6)):
            x, y = int(a_ids[i]), int(b_ids[j])
            if bi == bj:
                # diagonal cell: both sides are the same block — each
                # unordered pair appears twice, keep the x<y orientation
                if x >= y:
                    continue
                lo, hi = x, y
            else:
                # off-diagonal: blocks are disjoint, the pair appears once
                lo, hi = (x, y) if x < y else (y, x)
            exact = round(cosine_exact_py(a_vecs[i], b_vecs[j]), 6)
            if exact >= thr:
                out.append((lo, hi, exact))
        return (
            pd.DataFrame(out, columns=["vec_a", "vec_b", "cosine"])
            if out
            else empty
        )

    return both.groupBy("bi", "bj").applyInPandas(
        score, schema="vec_a long, vec_b long, cosine double"
    )


def _probe_buckets(bucket: Column, n_planes: int, multiprobe: int) -> Column:
    """Bucket ids to probe: the home bucket plus, when ``multiprobe>=1``,
    every bucket at Hamming distance 1 (each sign bit flipped) — the
    standard multi-probe LSH recall boost without extra tables."""
    probes = [bucket]
    if multiprobe >= 1:
        for i in range(n_planes):
            probes.append(bucket.bitwiseXOR(F.lit(2 ** i)))
    return F.array(*probes)


def cosine_pairs_lsh(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    multiprobe: int = 1,
) -> DataFrame:
    """Scale path for embedding near-dup: bucket by random-hyperplane sign
    signature; score only candidate pairs sharing a probed bucket.

    Recall < 1 by design: a pair at angle θ shares the home bucket with
    probability (1-θ/π)^n_planes; ``multiprobe=1`` additionally probes every
    Hamming-1 bucket of the LEFT side, covering pairs that disagree on one
    plane (for true near-dups at cosine≥0.9 this lifts recall from ~0.4 to
    ~0.8 at n_planes=6).  Shuffle key stays the bucket id; candidate volume
    grows by at most (n_planes+1)x, never toward the full cross join.

    Scoring is vectorized per bucket group (``applyInPandas``, numpy
    float64 matmul — the same kernel pattern as :func:`cosine_pairs`):
    candidates at/above threshold-1e-6 are re-scored with the oracle's
    sequential left-fold dot over the Catalyst-computed norms, rounding
    and the threshold filter stay IN Catalyst, so emitted values are
    byte-identical to the previous pure-expression formulation (and its
    DuckDB oracle).  Measured at sf1.0 (20k vectors, 64 buckets): the
    interpreted ``aggregate(zip_with(...))`` per-pair dot cost 160s; the
    bucket-group matmul does the same candidate volume in ~2s — the same
    interpreted-HOF tax the quality-score bake-off measured at 4.4x and
    here, at ~2M candidates × 64 dims, at ~75x.

    Scale sizing: candidate volume per bucket is quadratic in bucket
    occupancy (n / 2^n_planes), so ``n_planes`` must grow ~log2(n) to hold
    per-bucket work flat — the same bound-the-cell rule the exact path
    pins with its spill test; the knob is exposed and the default (6)
    matches the value-checked driver contract at sf0.01.
    """
    import pandas as pd

    planes = make_planes(dim, n_planes)
    # Null / wrong-length embeddings: the old pure-expression formulation
    # yielded a null cosine that the threshold filter dropped; the numpy
    # bucket kernel would instead raise on the ragged batch.  Restore the
    # old tolerance by dropping such rows BEFORE they can form a bucket.
    n = corpus.where(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == dim)
    ).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
        _rp_bits(F.col(vec_col), planes).alias("bucket"),
    )
    a = n.select(
        F.explode(
            _probe_buckets(F.col("bucket"), n_planes, multiprobe)
        ).alias("bucket"),
        "vid", "vec", "nrm", F.lit(0).alias("side"),
    )
    b = n.select("bucket", "vid", "vec", "nrm", F.lit(1).alias("side"))
    both = a.unionByName(b)
    thr = float(threshold)

    def score(key, pdf):
        import numpy as np

        A = pdf[pdf["side"] == 0]
        B = pdf[pdf["side"] == 1]
        empty = pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "cosine_raw": pd.Series([], dtype="float64"),
            }
        )
        if not len(A) or not len(B):
            return empty
        MA = np.asarray([np.asarray(v, dtype=np.float64) for v in A["vec"]])
        MB = np.asarray([np.asarray(v, dtype=np.float64) for v in B["vec"]])
        na = A["nrm"].to_numpy(dtype=np.float64)
        nb = B["nrm"].to_numpy(dtype=np.float64)
        fast = (MA @ MB.T) / np.outer(na, nb)
        a_ids = A["vid"].to_numpy()
        b_ids = B["vid"].to_numpy()
        cand = (fast >= thr - 1e-6) & (a_ids[:, None] < b_ids[None, :])
        a_vecs = list(A["vec"])
        b_vecs = list(B["vec"])
        out = []
        for i, j in zip(*np.nonzero(cand)):
            # exact value: sequential left-fold dot over the Catalyst norms —
            # the arithmetic of the old expression and of the SQL oracle
            dot = 0.0
            for x, y in zip(a_vecs[i], b_vecs[j]):
                dot += float(x) * float(y)
            out.append(
                (int(a_ids[i]), int(b_ids[j]), dot / (float(na[i]) * float(nb[j])))
            )
        return (
            pd.DataFrame(out, columns=["vec_a", "vec_b", "cosine_raw"])
            if out
            else empty
        )

    scored = both.groupBy("bucket").applyInPandas(
        score, schema="vec_a long, vec_b long, cosine_raw double"
    )
    return (
        scored.select(
            "vec_a", "vec_b", F.round(F.col("cosine_raw"), 6).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: probe the query's random-hyperplane bucket plus
    (``multiprobe>=1``) every Hamming-1 neighbor bucket.

    Recall < 1.0 by design; the scale win is that the corpus join key is the
    LSH bucket (uniform-ish), so each query touches ~(n_planes+1) buckets of
    ~corpus/2^n_planes rows instead of all of them.
    """
    planes = make_planes(dim, n_planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _rp_bits(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(
            _probe_buckets(_rp_bits(F.col(vec_col), planes), n_planes, multiprobe)
        ).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


PQ_M = 8  # subspaces
PQ_K = 8  # codewords per subspace


def pq_codebook(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    ksub: int = PQ_K,
) -> list[list[list[float]]]:
    """Deterministic product-quantization codebook: for each of the ``m``
    subspaces, the sub-vectors of the ``ksub`` corpus vectors with the
    smallest ids (the seed-vector discipline of :func:`ivf_centroids` —
    production would k-means each subspace; seeds keep the operator exactly
    oracle-checkable).  codebook[mi][ki][j] — metadata-sized."""
    seeds = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(ksub).collect()
    )
    if not seeds:
        raise ValueError("pq_codebook: empty corpus")
    d = len(seeds[0][1])
    if d % m:
        raise ValueError(
            f"pq_codebook: dim {d} not divisible by m={m} subspaces"
            " (a silent remainder would drop trailing dimensions from"
            " every reconstruction)"
        )
    sub = d // m
    return [
        [[float(x) for x in s[1][mi * sub : (mi + 1) * sub]] for s in seeds]
        for mi in range(m)
    ]


def _pq_code(vec: Column, cwords: list[list[float]], start: int) -> Column:
    """0-based argmin-L2 codeword index for one subspace (ties -> smallest
    index).  The L2 fold is sequential in index order — the engine-portable
    float discipline (kgspark.vec_oracles docstring)."""
    sub = len(cwords[0])
    sl = F.slice(vec, start + 1, sub)
    structs = []
    for ki, cw in enumerate(cwords):
        carr = F.array(*[F.lit(c) for c in cw])
        l2 = F.aggregate(
            F.zip_with(
                sl, carr, lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        structs.append(F.struct(l2.alias("l2"), F.lit(ki).alias("k")))
    return F.array_min(F.array(*structs))["k"]


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = PQ_M,
    ksub: int = PQ_K,
) -> DataFrame:
    """Product-quantization ANN top-k (asymmetric distance computation,
    Jégou et al. 2011): corpus vectors compress to ``m`` codeword indices
    (here 64 floats → 8 codes — the 100 TB memory story: the serving set
    holds codes + the metadata-sized codebook, never the raw vectors);
    queries stay exact and score against the codeword RECONSTRUCTION.
    Everything is deterministic — seed-vector codebook, index-order float
    folds, ties to the smallest codeword/neighbor id — so the operator is
    value-oracled like the IVF sibling, recall < 1 by design.

    Scale shape: encoding is a narrow per-row projection (m × ksub small
    L2 folds); scoring reuses the broadcast-queries brute-force shape of
    :func:`cosine_topk` over the RECONSTRUCTED corpus (at warehouse scale
    the codes column is what's stored; pair it with the IVF cell key for
    the classic IVF-PQ composition).
    """
    cb = pq_codebook(corpus, id_col, vec_col, m, ksub)
    sub = len(cb[0][0])
    chosen = [
        F.element_at(
            F.array(*[F.array(*[F.lit(c) for c in cw]) for cw in cb[mi]]),
            (_pq_code(F.col(vec_col), cb[mi], mi * sub) + 1).cast("int"),
        )
        for mi in range(m)
    ]
    recon = corpus.select(
        F.col(id_col), F.concat(*chosen).alias(vec_col)
    )
    # scoring = exactly cosine_topk over the reconstructed corpus (one
    # shared implementation of the broadcast join / self-exclusion /
    # round-6 / tie-break shape — the exact and PQ variants cannot drift)
    return cosine_topk(
        recon, queries, id_col=id_col, vec_col=vec_col, k=k
    ).withColumnRenamed("cosine", "cosine_pq")


def ivf_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, n_cells: int
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse quantizer: the ``n_cells`` corpus vectors with
    the smallest ids (metadata-sized collect, like the LSH plane constants;
    production would k-means a sample)."""
    cents = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(n_cells).collect()
    )
    return [(int(r[0]), [float(x) for x in r[1]]) for r in cents]


def _ivf_cell_cols(
    cent: list[tuple[int, list[float]]], vec: Column, nprobe: int
) -> tuple[Column, Column]:
    """(best cell id, ordered nprobe probe-cell id array) for a vector."""
    coss = [
        cosine(vec, F.array(*[F.lit(x) for x in cvec])) for _, cvec in cent
    ]
    cos_arr = F.array(*coss)
    cid_arr = F.array(*[F.lit(cid) for cid, _ in cent])
    best = F.element_at(
        cid_arr, F.array_position(cos_arr, F.array_max(cos_arr)).cast("int")
    )
    ordered = F.transform(
        F.array_sort(
            F.array(
                *[
                    F.struct((-c).alias("nc"), F.lit(cid).alias("cid"))
                    for c, (cid, _) in zip(coss, cent)
                ]
            )
        ),
        lambda s: s["cid"],
    )
    return best, F.slice(ordered, 1, nprobe)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-flat approximate top-k: coarse-quantize the corpus into
    ``n_cells`` cells, probe each query's ``nprobe`` nearest cells, score
    exactly within them.

    The coarse quantizer is DETERMINISTIC: the ``n_cells`` corpus vectors
    with the smallest ids act as centroids (production would k-means a
    sample; seed vectors keep the operator exactly oracle-checkable — the
    SQL oracle re-derives the same centroids, assignments, and probes).
    Each vector lands in the cell whose centroid has the highest cosine
    (ties: smallest centroid id); a query probes its ``nprobe`` best cells.

    Scale shape: centroids are metadata (n_cells rows collected once, like
    the LSH plane constants); assignment is a narrow per-row projection; the
    probe join shuffles on the cell id only — at warehouse scale the cell
    is the table's partition key, so each query's probes become partition
    pruning instead of a scan.  Recall < 1 by design (neighbors outside
    probed cells are missed) — the IVF sibling of :func:`lsh_topk`.
    """
    cent = ivf_centroids(corpus, id_col, vec_col, n_cells)

    def _cell_cols(vec: Column) -> tuple[Column, Column]:
        return _ivf_cell_cols(cent, vec, nprobe)

    assign_cell, _ = _cell_cols(F.col(vec_col))
    assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        assign_cell.alias("cell"),
    )
    _, probe_cells = _cell_cols(F.col(vec_col))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probe_cells).alias("cell"),
    )
    scored = (
        assigned.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_index_write(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
) -> list[tuple[int, list[float]]]:
    """Materialize an IVF index: the corpus written partitioned by coarse
    cell id (``cell=`` hive partitions).  Returns the centroid metadata the
    probe side needs.

    This is the warehouse form of :func:`ivf_topk`'s scale claim: with the
    cell as the table's partition key, a query's nprobe cells stop being a
    shuffle and become PARTITION PRUNING — files of unprobed cells are
    never opened (demonstrated in tests/test_vecops.py by plan + file
    inspection)."""
    cent = ivf_centroids(corpus, id_col, vec_col, n_cells)
    best, _ = _ivf_cell_cols(cent, F.col(vec_col), 1)
    corpus.select(
        F.col(id_col), F.col(vec_col), best.alias("cell")
    ).write.mode("overwrite").partitionBy("cell").parquet(path)
    return cent


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    cent: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """IVF top-k over a materialized :func:`ivf_index_write` index.

    The probed-cell set of the query batch (bounded by n_cells — metadata,
    same size class as the centroid collect) is pushed into the scan as an
    ``isin`` on the partition column, so only the probed cells' files are
    read.  Scoring and ranking semantics are identical to :func:`ivf_topk`
    (same centroids, same tie-breaks), which the parity test asserts.
    """
    from . import cache

    _, probe_cells = _ivf_cell_cols(cent, F.col(vec_col), nprobe)
    # persisted: the probed-cell collect below and the broadcast join both
    # read this frame — one evaluation of the 16-centroid cosine projection
    # per query batch, not two
    q = cache.keyed_persist(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode(probe_cells).alias("cell"),
        ),
        "ivf_probe_queries",
    )
    probed = sorted({r["cell"] for r in q.select("cell").distinct().collect()})
    idx = spark.read.parquet(path).filter(F.col("cell").isin(probed))
    scored = (
        idx.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            "cell",
        )
        .join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
