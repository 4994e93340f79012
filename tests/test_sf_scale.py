"""Guards on the deterministic scale-up generator (jobs/make_sf_scale.py).

The generator decorrelates embedding replicas by rotating each copy k
positions.  A raw rotation of k >= dim slices back to the UNROTATED
original, silently regenerating the pathological corpus the module
docstring warns about (every replica of a vector at cosine 1.0 inside one
LSH bucket — observed 1.7s -> 165s on dedup_embedding_pairs_lsh).  The
rotation amount must therefore stay in [1, dim-1] for every k > 0, at any
replication factor.  No Spark needed: the generator is pure DuckDB.
"""

import importlib.util
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_generator(out_dir: str, factor: int) -> None:
    os.environ["KGSPARK_SCALE_SRC"] = "/root/testdata/sf0.001"
    spec = importlib.util.spec_from_file_location(
        "make_sf_scale", os.path.join(REPO, "jobs", "make_sf_scale.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = sys.argv
    sys.argv = ["make_sf_scale.py", out_dir, str(factor)]
    try:
        mod.main()
    finally:
        sys.argv = argv
        del os.environ["KGSPARK_SCALE_SRC"]


def test_rotation_never_degrades_to_identity_past_dim(tmp_path):
    out = str(tmp_path / "sf_scaled")
    # 70 > embedding dim (64): the pre-guard arithmetic returned the
    # UNROTATED original for k >= 64
    _run_generator(out, 70)
    con = duckdb.connect()
    n_bad, n_reps = con.execute(
        f"""
        WITH base AS (SELECT vec_id, embedding
                      FROM '{out}/embeddings.parquet' WHERE vec_id < 10000000),
             reps AS (SELECT vec_id % 10000000 AS orig_id,
                             vec_id // 10000000 AS k, embedding
                      FROM '{out}/embeddings.parquet' WHERE vec_id >= 10000000)
        SELECT count(*) FILTER (WHERE r.embedding = b.embedding), count(*)
        FROM reps r JOIN base b ON b.vec_id = r.orig_id
        """
    ).fetchone()
    assert n_reps > 0
    assert n_bad == 0, f"{n_bad}/{n_reps} replicas identical to the original"
    # replica count is exactly factor x the base table
    n_base, n_all = con.execute(
        f"""
        SELECT count(*) FILTER (WHERE vec_id < 10000000), count(*)
        FROM '{out}/embeddings.parquet'
        """
    ).fetchone()
    assert n_all == 70 * n_base


def test_factor_10_rotation_unchanged(tmp_path):
    """For k < dim the guarded arithmetic must equal the original plain
    k-rotation — the committed sf1.0 bench evidence stays reproducible."""
    out = str(tmp_path / "sf10")
    _run_generator(out, 3)
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH base AS (SELECT vec_id, embedding
                      FROM '{out}/embeddings.parquet' WHERE vec_id < 10000000)
        SELECT b.embedding AS orig, r.embedding AS rot,
               r.vec_id // 10000000 AS k
        FROM '{out}/embeddings.parquet' r
        JOIN base b ON b.vec_id = r.vec_id % 10000000
        WHERE r.vec_id >= 10000000
        LIMIT 50
        """
    ).fetchall()
    assert rows
    for orig, rot, k in rows:
        assert rot == orig[k:] + orig[:k]
