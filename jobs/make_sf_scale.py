#!/usr/bin/env python
"""Deterministic scale-up of the driver testdata to sf1.0 (VERDICT r4 item 4).

The driver ships read-only parquet at sf{0.001,0.01,0.1}; the scale-tier
evidence needs one more decade.  This generator replicates the sf0.1 tables
10x with per-replica key remapping — no external data, fully deterministic,
same schemas — into a local bench directory (never committed; bench_data/ is
gitignored).  Only the three tables the headline bench reads are scaled:

  * documents: doc_id offset per replica; text gets a per-replica suffix
    (replica 0 byte-identical) so exact/near-dup structure scales ~10x
    (duplicates stay within a replica) instead of exploding ~100x via
    10 identical copies of every page sharing one LSH bucket;
  * embeddings: vec_id offset; each replica's vector is the original
    ROTATED by k positions (replica 0 identical).  Rotation preserves the
    norm and per-dim distribution while decorrelating replicas — a tiny
    per-replica nudge instead leaves all 10 copies of a vector inside the
    same LSH buckets (cosine ~1), which multiplies the TRUE near-dup pair
    count ~100x and measures a pathological corpus, not a 10x scale-up
    (observed: dedup_embedding_pairs_lsh 1.7s -> 165s under the nudge
    variant vs honest ~10x structure under rotation);
  * events: event_id / user_id offset per replica — 10x distinct session
    keys with identical per-key event structure, the honest scale-up for
    the sessionize/window shuffles.

Usage:  python jobs/make_sf_scale.py [out_dir] [factor]
        (defaults: <repo>/bench_data/sf1.0, 10)
Then:   SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("KGSPARK_SCALE_SRC", "/root/testdata/sf0.1")
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO_ROOT, "bench_data", "sf1.0"
    )
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT unnest(range({factor})) AS k")

    docs = os.path.join(SRC, "documents.parquet")
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + r.k * 10000000 AS doc_id,
                 CASE WHEN r.k = 0 THEN d.text
                      ELSE d.text || ' r' || r.k END AS text,
                 d.lang, d.source,
                 CAST(length(CASE WHEN r.k = 0 THEN d.text
                                  ELSE d.text || ' r' || r.k END) AS BIGINT)
                   AS n_chars
          FROM '{docs}' d CROSS JOIN reps r
          ORDER BY doc_id
        ) TO '{out_dir}/documents.parquet' (FORMAT parquet)
        """
    )

    emb = os.path.join(SRC, "embeddings.parquet")
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + r.k * 10000000 AS vec_id,
                 -- rotation amount stays in [1, dim-1] for every k>0: a
                 -- raw k >= dim would slice to the UNROTATED original and
                 -- recreate the pathological all-copies-one-bucket corpus
                 -- the docstring warns about (factor > dim runs)
                 CASE WHEN r.k = 0 THEN e.embedding
                      ELSE list_concat(
                        e.embedding[1 + (1 + (r.k - 1) % (len(e.embedding) - 1)):],
                        e.embedding[1:(1 + (r.k - 1) % (len(e.embedding) - 1))])
                      END AS embedding,
                 e.label
          FROM '{emb}' e CROSS JOIN reps r
          ORDER BY vec_id
        ) TO '{out_dir}/embeddings.parquet' (FORMAT parquet)
        """
    )

    ev = os.path.join(SRC, "events.parquet")
    con.execute(
        f"""
        COPY (
          SELECT e.event_id + r.k * 1000000000 AS event_id,
                 e.ts,
                 e.user_id + r.k * 1000000 AS user_id,
                 e.event_type, e.value, e.props
          FROM '{ev}' e CROSS JOIN reps r
          ORDER BY event_id
        ) TO '{out_dir}/events.parquet' (FORMAT parquet)
        """
    )
    for t in ("documents", "embeddings", "events"):
        n = con.execute(
            f"SELECT count(*) FROM '{out_dir}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows -> {out_dir}/{t}.parquet")


if __name__ == "__main__":
    main()
