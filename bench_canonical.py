#!/usr/bin/env python
"""Incremental-canonicalization cost bench (VERDICT r2 item 5 evidence).

Three consecutive warehouse batches over growing prefixes of the synthetic
web corpus.  Batch 1 pays the full canonical build (LSH blocking + hash-min
CC over every distinct name); batches 2-3 must take the incremental path,
whose cost tracks the batch's NEW-name count — with the closed entity
vocabulary saturated by batch 1, that count is 0 and the canonical stage
must cost ~O(batch triples append), independent of stored corpus size.

Prints one JSON line per batch:
    {"run_id", "processed_docs", "incremental", "n_new_names",
     "canonical_stage_s", "batch_wall_s", "stored_names"}
and a final summary line.  Results are recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SIZES = [int(s) for s in os.environ.get(
    "KGSPARK_CANON_BENCH_SIZES", "60000,120000,180000"
).split(",")]


def main() -> None:
    from kgspark import datagen, materialize
    from kgspark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="kgspark-canon-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="canon_bench_")
    try:
        wh = materialize.Warehouse(spark, os.path.join(root, "wh"))
        out = []
        for k, n in enumerate(SIZES):
            pages = datagen.web_pages_distributed(spark, n, seed=42)
            entry = materialize.run_pipeline(spark, pages, wh, run_id=f"b{k}")
            cm = entry["stages"].get("canonical_map", {})
            rec = {
                "run_id": entry["run_id"],
                "processed_docs": entry["processed_docs"],
                "incremental": cm.get("incremental"),
                "n_new_names": cm.get("n_new_names"),
                "canonical_stage_s": cm.get("stage_wall_s"),
                "batch_wall_s": entry["wall_s"],
                "stored_names": wh.read("canon_names").count(),
            }
            out.append(rec)
            print(json.dumps(rec), flush=True)
        full = out[0]["canonical_stage_s"]
        incr = [r["canonical_stage_s"] for r in out[1:]]
        print(json.dumps({
            "metric": "canonical_incremental_cost_ratio",
            "value": round(max(incr) / full, 3) if full else None,
            "unit": "ratio (max incremental batch / full build)",
            "batches": out,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
