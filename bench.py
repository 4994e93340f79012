#!/usr/bin/env python
"""Bench harness — headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {"q": sec, ...}, "sf": ...}

Execution is forced with the noop sink (``df.write.format("noop")``) so every
query pays its full scan/shuffle/UDF cost but nothing is collected to the
driver — the same discipline a cluster job would have.

Headline set: the flagship KG construction chain (documents corpus + the
synthetic web_pages corpus end-to-end) plus the heaviest dedup / similarity /
rollup operators.  A separate scaling run (``--scaling``) executes the
flagship pipeline at local[8] and local[32] and reports N→4N scaling
efficiency (recorded in BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Queries from __spark_entry__.queries() to time at the bench scale.
HEADLINE = [
    "kg_triples",
    "kg_entities",
    "kg_entity_links",
    "kg_chunks",
    "web_triples",
    "web_canonical_triples",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_lsh_pairs",
    "text_simhash",
    "text_quality",
    "graph_bfs_paths",
    "text_bpe_token_counts",
    "dedup_embedding_pairs",
    "dedup_embedding_pairs_lsh",
    "ann_cosine_topk",
    "events_hourly",
    "events_session_windows",
]


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.0


def _force(df) -> int:
    """Execute the full plan without driver materialization."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_bench(sf_dir: str, cpus: str) -> dict:
    from kgspark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(app_name="kgspark-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    qmap = entry.queries()
    timings: dict[str, float] = {}
    # best-of-REPS per query: rep 1 pays JIT/codegen for that plan shape and
    # this VM has time-varying noisy-neighbor interference (identical configs
    # swing 2x run-to-run — see BENCH/BASELINE.md); the min is the
    # steady-state number a warmed cluster executor would see.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    for name in HEADLINE:
        if name not in qmap:
            continue
        walls = []
        for _ in range(reps):
            # full cost per rep: drop the memoized web build + all cached
            # RDDs so a rep never times a fold-from-cache shortcut.
            entry._WEB_BUILT_CACHE.clear()
            spark.catalog.clearCache()
            df = qmap[name](spark, sf_dir)
            t0 = time.perf_counter()
            _force(df)
            walls.append(time.perf_counter() - t0)
        timings[name] = round(min(walls), 3)
    total = round(sum(timings.values()), 3)
    spark.stop()
    return {
        "metric": "kgspark_headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "reps": reps,
        "sf": _sf_from_dir(sf_dir),
    }


def main() -> None:
    if "--scaling" in sys.argv:
        # Scaling-efficiency evidence: same flagship job at two parallelism
        # levels in separate processes (fresh JVM each) — see bench_scaling.py.
        from bench_scaling import main as scaling_main

        scaling_main()
        return
    print(json.dumps(run_bench(SF_DIR, CPUS)))


if __name__ == "__main__":
    main()
