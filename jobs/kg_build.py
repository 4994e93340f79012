#!/usr/bin/env python
"""spark-submit entry point: web_pages table → KG warehouse (one batch).

The north rule's cluster-run surface: the same resumable batch the tests and
streaming path use (kgspark.materialize.run_pipeline), runnable on any
cluster manager via

    python jobs/make_pyfiles.py                       # builds kgspark.zip
    spark-submit --master <cluster> --py-files kgspark.zip \\
        jobs/kg_build.py --input /path/web_pages.parquet \\
        --warehouse /path/warehouse --run-id run-001 [--check-digest]

or, sandbox stand-in for two cluster sizes (N vs 4N cores):

    spark-submit --master 'local[8]'  --py-files kgspark.zip jobs/kg_build.py ...
    spark-submit --master 'local[32]' --py-files kgspark.zip jobs/kg_build.py ...

All session tuning (AQE, Arrow, shuffle partitions, codegen-cache sizing)
comes from kgspark.session defaults unless overridden by --conf; the master
is whatever spark-submit provides.  EXCEPTION: ``spark.driver.memory``
cannot be applied after the JVM is up, so under spark-submit it stays at
the 1g default unless passed explicitly — pass ``--driver-memory`` (local
mode runs every task thread in the driver JVM; 100k+-page batches OOM the
default heap):

    spark-submit --master 'local[32]' --driver-memory 48g ...

Prints the run's manifest entry as one
JSON line (stage lineage metrics, skip/error counts, wall time, pages/sec).

With --generate N the input table is synthesized executor-side at N pages
(deterministic seed 42, no driver materialization) instead of read from
--input — the self-contained benchmark mode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:  # direct `python jobs/kg_build.py` runs
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="web_pages parquet path (url, warc_ts, html, text, lang)")
    ap.add_argument("--generate", type=int, default=0,
                    help="synthesize N pages executor-side instead of reading --input")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--check-digest", action="store_true",
                    help="enforce the per-url byte-identity gate before folding")
    args = ap.parse_args()
    if not args.input and not args.generate:
        ap.error("one of --input / --generate is required")

    from pyspark.sql import SparkSession

    from kgspark import datagen, materialize, session

    builder = SparkSession.builder.appName("kgspark-build")
    for k, v in session.DEFAULT_CONFS.items():
        builder = builder.config(k, v)  # spark-submit --conf overrides win
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.generate:
        web = datagen.web_pages_distributed(
            spark, args.generate,
            partitions=spark.sparkContext.defaultParallelism,
        )
    else:
        web = spark.read.parquet(args.input)

    wh = materialize.Warehouse(spark, args.warehouse)
    entry = materialize.run_pipeline(
        spark, web, wh, run_id=args.run_id, check_digest=args.check_digest
    )
    entry["pages_per_sec"] = (
        round(entry["processed_docs"] / entry["wall_s"], 1)
        if entry["wall_s"] else None
    )
    print(json.dumps(entry, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
