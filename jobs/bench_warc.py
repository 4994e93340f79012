#!/usr/bin/env python
"""WARC ingest throughput scaling: N → 4N executors (bench_scaling protocol).

Measures the container path end to end — parquet scan of (file_name,
content) blobs → gzip member split → WARC/HTTP record parse → HTML→text
extraction → digest — under the repo's executor-model protocol
(bench_scaling.py): an executor is a 2-core CPU-pinned JVM, the corpus is
4 fixed file shards, and the only variable is the executor count:

  * N  (1 executor):  one pinned JVM drains the 4 shard jobs sequentially;
  * 4N (4 executors): four pinned JVMs run one shard each, concurrently,
    barriering after an untimed JIT warmup.

Efficiency = wall_N / (4 * wall_4N), target >= 0.8.  The stage is
file-parallel with zero shuffles, so efficiency is bounded only by shard
balance and fixed stage latency — the property that keeps the same plan
linear when the file listing is 10^6 objects instead of 256.

Usage:  python jobs/bench_warc.py                      # full run
        python jobs/bench_warc.py --worker MODE SHARD LO HI INPUT_DIR
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

N_DOCS = int(os.environ.get("SPARK_GRAFT_WARC_DOCS", "200000"))
N_FILES = int(os.environ.get("SPARK_GRAFT_WARC_FILES", "256"))
REPS = int(os.environ.get("SPARK_GRAFT_WARC_REPS", "3"))
EXEC_CORES = int(os.environ.get("SPARK_GRAFT_WARC_EXEC_CORES", "2"))
N_SHARDS = 4


def _barrier(dir_: str | None, n: int, tag: str) -> None:
    if not dir_:
        return
    open(os.path.join(dir_, f"{tag}.ready"), "w").close()
    deadline = time.time() + 900
    while time.time() < deadline:
        if len([f for f in os.listdir(dir_) if f.endswith(".ready")]) >= n:
            return
        time.sleep(0.5)
    raise RuntimeError("barrier timeout")


def worker(mode: str, shard: int, cpu_lo: int, cpu_hi: int, input_dir: str) -> None:
    os.sched_setaffinity(0, range(cpu_lo, cpu_hi))
    from pyspark.sql import functions as F

    from kgspark import html_extract, warc
    from kgspark.session import get_spark

    spark = get_spark(
        app_name=f"warc-bench-{mode}-{shard}", master=f"local[{EXEC_CORES}]"
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run_shard(i: int) -> tuple[float, int]:
        files = spark.read.parquet(os.path.join(input_dir, f"shard={i}"))
        t0 = time.perf_counter()
        ex = html_extract.extract_stage(warc.warc_pages(files))
        n = ex.filter(F.col("text_sha256").isNotNull()).count()
        return time.perf_counter() - t0, n

    out: dict = {"mode": mode, "exec_cores": EXEC_CORES}
    if mode == "seq":
        run_shard(0)  # untimed JIT/codegen warmup
        walls, n_pages = [], 0
        for _ in range(REPS):
            total, n_pages = 0.0, 0
            for i in range(N_SHARDS):
                w, n = run_shard(i)
                total += w
                n_pages += n
            walls.append(total)
        out.update(wall_s=round(min(walls), 3), walls=[round(w, 3) for w in walls],
                   n_pages=n_pages)
    else:  # one shard, concurrent level
        run_shard(shard)  # untimed warmup
        _barrier(
            os.environ.get("SPARK_GRAFT_BARRIER_DIR"),
            int(os.environ.get("SPARK_GRAFT_BARRIER_N", "1")),
            f"s{shard}",
        )
        walls, n_pages = [], 0
        for _ in range(REPS):
            w, n_pages = run_shard(shard)
            walls.append(w)
        out.update(wall_s=round(min(walls), 3), walls=[round(w, 3) for w in walls],
                   shard=shard, n_pages=n_pages)
    spark.stop()
    out["pages_per_sec"] = round(out["n_pages"] / out["wall_s"], 1)
    print(json.dumps(out))


def _spawn(mode: str, shard: int, lo: int, hi: int, input_dir: str, env_extra=None):
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         mode, str(shard), str(lo), str(hi), input_dir],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=REPO_ROOT, env=env,
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5]),
               sys.argv[6])
        return

    from pyspark.sql import functions as F

    from kgspark import datagen
    from kgspark.session import get_spark

    with tempfile.TemporaryDirectory(prefix="warcbench-") as tmp:
        input_dir = os.path.join(tmp, "warcs")
        spark = get_spark(app_name="warc-bench-gen", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        (
            datagen.warc_files_distributed(spark, N_DOCS, N_FILES)
            .withColumn(
                "shard",
                (
                    F.regexp_extract("file_name", r"-(\d+)\.warc\.gz$", 1).cast("int")
                    % N_SHARDS
                ),
            )
            .write.partitionBy("shard")
            .parquet(input_dir)
        )
        spark.stop()

        # N level: one pinned 2-core executor drains all shards sequentially
        p = _spawn("seq", 0, 0, EXEC_CORES, input_dir)
        r_n = json.loads(p.communicate()[0].splitlines()[-1])
        print(json.dumps(r_n))

        # 4N level: four pinned executors, one shard each, concurrent
        with tempfile.TemporaryDirectory(prefix="warcbar-") as bar:
            env = {"SPARK_GRAFT_BARRIER_DIR": bar,
                   "SPARK_GRAFT_BARRIER_N": str(N_SHARDS)}
            procs = [
                _spawn("one", i, i * EXEC_CORES, (i + 1) * EXEC_CORES, input_dir, env)
                for i in range(N_SHARDS)
            ]
            rs = [json.loads(p.communicate()[0].splitlines()[-1]) for p in procs]
        for r in rs:
            print(json.dumps(r))
        wall_4n = max(r["wall_s"] for r in rs)
        n_pages = sum(r["n_pages"] for r in rs)
        eff = r_n["wall_s"] / (N_SHARDS * wall_4n)
        print(
            json.dumps(
                {
                    "metric": "warc_ingest_scaling",
                    "n_docs": N_DOCS,
                    "n_files": N_FILES,
                    "exec_cores": EXEC_CORES,
                    "wall_n": r_n["wall_s"],
                    "wall_4n": wall_4n,
                    "pages_per_sec_n": r_n["pages_per_sec"],
                    "pages_per_sec_4n": round(n_pages / wall_4n, 1),
                    "scaling_efficiency": round(eff, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
