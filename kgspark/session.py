"""SparkSession factory with scale-oriented defaults.

Single place where every entry point (tests, bench, __spark_entry__) gets its
session, so the AQE / Arrow / shuffle settings that matter at 100 TB are
applied uniformly.  On a real cluster the same builder is used via
``spark-submit --py-files``; only ``master`` changes.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

# Defaults tuned for the sandbox (local[32], 128 GiB).  On a 1000-executor
# cluster, shuffle.partitions should be ~2-3x total cores; AQE coalesces the
# excess at runtime, so erring high is safe.
DEFAULT_CONFS: dict[str, str] = {
    # Runtime re-planning: partition coalescing, skew-join splitting, and
    # runtime broadcast-join conversion.  Non-negotiable at scale.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # AQE's 1m default minPartitionSize coalesces small-scale shuffles below
    # the core count, serializing the UDF-heavy post-shuffle stages (measured:
    # <50% CPU at local[32]).  A small floor keeps coalescing for the
    # many-tiny-partition case while preserving one-task-per-core parallelism;
    # at cluster scale partitions are far above either threshold.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    # The whole-stage-codegen class cache defaults to 100 entries; the full
    # construction chain + AQE re-planning exceeds that, so every run evicted
    # and re-compiled (Janino + C2) its generated classes — measured as
    # never-converging, bimodal rep times.  Size it to hold the pipeline.
    "spark.sql.codegen.cache.maxEntries": "10000",
    # Arrow transport for every pandas UDF in the pipeline.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Broadcast small dimension/alias tables aggressively (alias dictionary,
    # vocab, canonical map head).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Keep scan partitions big enough to amortize task overhead locally.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    # Local mode runs all task threads in the driver JVM: the 1g default heap
    # collapses into GC thrash at local[32] (measured: GCLocker retry storms,
    # 4x slowdown vs local[8]).  On a real cluster this maps to executor
    # memory instead.  Applies only when the JVM is launched by this builder.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g"),
    # Reliable checkpoints (truncate_lineage with a checkpoint dir) write one
    # RDD checkpoint per BFS level / CC round; without this flag the files
    # outlive their RDDs for the whole application — unbounded growth on a
    # long-lived cluster session.  Cleanup rides the ContextCleaner when the
    # checkpointed RDD is GC'd; the latest checkpoint is retained.
    "spark.cleaner.referenceTracking.cleanCheckpoints": "true",
    # Quieter local runs.
    "spark.ui.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
}


def truncate_lineage(df):
    """Lineage truncation for iterative driver loops (BFS, hash-min CC).

    Defaults to ``localCheckpoint()`` — cheap, but blocks stored on executors
    are NOT replayable after executor loss, which is fine single-JVM and a
    durability gap on a 1000-executor cluster.  When the session has a
    reliable checkpoint directory configured (``get_spark(checkpoint_dir=…)``
    or ``sparkContext.setCheckpointDir``, pointing at HDFS/S3 on a real
    cluster), iterative state is checkpointed there instead and survives
    executor loss.  Default behavior is unchanged when no dir is set.
    """
    if df.sparkSession.sparkContext.getCheckpointDir() is not None:
        return df.checkpoint()
    return df.localCheckpoint()


def get_spark(
    app_name: str = "kgspark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
    checkpoint_dir: str | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    the bench harness can run the identical job at two parallelism levels for
    the N→4N scaling-efficiency measurement.

    ``checkpoint_dir`` (or env ``KGSPARK_CHECKPOINT_DIR``): reliable
    checkpoint location for iterative loops — see :func:`truncate_lineage`.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    confs = dict(DEFAULT_CONFS)
    # Shuffle partitions scale with the compute (2-3x total cores, the
    # standard sizing rule); AQE coalesces the excess.  A fixed count would
    # under-parallelize the bigger cluster in the N-vs-4N scaling runs, just
    # as a fixed 32 would on a 1000-executor cluster.
    m = re.fullmatch(r"local\[(\d+)\]", master)
    if m:
        confs["spark.sql.shuffle.partitions"] = str(max(32, 3 * int(m.group(1))))
    if shuffle_partitions is not None:
        confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ckpt = checkpoint_dir or os.environ.get("KGSPARK_CHECKPOINT_DIR")
    if ckpt:
        spark.sparkContext.setCheckpointDir(ckpt)
    return spark
