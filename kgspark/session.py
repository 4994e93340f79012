"""SparkSession factory with scale-oriented defaults.

Single place where every entry point (tests, bench, __spark_entry__) gets its
session, so the AQE / Arrow / shuffle settings that matter at 100 TB are
applied uniformly.  On a real cluster the same builder is used via
``spark-submit --py-files``; only ``master`` changes.
"""

from __future__ import annotations

import os

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
    # Arrow transport for every pandas UDF in the pipeline.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Broadcast small dimension/alias tables aggressively (alias dictionary,
    # vocab, canonical map head).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Keep scan partitions big enough to amortize task overhead locally.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    # Quieter local runs.
    "spark.ui.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(
    app_name: str = "kgspark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    the bench harness can run the identical job at two parallelism levels for
    the N→4N scaling-efficiency measurement.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    confs = dict(DEFAULT_CONFS)
    if shuffle_partitions is not None:
        confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
