"""Structured Streaming ingest: incremental web_pages → KG construction.

The reference has no streaming (SURVEY.md §2.10) — its closest analog is a
10s scheduler tick re-scanning PENDING docs (runtime/src/scheduler.rs:298) and
an mpsc work queue (main.rs:78-81).  In Spark both dissolve into Structured
Streaming over the input table: new files/snapshots arrive, each micro-batch
runs the SAME deterministic batch fold (kgspark.pipeline) through
``foreachBatch`` into the warehouse, and the warehouse's content-addressed
anti-join (J1) makes delivery effectively exactly-once — re-delivered pages
fold to already-present ids and are skipped.

``Trigger.AvailableNow`` gives the batch-parity mode (drain everything then
stop) used by the tests; on a cluster the same code runs continuously against
an Iceberg source with incremental snapshot scans.

Also included: the event-time surface the reference lacks entirely —
watermarked sliding-window counts over ``warc_ts`` (crawl time), the standard
late-data-tolerant ingest monitor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import datagen, materialize


def read_web_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-source stream of web_pages parquet drops (Iceberg stand-in).

    ``maxFilesPerTrigger`` bounds micro-batch size so a backlog of crawl
    output never produces one giant batch.
    """
    return (
        spark.readStream.schema(datagen.SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def ingest_available_now(
    spark: SparkSession,
    input_path: str,
    wh: materialize.Warehouse,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
) -> int:
    """Drain all pending input into the warehouse; returns micro-batch count.

    Each micro-batch runs the full construction fold + merge via
    ``materialize.run_pipeline`` (anti-join resume ⇒ idempotent under
    replays); the streaming checkpoint makes source progress durable, the
    warehouse manifest makes stage output durable — the two-level recovery
    the reference implements with doc/chunk status fields.
    """
    stream = read_web_pages_stream(spark, input_path, max_files_per_trigger)
    n_batches = {"n": 0}

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        n_batches["n"] += 1
        materialize.run_pipeline(
            spark, batch_df, wh, run_id=f"stream-epoch-{epoch_id}"
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


def dedup_stream(
    web_pages: DataFrame,
) -> DataFrame:
    """Custom stateful operator: cross-micro-batch exact dedup by content hash.

    ``applyInPandasWithState`` keyed on sha256(text): the first page with a
    given content hash is emitted, every later arrival (same batch or any
    later batch) is dropped.  State is one boolean per hash, persisted in the
    streaming state store — a restart from the checkpoint continues
    deduplicating against everything already seen.  This is the streaming
    twin of the batch anti-join resume: same invariant (content-addressed
    first-wins), state-store instead of warehouse table.

    Output: (url, warc_ts, text_sha256) of first-seen pages, append mode.
    """
    from pyspark.sql import functions as F2
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    hashed = web_pages.select(
        "url", "warc_ts", F2.sha2(F2.coalesce("text", F2.lit("")), 256).alias("text_sha256")
    )

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            # hash already emitted in an earlier batch: drop everything
            for _ in pdfs:
                pass
            return
        # concatenate ALL Arrow chunks of the key's micro-batch before
        # selecting — picking from the first non-empty chunk alone would make
        # the emitted (url, warc_ts) chunk-order-dependent when one key spans
        # multiple chunks, breaking the deterministic first-wins contract.
        parts = [pdf for pdf in pdfs if len(pdf)]
        state.update((True,))
        if parts:
            all_rows = pd.concat(parts, ignore_index=True)
            all_rows = all_rows.sort_values(["url", "warc_ts"], kind="mergesort")
            yield all_rows.iloc[[0]][["url", "warc_ts", "text_sha256"]]

    return hashed.groupBy("text_sha256").applyInPandasWithState(
        fn,
        outputStructType="url string, warc_ts timestamp, text_sha256 string",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def transitions_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator: streaming twin of
    :func:`kgspark.events.transitions` — per-user consecutive event-type
    pairs across micro-batches.

    ``applyInPandasWithState`` keyed on user_id; state carries the user's
    LAST event (ts, event_id, event_type), so the first event of a new
    micro-batch pairs with the final event of any earlier batch — the
    cross-batch boundary a per-batch window cannot see.  Within a batch,
    rows sort by the sessionize total order (ts, event_id) before pairing.

    CONTRACT (documented, tested): per-user event-time-ordered arrival
    across micro-batches — the replay/backfill shape (AvailableNow over
    time-partitioned drops).  An out-of-order source needs a watermark
    reorder buffer upstream; pairing late data here would silently attach
    it to the wrong predecessor, so the operator is specified for ordered
    replay rather than guessing.

    Output: one (user_id, from_type, to_type, ts) row per transition,
    append mode — downstream aggregation to the transition matrix is the
    same groupBy the batch operator runs.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        rows = pd.concat(parts, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        last_type = state.get[2] if state.exists else None
        out_from, out_to, out_ts = [], [], []
        for ts, eid, etype in zip(rows["ts"], rows["event_id"], rows["event_type"]):
            if last_type is not None:
                out_from.append(last_type)
                out_to.append(etype)
                out_ts.append(ts)
            last_type = etype
        tail = rows.iloc[-1]
        state.update(
            (int(tail["ts"].value // 1000), int(tail["event_id"]), str(tail["event_type"]))
        )
        if out_from:
            yield pd.DataFrame(
                {
                    "user_id": key[0],
                    "from_type": out_from,
                    "to_type": out_to,
                    "ts": out_ts,
                }
            )

    return events.select("user_id", "ts", "event_id", "event_type").groupBy(
        "user_id"
    ).applyInPandasWithState(
        fn,
        outputStructType="user_id long, from_type string, to_type string, ts timestamp",
        stateStructType="last_ts_us long, last_event_id long, last_type string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def docs_per_window(
    web_pages: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked event-time windowed counts over crawl time.

    Works on both a streaming and a batch DataFrame (same plan — handy for
    parity tests): per (window, lang) page counts.  The watermark bounds
    state: rows later than ``watermark`` behind the max observed ``warc_ts``
    are dropped instead of growing state forever.
    """
    src = web_pages
    if src.isStreaming:
        src = src.withWatermark("warc_ts", watermark)
    win = F.window("warc_ts", window, slide or window)
    return (
        src.groupBy(win.alias("win"), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )


def interval_join_stream(
    events: DataFrame,
    left_type: str = "purchase",
    right_type: str = "error",
    window_s: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: the streaming twin of
    :func:`kgspark.events.range_join`, same output contract
    (user_id, left_id, right_id, delta_us).

    Spark's native stream-stream join with BOTH watermarks and a time-range
    condition — exactly the combination the engine needs to bound join
    state: a buffered left row is dropped once the right watermark passes
    ``lts + window_s`` (and vice versa), so state is O(rows within the
    watermark horizon), never the whole history.  The batch operator uses
    the bucketed composition instead because a batch job has no watermark
    to bound a time-range join's buffering.
    """
    l = (
        events.filter(F.col("event_type") == left_type)
        .select(
            "user_id",
            F.col("event_id").alias("left_id"),
            # watermarks require TIMESTAMP (not NTZ); the session tz is
            # pinned UTC so the cast is deterministic
            F.col("ts").cast("timestamp").alias("lts"),
        )
        .withWatermark("lts", watermark)
    )
    r = (
        events.filter(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("right_id"),
            F.col("ts").cast("timestamp").alias("rts"),
        )
        .withWatermark("rts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("r_user"))
        & (F.col("rts") >= F.col("lts") - F.expr(f"INTERVAL {window_s} SECONDS"))
        & (F.col("rts") <= F.col("lts") + F.expr(f"INTERVAL {window_s} SECONDS"))
    )
    return l.join(r, cond).select(
        "user_id",
        "left_id",
        "right_id",
        (F.unix_micros("rts") - F.unix_micros("lts"))
        .cast("long")
        .alias("delta_us"),
    )


def read_warc_files_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream of WARC blob drops — the shape a continuously
    running crawler hands the pipeline: each drop is a parquet of
    (file_name, content) rows, each row one member-per-record gzip WARC."""
    return (
        spark.readStream.schema(datagen.WARC_FILES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def ingest_warc_available_now(
    spark: SparkSession,
    input_path: str,
    wh: materialize.Warehouse,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
) -> int:
    """Drain pending WARC drops into the warehouse; returns micro-batch count.

    Each micro-batch runs container parse → pages → the SAME resumable
    construction fold as the table path (``materialize.run_pipeline``), so
    replayed or duplicate WARC files dissolve in the content-addressed
    anti-join exactly like replayed pages.  The container carries no lang
    column; ingest tags BCP-47 ``und`` (language-ID is a downstream stage,
    not container metadata).
    """
    from . import warc

    stream = read_warc_files_stream(spark, input_path, max_files_per_trigger)
    n_batches = {"n": 0}

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        n_batches["n"] += 1
        pages = warc.warc_pages(batch_df).withColumn("lang", F.lit("und"))
        materialize.run_pipeline(
            spark, pages, wh, run_id=f"warc-epoch-{epoch_id}"
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]
