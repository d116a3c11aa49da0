"""Structured Streaming surface (beyond-reference; the reference has no
streaming — SURVEY.md §2.4).

Streaming mirrors of the batch window operators: readStream over a parquet
directory → watermarked event-time aggregation → memory/parquet sink. The
batch operators in operators/windows.py share the same expressions, so
batch results are the oracle for the streaming path (same input → same
windows), which is exactly how the tests verify it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_event_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.format("parquet")
        .schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def windowed_counts_stream(events: DataFrame, width: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation (late rows beyond the
    watermark are dropped — bounded state at scale)."""
    # Watermarks require TIMESTAMP (with timezone); parquet sources often
    # surface TIMESTAMP_NTZ. The cast is session-TZ-consistent with the
    # batch oracle, which windows the same column.
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def session_windows_stream(
    events: DataFrame,
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked session-window aggregation: per key, events within
    ``gap`` of each other merge into one session; a session closes (and
    its state evicts) once the watermark passes its end — the bounded-state
    form of the batch gaps-and-islands operator
    (operators/windows.py::session_windows, which is the pytest oracle)."""
    if dict(events.dtypes).get("ts") == "timestamp_ntz":
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), key_col)
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n",
            "sum_value",
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_time: str = "ts",
    right_time: str = "ts",
    upper: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join: each left row pairs with
    right rows of the same key whose timestamp lands in
    ``[left_time, left_time + upper]`` (e.g. purchases within an hour of a
    signup). BOTH sides carry watermarks and the join condition bounds the
    time difference in BOTH directions — that is what lets Spark evict
    buffered state instead of holding every row forever; an unbounded
    stream-stream join is a memory leak at 100 TB/day ingest rates.
    Batch-equivalent: the same condition as a plain join (the pytest
    oracle)."""
    lt, rt = f"__l_{left_time}", f"__r_{right_time}"
    l = left.withColumnRenamed(left_time, lt)
    r = right.withColumnRenamed(right_time, rt)
    if dict(l.dtypes).get(lt) == "timestamp_ntz":
        l = l.withColumn(lt, F.col(lt).cast("timestamp"))
    if dict(r.dtypes).get(rt) == "timestamp_ntz":
        r = r.withColumn(rt, F.col(rt).cast("timestamp"))
    l = l.withWatermark(lt, watermark)
    r = r.withWatermark(rt, watermark)
    cond = (
        (l[key_col] == r[key_col])
        & (F.col(rt) >= F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {upper}"))
    )
    return (
        l.join(r, cond)
        .drop(r[key_col])
        .withColumnRenamed(lt, left_time)
        .withColumnRenamed(rt, f"right_{right_time}")
    )


SINK_ID_KEY = "streaming-sink-id"
BATCH_ID_KEY = "streaming-batch-id"


def _sink_id_for(checkpoint_dir: str) -> str:
    """Stable identity for a streaming sink, derived from its checkpoint
    location (Spark keys micro-batch ids to the checkpoint, so the
    checkpoint IS the sink's identity across restarts)."""
    import hashlib

    return hashlib.md5(checkpoint_dir.encode("utf-8")).hexdigest()[:16]


def last_committed_batch_id(table, sink_id: str, branch: str = "main") -> int | None:
    """Highest micro-batch id this sink has already committed to the
    branch, read from snapshot summaries along the head's ancestry.
    Micro-batches commit in order, so the FIRST matching snapshot on the
    walk carries the max — the walk is O(commits since this sink's last
    batch), not O(history)."""
    for snap in table.metadata.ancestry(branch):
        if snap.summary.get(SINK_ID_KEY) == sink_id:
            try:
                return int(snap.summary.get(BATCH_ID_KEY, ""))
            except ValueError:
                return None
    return None


def append_sink(table, checkpoint_dir: str):
    """The ``foreachBatch`` callable behind :func:`stream_append_to_table`,
    exposed so replay (same ``batch_id`` delivered twice — the at-least-once
    contract) can be driven directly in tests."""
    sink_id = _sink_id_for(checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        t = table.refresh()
        last = last_committed_batch_id(t, sink_id)
        if last is not None and batch_id <= last:
            return  # replayed micro-batch: already committed
        t.append(
            batch_df,
            summary={SINK_ID_KEY: sink_id, BATCH_ID_KEY: str(batch_id)},
            small_hint=True,  # micro-batches are delta-sized; oversize falls back
        )

    return sink


def upsert_sink(table, key_cols: list, checkpoint_dir: str):
    """The ``foreachBatch`` callable behind :func:`stream_upsert_to_table`
    (delete-by-key + append, replay-skipped by ``(sink-id, batch-id)``)."""
    from iceberg_rust_custom_spark.table.maintenance import delete_by_key

    sink_id = _sink_id_for(checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        t = table.refresh()
        last = last_committed_batch_id(t, sink_id)
        if last is not None and batch_id <= last:
            return  # replayed micro-batch: the append commit already landed
        # last write wins within the batch (stable: by arrival order column
        # when present, else arbitrary-but-single row per key)
        dedup = batch_df.dropDuplicates(key_cols)
        delete_by_key(t, dedup.select(*key_cols))
        table.refresh().append(dedup, summary={SINK_ID_KEY: sink_id, BATCH_ID_KEY: str(batch_id)})

    return sink


def stream_append_to_table(table, stream_df: DataFrame, checkpoint_dir: str, trigger_available_now: bool = True):
    """Streaming sink into an engine table: each micro-batch appends through
    the normal write path (partitioned write + footer stats + ACID commit),
    so a streaming ingest gets the same table semantics as batch. The
    checkpoint dir gives restart recovery; appends are atomic per batch.

    Exactly-once: ``foreachBatch`` is at-least-once — a crash after the
    table commit but before the checkpoint records the batch replays the
    same ``batch_id`` on restart. Each commit therefore records
    ``(sink-id, batch-id)`` in the snapshot summary (the Delta
    txn appId/version pattern), and the sink skips any batch whose id is
    ≤ the last one found on the branch's ancestry. Returns the
    StreamingQuery (caller awaits/stops)."""
    writer = stream_df.writeStream.foreachBatch(append_sink(table, checkpoint_dir)).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_stream_to_memory(
    spark: SparkSession, agg: DataFrame, name: str = "stream_out", output_mode: str = "complete"
) -> DataFrame:
    """Drive a bounded source to completion synchronously (test harness).
    ``output_mode``: "complete" for aggregations, "append" for joins/maps."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


def stream_upsert_to_table(
    table, stream_df: DataFrame, key_cols: list, checkpoint_dir: str, trigger_available_now: bool = True
):
    """Streaming CDC sink: each micro-batch UPSERTS — an equality delete of
    the batch's keys (O(batch), no data file read) followed by an append,
    committed through the ACID path. Latest record per key wins across
    batches; within a batch, duplicates are reduced to the last by key
    first. This is the 100 TB streaming-upsert cost model: per-batch work
    tracks batch size, never table size; run ``compact()`` on a schedule to
    fold tombstones in. The delete-then-append pair is naturally idempotent,
    but the sink still records/checks ``(sink-id, batch-id)`` like the
    append sink so a replayed batch skips the redundant delete+append
    commits entirely. Returns the StreamingQuery."""
    writer = stream_df.writeStream.foreachBatch(upsert_sink(table, key_cols, checkpoint_dir)).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintained_sink(engine, table_name: str, inner, mv_names: list | None = None):
    """Wrap a foreachBatch sink so each committed micro-batch also brings
    the table's dependent materialized views up to date — incrementally
    (delta append / partial-aggregate merge / row-level changelog replay,
    engine.refresh_materialized_view's auto mode), so per-batch maintenance
    cost tracks batch size, not table or MV size. Replayed batches are
    harmless: the inner sink skips by (sink-id, batch-id) and a fresh MV
    refresh is a state-checked no-op."""
    if mv_names is None:
        mv_names = engine.dependent_materialized_views(table_name)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        inner(batch_df, batch_id)
        for mv in mv_names:
            engine.refresh_materialized_view(mv)

    return sink


def stream_append_with_mv_maintenance(
    engine,
    table_name: str,
    stream_df: DataFrame,
    checkpoint_dir: str,
    mv_names: list | None = None,
    trigger_available_now: bool = True,
):
    """`stream_append_to_table` + continuous MV maintenance: each
    micro-batch appends exactly-once, then incrementally refreshes every
    (or the named) MV over the table. An end-to-end streaming pipeline —
    ingest feeds dashboards without any full recompute on the path."""
    t = engine.load_table(table_name)
    sink = maintained_sink(engine, table_name, append_sink(t, checkpoint_dir), mv_names)
    writer = stream_df.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_upsert_with_mv_maintenance(
    engine,
    table_name: str,
    stream_df: DataFrame,
    key_cols: list,
    checkpoint_dir: str,
    mv_names: list | None = None,
    trigger_available_now: bool = True,
):
    """`stream_upsert_to_table` + continuous MV maintenance. The upsert's
    equality delete makes the source history changelog-shaped, so the MV
    refresh runs through the row-level changelog (changes() computes the
    equality-delete victims) — still incremental, never a full recompute,
    even though rows are being replaced."""
    t = engine.load_table(table_name)
    sink = maintained_sink(
        engine, table_name, upsert_sink(t, key_cols, checkpoint_dir), mv_names
    )
    writer = stream_df.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
