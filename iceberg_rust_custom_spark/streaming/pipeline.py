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


def stream_append_to_table(table, stream_df: DataFrame, checkpoint_dir: str, trigger_available_now: bool = True):
    """Streaming sink into an engine table: each micro-batch appends through
    the normal write path (partitioned write + footer stats + ACID commit),
    so a streaming ingest gets the same table semantics as batch. The
    checkpoint dir gives restart recovery; appends are atomic per batch.
    Returns the StreamingQuery (caller awaits/stops)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.refresh().append(batch_df)

    writer = stream_df.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
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
    fold tombstones in. Returns the StreamingQuery."""
    from iceberg_rust_custom_spark.table.maintenance import delete_by_key

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # last write wins within the batch (stable: by arrival order column
        # when present, else arbitrary-but-single row per key)
        dedup = batch_df.dropDuplicates(key_cols)
        table.refresh()
        delete_by_key(table, dedup.select(*key_cols))
        table.refresh().append(dedup)

    writer = stream_df.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
