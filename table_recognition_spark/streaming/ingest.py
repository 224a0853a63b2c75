"""Structured Streaming ingestion paths.

The reference is pure batch (SURVEY.md §2.9) and the north rule requires
resumability rather than streaming — that lives in pipeline/checkpoint.py.
These streams exist for continuous ingestion of new document partitions:

- ``stream_events_hourly``: watermarked tumbling-window aggregation over
  the events table read as a file stream (the same logical plan as the
  batch ``rel_events_hourly``).
- ``stream_extract``: foreachBatch wrapper that runs the extraction
  pipeline on each micro-batch of docs — exactly-once via the
  checkpointed sink contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def stream_events_hourly(
    spark: SparkSession, events_path: str, watermark: str = "1 hour"
) -> DataFrame:
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    ev = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(events_path)
    )
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "value_c"
            ),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
            "n",
            "value_c",
        )
    )


def run_stream_to_memory(stream_df: DataFrame, name: str):
    """Drive a bounded file stream to completion synchronously (test/demo
    harness): memory sink + processAllAvailable."""
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def stream_extract(
    spark: SparkSession,
    docs_stream: DataFrame,
    media_df: DataFrame,
    weights: dict,
    out_dir: str,
    checkpoint_dir: str,
):
    """Continuous extraction: each micro-batch of docs runs the batch
    extract() plan and appends to parquet; Spark's streaming checkpoint
    gives exactly-once per micro-batch."""
    from ..pipeline.extract import extract

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        out = extract(batch_df, media_df, weights)
        out.write.mode("append").parquet(out_dir)

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_sessions(
    spark: SparkSession,
    events_path: str,
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Watermarked session-window aggregation (the streaming analogue of
    the batch ``rel_events_sessions`` lag/cumsum sessionization): Spark's
    native ``session_window`` merges per-user event runs whose gaps are
    under ``gap`` and emits each session once its window closes past the
    watermark (append mode — exactly-once per session).

    Scale shape: session state is hash-partitioned by user_id; state per
    key is one open interval, not the event history."""
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    ev = spark.readStream.schema(schema).format("parquet").load(events_path)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "value_c"
            ),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
            "value_c",
        )
    )
