"""Structured Streaming ingestion paths.

The reference is pure batch (SURVEY.md §2.9) and the north rule requires
resumability rather than streaming — that lives in pipeline/checkpoint.py.
These streams exist for continuous ingestion of new document partitions:

- ``stream_events_hourly``: watermarked tumbling-window aggregation over
  the events table read as a file stream (the same logical plan as the
  batch ``rel_events_hourly``).
- ``stream_view_purchase_join``: watermarked stream-stream range join
  (state bounded by watermark + window on both sides).
- ``stream_hll_users_daily_registers``: streaming HLL register maxes
  (the max-merge property is what makes the sketch streamable).
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


def stream_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated smoke of the streaming sessionizer: drive the
    ``stream_sessions`` file stream over the fixture events to
    completion (bounded micro-batches + two staggered far-future
    sentinel files to flush the watermark past every real event — the
    watermark only advances at batch END, so closing the session that
    contains max(ts) needs one more data-carrying batch after the
    first sentinel), then return the append-mode session rows.

    The DuckDB oracle recomputes the same sessions relationally
    (lag-gap sessionization at FULL microsecond precision — Spark's
    ``session_window`` merges an event exactly ``gap`` after its
    predecessor, i.e. a new session iff diff > gap, verified
    empirically; session end = last event + gap). This puts Spark's
    stateful session semantics under the cross-engine hash gate, not
    just pytest.

    Scale shape: unchanged from ``stream_sessions`` — state is one
    open interval per (user, session), hash-partitioned by user_id."""
    import datetime
    import os
    import shutil
    import tempfile
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tempfile.mkdtemp(prefix="trs_sessions_stream_")
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(src, "e0.parquet"),
    )
    max_ts = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .agg(F.max("ts"))
        .first()[0]
    )

    # sentinel sessions (user_id = -1) stay open and never emit; the
    # file source lists top-level FILES, so write plain parquet files.
    # Sentinel #1 rides IN the initial batch: the watermark advances at
    # batch END, so after batch 1 it already stands at max_ts + 10 d and
    # the single follow-up sentinel batch flushes every real session —
    # two micro-batches total instead of three.
    def _sentinel(days: int, path: str) -> None:
        tbl = pa.table(
            {
                "event_id": pa.array([-1], pa.int64()),
                "ts": pa.array(
                    [max_ts + datetime.timedelta(days=days)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([-1], pa.int64()),
                "event_type": pa.array(["sentinel"], pa.string()),
                "value": pa.array([0.0], pa.float64()),
                "props": pa.array([""], pa.string()),
            }
        )
        pq.write_table(tbl, path)

    _sentinel(10, os.path.join(src, "e1.parquet"))
    name = "sessions_smoke_" + uuid.uuid4().hex[:8]
    # the fixture stream carries thousands of rows through a stateful
    # exchange sized for batch analytics — 8 state partitions keep the
    # two micro-batches from being pure task-scheduling overhead (a
    # production deployment sizes this to its key cardinality instead)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stream_sessions(spark, src)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        q.processAllAvailable()
        _sentinel(20, os.path.join(src, "e2.parquet"))
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    # (user_id, session_start) is a unique sort key: two sessions of
    # one user are by construction > gap apart
    return (
        spark.table(name)
        .filter(F.col("user_id") >= 0)
        .orderBy("user_id", "session_start")
    )


STREAM_SESSIONS_SQL = """
WITH g AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
),
sess AS (
  SELECT user_id, min(ts) AS mn, max(ts) AS mx,
         count(*) AS n_events,
         CAST(sum(cast(round(value*100) as bigint)) AS BIGINT) AS value_c
  FROM s GROUP BY user_id, sid
)
SELECT user_id,
       strftime(mn, '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(mx + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
           AS session_end,
       n_events, value_c
FROM sess ORDER BY user_id, session_start
"""


def stream_view_purchase_join(
    spark: SparkSession,
    events_path: str,
    window_min: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream range join — the streaming analogue of
    the batch ``rel_range_join_attribution``: every purchase is matched
    to the same user's view events in the preceding ``window_min``
    minutes, emitting one (purchase event_id, view ts) row per match.

    The time-range condition bounds BOTH sides' join state: Spark keeps
    a view only until the watermark guarantees no future purchase can
    reach back to it (view_ts >= purchase_ts - window), and a purchase
    only while in-window views may still arrive — so state is
    O(events inside watermark + window), never the stream history.
    Inner-join matches emit as they are found (append mode); the
    watermark exists purely for state eviction, which is why a bounded
    file-stream drive needs no flush sentinel.

    Scale shape: the join state is hash-partitioned by user_id on both
    sides — the streaming twin of the batch rewrite's (user_id, bucket)
    equi-join shuffle."""
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    ev = spark.readStream.schema(schema).format("parquet").load(events_path)
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
        )
        .withWatermark("v_ts", watermark)
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
        .withWatermark("ts", watermark)
    )
    return (
        purchases.join(
            views,
            (F.col("user_id") == F.col("v_user"))
            & (
                F.col("v_ts")
                >= F.col("ts") - F.expr(f"interval {window_min} minutes")
            )
            & (F.col("v_ts") < F.col("ts")),
        )
        .select(
            "event_id",
            F.date_format("v_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        )
    )


def stream_hll_users_daily_registers(
    spark: SparkSession, events_path: str, watermark: str = "0 seconds"
) -> DataFrame:
    """Streaming per-day distinct-user HLL — the register stream behind
    the batch ``sketch_hll_users_daily``: (day, register, running max
    rho). HLL registers are max-mergeable, which is exactly what makes
    the sketch streamable: the stateful aggregation keeps ONE integer
    per (day, register) key — 64 longs per day, not the user set — and
    an incremental max over micro-batches is bit-identical to the batch
    max over the full table. The same md5/register/rho arithmetic as
    the batch operator (operators/sketch.py), so finalizing the emitted
    registers with the integer estimate formula reproduces the batch
    sketch exactly (pinned by tests/test_streaming.py).

    Update output mode: each micro-batch re-emits the keys it touched;
    the last emission per key is the final register state."""
    from ..operators.sketch import M_REGISTERS, _rho_case_sql

    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    ev = spark.readStream.schema(schema).format("parquet").load(events_path)
    hashed = ev.withWatermark("ts", watermark).select(
        F.window("ts", "1 day").alias("w"),
        F.md5(F.col("user_id").cast("string")).alias("h"),
    ).select(
        F.date_format("w.start", "yyyy-MM-dd").alias("day"),
        F.col("w"),
        (F.conv(F.substring("h", 1, 2), 16, 10).cast("long") % M_REGISTERS)
        .alias("reg"),
        F.conv(F.substring("h", 3, 4), 16, 10).cast("long").alias("v"),
    )
    return hashed.groupBy("day", "w", "reg").agg(
        F.max(F.expr(_rho_case_sql("v"))).alias("rho")
    ).select("day", "reg", "rho")
