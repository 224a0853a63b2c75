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

import os

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
    ckpt = _ephemeral_checkpoint_dir(name)
    # the fixture stream carries thousands of rows through a stateful
    # exchange sized for batch analytics — 8 state partitions keep the
    # two micro-batches from being pure task-scheduling overhead (a
    # production deployment sizes this to its key cardinality instead)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled"
    )
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    # No trailing no-data batch needed (round-7): every REAL session is
    # emitted in the second data batch — after batch 1 (events +
    # sentinel #1) the watermark already stands at max_ts + 10 d, so
    # batch 2 (sentinel #2, a data batch) flushes every real session;
    # the only thing a no-data batch 3 could emit is the sentinel #1
    # session itself (user_id = -1, filtered below). Saves a full
    # state-load/commit cycle over every partition.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
                   "false")
    try:
        q = (
            stream_sessions(spark, src)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        _sentinel(20, os.path.join(src, "e2.parquet"))
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata
        )
        shutil.rmtree(ckpt, ignore_errors=True)
        # the staged source is consumed once the drive completes (the
        # memory sink holds the result); every invocation used to leak
        # a full copy of events.parquet to /tmp
        shutil.rmtree(src, ignore_errors=True)
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
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    ev = spark.readStream.schema(schema).format("parquet").load(events_path)
    return _hll_registers_from_stream(ev, watermark)


# --- bounded driver-gated drives ---------------------------------------
# Each function below replays a fixture table through a real file stream
# as TWO deterministic micro-batches (maxFilesPerTrigger=1 over two
# staged files with strictly increasing mtimes) and returns the final
# result, so the driver's rows+schema+hash DuckDB gate covers the
# STATEFUL cross-batch path of every streaming operator — state carried
# between batches, watermark advancement, update-mode re-emission — not
# just the single-batch plan. The staging order is chosen per operator
# so the streamed result provably equals a batch-relational oracle
# (see each docstring); the order-SENSITIVE behaviors (a later batch
# never overrides first-seen state even with a smaller doc_id) stay
# pinned by tests/test_stateful_streaming.py, which stages adversarial
# batch contents the relational oracle could not express.

_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def _stage_two_batches(df: DataFrame, sort_cols) -> str:
    """Write ``df`` as two parquet files (first/second half in
    ``sort_cols`` order) with increasing mtimes: a deterministic
    two-micro-batch replay for a maxFilesPerTrigger=1 file stream.
    Driver-side staging of a bounded fixture — the operators under
    test never touch pandas."""
    import os
    import tempfile
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tempfile.mkdtemp(prefix="trs_stream_src_")
    pdf = df.orderBy(*sort_cols).toPandas()
    mid = len(pdf) // 2
    now = time.time()
    for i, part in enumerate((pdf.iloc[:mid], pdf.iloc[mid:])):
        p = os.path.join(src, f"b{i}.parquet")
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            p,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        os.utime(p, (now + 10 * i, now + 10 * i))
    return src


def _ephemeral_checkpoint_dir(name: str) -> str:
    """Checkpoint dir for a bounded test drive: tmpfs when available
    (same rationale as session.py's spark.local.dir — the state store
    writes many small delta/snapshot files per batch plus the
    offset/commit WAL, and this sandbox's disk stalls under small-file
    fsync traffic; measured ~0.3-0.5 s per two-batch drive), else the
    system tmpdir. The caller removes it when the drive completes; a
    production stream points this at durable storage instead."""
    import tempfile

    base = (
        "/dev/shm/trs_stream_ckpt"
        if os.path.isdir("/dev/shm")
        else tempfile.gettempdir()
    )
    os.makedirs(base, exist_ok=True)
    return os.path.join(base, name)


def _drive_two_batch_stream(spark, builder, src, schema, mode: str,
                            state_partitions: int | None = None):
    """Run ``builder(stream_df)`` over the staged two-file source to
    completion; returns the memory-sink table as a DataFrame.

    ``state_partitions`` defaults to 8 (fixture-sized state for the
    JVM stateful operators, whose per-batch cost is dominated by
    state-store load/commit per partition). The applyInPandasWithState
    drives pass the cluster width instead: their per-batch cost is the
    per-GROUP Python protocol (measured ~5-15 ms/group — state ser/de +
    one pandas frame per group), which is serial within a partition, so
    with thousands of keys the fan-out is what parallelizes it
    (user_totals drive 3.6 → 2.9 s at 32 partitions, sf0.1)."""
    import shutil
    import uuid

    name = "stream_gate_" + uuid.uuid4().hex[:8]
    ckpt = _ephemeral_checkpoint_dir(name)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled"
    )
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(state_partitions or 8)
    )
    # Skip the trailing no-data micro-batch (round-7): it exists to run
    # event-time timeouts and watermark-driven final emissions, and
    # every operator driven through this helper emits ONLY in data
    # batches — the stream-stream inner join emits matches as found
    # (append), the applyInPandasWithState operators use
    # GroupStateTimeout.NoTimeout, and the update-mode aggregations
    # re-emit touched keys per data batch. The empty batch still paid a
    # full state-store load/commit cycle across every partition
    # (measured 1.4 s of the 4 s drive). A production continuous stream
    # keeps the default on.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
                   "false")
    try:
        ev = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .format("parquet")
            .load(src)
        )
        q = (
            builder(ev)
            .writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata
        )
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def stream_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated drive of the watermarked stream-stream range join
    (``stream_view_purchase_join``): every purchase matched to the same
    user's views in the preceding 30 minutes, streamed as two
    ts-ordered micro-batches.

    Why the ts-ordered split makes the streamed result equal the batch
    join (the DuckDB oracle): with batch 1 = earlier half by ts, every
    view a batch-2 purchase needs (v_ts > p_ts - 30min ≥ split - 30min)
    is either in batch 2 or still in state — view state evicts only
    once the watermark passes v_ts + 30min, and after batch 1 the
    watermark stands at split - 1h < v_ts + 30min. Symmetrically no
    batch-2 row is late (all ts ≥ split ≥ watermark). Inner matches
    emit as found; no flush sentinel needed."""
    from ..operators.common import load

    src = _stage_two_batches(
        load(spark, sf_dir, "events"), ["ts", "event_id"]
    )

    def build(ev):
        views = (
            ev.filter(F.col("event_type") == "view")
            .select(F.col("user_id").alias("v_user"),
                    F.col("ts").alias("v_ts"))
            .withWatermark("v_ts", "1 hour")
        )
        purchases = (
            ev.filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "ts")
            .withWatermark("ts", "1 hour")
        )
        return (
            purchases.join(
                views,
                (F.col("user_id") == F.col("v_user"))
                & (F.col("v_ts")
                   >= F.col("ts") - F.expr("interval 30 minutes"))
                & (F.col("v_ts") < F.col("ts")),
            )
            .select(
                "event_id",
                F.date_format("v_ts", "yyyy-MM-dd HH:mm:ss")
                .alias("view_ts"),
            )
        )

    out = _drive_two_batch_stream(spark, build, src, _EVENTS_SCHEMA,
                                  "append")
    return out.orderBy("event_id", "view_ts")


STREAM_ATTRIBUTION_SQL = """
SELECT p.event_id AS event_id,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts
FROM events p JOIN events v
  ON v.user_id = p.user_id
 AND v.ts >= p.ts - INTERVAL 30 MINUTE
 AND v.ts < p.ts
WHERE p.event_type = 'purchase' AND v.event_type = 'view'
ORDER BY 1, 2
"""


def stream_dedup_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated drive of the incremental exact dedup
    (``stream_dedup_exact``): the planted-duplicate corpus (same plant
    as the batch dedup queries) streamed as two doc_id-ordered
    micro-batches — every planted exact copy (doc_id + 100000) arrives
    in the same batch as, or a later batch than, its original, so
    first-seen ≡ min(doc_id) per fingerprint and the batch-2 copies of
    batch-1 originals exercise the cross-batch ``state.exists`` drop
    path under the hash gate."""
    from ..operators.common import load
    from ..operators.dedup import _with_planted_dups
    from .dedup import stream_dedup_exact

    docs = _with_planted_dups(load(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    src = _stage_two_batches(docs, ["doc_id"])
    out = _drive_two_batch_stream(
        spark, stream_dedup_exact, src,
        "doc_id bigint, text string", "append",
        state_partitions=spark.sparkContext.defaultParallelism,
    )
    return out.orderBy("fingerprint")


def _stream_dedup_sql() -> str:
    from ..operators.common import NORM_SQL
    from ..operators.dedup import _PLANTED_SQL

    norm = NORM_SQL.format(c="text")
    return f"""
    SELECT md5({norm}) AS fingerprint, doc_id,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM (SELECT doc_id, text,
                 row_number() OVER (
                     PARTITION BY md5({norm}) ORDER BY doc_id) AS rn
          FROM {_PLANTED_SQL})
    WHERE rn = 1 ORDER BY fingerprint
    """


def stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated drive of the ``applyInPandasWithState`` running
    per-user totals: two micro-batches of events, final state per user
    = the batch aggregate. n_events is strictly increasing per user
    across batches and value_c is NON-DECREASING (round(value*100) can
    be 0; the fixture plants no negative values — asserted below so a
    future fixture can't silently corrupt the max()-reconstruction),
    so the final row is max() of the update-mode emissions — no window
    needed (ADVICE r6)."""
    from ..operators.common import load
    from .stateful import running_user_totals

    ev = load(spark, sf_dir, "events")
    # guard for the max()-reconstruction above: a negative value would
    # make value_c non-monotone across batches and silently corrupt the
    # gate instead of failing it
    assert ev.filter(F.col("value") < 0).isEmpty(), (
        "stream_user_totals requires non-negative event values"
    )
    src = _stage_two_batches(ev, ["ts", "event_id"])
    out = _drive_two_batch_stream(
        spark, running_user_totals, src, _EVENTS_SCHEMA, "update",
        state_partitions=spark.sparkContext.defaultParallelism,
    )
    return (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"),
             F.max("value_c").alias("value_c"))
        .orderBy("user_id")
    )


STREAM_TOTALS_SQL = """
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
FROM events GROUP BY user_id ORDER BY user_id
"""


def stream_hll_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated drive of the streaming per-day HLL register stream:
    two ts-ordered micro-batches, update-mode emissions max-merged per
    (day, register) and finalized with the SAME code as the batch
    sketch (operators/sketch.py::finalize_daily_registers) — the
    incremental register maxes are bit-equal to the batch sketch, so
    the oracle IS the batch query's SQL."""
    from ..operators.common import load
    from ..operators.sketch import finalize_daily_registers

    src = _stage_two_batches(
        load(spark, sf_dir, "events"), ["ts", "event_id"]
    )
    out = _drive_two_batch_stream(
        spark, _hll_registers_from_stream, src, _EVENTS_SCHEMA, "update"
    )
    regs = out.groupBy("day", "reg").agg(F.max("rho").alias("rho"))
    return finalize_daily_registers(regs, load(spark, sf_dir, "events"))


def _hll_registers_from_stream(
    ev: DataFrame, watermark: str = "0 seconds"
) -> DataFrame:
    from ..operators.sketch import M_REGISTERS, _rho_case_sql

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


def _oracles() -> dict:
    from ..operators.sketch import hll_users_daily_sql

    return {
        "stream_events_sessions": STREAM_SESSIONS_SQL,
        "stream_attribution_join": STREAM_ATTRIBUTION_SQL,
        "stream_dedup_first_seen": _stream_dedup_sql(),
        "stream_user_totals": STREAM_TOTALS_SQL,
        "stream_hll_users_daily": hll_users_daily_sql(),
    }


QUERIES = {
    "stream_events_sessions": stream_events_sessions,
    "stream_attribution_join": stream_attribution_join,
    "stream_dedup_first_seen": stream_dedup_first_seen,
    "stream_user_totals": stream_user_totals,
    "stream_hll_users_daily": stream_hll_users_daily,
}
ORACLES = _oracles()
