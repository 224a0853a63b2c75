import pytest
from pyspark.sql import functions as F

from table_recognition_spark.streaming.ingest import (
    run_stream_to_memory,
    stream_events_hourly,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.spark
@pytest.mark.slow
def test_stream_hourly_equals_batch(spark, tmp_path):
    """The streaming tumbling-window agg must agree with the batch plan
    once the bounded file stream drains."""
    import shutil

    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", events_dir / "events.parquet")
    stream = stream_events_hourly(spark, str(events_dir))
    run_stream_to_memory(stream, "hourly_out")
    got = {
        (r["hour"], r["event_type"]): (r["n"], r["value_c"])
        for r in spark.sql("SELECT * FROM hourly_out").collect()
    }

    ev = spark.read.parquet(f"{SF}/events.parquet")
    exp = {
        (r["hour"], r["event_type"]): (r["n"], r["value_c"])
        for r in ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("value_c"),
        )
        .collect()
    }
    assert got == exp


@pytest.mark.spark
@pytest.mark.slow
def test_stream_extract_foreachbatch(spark, tiny_corpus, weights, tmp_path):
    """foreachBatch extraction over a file-streamed docs table matches the
    batch pipeline output."""
    from table_recognition_spark.fixtures.generate import (
        DOCS_SCHEMA,
        corpus_to_spark,
    )
    from table_recognition_spark.pipeline.extract import extract
    from table_recognition_spark.streaming.ingest import stream_extract

    docs, media, _ = tiny_corpus
    docs_df, media_df = corpus_to_spark(spark, docs, media)
    docs_path = str(tmp_path / "docs_in")
    docs_df.write.parquet(docs_path)

    docs_stream = (
        spark.readStream.schema(DOCS_SCHEMA).format("parquet").load(docs_path)
    )
    q = stream_extract(
        spark,
        docs_stream,
        media_df,
        weights,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    def canon(df):
        return sorted(
            (
                r["doc_id"],
                tuple(
                    (s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in r["spans"]
                ),
            )
            for r in df.collect()
        )

    got = canon(spark.read.parquet(str(tmp_path / "out")))
    exp = canon(extract(docs_df, media_df, weights))
    assert got == exp


@pytest.mark.spark
@pytest.mark.slow
def test_watermark_drops_late_events_append_mode(spark, tmp_path):
    """Late-data semantics: in append mode a window is finalized once
    the watermark passes its end; a late event arriving after that must
    be DROPPED, not re-open the window. Two micro-batches through a
    file source: batch 2 carries one late row (beyond the 30-min
    watermark) and one fresh row that finalizes a second window."""
    import pandas as pd

    from table_recognition_spark.streaming.ingest import stream_events_hourly

    events_dir = tmp_path / "ev"
    events_dir.mkdir()

    def write_batch(rows):
        pdf = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value",
                     "props"],
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(
            str(events_dir)
        )

    write_batch(
        [
            (1, "2024-01-01 10:00:00", 1, "A", 1.0, "{}"),
            (2, "2024-01-01 10:05:00", 1, "A", 1.0, "{}"),
            (3, "2024-01-01 10:10:00", 2, "A", 1.0, "{}"),
            (4, "2024-01-01 13:00:00", 2, "A", 1.0, "{}"),
        ]
    )
    stream = stream_events_hourly(
        spark, str(events_dir), watermark="30 minutes"
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: event 5 is LATE (10:20 << watermark 12:30 after
        # batch 1) and must be dropped; event 6 advances the watermark
        # past 14:00, finalizing the 13:00 window
        write_batch(
            [
                (5, "2024-01-01 10:20:00", 3, "A", 1.0, "{}"),
                (6, "2024-01-01 14:40:00", 3, "A", 1.0, "{}"),
            ]
        )
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["hour"], r["event_type"]): (r["n"], r["value_c"])
        for r in spark.sql("SELECT * FROM wm_out").collect()
    }
    # the 10:00 window counts exactly the 3 on-time events — the late
    # row did not reopen it; the 13:00 window was finalized by the
    # watermark advance; the 14:00 window is still open (not emitted)
    assert got[("2024-01-01 10:00:00", "A")] == (3, 300)
    assert got[("2024-01-01 13:00:00", "A")] == (1, 100)
    assert ("2024-01-01 14:00:00", "A") not in got


@pytest.mark.spark
@pytest.mark.slow
def test_stream_sessions_equals_batch(spark, tmp_path):
    """Native session_window streaming sessionization: once the watermark
    passes every real event (driven by a far-future sentinel), the
    append-mode output must equal the batch session_window plan."""
    import shutil

    from table_recognition_spark.streaming.ingest import stream_sessions

    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", events_dir / "e0.parquet")

    stream = stream_sessions(spark, str(events_dir))
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .start()
    )
    q.processAllAvailable()
    # Two staggered far-future sentinels: the watermark only advances at
    # the END of a batch, so closing the session that contains max(ts)
    # needs one more data-carrying batch after the first sentinel (the
    # flush batch isn't guaranteed under processAllAvailable). Sentinel
    # sessions stay open and never emit; they're filtered by user_id.
    # The file source only lists top-level files, so the sentinel must be
    # a plain parquet FILE (pyarrow), not a df.write.parquet directory.
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    ev = spark.read.parquet(f"{SF}/events.parquet")
    max_ts = ev.agg(F.max("ts")).first()[0]
    for i, days in enumerate((10, 20), start=1):
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
        pq.write_table(tbl, str(events_dir / f"e{i}.parquet"))
        q.processAllAvailable()
    q.stop()

    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT * FROM sessions_out WHERE user_id >= 0"
        ).collect()
    }
    exp = {
        tuple(r)
        for r in ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("value_c"),
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
        .collect()
    }
    assert got == exp and got


@pytest.mark.spark
def test_stream_range_join_equals_batch(spark, tmp_path):
    """The stream-stream range join must emit exactly the batch join's
    (purchase, view_ts) match set — inner-join matches emit without any
    watermark flush, so a bounded drive needs no sentinel."""
    import shutil

    from table_recognition_spark.streaming.ingest import (
        stream_view_purchase_join,
    )

    events_dir = tmp_path / "events_rj"
    events_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", events_dir / "e0.parquet")

    stream = stream_view_purchase_join(spark, str(events_dir))
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("rj_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {tuple(r) for r in spark.sql("SELECT * FROM rj_out").collect()}

    ev = spark.read.parquet(f"{SF}/events.parquet")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    exp = {
        tuple(r)
        for r in p.join(
            v,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("v_ts") >= F.col("ts") - F.expr("interval 30 minutes"))
            & (F.col("v_ts") < F.col("ts")),
        )
        .select(
            "event_id",
            F.date_format("v_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        )
        .collect()
    }
    assert got == exp
    assert len(got) > 0


@pytest.mark.spark
def test_stream_hll_registers_equal_batch_sketch(spark, tmp_path):
    """HLL registers are max-mergeable, so the streaming per-(day, reg)
    running max — folded with the integer estimate formula — must equal
    the batch sketch_hll_users_daily output bit-for-bit."""
    import shutil

    from table_recognition_spark.operators.sketch import (
        M_REGISTERS,
        RHO_BITS,
        ALPHA_MILLI,
        hll_users_daily,
    )
    from table_recognition_spark.streaming.ingest import (
        stream_hll_users_daily_registers,
    )

    events_dir = tmp_path / "events_hll"
    events_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", events_dir / "e0.parquet")

    stream = stream_hll_users_daily_registers(spark, str(events_dir))
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("hll_regs")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # fold: last emission per (day, reg) is the running max = final state
    regs = {}
    for r in spark.sql("SELECT * FROM hll_regs").collect():
        regs[(r["day"], r["reg"])] = r["rho"]
    per_day = {}
    for (day, _), rho in regs.items():
        per_day.setdefault(day, []).append(rho)
    est_num = ALPHA_MILLI * M_REGISTERS * M_REGISTERS * (1 << (RHO_BITS + 1))
    got = {}
    for day, rhos in per_day.items():
        s_inv = sum(1 << (RHO_BITS + 1 - rho) for rho in rhos) + (
            M_REGISTERS - len(rhos)
        ) * (1 << (RHO_BITS + 1))
        got[day] = (s_inv, M_REGISTERS - len(rhos), est_num // s_inv)

    exp = {
        r["day"]: (r["s_inv"], r["zero_regs"], r["est_milli"])
        for r in hll_users_daily(spark, SF).collect()
    }
    assert got == exp
    assert len(got) > 1
