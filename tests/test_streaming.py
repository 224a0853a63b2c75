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
