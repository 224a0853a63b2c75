import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.mark.spark
@pytest.mark.slow
def test_running_user_totals_match_batch(spark, tmp_path):
    """The stateful stream's final per-user state equals the batch
    aggregate over the same files."""
    import shutil

    from table_recognition_spark.streaming.stateful import running_user_totals

    # file streams need a directory; stage the single events file
    events_dir = tmp_path / "events_in"
    events_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", events_dir / "events.parquet")

    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(events_dir))
    )
    out = running_user_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # last emitted row per user == final running totals
    got = {
        r["user_id"]: (r["n_events"], r["value_c"])
        for r in spark.sql(
            """SELECT * FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id
                          ORDER BY n_events DESC) rn FROM running_totals)
               WHERE rn = 1"""
        ).collect()
    }
    exp = {
        r["user_id"]: (r["n"], r["v"])
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("v"),
        )
        .collect()
    }
    assert got == exp
