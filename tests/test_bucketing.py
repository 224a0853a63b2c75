"""Bucketing demo: pre-bucketed tables co-locate a join without any
shuffle — the 100 TB pattern for repeated fact-fact joins on the same
key."""

import pytest


@pytest.mark.spark
@pytest.mark.slow
def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")

    # warehouse dir is a static conf — create the demo DB at an
    # explicit location instead
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS buckdemo LOCATION '{tmp_path}/wh'"
    )
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("buckdemo.li_b")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("buckdemo.orders_b")

    lb = spark.table("buckdemo.li_b")
    ob = spark.table("buckdemo.orders_b")
    # at this tiny SF the optimizer would broadcast and ignore buckets;
    # disable broadcast to demonstrate the bucket-co-located SMJ (the
    # plan shape that matters when both sides are fact-table-sized)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).where(
            "o_totalprice > 0"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:2000]
        # co-located buckets: no Exchange anywhere in the join plan
        assert "Exchange" not in plan, plan[:2000]
        n = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    assert n == li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).where("o_totalprice > 0").count()
