"""Relational demonstration queries over the TPC-H-ish testdata — the
stock-Catalyst skeleton the extraction pipeline also relies on (scan →
pushdown filter → broadcast/shuffle join → partial agg → window).

Cross-engine exactness: money aggregates go through integer cents
(``cast(round(x*100) as bigint)``) so no double-summation-order drift can
break the value-hash compare; dates are emitted as formatted strings;
every ordering has a total tie-break.

Scale notes: dimension tables (region/nation/customer/supplier/part) are
broadcast; fact-fact joins shuffle on their keys with AQE skew handling;
aggregates are partial (map-side) by construction of groupBy.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..operators.common import cents, cents_sql, load


def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 flavor: pushdown date filter → 2-key groupBy with 8
    partial aggregates."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "2001-09-02"
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents(F.col("l_quantity"))).alias("sum_qty_c"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_price_c"),
            F.sum(cents(disc_price)).alias("sum_disc_price_c"),
            F.sum(cents(charge)).alias("sum_charge_c"),
            F.sum(cents(F.col("l_discount"))).alias("sum_disc_c"),
            F.count("*").alias("count_order"),
        )
        .withColumn(
            "avg_qty",
            F.round(F.col("sum_qty_c") / 100.0 / F.col("count_order"), 6),
        )
        .withColumn(
            "avg_price",
            F.round(F.col("sum_base_price_c") / 100.0 / F.col("count_order"), 6),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum({cents_sql('l_quantity')}) AS BIGINT) AS sum_qty_c,
       CAST(sum({cents_sql('l_extendedprice')}) AS BIGINT) AS sum_base_price_c,
       CAST(sum({cents_sql('l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS sum_disc_price_c,
       CAST(sum({cents_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}) AS BIGINT) AS sum_charge_c,
       CAST(sum({cents_sql('l_discount')}) AS BIGINT) AS sum_disc_c,
       count(*) AS count_order,
       round(sum({cents_sql('l_quantity')}) / 100.0 / count(*), 6) AS avg_qty,
       round(sum({cents_sql('l_extendedprice')}) / 100.0 / count(*), 6) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 flavor: broadcast dim filter → two shuffle joins →
    groupBy → top-10."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .agg(
            F.sum(
                cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_c")
        )
        .orderBy(F.desc("revenue_c"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(sum({cents_sql('l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS revenue_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2
ORDER BY revenue_c DESC, l_orderkey LIMIT 10
"""


def q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 flavor: 6-table join with broadcast dims, local-supplier
    predicate (c_nationkey = s_nationkey), revenue by nation."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_c")
        )
        .orderBy(F.desc("revenue_c"), "n_name")
    )


Q5_SQL = f"""
SELECT n_name, CAST(sum({cents_sql('l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS revenue_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name ORDER BY revenue_c DESC, n_name
"""


def top_customers_per_nation(spark, sf_dir, k: int = 3):
    """Window top-k per group: highest-balance customers per nation."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "n_name",
            "rank",
            "c_custkey",
            "c_name",
            cents(F.col("c_acctbal")).alias("acctbal_c"),
        )
        .orderBy("n_name", "rank")
    )


TOP_CUSTOMERS_SQL = f"""
SELECT n_name, rank, c_custkey, c_name, {cents_sql('c_acctbal')} AS acctbal_c
FROM (
  SELECT n_name, c_custkey, c_name, c_acctbal,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
  FROM customer JOIN nation ON c_nationkey = n_nationkey
) WHERE rank <= 3 ORDER BY n_name, rank
"""


def brand_revenue_topk(spark, sf_dir, k: int = 10):
    """Broadcast part-dim join → revenue by brand, top-k."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(
                cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_c"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue_c"), "p_brand")
        .limit(k)
    )


BRAND_REVENUE_SQL = f"""
SELECT p_brand, CAST(sum({cents_sql('l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS revenue_c,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY revenue_c DESC, p_brand LIMIT 10
"""


def events_hourly(spark, sf_dir):
    """Tumbling-window aggregation on the events stream table (batch
    form; the streaming module runs the same plan via readStream)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(
                F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00:00"
            ).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(cents(F.col("value"))).alias("value_c"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("hour", "event_type")
    )


EVENTS_HOURLY_SQL = f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
       event_type, count(*) AS n,
       CAST(sum({cents_sql('value')}) AS BIGINT) AS value_c,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2 ORDER BY hour, event_type
"""


def events_sessions(spark, sf_dir, gap_minutes: int = 30):
    """Sessionization: lag + cumulative gap counter per user (window
    functions), then session stats."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    with_session = (
        ev.withColumn(
            "new_session",
            F.when(
                gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        with_session.groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


EVENTS_SESSIONS_SQL = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR cast(epoch(ts) AS bigint)
                      - cast(epoch(lag(ts) OVER w) AS bigint) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id,
         CAST(sum(new_session) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM s GROUP BY user_id ORDER BY user_id
"""


def revenue_rollup(spark, sf_dir):
    """ROLLUP over (returnflag, linestatus): hierarchical subtotals +
    grand total — Catalyst expands to grouping sets with partial aggs."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                  ).alias("revenue_c"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue_c",
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


REVENUE_ROLLUP_SQL = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(sum({cents_sql('l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS revenue_c,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


def orderstatus_pivot(spark, sf_dir):
    """Pivot: order counts and value by priority × status."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "o_orderpriority",
            F.col("F").alias("n_f"),
            F.col("O").alias("n_o"),
            F.col("P").alias("n_p"),
        )
        .orderBy("o_orderpriority")
    )


ORDERSTATUS_PIVOT_SQL = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def asof_event_to_order(spark, sf_dir):
    """As-of join (Spark lacks a native one — composed from the
    union-then-window pattern): each event is matched to its user's most
    recent order at-or-before the event timestamp, then counted by the
    matched order's priority. Events with no prior order fall in the
    NULL bucket."""
    o = load(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 50).alias("user_id"),
        F.col("o_orderdate").alias("ts"),
        "o_orderpriority",
        F.lit(0).alias("is_event"),
    )
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.lit(None).cast("string").alias("o_orderpriority"),
        F.lit(1).alias("is_event"),
    )
    unioned = o.unionByName(e)
    # Total order (round-7 correctness fix, VERDICT r6 #1): orders tie on
    # (user_id, ts) with >1 distinct priority in 36,818 sf0.1 groups, so
    # ("ts", "is_event") alone left `last()` engine-dependent. Canonical
    # rule: the max priority among same-date orders wins; o_orderpriority
    # is non-null on every order row and null on every event row, so the
    # added key is a pure tie-break within is_event=0 peers (NULL-order
    # differences between engines cannot surface).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_event", "o_orderpriority")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        unioned.withColumn(
            "matched_priority",
            F.last("o_orderpriority", ignorenulls=True).over(w),
        )
        .filter(F.col("is_event") == 1)
    )
    return (
        matched.groupBy("matched_priority")
        .agg(F.count("*").alias("n_events"))
        .orderBy("matched_priority")
    )


ASOF_SQL = """
WITH unioned AS (
  SELECT o_custkey % 50 AS user_id, o_orderdate AS ts,
         o_orderpriority, 0 AS is_event
  FROM orders
  UNION ALL
  SELECT user_id, ts, CAST(NULL AS VARCHAR), 1 FROM events
),
matched AS (
  SELECT user_id, is_event,
         last_value(o_orderpriority IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, is_event, o_orderpriority
           ROWS UNBOUNDED PRECEDING) AS matched_priority
  FROM unioned
)
SELECT matched_priority, count(*) AS n_events
FROM matched WHERE is_event = 1
GROUP BY matched_priority ORDER BY matched_priority
"""


def events_json_props(spark, sf_dir):
    """Semi-structured extraction: pull a field out of the JSON ``props``
    column (JVM get_json_object — no Python), bucket it, aggregate."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        # explicit floor: Spark casts double->int by truncation,
        # DuckDB by rounding - floor() is the portable bucket
        ev.select("event_type", F.floor(k / 10).cast("int").alias("k_bucket"))
        .groupBy("event_type", "k_bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "k_bucket")
    )


EVENTS_JSON_SQL = """
SELECT event_type,
       cast(floor(cast(json_extract_string(props, '$.k') AS int) / 10) AS int)
           AS k_bucket,
       count(*) AS n
FROM events GROUP BY 1, 2 ORDER BY event_type, k_bucket
"""


def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 flavor: bidirectional nation-pair trade volume by ship
    year. Two independent broadcast-dim legs (supplier→nation,
    orders→customer→nation) meet on the lineitem fact — the dims stay
    broadcast, the only big shuffle is lineitem⋈orders on orderkey."""
    n1 = ("NATION_1", "NATION_2")
    nation = load(spark, sf_dir, "nation")
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    sn = F.col("supp_nation")
    cn = F.col("cust_nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("cn_key"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .filter(
            ((sn == n1[0]) & (cn == n1[1])) | ((sn == n1[1]) & (cn == n1[0]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum(
                cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_c")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(sum({cents_sql('l_extendedprice * (1 - l_discount)')}) AS BIGINT)
           AS revenue_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year
"""


def churned_customers(spark, sf_dir):
    """Left-anti retention query: customers with NO order since the
    cutoff, counted per market segment with their idle balance. The
    anti-join shuffles both sides on custkey — at scale the orders side
    is pre-filtered at the scan (pushdown) before the shuffle, so the
    anti-join input is the small recent slice, not full history."""
    cutoff = "2001-01-01"
    cust = load(spark, sf_dir, "customer")
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= cutoff
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_churned"),
            F.sum(cents(F.col("c_acctbal"))).alias("idle_balance_c"),
        )
        .orderBy("c_mktsegment")
    )


CHURNED_SQL = f"""
SELECT c_mktsegment, count(*) AS n_churned,
       CAST(sum({cents_sql('c_acctbal')}) AS BIGINT) AS idle_balance_c
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
)
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 flavor: order-priority count over orders that have at
    least one returned lineitem — a LEFT SEMI join (EXISTS). The semi
    join shuffles only the pre-filtered returned slice of lineitem and
    keeps one probe row per match (no fan-out), which is the
    scale-correct EXISTS shape; the agg after it is tiny (5 groups)."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    returned = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
  )
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 flavor: single-row scan-aggregate whose entire predicate
    set (date range, discount band, quantity cap) pushes down to the
    parquet scan — the canonical pushdown/pruning showcase: at 100 TB
    this reads two columns of the row groups the min/max stats admit,
    with zero shuffle beyond the final 1-row partial-agg gather."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            cents(F.col("l_extendedprice") * F.col("l_discount"))
        ).alias("revenue_c"),
        F.count("*").alias("n_lineitems"),
    )


Q6_SQL = f"""
SELECT CAST(sum({cents_sql('l_extendedprice * l_discount')}) AS BIGINT) AS revenue_c,
       count(*) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark, sf_dir, k: int = 20):
    """TPC-H Q10 flavor: top-k customers by revenue lost to returned
    items in a quarter. Fact-fact join shuffles on orderkey with both
    sides pre-filtered at the scan; customer/nation broadcast; the
    top-k is a single total-ordered take, not a full sort at scale."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-07-01")
        & (F.col("o_orderdate") < "1997-10-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue_c"),
            cents(F.first("c_acctbal")).alias("acctbal_c"),
        )
        .orderBy(F.desc("revenue_c"), "c_custkey")
        .limit(k)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
       CAST(sum({cents_sql('l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS revenue_c,
       {cents_sql('any_value(c_acctbal)')} AS acctbal_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_c DESC, c_custkey LIMIT 20
"""


def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 flavor: revenue per supplier over a quarter, then the
    max-revenue supplier(s) with ties kept — the CREATE VIEW + scalar
    max of the original expressed as a 1-row max aggregate broadcast
    back into the filter (no unpartitioned window, so nothing ever
    funnels into a single partition). Revenue in integer cents so the
    tie test is exact cross-engine. At scale the agg shuffles on
    l_suppkey (supplier cardinality, no skew) and the scalar side is
    one row regardless of corpus size."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = load(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("total_revenue_c")
    )
    mx = rev.agg(F.max("total_revenue_c").alias("max_rev_c"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue_c") == F.col("max_rev_c"))
        .drop("max_rev_c")
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue_c")
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey,
         CAST(sum({cents_sql('l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS total_revenue_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_c
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue_c = (SELECT max(total_revenue_c) FROM revenue)
ORDER BY s_suppkey
"""


def q18_large_volume_customers(spark, sf_dir, min_qty: int = 300):
    """TPC-H Q18 flavor: customers whose single orders total > 300
    units. The HAVING-on-aggregated-subquery shape: lineitem aggregates
    to one row per orderkey FIRST (map-side partial sums make this the
    cheap pass over the big fact), the > threshold filter drops ~99% of
    groups, and only the survivors join orders/customer — never the
    raw lineitem rows. Quantities are integral doubles in this corpus,
    so sum-in-cents is exact."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(cents(F.col("l_quantity"))).alias("sum_qty_c"))
        .filter(F.col("sum_qty_c") > min_qty * 100)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
            cents(F.col("o_totalprice")).alias("totalprice_c"),
            "sum_qty_c",
        )
        .orderBy(F.desc("sum_qty_c"), "o_orderkey")
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
       {cents_sql('o_totalprice')} AS totalprice_c,
       sum_qty_c
FROM (
  SELECT l_orderkey,
         CAST(sum({cents_sql('l_quantity')}) AS BIGINT) AS sum_qty_c
  FROM lineitem GROUP BY l_orderkey
  HAVING sum_qty_c > 30000
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY sum_qty_c DESC, o_orderkey
"""


def q22_idle_customers(spark, sf_dir, cutoff: str = "2001-01-01"):
    """TPC-H Q22 flavor: per-nation count + balance of above-average-
    balance customers with no order since the cutoff. Two scale shapes
    in one query: the global-average scalar is a 1-row aggregate
    broadcast into the filter (condition written integer-exact as
    acctbal_c * n > sum_c — no float average crosses the engine
    boundary), and the "no recent order" test is a LEFT ANTI join
    against the date-pruned slice of orders (shuffles only customers +
    the recent slice, never all orders)."""
    cust = load(spark, sf_dir, "customer").withColumn(
        "acctbal_c", cents(F.col("c_acctbal"))
    )
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum("acctbal_c").alias("sum_c"), F.count("*").alias("n_pos")
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= cutoff)
        .select("o_custkey")
    )
    nation = load(spark, sf_dir, "nation")
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(F.col("acctbal_c") * F.col("n_pos") > F.col("sum_c"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.sum("acctbal_c").alias("totacctbal_c"),
        )
        .orderBy("n_name")
    )


Q22_SQL = f"""
WITH pos AS (
  SELECT CAST(sum({cents_sql('c_acctbal')}) AS BIGINT) AS sum_c,
         count(*) AS n_pos
  FROM customer WHERE c_acctbal > 0
)
SELECT n_name, count(*) AS numcust,
       CAST(sum({cents_sql('c_acctbal')}) AS BIGINT) AS totacctbal_c
FROM customer c
JOIN nation ON c_nationkey = n_nationkey
CROSS JOIN pos
WHERE {cents_sql('c_acctbal')} * pos.n_pos > pos.sum_c
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
  )
GROUP BY n_name ORDER BY n_name
"""


def retention_cohorts(spark, sf_dir):
    """Weekly retention-cohort analysis over the events stream: cohort =
    ISO week of a user's first event; for each (cohort, week-offset)
    cell, distinct active users and event count. The classic
    product-analytics triangle.

    Scale shape: first-event is one map-side-partial ``min`` groupBy on
    user_id; the cohort tag joins back on the same key (AQE can plan it
    shuffle-free after the agg); the final cell agg is a count-distinct
    keyed by (cohort, offset) — user-dimension cardinality, not event
    cardinality. Week offsets stay integer-exact: both week-truncations
    land on Mondays, so datediff is an exact multiple of 7."""
    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    return (
        ev.join(first, "user_id")
        .withColumn("cohort_w", F.date_trunc("week", F.col("first_ts")))
        .withColumn("event_w", F.date_trunc("week", F.col("ts")))
        .groupBy(
            F.date_format("cohort_w", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("event_w"), F.col("cohort_w")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("cohort_week", "week_offset")
    )


RETENTION_SQL = """
WITH first AS (
  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
),
tagged AS (
  SELECT e.user_id,
         date_trunc('week', f.first_ts) AS cohort_w,
         date_trunc('week', e.ts) AS event_w
  FROM events e JOIN first f USING (user_id)
)
SELECT strftime(cohort_w, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', cohort_w, event_w) / 7 AS INTEGER)
         AS week_offset,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM tagged
GROUP BY 1, 2
ORDER BY cohort_week, week_offset
"""


def q21_waiting_supplier(spark, sf_dir, k: int = 20):
    """TPC-H Q21 flavor (suppliers who kept orders waiting) respec'd to
    this schema: lateness = ``l_shipdate > o_orderdate + 90 days`` (the
    fixture lineitem has no commit/receipt dates). Structure preserved:
    a late lineitem counts iff the order has ANOTHER supplier (EXISTS →
    left-semi) and no OTHER supplier was late on it (NOT EXISTS →
    left-anti). All three self-join legs shuffle on l_orderkey — one
    co-located key, no cartesian."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # Round-7 rework: the EXISTS / NOT-EXISTS legs used to be a
    # left-semi + left-anti self-join pair over the (late) line table —
    # two more shuffles of lineitem-scale data. Both predicates are
    # per-ORDER facts a single window computes from the join output,
    # whose partitioning (l_orderkey) the window reuses with no further
    # exchange:
    #   EXISTS another supplier on the order      ⟺ |suppliers(order)| ≥ 2
    #   NOT EXISTS another LATE supplier          ⟺ |late_suppliers(order)| = 1
    # (l1 itself is late, so its supplier is in the late set; "another
    # late supplier" exists iff that set has a second member). The
    # surviving rows and their multiplicities are identical to the
    # semi/anti-join result, so numwait is unchanged.
    w = Window.partitionBy("l_orderkey")
    is_late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    waiting = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn("is_late", is_late)
        .withColumn("n_supps", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supps",
            F.size(
                F.collect_set(
                    F.when(F.col("is_late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .where(
            F.col("is_late")
            & (F.col("n_supps") >= 2)
            & (F.col("n_late_supps") == 1)
        )
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(k)
    )


Q21_SQL = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
)
SELECT s_name, count(*) AS numwait
FROM late l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def funnel_steps(spark, sf_dir, deadline_days: int = 7):
    """Ordered funnel analysis (view → click → purchase): users whose
    first view is followed by a later click, then a later purchase, all
    inside ``deadline_days`` of the first view. Emits one row per step
    with the surviving user count (the product-analytics funnel chart).

    Scale shape: three user_id-keyed conditional-min aggregations
    chained by joins on the same key — every shuffle reuses the user_id
    partitioning; no event-cardinality self-join (the naive per-event
    sequence match would be quadratic in events-per-user)."""
    ev = load(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.col("ts") > F.col("t2"))
            & (
                F.col("ts")
                <= F.col("t1") + F.expr(f"INTERVAL {deadline_days} DAYS")
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.lit("1_view").alias("step"), F.count("*").alias("n_users"))
        .unionAll(
            c.agg(F.lit("2_click").alias("step"), F.count("*").alias("n_users"))
        )
        .unionAll(
            p.agg(
                F.lit("3_purchase").alias("step"),
                F.count("*").alias("n_users"),
            )
        )
        .orderBy("step")
    )


def funnel_sql(deadline_days: int = 7) -> str:
    """Oracle builder parameterized identically to funnel_steps — a
    non-default call site regenerates a matching oracle instead of
    silently diverging from the registered default."""
    return f"""
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2, min(v.t1) AS t1
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
    AND e.ts <= c.t1 + INTERVAL {deadline_days} DAY
  GROUP BY e.user_id
)
SELECT * FROM (
  SELECT '1_view' AS step, count(*) AS n_users FROM v
  UNION ALL
  SELECT '2_click', count(*) FROM c
  UNION ALL
  SELECT '3_purchase', count(*) FROM p
) ORDER BY step
"""


FUNNEL_SQL = funnel_sql()


def q12_priority_by_class(spark, sf_dir):
    """TPC-H Q12 flavor (shipmode respec: the testdata lineitem carries
    no l_shipmode/commitdate, so the grouping attribute is l_returnflag
    and the date window is a plain shipdate year): orders x lineitem
    join -> conditional counts of high- vs low-priority orders per
    class. Both scans are pruned to 2 columns, the shipdate window is
    pushed to the lineitem scan, and the final aggregate is partial
    (map-side) over 3 distinct flags — the only wide shuffle is the
    orderkey join (AQE broadcasts the filtered side when it fits)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "2000-01-01")
            & (F.col("l_shipdate") < "2001-01-01")
        )
        .select("l_orderkey", "l_returnflag")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= '2000-01-01' AND l_shipdate < '2001-01-01'
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 flavor: count-of-counts distribution of orders per
    customer INCLUDING zero-order customers — the left-outer-join-then-
    double-aggregate shape (the outer join is what Q4/Q22's semi/anti
    joins cannot express). Both aggregates are partial-agg friendly;
    the second groupBy shuffles one row per distinct count."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_custkey")
    )
    c = load(spark, sf_dir, "customer").select("c_custkey")
    per_cust = c.join(o, c.c_custkey == o.o_custkey, "left_outer").groupBy(
        "c_custkey"
    ).agg(F.count("o_custkey").alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_custkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN (
    SELECT o_custkey FROM orders WHERE o_orderpriority <> '4-NOT SPECIFIED'
  ) o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 flavor: promotion revenue share for one shipdate month.
    lineitem x broadcast(part) -> single global conditional aggregate.
    The share is emitted integer-exact as basis points via truncating
    integer division (both operands nonnegative, so Spark's ``div`` and
    DuckDB's ``//`` agree bit-for-bit) — no float ratio crosses the
    engine boundary."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "2000-06-01")
            & (F.col("l_shipdate") < "2000-07-01")
        )
        .withColumn(
            "disc_c",
            cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
        )
        .select("l_partkey", "disc_c")
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", F.col("disc_c")).otherwise(
                    F.lit(0)
                )
            ).alias("promo_c"),
            F.sum("disc_c").alias("total_c"),
        )
        .withColumn(
            "promo_share_bp", F.expr("promo_c * 10000 div total_c")
        )
    )


Q14_SQL = f"""
WITH j AS (
  SELECT p_type,
         {cents_sql('l_extendedprice * (1 - l_discount)')} AS disc_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= '2000-06-01' AND l_shipdate < '2000-07-01'
)
SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN disc_c ELSE 0 END) AS BIGINT)
         AS promo_c,
       CAST(sum(disc_c) AS BIGINT) AS total_c,
       CAST(sum(CASE WHEN p_type = 'PROMO' THEN disc_c ELSE 0 END) * 10000
            // sum(disc_c) AS BIGINT) AS promo_share_bp
FROM j
"""


def q17_small_qty_revenue(spark, sf_dir, brand: str = "Brand#13"):
    """TPC-H Q17 flavor: revenue from small-quantity lineitems of one
    brand, where "small" means below 20% of that part's average order
    quantity. The correlated scalar subquery becomes a per-part
    aggregate re-joined (broadcast — one brand's parts are tiny) onto
    the same filtered slice; the threshold test is written integer-
    exact as ``qty_c * 5 * n < sum_q`` so no float average is ever
    materialized. Sums are COALESCEd so the zero-match edge still
    hash-compares."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == brand)
        .select("p_partkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            cents(F.col("l_quantity")).alias("qty_c"),
            cents(F.col("l_extendedprice")).alias("price_c"),
        )
    )
    stats = li.groupBy("l_partkey").agg(
        F.sum("qty_c").alias("sum_q"), F.count("*").alias("n_li")
    )
    return (
        li.join(F.broadcast(stats), "l_partkey")
        .filter(F.col("qty_c") * 5 * F.col("n_li") < F.col("sum_q"))
        .agg(
            F.coalesce(F.sum("price_c"), F.lit(0)).alias("revenue_c"),
            F.count("*").alias("n_lines"),
        )
    )


def q17_sql(brand: str = "Brand#13") -> str:
    """Oracle builder sharing q17_small_qty_revenue's parameter."""
    return f"""
WITH li AS (
  SELECT l_partkey,
         {cents_sql('l_quantity')} AS qty_c,
         {cents_sql('l_extendedprice')} AS price_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{brand}'
), s AS (
  SELECT l_partkey, CAST(sum(qty_c) AS BIGINT) AS sum_q,
         count(*) AS n_li
  FROM li GROUP BY l_partkey
)
SELECT CAST(COALESCE(sum(price_c), 0) AS BIGINT) AS revenue_c,
       count(*) AS n_lines
FROM li JOIN s USING (l_partkey)
WHERE qty_c * 5 * n_li < sum_q
"""


Q17_SQL = q17_sql()


def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 flavor: discounted revenue under a 3-arm disjunction of
    (brand, size-range, quantity-range) predicates — the OR-of-ANDs
    shape that exercises Catalyst's disjunction handling. The join
    itself stays a plain broadcast equi-join on partkey; the
    disjunction is a post-join filter, so no per-arm scan duplication
    happens (one pass over lineitem)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "disc_c"
        ),
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    arm = lambda b, s0, s1, q0, q1: (
        (F.col("p_brand") == b)
        & F.col("p_size").between(s0, s1)
        & F.col("l_quantity").between(q0, q1)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(
            arm("Brand#11", 1, 15, 1, 20)
            | arm("Brand#12", 10, 30, 10, 30)
            | arm("Brand#13", 20, 50, 20, 50)
        )
        .agg(
            F.coalesce(F.sum("disc_c"), F.lit(0)).alias("revenue_c"),
            F.count("*").alias("n_lines"),
        )
    )


Q19_SQL = f"""
SELECT CAST(COALESCE(sum({cents_sql('l_extendedprice * (1 - l_discount)')}), 0)
            AS BIGINT) AS revenue_c,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
"""


def range_join_attribution(spark, sf_dir, window_min: int = 30):
    """Range (interval) join, binned: for every purchase event, count
    the same user's view events in the preceding ``window_min`` minutes,
    then report the distribution (views_30m -> n_purchases, zero
    included). The non-equi time predicate is rewritten as the scalable
    bin + equi-join pattern: both sides bucket ts into window-sized
    bins, the probe side explodes into (bucket, bucket-1), the join is
    a plain equi-join on (user_id, bucket), and the exact range test is
    a residual filter — never a BroadcastNestedLoopJoin, so it survives
    a 100x event-volume scale-up. All time arithmetic is integer
    milliseconds (unix_millis vs epoch_ms), bit-exact cross-engine."""
    w_ms = window_min * 60 * 1000
    # events.ts is TIMESTAMP_NTZ; the session tz is pinned UTC
    # (session.py:47) so the cast to TIMESTAMP is shift-free and
    # unix_millis matches DuckDB's epoch_ms on the naive value exactly.
    ev = load(spark, sf_dir, "events").withColumn(
        "ms", F.unix_millis(F.col("ts").cast("timestamp"))
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ms").alias("v_ms"),
        (F.col("ms") - F.col("ms") % w_ms).alias("v_bucket"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ms",
        (F.col("ms") - F.col("ms") % w_ms).alias("bucket"),
    )
    probe = purchases.withColumn(
        "jb", F.explode(F.array(F.col("bucket"), F.col("bucket") - w_ms))
    )
    matched = (
        probe.join(
            views,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("jb") == F.col("v_bucket")),
        )
        .filter(
            (F.col("v_ms") >= F.col("ms") - w_ms) & (F.col("v_ms") < F.col("ms"))
        )
        .groupBy("event_id")
        .agg(F.count("*").alias("views_30m"))
    )
    per_purchase = purchases.join(matched, "event_id", "left_outer").select(
        F.coalesce(F.col("views_30m"), F.lit(0)).alias("views_30m")
    )
    return (
        per_purchase.groupBy("views_30m")
        .agg(F.count("*").alias("n_purchases"))
        .orderBy("views_30m")
    )


RANGE_JOIN_SQL = """
WITH p AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events
  WHERE event_type = 'purchase'
), v AS (
  SELECT user_id AS v_user, epoch_ms(ts) AS v_ms FROM events
  WHERE event_type = 'view'
), counted AS (
  SELECT p.event_id,
         CAST(count(v.v_user) AS BIGINT) AS views_30m
  FROM p LEFT OUTER JOIN v
    ON p.user_id = v.v_user
   AND v.v_ms >= p.ms - 1800000 AND v.v_ms < p.ms
  GROUP BY p.event_id
)
SELECT views_30m, count(*) AS n_purchases
FROM counted GROUP BY views_30m ORDER BY views_30m
"""


def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 flavor (no partsupp table in this corpus, so the
    part<->supplier relation is derived from lineitem): for each LARGE
    part in a size band, the supplier offering the minimal observed
    line price (cents), tie-broken to the lowest suppkey. The
    correlated MIN subquery of the original is the argmin-via-encoded-
    min pattern: (cost_c, suppkey) packs into one BIGINT
    (cost_c * 100000 + suppkey, exact while suppkey < 1e5 and
    cost_c < ~9e13), one min() per part recovers both — no window, no
    second join back. Dimension joins broadcast."""
    p = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey",
            "p_brand",
            "p_size",
            (
                cents(F.col("l_extendedprice")) * 100000 + F.col("l_suppkey")
            ).alias("enc"),
        )
    )
    best = li.groupBy("p_partkey", "p_brand", "p_size").agg(
        F.min("enc").alias("enc_min")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        best.withColumn("best_suppkey", F.col("enc_min") % 100000)
        .withColumn(
            "min_cost_c", F.expr("enc_min div 100000")
        )
        .join(
            F.broadcast(s), F.col("best_suppkey") == F.col("s_suppkey")
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey", "p_brand", "p_size", "best_suppkey", "min_cost_c",
            "s_name", "n_name",
        )
        .orderBy("p_partkey")
    )


Q2_SQL = f"""
WITH cand AS (
  SELECT p_partkey, p_brand, p_size,
         {cents_sql('l_extendedprice')} * 100000 + l_suppkey AS enc
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
), best AS (
  SELECT p_partkey, p_brand, p_size,
         CAST(min(enc) % 100000 AS BIGINT) AS best_suppkey,
         CAST(min(enc) // 100000 AS BIGINT) AS min_cost_c
  FROM cand GROUP BY p_partkey, p_brand, p_size
)
SELECT p_partkey, p_brand, p_size, best_suppkey, min_cost_c, s_name, n_name
FROM best
JOIN supplier ON best_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
ORDER BY p_partkey
"""


def q8_market_share(spark, sf_dir, nation: str = "NATION_3"):
    """TPC-H Q8 flavor: one nation's share of STANDARD-part revenue per
    order year, in integer basis points. Two broadcast dims onto the
    lineitem x orders shuffle join; the share is a conditional sum over
    the same rows (one pass, no self-join) and the division is
    truncating integer div on nonnegative operands (Spark ``div`` ==
    DuckDB ``//`` exactly)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "vol_c"
        ),
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).select("s_suppkey", "n_name")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("n_name") == nation, F.col("vol_c")).otherwise(
                    F.lit(0)
                )
            ).alias("nation_c"),
            F.sum("vol_c").alias("total_c"),
        )
        .withColumn("share_bp", F.expr("nation_c * 10000 div total_c"))
        .orderBy("o_year")
    )


def q8_sql(nation: str = "NATION_3") -> str:
    """Oracle builder sharing q8_market_share's parameter."""
    return f"""
WITH j AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         n_name,
         {cents_sql('l_extendedprice * (1 - l_discount)')} AS vol_c
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE p_type = 'STANDARD'
)
SELECT o_year,
       CAST(sum(CASE WHEN n_name = '{nation}' THEN vol_c ELSE 0 END)
            AS BIGINT) AS nation_c,
       CAST(sum(vol_c) AS BIGINT) AS total_c,
       CAST(sum(CASE WHEN n_name = '{nation}' THEN vol_c ELSE 0 END) * 10000
            // sum(vol_c) AS BIGINT) AS share_bp
FROM j GROUP BY o_year ORDER BY o_year
"""


Q8_SQL = q8_sql()


def q9_product_type_profit(spark, sf_dir, name_like: str = "%small%"):
    """TPC-H Q9 flavor: profit by (supplier nation, order year) for
    parts whose name matches a pattern. The original's ps_supplycost is
    respec'd as the part's retail price x quantity (the corpus has no
    partsupp), keeping the join DAG identical: part + supplier +
    nation broadcast onto lineitem, then one shuffle join against
    orders, then a 2-key aggregate. Profit is computed per line in
    integer cents BEFORE aggregation, so the cross-engine sum is exact
    regardless of addition order."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like(name_like))
        .select("p_partkey", cents(F.col("p_retailprice")).alias("cost_c"))
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    li = load(spark, sf_dir, "lineitem")
    amount = cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ) - F.col("cost_c") * F.col("l_quantity").cast("long")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select("n_name", "o_year", amount.alias("amount_c"))
        .groupBy("n_name", "o_year")
        .agg(F.sum("amount_c").alias("profit_c"))
        .orderBy("n_name", F.desc("o_year"))
    )


def q9_sql(name_like: str = "%small%") -> str:
    """Oracle builder sharing q9_product_type_profit's parameter."""
    return f"""
SELECT n_name,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(sum({cents_sql('l_extendedprice * (1 - l_discount)')}
                - {cents_sql('p_retailprice')} * CAST(l_quantity AS BIGINT))
            AS BIGINT) AS profit_c
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '{name_like}'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


Q9_SQL = q9_sql()


def q11_important_stock(spark, sf_dir, permille: int = 1):
    """TPC-H Q11 flavor: parts whose traded value through suppliers of
    a nation group exceeds a per-mille fraction of the group total. The
    correlated scalar (SELECT sum * fraction) becomes a 1-row aggregate
    broadcast into the filter — same shape as Q15's scalar max — and
    the fraction test is integer cross-multiplication
    (value_c * 1000 > total_c), never a float threshold."""
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 5)
        .select("s_suppkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey", cents(F.col("l_extendedprice")).alias("val_c"))
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum("val_c").alias("value_c")
    )
    total = per_part.agg(F.sum("value_c").alias("total_c"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_c") * 1000 > F.col("total_c") * permille)
        .select("l_partkey", "value_c")
        .orderBy(F.desc("value_c"), "l_partkey")
    )


def q11_sql(permille: int = 1) -> str:
    """Oracle builder sharing q11_important_stock's parameter."""
    return f"""
WITH per_part AS (
  SELECT l_partkey,
         CAST(sum({cents_sql('l_extendedprice')}) AS BIGINT) AS value_c
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey < 5
  GROUP BY l_partkey
)
SELECT l_partkey, value_c
FROM per_part
WHERE value_c * 1000 > (SELECT sum(value_c) FROM per_part) * {permille}
ORDER BY value_c DESC, l_partkey
"""


Q11_SQL = q11_sql()


def q16_supplier_relationship_count(spark, sf_dir):
    """TPC-H Q16 flavor: how many distinct suppliers serve each
    (brand, type, size) part class, excluding flagged suppliers (the
    original's complaints-LIKE subquery respec'd as negative account
    balance). The exclusion is a broadcast LEFT ANTI join BEFORE the
    distinct aggregation; the distinct itself rides the same
    (class-keys, suppkey) shuffle as the count — one exchange total.
    The part<->supplier relation derives from lineitem (no partsupp)."""
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(
            F.broadcast(bad),
            li.l_suppkey == bad.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"
        )
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO' AND p_size IN (1, 5, 10, 15, 20, 25)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_excess_share_suppliers(spark, sf_dir, name_like: str = "%small%"):
    """TPC-H Q20 flavor: suppliers who dominate the year-2000 shipped
    volume of some name-matched part (shipped share respec of the
    availqty > 50% test: pair quantity x 2 > part total, integer-exact
    on quantity cents). The nested IN-subquery chain of the original
    becomes aggregate -> self-broadcast threshold join -> LEFT SEMI
    onto supplier, so the big fact is read once and only (part, supp)
    aggregates flow through the qualification."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like(name_like))
        .select("p_partkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "2000-01-01")
            & (F.col("l_shipdate") < "2001-01-01")
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey", cents(F.col("l_quantity")).alias("q_c"))
    )
    pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("q_c").alias("pair_q")
    )
    part_tot = pair.groupBy("l_partkey").agg(F.sum("pair_q").alias("tot_q"))
    qual = (
        pair.join(F.broadcast(part_tot), "l_partkey")
        .filter(F.col("pair_q") * 2 > F.col("tot_q"))
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 13)
    return (
        s.join(qual, s.s_suppkey == qual.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_nationkey")
        .orderBy("s_suppkey")
    )


def q20_sql(name_like: str = "%small%") -> str:
    """Oracle builder sharing q20_excess_share_suppliers's parameter."""
    return f"""
WITH li AS (
  SELECT l_partkey, l_suppkey, {cents_sql('l_quantity')} AS q_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '{name_like}'
    AND l_shipdate >= '2000-01-01' AND l_shipdate < '2001-01-01'
), pair AS (
  SELECT l_partkey, l_suppkey, CAST(sum(q_c) AS BIGINT) AS pair_q
  FROM li GROUP BY l_partkey, l_suppkey
), tot AS (
  SELECT l_partkey, CAST(sum(pair_q) AS BIGINT) AS tot_q
  FROM pair GROUP BY l_partkey
)
SELECT s_suppkey, s_name, s_nationkey
FROM supplier
WHERE s_nationkey < 13
  AND s_suppkey IN (
    SELECT l_suppkey FROM pair JOIN tot USING (l_partkey)
    WHERE pair_q * 2 > tot_q
  )
ORDER BY s_suppkey
"""


Q20_SQL = q20_sql()


def rolling_active_users(spark, sf_dir, window_days: int = 7):
    """Rolling 7-day distinct active users per day. Spark (and SQL
    generally) cannot run count(DISTINCT) over a RANGE window frame, so
    the scalable rewrite is: dedup to (day, user) once (the only pass
    over the raw events), explode each pair to the ``window_days`` days
    it stays active for, and count distinct per target day. The explode
    multiplies the already-deduped day-level pairs — days x users x 7
    rows, independent of raw event volume. Days are integer epoch days
    (bit-exact cross-engine); only days present in the data are
    reported (same rule both sides)."""
    ev = load(spark, sf_dir, "events").select(
        F.floor(
            F.unix_millis(F.col("ts").cast("timestamp")) / 86400000
        ).cast("long").alias("day"),
        "user_id",
    )
    day_user = ev.distinct()
    present = day_user.select("day").distinct()
    fanned = day_user.select(
        F.explode(
            F.sequence(
                F.col("day"), F.col("day") + (window_days - 1)
            )
        ).alias("day"),
        "user_id",
    )
    return (
        fanned.join(present, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias(f"active_{window_days}d"))
        .orderBy("day")
    )


ROLLING_ACTIVE_SQL = """
WITH day_user AS (
  SELECT DISTINCT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day, user_id
  FROM events
), fanned AS (
  SELECT day + o AS day, user_id
  FROM day_user, unnest(range(0, 7)) t(o)
)
SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS active_7d
FROM fanned
WHERE day IN (SELECT day FROM day_user)
GROUP BY day ORDER BY day
"""


QUERIES = {
    "rel_q1_pricing_summary": q1_pricing_summary,
    "rel_q3_shipping_priority": q3_shipping_priority,
    "rel_q5_local_supplier": q5_local_supplier,
    "rel_top_customers_per_nation": top_customers_per_nation,
    "rel_brand_revenue_topk": brand_revenue_topk,
    "rel_events_hourly": events_hourly,
    "rel_events_sessions": events_sessions,
    "rel_revenue_rollup": revenue_rollup,
    "rel_orderstatus_pivot": orderstatus_pivot,
    "rel_asof_last_event": asof_event_to_order,
    "rel_events_json_props": events_json_props,
    "rel_q7_volume_shipping": q7_volume_shipping,
    "rel_churned_customers": churned_customers,
    "rel_q4_order_priority": q4_order_priority,
    "rel_q6_forecast_revenue": q6_forecast_revenue,
    "rel_q10_returned_items": q10_returned_items,
    "rel_q15_top_supplier": q15_top_supplier,
    "rel_q18_large_volume": q18_large_volume_customers,
    "rel_q22_idle_customers": q22_idle_customers,
    "rel_retention_cohorts": retention_cohorts,
    "rel_q21_waiting_supplier": q21_waiting_supplier,
    "rel_funnel_steps": funnel_steps,
    "rel_q12_priority_class": q12_priority_by_class,
    "rel_q13_custdist": q13_customer_distribution,
    "rel_q14_promo_revenue": q14_promo_revenue,
    "rel_q17_small_qty": q17_small_qty_revenue,
    "rel_q19_disjunctive": q19_disjunctive_revenue,
    "rel_range_join_attribution": range_join_attribution,
    "rel_q2_min_cost_supplier": q2_min_cost_supplier,
    "rel_q8_market_share": q8_market_share,
    "rel_q9_product_profit": q9_product_type_profit,
    "rel_q11_important_stock": q11_important_stock,
    "rel_q16_supplier_count": q16_supplier_relationship_count,
    "rel_q20_excess_share": q20_excess_share_suppliers,
    "rel_rolling_active_users": rolling_active_users,
}

ORACLES = {
    "rel_q1_pricing_summary": Q1_SQL,
    "rel_q3_shipping_priority": Q3_SQL,
    "rel_q5_local_supplier": Q5_SQL,
    "rel_top_customers_per_nation": TOP_CUSTOMERS_SQL,
    "rel_brand_revenue_topk": BRAND_REVENUE_SQL,
    "rel_events_hourly": EVENTS_HOURLY_SQL,
    "rel_events_sessions": EVENTS_SESSIONS_SQL,
    "rel_revenue_rollup": REVENUE_ROLLUP_SQL,
    "rel_orderstatus_pivot": ORDERSTATUS_PIVOT_SQL,
    "rel_asof_last_event": ASOF_SQL,
    "rel_events_json_props": EVENTS_JSON_SQL,
    "rel_q7_volume_shipping": Q7_SQL,
    "rel_churned_customers": CHURNED_SQL,
    "rel_q4_order_priority": Q4_SQL,
    "rel_q6_forecast_revenue": Q6_SQL,
    "rel_q10_returned_items": Q10_SQL,
    "rel_q15_top_supplier": Q15_SQL,
    "rel_q18_large_volume": Q18_SQL,
    "rel_q22_idle_customers": Q22_SQL,
    "rel_retention_cohorts": RETENTION_SQL,
    "rel_q21_waiting_supplier": Q21_SQL,
    "rel_funnel_steps": FUNNEL_SQL,
    "rel_q12_priority_class": Q12_SQL,
    "rel_q13_custdist": Q13_SQL,
    "rel_q14_promo_revenue": Q14_SQL,
    "rel_q17_small_qty": Q17_SQL,
    "rel_q19_disjunctive": Q19_SQL,
    "rel_range_join_attribution": RANGE_JOIN_SQL,
    "rel_q2_min_cost_supplier": Q2_SQL,
    "rel_q8_market_share": Q8_SQL,
    "rel_q9_product_profit": Q9_SQL,
    "rel_q11_important_stock": Q11_SQL,
    "rel_q16_supplier_count": Q16_SQL,
    "rel_q20_excess_share": Q20_SQL,
    "rel_rolling_active_users": ROLLING_ACTIVE_SQL,
}
