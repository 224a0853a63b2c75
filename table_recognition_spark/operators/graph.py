"""Iterative graph algebra over a derived co-purchase graph.

No reference counterpart (the reference's only graph is the per-image
k-NN cell graph, core/knn.py); this adds the join-per-iteration
distributed pattern — the one large-scale shape the suite's iterative
operators (connected components' pointer jumping, BPE's delta rounds)
don't yet cover: a fixed-point computation whose every round is a
full edge-relation join + aggregate.

Graph: parts co-purchased in the same order (lineitem self-joined on
l_orderkey), undirected, deduplicated. PageRank runs a FIXED 5
iterations in exact integer arithmetic — ranks in micro-units, damping
0.85 as (150000 + 850·x div 1000), per-edge contribution rank div
out_degree — so the result is bit-identical across engines and the
DuckDB oracle can unroll the same five rounds as chained CTEs.
(Floating-point PageRank would hash-mismatch on summation order; the
integer respec trades conserved mass for cross-engine exactness, the
same trade the suite's HLL/surprisal operators make.)

Scale shape: the edge relation is built ONCE (one self-join shuffle on
the order key, then distinct) and checkpointed; each iteration is one
hash join of the rank vector (|V| rows) against the edge list on src +
one groupBy(dst) aggregate — both exchanges on the same keys every
round, which a real cluster co-partitions so only the rank vector
moves. Degrees ride inside the edge relation so the per-round join is
single, not double. No driver-side state: the loop composes a lazy
plan, one action at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .common import load

N_ITERS = 5
R0 = 1_000_000  # initial rank, micro-units


def copurchase_edges(li: DataFrame, partitions: int | None = None) -> DataFrame:
    """(src, dst, deg): distinct directed co-purchase edges (both
    directions of the undirected pair) with the source's out-degree
    attached, hash-partitioned on ``src``.

    Shape (round-7 rework, guide §2.4): the order's part set is built
    with ONE exchange (groupBy order key + collect_set — the self-join
    it replaces shuffled the line table twice), the pair fan-out is
    exploded map-side, and a single repartition on ``src`` then feeds
    BOTH the (src, dst) dedup and the degree window without further
    exchanges — hashpartitioning(src) satisfies the dedup aggregate's
    clustered-distribution requirement on (src, dst) and the window's
    partitioning, so the relation leaves this function already
    partitioned for the iteration loop's join. The previous
    self-join → distinct → groupBy-deg → join-deg → repartition shape
    moved the edge relation through three more exchanges; the rebuild
    measured 3.15 s → 1.33 s at sf0.1 (identical edge set)."""
    from pyspark.sql import Window

    if partitions is None:
        partitions = li.sparkSession.sparkContext.defaultParallelism
    # fan the line table out before the per-order aggregation: the
    # testdata parquet is one file / one row group, so the scan (and
    # the partial collect_set over 600k rows) would otherwise run as a
    # single task (same rationale as _shingle_df's repartition)
    per_order = li.repartition(partitions).groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("parts")
    )
    pairs = (
        per_order.select(F.explode("parts").alias("src"), "parts")
        .select("src", F.explode("parts").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    return (
        pairs.repartition(partitions, "src")
        .dropDuplicates(["src", "dst"])
        .withColumn("deg", F.count("*").over(Window.partitionBy("src")))
    )


def pagerank(edges: DataFrame, n_iters: int = N_ITERS) -> DataFrame:
    """(node, rank): integer PageRank after ``n_iters`` rounds.
    Every node of the symmetric edge set has in- and out-edges, so no
    dangling-mass term is needed."""
    ranks = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "rank", F.lit(R0).cast("long")
    )
    for _ in range(n_iters):
        ranks = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div deg").alias("c"),
            )
            .groupBy("node")
            .agg(
                (F.lit(150_000) + F.expr("(850 * sum(c)) div 1000"))
                .cast("long")
                .alias("rank")
            )
        )
    return ranks


def graph_pagerank(spark, sf_dir) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # hash-partitioned on src BEFORE the checkpoint, with AQE off while
    # the checkpoint plan is built: under AQE the checkpointed
    # LogicalRDD records UnknownPartitioning (the adaptive plan's final
    # partitioning isn't static), so Catalyst would re-exchange the
    # edge relation in EVERY iteration.  With the partitioning
    # statically known, the edge scans in the loop plan carry
    # hashpartitioning(src) + sort order and the per-iteration join
    # elides both Exchange and Sort on the edge side — the only
    # shuffle per round is the groupBy(dst) transpose, the algorithmic
    # minimum: ranks move, edges never do.  Pinned by
    # tests/test_plans.py::test_pagerank_iteration_reuses_edge_partitioning;
    # at sf0.1 this halves the whole query (13.2 -> ~6.7 s).
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # copurchase_edges already hash-partitions on src (one
        # repartition inside, shared by its dedup + degree window)
        edges = copurchase_edges(li).localCheckpoint()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    return pagerank(edges).orderBy("node")


def graph_pagerank_sql() -> str:
    rounds = []
    prev = "r0"
    for k in range(1, N_ITERS + 1):
        rounds.append(
            f"""r{k} AS (
      SELECT e.dst AS node,
             150000 + (850 * sum(r.rank // e.deg)) // 1000 AS rank
      FROM edges e JOIN {prev} r ON e.src = r.node GROUP BY e.dst
    )"""
        )
        prev = f"r{k}"
    chain = ",\n    ".join(rounds)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey <> b.l_partkey
    ),
    deg AS (SELECT src, count(*) AS deg FROM pairs GROUP BY src),
    edges AS (
      SELECT p.src, p.dst, d.deg FROM pairs p JOIN deg d ON p.src = d.src
    ),
    r0 AS (
      SELECT DISTINCT src AS node, CAST({R0} AS BIGINT) AS rank FROM pairs
    ),
    {chain}
    SELECT node, CAST(rank AS BIGINT) AS rank FROM {prev} ORDER BY node
    """


QUERIES = {"graph_pagerank": graph_pagerank}
ORACLES = {"graph_pagerank": graph_pagerank_sql()}
