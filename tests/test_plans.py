"""Catalyst plan regression tests — the plan properties that make the
pipeline survive a 100× scale-up, pinned so refactors can't silently
lose them."""

import pytest

from table_recognition_spark.fixtures.generate import corpus_to_spark
from table_recognition_spark.pipeline.extract import extract


def _formatted_plan(df):
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture(scope="module")
def plan(spark, tiny_corpus, weights, tmp_path_factory):
    docs, media, _ = tiny_corpus
    docs_df, media_df = corpus_to_spark(spark, docs, media)
    # write to parquet so scans show real ReadSchema pruning
    base = tmp_path_factory.mktemp("plans")
    docs_df.write.parquet(str(base / "docs"))
    media_df.write.parquet(str(base / "media"))
    d = spark.read.parquet(str(base / "docs"))
    m = spark.read.parquet(str(base / "media"))
    return _formatted_plan(extract(d, m, weights))


def test_image_column_pruned_from_media_scan(plan):
    """The potentially-huge binary column must never leave the scan."""
    for block in plan.split("\n\n"):
        if "media" in block and "ReadSchema" in block:
            assert "image" not in block, block


def test_single_real_shuffle(plan):
    """Reassembly is the only Exchange; everything else broadcasts."""
    import re

    exchanges = re.findall(r"\n\((\d+)\) (Exchange|BroadcastExchange)", plan)
    real = [e for e in exchanges if e[1] == "Exchange"]
    # final groupBy + distinct(media_ref) aggregate + the deliberate
    # kernel repartition (straggler-tail levelling)
    assert len(real) <= 3, exchanges


def test_kernel_is_arrow_batched(plan):
    assert "MapInArrow" in plan or "PythonMapInArrow" in plan, plan[:800]
    # no row-at-a-time python UDFs anywhere in the pipeline
    assert "BatchEvalPython" not in plan


def test_text_strip_is_jvm_side(plan):
    """Default text engine compiles to regexp_replace in a Project —
    whole-stage codegen, no Python."""
    assert "regexp_replace" in plan
    assert "ArrowEvalPython" not in plan


def test_no_per_row_python_udf_registered():
    """Lint (SURVEY §7 hard part d): the engine never uses row-at-a-time
    F.udf in pipeline/operator code."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent / "table_recognition_spark"
    for py in root.rglob("*.py"):
        src = py.read_text()
        assert "F.udf(" not in src and "@udf" not in src, py


def test_split_filter_pushed_to_scan(spark, tmp_path):
    """filter_split's isin predicate must reach the parquet scan as a
    PushedFilters In(...) entry — at 100 TB this is partition/row-group
    pruning, not a post-scan filter."""
    from table_recognition_spark.operators.dataset_ops import filter_split

    df = spark.createDataFrame(
        [(i, f"u{i}") for i in range(100)], "doc_id long, txt string"
    )
    path = str(tmp_path / "docs")
    df.write.parquet(path)
    out = filter_split(spark.read.parquet(path), [3, 17, 42], "doc_id")
    p = _formatted_plan(out)
    assert "PushedFilters" in p and "In(doc_id" in p, p


def test_embedding_dedup_no_cartesian(spark):
    """The banded-LSH candidate join must stay an equi-join on
    (band, bucket) — a refactor that degrades it to a cartesian /
    nested-loop product dies at 100 TB."""
    from table_recognition_spark.operators.dedup import (
        dedup_embedding_cosine,
    )

    p = _formatted_plan(
        dedup_embedding_cosine(spark, "/root/testdata/sf0.001")
    )
    assert "CartesianProduct" not in p, p[:1200]
    assert "BroadcastNestedLoopJoin" not in p, p[:1200]
    spark.catalog.clearCache()


def test_jaccard_df_cap_before_pair_join(spark):
    """The document-frequency cap must sit between the shingle explode
    and the token self-join (an aggregate feeding the join input), so a
    universal shingle can never reach the pairing stage."""
    from pyspark.sql import functions as F

    from table_recognition_spark.operators import dedup

    df = dedup.dedup_jaccard_ngram(spark, "/root/testdata/sf0.001")
    p = _formatted_plan(df)
    # the cap is a HashAggregate producing df<=cap, joined back to tokens:
    # assert the filter constant survives into the physical plan
    assert f"<= {dedup.JACCARD_DF_CAP}" in p, p[:1500]
    spark.catalog.clearCache()
    _ = F


def test_decontaminate_broadcasts_benchmark_shingles(spark):
    """The benchmark shingle universe must reach the training side as a
    broadcast-hash join (eval sets are tiny vs the corpus); a refactor
    that shuffles the full training explode against it, or degrades to
    a nested-loop product, dies at 100 TB."""
    from table_recognition_spark.operators.dedup import decontaminate_ngram

    p = _formatted_plan(decontaminate_ngram(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in p, p[:1200]
    assert "CartesianProduct" not in p, p[:1200]
    assert "BroadcastNestedLoopJoin" not in p, p[:1200]


def test_repetition_filter_tokenizes_before_explode(spark):
    """The tokenizer must run behind a repartition barrier so
    CollapseProject can't inline the regex into the Generate and re-run
    it per exploded bigram (measured 6.0 s vs 1.1 s at sf0.1). Pinned:
    an Exchange sits between the scan-side Project (which carries the
    regex) and the Generate, and the Generate's own block carries no
    regexp."""
    import re

    from table_recognition_spark.operators.textstats import (
        repetition_filter,
    )

    p = _formatted_plan(repetition_filter(spark, "/root/testdata/sf0.001"))
    gen = [b for b in p.split("\n\n") if b.startswith("(") and "Generate" in b.split("\n")[0]]
    assert gen and all("regexp" not in b for b in gen), (gen or p)[:1500]
    # the tree shows Generate downstream of an Exchange (the barrier)
    tree = p.split("\n\n")[0]
    gen_line = next(i for i, l in enumerate(tree.splitlines()) if "Generate" in l)
    assert any(
        "Exchange" in l and "Broadcast" not in l
        for l in tree.splitlines()[gen_line:]
    ), tree


def test_pii_and_chunk_are_map_only(spark):
    """PII scrub and fixed chunking must stay map-only: a single pruned
    (doc_id, text) scan, no join, and no shuffle besides the
    deterministic output sort."""
    import re

    from table_recognition_spark.operators.textstats import (
        chunk_fixed,
        pii_scrub,
    )

    for fn in (pii_scrub, chunk_fixed):
        p = _formatted_plan(fn(spark, "/root/testdata/sf0.001"))
        assert "Join" not in p and "CartesianProduct" not in p, p[:1200]
        exchanges = re.findall(r"\n\(\d+\) Exchange", p)
        assert len(exchanges) <= 1, p[:1200]
        scans = [b for b in p.split("\n\n") if "ReadSchema" in b]
        assert len(scans) == 1 and "doc_id:bigint,text:string" in scans[0], (
            scans
        )


def test_hll_sketch_shuffles_registers_not_tokens(spark):
    """The HLL aggregation must partial-aggregate map-side so the
    shuffle carries at most M register rows per partition, never the
    token stream: the register groupBy appears as two HashAggregates
    around its Exchange (partial + final), and no join in the sketch
    branch is a cartesian surprise (the single-row crossJoin with the
    exact count is the one deliberate nested-loop)."""
    import re

    from table_recognition_spark.operators.sketch import (
        hll_distinct_tokens,
    )

    p = _formatted_plan(hll_distinct_tokens(spark, "/root/testdata/sf0.001"))
    # partial+final pairs: at least two HashAggregates per Exchange
    assert len(re.findall(r"HashAggregate", p)) >= 4, p[:1500]
    # the only nested-loop is the deliberate single-row estimate×exact
    tree = p.split("\n\n")[0]
    assert tree.count("BroadcastNestedLoopJoin") <= 1, tree
    assert "CartesianProduct" not in p, p[:1500]


def test_q4_exists_stays_semi_join(spark):
    """The EXISTS must execute as a LEFT SEMI join (one probe row per
    match, no fan-out) with both scans pre-filtered at the source: a
    refactor to inner-join + distinct re-shuffles the full returned
    fan-out at 100 TB."""
    from table_recognition_spark.queries.relational import (
        q4_order_priority,
    )

    p = _formatted_plan(q4_order_priority(spark, "/root/testdata/sf0.001"))
    assert "LeftSemi" in p, p[:1500]
    assert "EqualTo(l_returnflag,R)" in p, p[:1500]
    # lineitem side reads exactly the key + the pushed flag column
    scans = [b for b in p.split("\n\n") if "ReadSchema" in b]
    li = next(b for b in scans if "l_orderkey" in b)
    assert "l_extendedprice" not in li and "l_quantity" not in li, li


def test_q6_is_pure_pushdown_scan_agg(spark):
    """Q6 must stay join-free with every predicate pushed to the scan
    and a 4-column ReadSchema — the canonical pushdown showcase; its
    only exchange is the single-row final-agg gather."""
    import re

    from table_recognition_spark.queries.relational import (
        q6_forecast_revenue,
    )

    p = _formatted_plan(q6_forecast_revenue(spark, "/root/testdata/sf0.001"))
    assert "Join" not in p, p[:1200]
    assert len(re.findall(r"\n\(\d+\) Exchange", p)) == 1, p[:1200]
    scan = next(b for b in p.split("\n\n") if "ReadSchema" in b)
    assert "PushedFilters" in scan and "GreaterThanOrEqual(l_shipdate" in scan, scan
    for col in ("l_returnflag", "l_tax", "l_orderkey"):
        assert col not in scan, scan


def test_q10_broadcasts_dims_and_prunes(spark):
    """Customer and nation must arrive as broadcast-hash joins (dims vs
    a fact) and no join may degrade to a cartesian/nested-loop."""
    from table_recognition_spark.queries.relational import (
        q10_returned_items,
    )

    p = _formatted_plan(q10_returned_items(spark, "/root/testdata/sf0.001"))
    assert p.count("BroadcastHashJoin") >= 2, p[:1500]
    assert "CartesianProduct" not in p, p[:1500]
    assert "BroadcastNestedLoopJoin" not in p, p[:1500]


def test_pagerank_iteration_reuses_edge_partitioning(spark):
    """The per-iteration join must NOT re-shuffle the edge relation:
    edges are hash-partitioned on src before the checkpoint, so the
    only exchanges in the 5-round plan are the |V|-row rank-vector
    shuffles and groupBy(dst) aggregations — if an Exchange over the
    full edge relation reappears per round, the scale story (move
    ranks, not edges) is lost."""
    from pyspark.sql import functions as F

    from table_recognition_spark.operators import graph
    from table_recognition_spark.operators.common import load

    import re

    li = load(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        edges = graph.copurchase_edges(li, partitions=8).localCheckpoint()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    n_iters = 3
    plan = _formatted_plan(graph.pagerank(edges, n_iters=n_iters))
    # edge scans must carry the checkpoint-preserved partitioning...
    assert "hashpartitioning(src" in plan, plan[:2000]
    # ...so the ONLY exchanges are the per-round groupBy(dst) transpose
    # aggregations (n_iters of them); a per-round edge re-shuffle would
    # add n_iters more
    exchanges = re.findall(r"\n\(\d+\) Exchange", plan)
    assert len(exchanges) == n_iters, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan


def test_mv_incremental_fold_is_one_exchange(spark):
    """merge_partials must be union -> ONE hash aggregate exchange on
    the group key — a second exchange would mean the fold re-shuffles
    state it could have co-located."""
    import re

    from table_recognition_spark.operators import incremental
    from table_recognition_spark.operators.common import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    state = incremental._partials(ev).localCheckpoint()
    plan = _formatted_plan(
        incremental.merge_partials(state, incremental._partials(ev))
    )
    exchanges = re.findall(r"\n\(\d+\) Exchange", plan)
    assert len(exchanges) <= 2, plan[:2000]  # delta partials + the fold
