"""Round-5 operators: repeated-substring dedup, hashed-feature quality
classifier, count-min sketch. Cross-engine exactness is covered by the
DuckDB gate (tests/test_queries_duckdb.py); these pin the SEMANTIC
properties and the physical-plan scale claims."""

import re

import pytest

SF = "/root/testdata/sf0.001"


def _formatted_plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.mark.spark
def test_substring_spans_planted_full_dup(spark):
    """The planted exact copies (doc_id + 100000) duplicate their source
    doc verbatim, so BOTH ends must report the whole document as one
    duplicated span: dup_bps == 10000 and dup_tokens == n_tokens."""
    from pyspark.sql import functions as F

    from table_recognition_spark.operators.dedup import (
        SUBSTR_W,
        dedup_substring_spans,
    )

    out = dedup_substring_spans(spark, SF).cache()
    rows = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert rows, "no duplicated spans found"
    planted = [d for d in rows if 100000 < d < 200000]
    assert planted, "planted exact copies missing from output"
    for d in planted:
        src = d - 100000
        for end in (d, src):
            r = rows.get(end)
            if r is None:  # source shorter than the window
                continue
            if r["n_tokens"] >= SUBSTR_W:
                assert r["dup_bps"] == 10000, r
                assert r["dup_tokens"] == r["n_tokens"], r
    # spans are disjoint by construction: duplicated never exceeds total
    assert out.filter(F.col("dup_tokens") > F.col("n_tokens")).count() == 0
    out.unpersist()


@pytest.mark.spark
def test_substring_spans_dup_test_is_min_max(spark):
    """The per-shingle duplicate test must stay a constant-state
    min/max aggregate (skew-safe at any shingle frequency) — not a
    collect_list/collect_set of doc ids."""
    from table_recognition_spark.operators.dedup import (
        dedup_substring_spans,
    )

    p = _formatted_plan(dedup_substring_spans(spark, SF))
    assert "collect_list" not in p and "collect_set" not in p, p[:1500]


@pytest.mark.spark
def test_quality_classifier_map_only(spark):
    """The hashed-feature classifier must stay map-only: the model lives
    in the expression tree (HOF aggregate), so the plan has no join, no
    Generate (no explode), and at most the input-fanout exchange."""
    from table_recognition_spark.operators.textstats import (
        quality_classifier,
    )

    p = _formatted_plan(quality_classifier(spark, SF))
    assert "Join" not in p and "Generate" not in p, p[:1500]
    assert len(re.findall(r"\n\(\d+\) Exchange", p)) == 0, p[:1500]


@pytest.mark.spark
def test_quality_classifier_labels(spark):
    from pyspark.sql import functions as F

    from table_recognition_spark.operators.textstats import (
        quality_classifier,
    )

    out = quality_classifier(spark, SF).cache()
    assert out.filter(
        ((F.col("mean_milli") >= 0) & (F.col("label") != "keep"))
        | ((F.col("mean_milli") < 0) & (F.col("label") != "drop"))
    ).count() == 0
    # both classes occur on the fixture corpus (weights are ~uniform)
    labels = {r["label"] for r in out.select("label").distinct().collect()}
    assert labels == {"keep", "drop"}
    out.unpersist()


@pytest.mark.spark
def test_cms_never_undercounts(spark):
    """Count-min property: every counter is ≥ the exact count of its
    heaviest token (cnt aggregates ALL tokens in the cell), and a point
    query (min over depth rows) is ≥ the token's exact frequency."""
    from pyspark.sql import functions as F

    from table_recognition_spark.operators.common import load, tokens
    from table_recognition_spark.operators.sketch import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_token_counts,
    )

    out = cms_token_counts(spark, SF).cache()
    assert out.filter(F.col("cnt") < F.col("max_exact")).count() == 0
    assert out.count() <= CMS_DEPTH * CMS_WIDTH
    assert (
        out.select("row_idx").distinct().count() == CMS_DEPTH
    )
    # point query for the corpus's most frequent token
    occ = (
        load(spark, SF, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("tok"))
    )
    top_tok, exact_n = (
        occ.groupBy("tok").count().orderBy(F.desc("count"), "tok").first()
    )
    cells = {}
    import hashlib

    for j in range(CMS_DEPTH):
        h = hashlib.md5(f"{j}:{top_tok}".encode()).hexdigest()
        cells[j] = int(h[:8], 16) % CMS_WIDTH
    sketch = {
        (r["row_idx"], r["col_idx"]): r["cnt"] for r in out.collect()
    }
    est = min(sketch[(j, c)] for j, c in cells.items())
    assert est >= exact_n
    out.unpersist()


@pytest.mark.spark
def test_lang_id_planted_languages(spark, tmp_path):
    """Three planted 'languages' with disjoint trigram inventories must
    classify on the diagonal: the operator self-trains its rank profiles
    from the labeled corpus, so every doc's own-language profile is the
    out-of-place argmin."""
    from table_recognition_spark.operators.textstats import lang_id_ngram

    vocab = {
        "aa": ["alpha", "apple", "arrow", "amber"],
        "bb": ["zebra", "zulu", "zigzag", "zero"],
        "cc": ["mango", "mocha", "motor", "mimic"],
    }
    rows = []
    i = 0
    for lang, words in vocab.items():
        for k in range(6):
            text = " ".join(words[(k + j) % 4] for j in range(12 + k))
            rows.append((i, text, lang, f"s{i % 2}", len(text)))
            i += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in lang_id_ngram(spark, str(tmp_path)).collect()
    }
    assert out == {("aa", "aa"): 6, ("bb", "bb"): 6, ("cc", "cc"): 6}, out


@pytest.mark.spark
def test_lang_id_no_cartesian_no_udf(spark):
    """Round-7 shape: the collected language profiles ride inside the
    classify kernel, so the final plan is one map-only Arrow pass plus
    the confusion-matrix aggregation — no joins at all, no per-row
    BatchEvalPython, and at most the single groupBy exchange."""
    import re

    from table_recognition_spark.operators.textstats import lang_id_ngram

    p = _formatted_plan(lang_id_ngram(spark, SF))
    assert "BatchEvalPython" not in p
    assert "CartesianProduct" not in p
    assert "Join" not in p, p[:1500]
    # repartition fan-out + the confusion groupBy: nothing else shuffles
    assert len(re.findall(r"\n\(\d+\) Exchange", p)) <= 2, p[:1500]


@pytest.mark.spark
def test_semantic_dedup_drops_planted_exact_copies(spark):
    """SemDeDup anchor independent of the committed parquet: every
    planted exact copy (vec_id + 100000) is bit-identical to its source
    vector, so it lands in the same cluster and at most one of the pair
    survives (both may drop when a third near-dup — e.g. the +200000
    planting for vec_id % 77 == 0 sources — scans first and evicts
    both); near-dup pairs (cos ≈ 0.989 ≥ 0.95 threshold) dedup whenever
    clustering co-locates them (cross-cluster escapes are the
    documented SemDeDup trade-off, so assert a floor, not totality)."""
    from table_recognition_spark.operators.dedup import dedup_semantic

    rows = dedup_semantic(spark, SF).collect()
    by_id = {r.vec_id: r for r in rows}
    exact = [r for r in rows if 100000 <= r.vec_id < 200000]
    assert exact, "fixture must plant exact copies"
    for r in exact:
        orig = by_id[r.vec_id - 100000]
        assert not (r.kept and orig.kept), f"pair {r.vec_id} both kept"
    near = [r for r in rows if r.vec_id >= 200000]
    deduped = sum(
        1 for r in near if not (r.kept and by_id[r.vec_id - 200000].kept)
    )
    assert deduped >= 0.8 * len(near), (deduped, len(near))
    # every dropped row names a kept keeper in its own cluster
    for r in rows:
        if not r.kept:
            keeper = by_id[r.kept_by]
            assert keeper.kept and keeper.cluster == r.cluster


@pytest.mark.spark
def test_semantic_dedup_matches_numpy_mirror(spark):
    """The distributed greedy must equal a single-process numpy replay
    of the same spec (same centroids, same integer order key, same
    integer cosine rule) — the no-Spark anchor for the expected-parquet
    oracle."""
    import numpy as np

    from table_recognition_spark.operators.dedup import (
        _SEM_T, _emb_quantized, dedup_semantic,
    )
    from table_recognition_spark.operators.similarity import (
        _ivf_train_centroids,
    )

    got = {
        r.vec_id: (r.cluster, r.kept, r.kept_by)
        for r in dedup_semantic(spark, SF).collect()
    }

    pdf = _emb_quantized(spark, SF).toPandas()
    X = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
    ids = pdf["vec_id"].to_numpy()
    n2 = pdf["norm2"].to_numpy().astype(np.int64)
    # same seeded sample: md5(vec_id) roll < 50, lowest 4096 by vec_id
    import hashlib

    roll = np.array(
        [
            int(hashlib.md5(str(v).encode()).hexdigest()[:4], 16) % 100
            for v in ids
        ]
    )
    samp = np.argsort(ids[roll < 50])
    cent = _ivf_train_centroids(X[roll < 50][samp])
    d2 = (
        (X.astype(float) ** 2).sum(1)[:, None]
        - 2.0 * (X.astype(float) @ cent.T)
        + (cent**2).sum(1)[None, :]
    )
    cluster = d2.argmin(1)
    t_num, t_den = _SEM_T
    exp = {}
    for c in np.unique(cluster):
        m = np.nonzero(cluster == c)[0]
        Xc, idc, n2c = X[m], ids[m], n2[m]
        n = len(m)
        S = Xc.sum(0)
        key = n * n * n2c - 2 * n * (Xc @ S) + int(S @ S)
        kept_rows = []
        for i in np.lexsort((idc, -key)):
            kb = None
            for j in kept_rows:
                d = int(Xc[j] @ Xc[i])
                if d > 0 and t_num * d * d >= t_den * int(n2c[j]) * int(
                    n2c[i]
                ):
                    kb = int(idc[j])
                    break
            if kb is None:
                kept_rows.append(i)
            exp[int(idc[i])] = (int(c), kb is None, kb)
    assert got == exp


@pytest.mark.spark
def test_winnow_guarantee_shared_passage(spark):
    """Winnowing guarantee (Schleimer et al. §3): any shared token run of
    length >= w + k - 1 between two documents must share at least one
    selected fingerprint HASH. Two docs embed the same 12-token passage
    (t = 4 + 5 - 1 = 8) at different offsets; a third is disjoint."""
    from pyspark.sql import functions as F

    from table_recognition_spark.operators.textstats import (
        POS_BASE,
        WINNOW_K,
        WINNOW_W,
        _winnow_selected,
    )

    passage = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    docs = spark.createDataFrame(
        [
            (1, "intro words before " + passage + " trailing tail"),
            (2, passage + " completely different ending here now"),
            (3, "zulu yankee xray whiskey victor uniform tango sierra romeo"),
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: set(r["hashes"])
        for r in _winnow_selected(docs, WINNOW_K, WINNOW_W)
        .select(
            "doc_id",
            F.transform("selected", lambda x: (x - x % POS_BASE) / POS_BASE)
            .cast("array<long>")
            .alias("hashes"),
        )
        .collect()
    }
    assert out[1] & out[2], "shared passage must share a fingerprint hash"
    assert not (out[1] & out[3]) and not (out[2] & out[3])


@pytest.mark.spark
def test_winnow_plan_map_only(spark):
    """The winnowing signature never shuffles: map-only over the scan."""
    from table_recognition_spark.operators.textstats import winnow_fingerprints

    plan = _formatted_plan(winnow_fingerprints(spark, SF))
    assert "Exchange" not in plan


@pytest.mark.spark
def test_new_queries_no_cartesian_no_row_udf(spark):
    """Round-5 additions must keep the scale shapes: no cartesian /
    nested-loop products anywhere, broadcast joins where a side is
    bounded (bloom probe, LM unigram table, sq8 query set), and zero
    per-row Python UDFs (BatchEvalPython) in any plan."""
    import __spark_entry__ as E

    qs = E.queries()
    names = [
        "text_winnow_fingerprints",
        "text_lm_surprisal",
        "rel_retention_cohorts",
        "rel_q21_waiting_supplier",
        "rel_funnel_steps",
        "sketch_bloom_membership",
        "sim_sq8_topk",
    ]
    broadcast_required = {
        "text_lm_surprisal",
        "sketch_bloom_membership",
    }
    for name in names:
        p = _formatted_plan(qs[name](spark, SF))
        assert "CartesianProduct" not in p, (name, p[:1200])
        assert "BatchEvalPython" not in p, (name, p[:1200])
        if name in broadcast_required:
            assert "BroadcastHashJoin" in p, (name, p[:1200])
        if name == "sim_sq8_topk":
            # the 5-row query set fans out via a deliberate broadcast
            # nested-loop (non-equi vec_id != query_id), same shape as
            # sim_bruteforce_topk — the candidate side never shuffles
            assert "BroadcastNestedLoopJoin" in p, (name, p[:1200])
        if name == "rel_q21_waiting_supplier":
            # round-7 shape: the EXISTS/NOT-EXISTS semi/anti self-join
            # legs collapsed into one per-order window over the
            # li⋈orders join (distinct-supplier set sizes); the window
            # must reuse the join's l_orderkey partitioning, so no
            # self-join of the line table remains
            assert "LeftSemi" not in p and "LeftAnti" not in p, (
                name, p[:1500],
            )
            assert "Window" in p, (name, p[:1500])


@pytest.mark.spark
def test_bloom_no_false_negatives_and_synth_probes(spark):
    """Bloom invariants: every actual member must be predicted a member
    (no false negatives, ever); synthetic probes are present and any
    predicted&!actual rows are the measured false positives."""
    from table_recognition_spark.operators.sketch import (
        BLOOM_SYNTH_PROBES,
        bloom_membership,
    )

    rows = bloom_membership(spark, SF).collect()
    assert all(r["predicted_member"] for r in rows if r["actual_member"])
    synth = [r for r in rows if r["probe_key"].startswith("probe:")]
    assert len(synth) == BLOOM_SYNTH_PROBES
    assert not any(r["actual_member"] for r in synth)


@pytest.mark.spark
def test_sq8_quantization_range_and_recall(spark):
    """q8 components stay in [-127, 127]; the int8 path's top-10 must
    overlap the exact milli-quantized top-10 heavily (>= 7/10 mean) —
    quantization loses precision, not the neighbourhood."""
    from pyspark.sql import functions as F

    from table_recognition_spark.operators.similarity import (
        N_QUERIES,
        sim_bruteforce_topk,
        sim_sq8_topk,
    )

    exact = {}
    for r in sim_bruteforce_topk(spark, SF).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx = {}
    for r in sim_sq8_topk(spark, SF).collect():
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact[q] & approx[q]) / len(exact[q]) for q in exact
    ]
    assert len(recalls) == N_QUERIES
    assert sum(recalls) / len(recalls) >= 0.7, recalls
    _ = F


@pytest.mark.spark
def test_round5b_queries_plan_shapes(spark):
    """The second batch of round-5 relational queries keeps the scale
    shapes: q14/q17/q19 broadcast their bounded side onto the lineitem
    fact (never shuffling the fact for a dim), q13's outer join stays a
    hash join, and none of them degrade to cartesian products or
    per-row Python."""
    import __spark_entry__ as E

    qs = E.queries()
    broadcast_required = {
        "rel_q14_promo_revenue",
        "rel_q17_small_qty",
        "rel_q19_disjunctive",
    }
    for name in (
        "rel_q12_priority_class",
        "rel_q13_custdist",
        "rel_q14_promo_revenue",
        "rel_q17_small_qty",
        "rel_q19_disjunctive",
    ):
        p = _formatted_plan(qs[name](spark, SF))
        assert "CartesianProduct" not in p, (name, p[:1200])
        assert "BroadcastNestedLoopJoin" not in p, (name, p[:1200])
        assert "BatchEvalPython" not in p, (name, p[:1200])
        if name in broadcast_required:
            assert "BroadcastHashJoin" in p, (name, p[:1200])


@pytest.mark.spark
def test_range_join_is_binned_equi_join(spark):
    """The interval join must execute as the bucket-explode equi-join
    rewrite — a SortMergeJoin/ShuffledHashJoin on (user_id, bucket)
    with the range test as a residual — NEVER a nested-loop product,
    which is what a naive `ON v_ms BETWEEN ms-w AND ms` plans as and
    what dies first at 100x event volume."""
    from table_recognition_spark.queries.relational import (
        range_join_attribution,
    )

    p = _formatted_plan(range_join_attribution(spark, SF))
    assert "BroadcastNestedLoopJoin" not in p, p[:1500]
    assert "CartesianProduct" not in p, p[:1500]
    assert "Explode" in p or "Generate" in p, p[:1500]
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", p), p[:1500]


@pytest.mark.spark
def test_range_join_zero_view_purchases_kept(spark):
    """Purchases with no preceding views inside the window must appear
    in the views_30m = 0 bucket (left-outer semantics), and the
    distribution must cover every purchase exactly once."""
    from pyspark.sql import functions as F

    from table_recognition_spark.operators.common import load
    from table_recognition_spark.queries.relational import (
        range_join_attribution,
    )

    dist = range_join_attribution(spark, SF).collect()
    n_purchases = (
        load(spark, SF, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r["n_purchases"] for r in dist) == n_purchases
    by_bucket = {r["views_30m"]: r["n_purchases"] for r in dist}
    assert by_bucket.get(0, 0) > 0, by_bucket


@pytest.mark.spark
def test_round5c_tpch_plan_shapes(spark):
    """Third batch (Q2/Q8/Q9/Q11/Q16/Q20 flavors): dims broadcast onto
    the fact, the Q11 scalar arrives as a broadcast (never a shuffled
    cross product of real cardinality), Q16's exclusion stays an anti
    join, Q20's qualification ends in a semi join — and nothing plans a
    cartesian product or per-row Python."""
    import __spark_entry__ as E

    qs = E.queries()
    for name in (
        "rel_q2_min_cost_supplier",
        "rel_q8_market_share",
        "rel_q9_product_profit",
        "rel_q11_important_stock",
        "rel_q16_supplier_count",
        "rel_q20_excess_share",
    ):
        p = _formatted_plan(qs[name](spark, SF))
        assert "CartesianProduct" not in p, (name, p[:1200])
        assert "BatchEvalPython" not in p, (name, p[:1200])
        assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p, (
            name, p[:1200],
        )
        if name == "rel_q11_important_stock":
            # the single-row total may legitimately plan as a broadcast
            # nested loop (it IS a 1-row cross join); anything else no
            pass
        else:
            assert "BroadcastNestedLoopJoin" not in p, (name, p[:1200])
        if name == "rel_q16_supplier_count":
            assert "LeftAnti" in p, (name, p[:1500])
        if name == "rel_q20_excess_share":
            assert "LeftSemi" in p, (name, p[:1500])


@pytest.mark.spark
def test_hist_quantile_sketch_bounds_exact(spark):
    """The binned sketch's reported bound is its bin's inclusive upper
    bound, so for every source and every q: exact_pq <= pq_ub < 2 *
    max(exact_pq, 1) — the < 2x guarantee of power-of-2 bins. Also the
    plan must shuffle only (source, bin) aggregates, never raw docs:
    no pandas UDF, one partial-agg exchange feeding the windows."""
    import duckdb

    from table_recognition_spark.operators.sketch import (
        HIST_QUANTILES,
        histogram_quantiles,
    )

    rows = {r["source"]: r for r in histogram_quantiles(spark, SF).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    for q in HIST_QUANTILES:
        exact = dict(
            con.execute(
                "SELECT source, CAST(quantile_disc(n_chars, "
                f"{q / 100.0}) AS BIGINT) FROM documents GROUP BY source"
            ).fetchall()
        )
        for src, r in rows.items():
            ub = r[f"p{q}_ub"]
            assert exact[src] <= ub < 2 * max(exact[src], 1), (
                q, src, exact[src], ub,
            )
    p = _formatted_plan(histogram_quantiles(spark, SF))
    assert "BatchEvalPython" not in p
    assert "partial_count" in p or "HashAggregate" in p, p[:800]
