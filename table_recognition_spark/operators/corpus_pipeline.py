"""End-to-end pretraining-corpus curation: the LLM-data operators
composed into the pipeline a real user runs, as ONE oracled query.

The individual operators (quality filtering, exact dedup,
benchmark decontamination) each have their own driver-gated query;
this module chains them in the canonical curation order and reports
the per-(source, stage) accounting a data-pipeline owner actually
looks at — how many documents and tokens each stage removed, by
corpus source:

    bench_heldout        held-out eval split (excluded before training)
    dropped_quality      token-count / stopword-ratio gate
    dropped_dup          exact duplicate of an earlier survivor
    dropped_contaminated ≥25% distinct-3-gram overlap with the bench set
    kept                 the final training corpus

Stage order is load-bearing (and pinned by the oracle): quality is
map-only so it runs first; dedup sees only quality survivors; the
(expensive) shingle join sees only dedup survivors. Planted duplicates
reuse the exact scheme of the dedup family (operators/dedup.py) so the
dedup stage has real work, and the interplay cases are covered by
construction: a planted copy of a *bench* document sails through dedup
(its original was held out before the dedup stage) and is then caught
by decontamination with 100% shingle overlap.

Scale design: stages never re-shuffle the corpus redundantly — one
hash exchange on the fingerprint (dedup window), one on (doc_id) for
the shingle-overlap count with the bench shingle universe broadcast,
and a final tiny (source, stage) rollup. Everything else is
whole-stage-codegen column work. At 100 TB the broadcast side is the
eval benchmark (small by definition) and the per-stage accounting is
exactly the lineage metric set the checkpoint sink records.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .common import NORM_SQL, load, norm_text, tokens, tokens_sql
from .dedup import _md5_roll, _shingles, _shingles_sql, _with_planted_dups
from .textstats import STOPWORDS

PLANT_BASE = 100_000  # planted-dup id offset (same as operators/dedup.py)
BENCH_PCT = 5  # md5-roll percent of original docs held out as eval set
Q_MIN_TOKENS = 15
Q_MAX_TOKENS = 95
Q_MIN_STOP_PERMILLE = 10  # stopword tokens per 1000 tokens
CONTAM_DEN = 4  # contaminated iff overlap * 4 >= distinct shingles

_STAGE_HELD = "bench_heldout"
_STAGE_QUALITY = "dropped_quality"
_STAGE_DUP = "dropped_dup"
_STAGE_CONTAM = "dropped_contaminated"
_STAGE_KEPT = "kept"


def pretraining_corpus(spark, sf_dir) -> DataFrame:
    """(source, stage, n_docs, n_tokens): per-source accounting of the
    quality → dedup → decontamination cascade over the planted-dup
    corpus, ordered by (source, stage).

    Physical shape: the tokenize/fingerprint/shingle derivation runs
    ONCE and is ``localCheckpoint``ed (→ ``checkpoint()`` to cluster
    storage, or a staged intermediate table, at real scale) because
    three consumers need it — the spine, the bench shingle universe,
    and the overlap branch; without the cut Spark re-derives the scan
    per branch. Dedup is a single cumulative-count window over the
    fingerprint exchange — no filter-branch-union, every row keeps
    flowing. The bench shingle set is broadcast (it is the eval
    benchmark: small by definition); the overlap join-back is left to
    AQE (clean corpus → broadcast-sized, contaminated corpus → shuffle
    join on doc_id)."""
    docs = load(spark, sf_dir, "documents")
    src = docs.select(F.col("doc_id").alias("orig_id"), "source")
    toks = tokens(F.col("text"))
    feat = (
        _with_planted_dups(docs)
        # planted ids are original + 100k/200k; attribute to the
        # original's source (broadcast: one row per original doc)
        .withColumn("orig_id", F.col("doc_id") % PLANT_BASE)
        .join(F.broadcast(src), "orig_id")
        .withColumn("toks", toks)
        .withColumn("n_tokens", F.size("toks").cast("long"))
        .withColumn(
            "n_stop",
            F.size(F.filter("toks", lambda t: t.isin(STOPWORDS))),
        )
        .withColumn("fp", F.md5(norm_text(F.col("text"))))
        .withColumn("shs", F.array_distinct(_shingles(F.col("toks"))))
        .withColumn(
            "pre_stage",
            F.when(
                (F.col("doc_id") < PLANT_BASE)
                & (_md5_roll(F.col("doc_id")) < BENCH_PCT),
                F.lit(_STAGE_HELD),
            ).when(
                (F.col("n_tokens") < Q_MIN_TOKENS)
                | (F.col("n_tokens") > Q_MAX_TOKENS)
                | (
                    1000 * F.col("n_stop")
                    < Q_MIN_STOP_PERMILLE * F.col("n_tokens")
                ),
                F.lit(_STAGE_QUALITY),
            ),
        )
        .select("doc_id", "source", "n_tokens", "fp", "shs", "pre_stage")
        .localCheckpoint(eager=False)
    )
    # alive-rank via ONE window: nth alive (quality-passing, non-bench)
    # doc per fingerprint in doc_id order; >1 → exact duplicate
    spine = feat.withColumn(
        "alive_rank",
        F.sum(F.col("pre_stage").isNull().cast("int")).over(
            Window.partitionBy("fp")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    bench_sh = (
        feat.filter(F.col("pre_stage") == _STAGE_HELD)
        .select(F.explode("shs").alias("sh"))
        .distinct()
    )
    overlap = (
        spine.filter(F.col("pre_stage").isNull() & (F.col("alive_rank") == 1))
        .select("doc_id", F.explode("shs").alias("sh"))
        .join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        spine.join(overlap, "doc_id", "left")
        .select(
            "source",
            "n_tokens",
            F.when(F.col("pre_stage").isNotNull(), F.col("pre_stage"))
            .when(F.col("alive_rank") > 1, F.lit(_STAGE_DUP))
            .when(
                CONTAM_DEN * F.coalesce("n_overlap", F.lit(0))
                >= F.size("shs"),
                F.lit(_STAGE_CONTAM),
            )
            .otherwise(F.lit(_STAGE_KEPT))
            .alias("stage"),
        )
        .groupBy("source", "stage")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("source", "stage")
    )


def pretraining_corpus_sql() -> str:
    toks = tokens_sql("text")
    norm = NORM_SQL.format(c="text")
    stop = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
    sh = _shingles_sql("toks")
    return f"""
    WITH planted AS (
      SELECT doc_id, text, source FROM documents
      UNION ALL
      SELECT doc_id + {PLANT_BASE}, text, source FROM documents
      WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + {2 * PLANT_BASE}, text || ' extradup', source
      FROM documents WHERE doc_id % 11 = 0
    ),
    feat AS (
      SELECT doc_id, source, md5({norm}) AS fp, {toks} AS toks,
             CAST(len({toks}) AS BIGINT) AS n_tokens,
             len(list_filter({toks},
                             t -> list_contains({stop}, t))) AS n_stop
      FROM planted
    ),
    s1 AS (
      SELECT *, CASE
        WHEN doc_id < {PLANT_BASE}
             AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                 ::BIGINT % 100 < {BENCH_PCT}
          THEN '{_STAGE_HELD}'
        WHEN n_tokens < {Q_MIN_TOKENS} OR n_tokens > {Q_MAX_TOKENS}
             OR 1000 * n_stop < {Q_MIN_STOP_PERMILLE} * n_tokens
          THEN '{_STAGE_QUALITY}'
        END AS stage
      FROM feat
    ),
    alive AS (
      SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM s1 WHERE stage IS NULL
    ),
    bsh AS (
      SELECT DISTINCT unnest(list_distinct({sh})) AS sh
      FROM s1 WHERE stage = '{_STAGE_HELD}'
    ),
    uniq AS (
      SELECT doc_id, source, n_tokens, list_distinct({sh}) AS shs
      FROM alive WHERE rn = 1
    ),
    ov AS (
      SELECT doc_id, count(*) AS n_overlap
      FROM (SELECT doc_id, unnest(shs) AS sh FROM uniq) e
      JOIN bsh USING (sh) GROUP BY doc_id
    ),
    staged AS (
      SELECT source, stage, n_tokens FROM s1 WHERE stage IS NOT NULL
      UNION ALL
      SELECT source, '{_STAGE_DUP}', n_tokens FROM alive WHERE rn > 1
      UNION ALL
      SELECT u.source,
             CASE WHEN {CONTAM_DEN} * coalesce(o.n_overlap, 0)
                       >= len(u.shs)
                  THEN '{_STAGE_CONTAM}' ELSE '{_STAGE_KEPT}' END,
             u.n_tokens
      FROM uniq u LEFT JOIN ov o USING (doc_id)
    )
    SELECT source, stage, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM staged GROUP BY source, stage ORDER BY source, stage
    """


QUERIES = {"pipeline_pretraining_corpus": pretraining_corpus}
ORACLES = {"pipeline_pretraining_corpus": pretraining_corpus_sql()}
