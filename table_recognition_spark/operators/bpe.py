"""Byte-pair-encoding merge learning over the documents corpus.

No reference counterpart (lpiwowar/table-recognition ships no
tokenizer); this extends the LLM-data-pipeline surface next to the
token-counting and fingerprinting operators in ``textstats.py``: the
classic BPE procedure (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") learns the top-N symbol
merges from corpus word frequencies.

Scale design (the part that must survive 100 TB):

- The corpus collapses to the distinct-word vocabulary ONCE — a single
  tokenize + explode + groupBy shuffle over the raw text, the same
  heavy pass every counting query pays.  Every merge round after that
  runs on |V| rows (distinct words with counts), never on corpus
  tokens: at web scale |V| ~ 1e8 while the corpus is ~1e12 tokens.
- Pair counts are maintained INCREMENTALLY (the delta scheme every
  single-node BPE trainer uses, distributed): the full
  explode-all-pairs aggregation runs once up front; each round then
  folds only the affected words' before/after pair multisets into the
  standing pair table — one union + groupBy-sum shuffle over
  |pairs| + O(affected) rows, never a re-explode of all |V| words.
  (Merging e.g. ('t','h') late in training touches the words
  containing "th", not the entire vocabulary.)
- Per round, three bounded steps:
  1. a driver fetch of exactly ONE row — the argmax pair from the
     standing pair table, tie-broken (count desc, pair lexicographic)
     for determinism.  Bounded the same way dedup's
     connected-components convergence scalar is: n_merges rows total
     cross the driver, regardless of corpus size.
  2. an Arrow-batched greedy left-to-right merge applied ONLY to the
     words that actually contain the winning adjacent pair — a
     JVM-side ``exists(zip_with(...))`` prefilter routes untouched
     words around the pandas UDF entirely.
  3. the delta fold: pair table (+c) ∪ hit-word pairs before (−cnt)
     ∪ hit-word pairs after (+cnt) → one groupBy sum, rows with
     count 0 dropped.  Exact integer arithmetic — bit-identical to
     recounting from scratch.
- ``localCheckpoint`` truncates the union + UDF lineage each round
  (reliable ``checkpoint()`` to cluster storage at real scale), the
  same iterative-algorithm pattern as ``dedup.py``'s pointer jumping.

Non-SQL-expressible (data-dependent argmax drives the next round's
input), so the driver oracle is the committed-expected-parquet pattern
(``scripts/gen_expected.py``); the independent correctness guard is a
pure-Python BPE mirror in ``tests/test_bpe.py``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .common import load, tokens

N_MERGES = 12
EOW = "</w>"  # end-of-word marker: lets merges form full-word tokens

MERGE_SCHEMA = (
    "rank int, left string, right string, merged string, pair_count bigint"
)


def _adj_pairs(syms):
    """Adjacent (a, b) symbol pairs of one word, JVM-side."""
    n = F.size(syms)
    return F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


# symbol-sequence signature delimiter: symbols are tokenizer output
# ([a-z0-9]+ substrings) plus the EOW marker, so NUL can never occur
# inside one — substring match on the signature is EXACTLY the
# adjacent-pair test, at a fraction of the expression-tree (and
# per-round driver re-planning) cost of an exists(zip_with(...)) probe
_SEP = "\x00"


def _sig(syms):
    return F.concat(F.lit(_SEP), F.array_join(syms, _SEP), F.lit(_SEP))


def _merge_delta_udf(a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) -> a+b, plus the
    word's pair-count delta (after-minus-before multiset) in the same
    pass — one Arrow batch per round feeds BOTH the next vocab and the
    standing pair table's incremental update.

    Sequential within one word (overlaps: 'aaa' under (a,a) -> 'aa','a')
    so it cannot be a Catalyst array expression; Arrow-batched, never
    per-row Python."""

    @F.pandas_udf(
        "syms array<string>, deltas array<struct<a string, b string, d int>>"
    )
    def merge(col: pd.Series) -> pd.DataFrame:
        import collections

        ab = a + b
        syms_out, deltas_out = [], []
        for s in col:
            s = list(s)
            out = []
            i, n = 0, len(s)
            while i < n:
                if i + 1 < n and s[i] == a and s[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            d = collections.Counter(zip(out, out[1:]))
            d.subtract(collections.Counter(zip(s, s[1:])))
            syms_out.append(out)
            deltas_out.append(
                [{"a": x, "b": y, "d": v} for (x, y), v in d.items() if v]
            )
        return pd.DataFrame({"syms": syms_out, "deltas": deltas_out})

    return merge


def word_vocab(docs: DataFrame) -> DataFrame:
    """(w, cnt, syms, sig): the distinct-word frequency table, each word
    as its initial symbol sequence (chars + end-of-word marker) plus the
    NUL-joined signature the per-round hit filter probes."""
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "syms", F.concat(F.split("w", ""), F.array(F.lit(EOW)))
        )
        .withColumn("sig", _sig(F.col("syms")))
    )


def learn_merges(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """The learned merge table: (rank, left, right, merged, pair_count),
    rank order — deterministic given the corpus and tokenizer."""
    spark = docs.sparkSession
    par = spark.sparkContext.defaultParallelism
    # the one corpus-sized pass runs under the session's AQE settings
    vocab = word_vocab(docs).localCheckpoint()
    # AQE off for the merge loop: under AQE, a lazy localCheckpoint of
    # a plan containing an exchange is not lazy — AdaptiveSparkPlanExec
    # materializes its shuffle stages at toRdd time, so every round
    # would pay an extra eager job plus per-stage re-planning.  The
    # loop's shuffles are over the standing pair table (|distinct
    # symbol pairs|, orders of magnitude below the corpus), where fixed
    # hash partitioning is the right plan anyway.
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _merge_loop(spark, vocab, n_merges, par)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def _merge_loop(spark, vocab, n_merges: int, par: int) -> DataFrame:
    pair_counts = (
        vocab.select(
            F.col("cnt"), F.explode(_adj_pairs(F.col("syms"))).alias("p")
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("c"))
        .localCheckpoint(eager=False)
    )
    cols = ["w", "cnt", "syms", "sig"]
    rows = []
    for rank in range(n_merges):
        best = (
            pair_counts.orderBy(F.desc("c"), "a", "b").limit(1).collect()
        )
        if not best:
            break  # vocab fully merged: every word is one symbol
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        rows.append((rank, a, b, a + b, c))
        pat = F.lit(_SEP + a + _SEP + b + _SEP)
        hit = vocab.filter(F.col("sig").contains(pat))
        rest = vocab.filter(~F.col("sig").contains(pat))
        # checkpointed: one UDF pass feeds BOTH the delta fold and the
        # next vocab
        merged = hit.withColumn(
            "r", _merge_delta_udf(a, b)(F.col("syms"))
        ).localCheckpoint(eager=False)
        # ONE shuffle per round: standing table (+c) ∪ affected words'
        # pair deltas (±d × word count) → groupBy sum; only
        # |pairs| + O(affected) rows move, never the full vocab
        pair_counts = (
            pair_counts.select("a", "b", "c")
            .unionByName(
                merged.select(
                    "cnt", F.explode("r.deltas").alias("p")
                ).select(
                    F.col("p.a").alias("a"),
                    F.col("p.b").alias("b"),
                    (F.col("p.d").cast("long") * F.col("cnt")).alias("c"),
                )
            )
            .groupBy("a", "b")
            .agg(F.sum("c").alias("c"))
            .filter(F.col("c") > 0)
            .coalesce(par)
            # lazy: materializes inside the NEXT round's argmax job
            # (one job per round instead of two); lineage still truncates
            .localCheckpoint(eager=False)
        )
        vocab = (
            merged.select(
                "w", "cnt", F.col("r.syms").alias("syms"),
                _sig(F.col("r.syms")).alias("sig"),
            )
            .unionByName(rest.select(*cols))
            # the union concatenates both branches' partitions; without
            # this shuffle-free merge the partition count doubles every
            # round (P * 2^n_merges tasks by the last round)
            .coalesce(par)
            .localCheckpoint(eager=False)
        )
    return spark.createDataFrame(rows, MERGE_SCHEMA)


def bpe_merges(spark, sf_dir, n_merges: int = N_MERGES) -> DataFrame:
    return learn_merges(load(spark, sf_dir, "documents"), n_merges)


def apply_merges(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(doc_id, n_tokens, n_bpe_tokens): per-document token counts under
    the learned vocabulary — the corpus-wide encode pass.  One Arrow
    batch pass over the documents; the merge table (n_merges rows)
    rides inside the UDF closure, the distributed analogue of a
    broadcast tokenizer."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("int")
    def n_bpe(col: pd.Series) -> pd.Series:
        def enc(toks):
            total = 0
            for w in toks:
                s = list(w) + [EOW]
                # canonical BPE encode: repeatedly apply the
                # lowest-rank applicable merge
                while len(s) > 1:
                    cand = [
                        (ranks[(s[i], s[i + 1])], i)
                        for i in range(len(s) - 1)
                        if (s[i], s[i + 1]) in ranks
                    ]
                    if not cand:
                        break
                    _, i = min(cand)
                    s[i : i + 2] = [s[i] + s[i + 1]]
                total += len(s)
            return total

        return col.map(enc).astype("int32")

    toks = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        n_bpe(toks).alias("n_bpe_tokens"),
    ).orderBy("doc_id")


def bpe_token_counts(spark, sf_dir, n_merges: int = N_MERGES) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    merges = [
        (r["left"], r["right"])
        for r in learn_merges(docs, n_merges).collect()
    ]
    return apply_merges(docs, merges)


QUERIES = {
    "text_bpe_merges": bpe_merges,
    "text_bpe_token_counts": bpe_token_counts,
}
