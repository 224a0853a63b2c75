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
- Per round, three bounded steps:
  1. a map-side-combinable pair-count aggregation over the vocab
     (explode adjacent symbol pairs weighted by word count, sum);
  2. a driver fetch of exactly ONE row — the argmax pair, tie-broken
     (count desc, pair lexicographic) for determinism.  Bounded the
     same way dedup's connected-components convergence scalar is:
     n_merges rows total cross the driver, regardless of corpus size.
  3. an Arrow-batched greedy left-to-right merge applied ONLY to the
     words that actually contain the winning adjacent pair — a
     JVM-side ``exists(zip_with(...))`` prefilter routes untouched
     words around the pandas UDF entirely.
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


def _has_adjacent(syms, a: str, b: str):
    return F.exists(
        _adj_pairs(syms),
        lambda p: (p["a"] == F.lit(a)) & (p["b"] == F.lit(b)),
    )


def _merge_udf(a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) -> a+b.

    Sequential within one word (overlaps: 'aaa' under (a,a) -> 'aa','a')
    so it cannot be a Catalyst array expression; Arrow-batched, never
    per-row Python."""

    @F.pandas_udf("array<string>")
    def merge(col: pd.Series) -> pd.Series:
        ab = a + b

        def m(s):
            out = []
            i, n = 0, len(s)
            while i < n:
                if i + 1 < n and s[i] == a and s[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            return out

        return col.map(m)

    return merge


def word_vocab(docs: DataFrame) -> DataFrame:
    """(w, cnt, syms): the distinct-word frequency table, each word as
    its initial symbol sequence (chars + end-of-word marker)."""
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "syms", F.concat(F.split("w", ""), F.array(F.lit(EOW)))
        )
    )


def learn_merges(docs: DataFrame, n_merges: int = N_MERGES) -> DataFrame:
    """The learned merge table: (rank, left, right, merged, pair_count),
    rank order — deterministic given the corpus and tokenizer."""
    spark = docs.sparkSession
    vocab = word_vocab(docs).localCheckpoint()
    rows = []
    for rank in range(n_merges):
        best = (
            vocab.select("cnt", F.explode(_adj_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break  # vocab fully merged: every word is one symbol
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        rows.append((rank, a, b, a + b, c))
        hit = vocab.filter(_has_adjacent(F.col("syms"), a, b))
        rest = vocab.filter(~_has_adjacent(F.col("syms"), a, b))
        vocab = (
            hit.withColumn("syms", _merge_udf(a, b)(F.col("syms")))
            .unionByName(rest)
            # the union concatenates both branches' partitions; without
            # this shuffle-free merge the partition count doubles every
            # round (P * 2^n_merges tasks by the last round)
            .coalesce(spark.sparkContext.defaultParallelism)
            # lazy: materializes inside the NEXT round's pair-count job
            # (one job per round instead of two); lineage still truncates
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
