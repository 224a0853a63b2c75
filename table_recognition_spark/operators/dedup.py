"""Deduplication operators for a training-data pipeline, each with an
exact DuckDB oracle:

- exact dedup: hash-groupBy on the normalized-text md5 fingerprint
- MinHash + LSH: shingle → md5-based minhash signature → banding →
  bucket join → candidate pairs → exact-Jaccard verify
- SimHash: 16-bit signature from md5 nibble votes + hamming-ball pairs
- n-gram Jaccard: explode-distinct-shingle self-join
- embedding cosine near-dup: integer-quantized vectors so the threshold
  test is pure integer arithmetic (25·dot² ≥ 4·‖a‖²·‖b‖², dot > 0 —
  i.e. cosine ≥ 0.4) — bit-identical across engines

Scale notes (100 TB design point): every operator is
explode → hash-shuffle on a key (fingerprint / band hash / token /
bucket) → per-key candidate pairing — no cross product ever
materializes; candidate verification joins back by doc id. Exact
pairwise stages are written against LSH/band-bucketed candidates, not
the full n² (the unigram-Jaccard demo bounds pair fan-out by token).

The corpus under test plants duplicates deterministically (the testdata
documents table has none): every 7th doc is unioned verbatim with a
``dup_`` id, every 11th with one appended token (a near-dup).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import NORM_SQL, load, norm_text, tokens, tokens_sql

N_MINHASH = 8
N_BANDS = 2
ROWS_PER_BAND = 4  # wider bands: false-candidate rate ~ j^4, not j^2


def _with_planted_dups(docs):
    # the testdata documents table is a single parquet file → one input
    # partition; fan out before the (expensive) per-row expression trees
    # so all cores participate. On a real multi-file table this is a no-op
    # cost-wise (AQE coalesces back).
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    exact = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    near = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extradup")).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(exact).unionByName(near)


_PLANTED_SQL = """
    (SELECT doc_id, text FROM documents
     UNION ALL
     SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
     UNION ALL
     SELECT doc_id + 200000 AS doc_id, text || ' extradup' AS text
     FROM documents WHERE doc_id % 11 = 0)
"""


def dedup_exact(spark, sf_dir):
    """Exact dedup: md5(normalized text) hash-groupBy; emit groups with
    >1 member, keeping the smallest doc_id as the canonical survivor."""
    docs = _with_planted_dups(load(spark, sf_dir, "documents"))
    return (
        docs.select("doc_id", F.md5(norm_text(F.col("text"))).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


def dedup_exact_sql() -> str:
    norm = NORM_SQL.format(c="text")
    return f"""
    SELECT md5({norm}) AS fp, count(*) AS n_copies,
           min(doc_id) AS canonical_doc_id, max(doc_id) AS max_doc_id
    FROM {_PLANTED_SQL} GROUP BY 1 HAVING count(*) > 1
    """


def _shingles(toks, n: int = 3):
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def _shingles_sql(toks: str, n: int = 3) -> str:
    return (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))"
    )



def _shingle_df(docs, n: int = 3):
    """(doc_id, shingles) with tokens materialized behind an exchange.

    Both the tokenizer (a regex) and the shingle builder are Catalyst
    higher-order-function lambdas; if left inline, CollapseProject nests
    the regex inside the per-shingle lambda and re-runs it once per
    shingle index. The repartition barrier pins evaluation order:
    regex once per row → shuffle → slice/concat once per shingle.
    """
    P = docs.sparkSession.sparkContext.defaultParallelism
    tok_df = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).repartition(P)
    return tok_df.select(
        "doc_id",
        F.array_distinct(_shingles(F.col("toks"), n)).alias("shingles"),
    )

def dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup detection.

    signature_h = min over 3-token shingles of md5(h || ':' || shingle)
    for h in 0..7; band b = sig[4b..4b+3] joined; candidate pairs share
    any band bucket; verified by exact shingle-set Jaccard ≥ 1/2
    (integer cross-multiplied: 2·|∩| ≥ |∪|). Bands are 4 rows wide so a
    random pair (jaccard j) collides with probability ~2·j⁴ — this is what
    keeps the candidate join sub-quadratic on low-entropy corpora.
    """
    docs = _with_planted_dups(load(spark, sf_dir, "documents"))
    sh_df = _shingle_df(docs)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(N_MINHASH - 1)),
        lambda h: F.array_min(
            F.transform(
                F.col("shingles"),
                lambda t: F.md5(F.concat(h.cast("string"), F.lit(":"), t)),
            )
        ),
    )
    base = sh_df.select("doc_id", "shingles", sig.alias("sig"))
    # base feeds three plan branches (banding + both sides of the verify
    # join); cache it so the signature tree runs once
    base = base.cache()

    bands = base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.concat_ws(
                        "|",
                        F.slice(F.col("sig"), b * ROWS_PER_BAND + 1, ROWS_PER_BAND),
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")

    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )

    a = base.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = base.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    verified = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("n_common"),
            F.size(F.array_union("sh_a", "sh_b")).alias("n_union"),
        )
        .filter(F.col("n_common") * 2 >= F.col("n_union"))
    )
    return verified.select("doc_a", "doc_b", "n_common", "n_union")


def dedup_minhash_lsh_sql() -> str:
    toks = tokens_sql("text")
    sh = f"list_distinct({_shingles_sql(toks)})"
    sig_elems = ", ".join(
        f"list_min(list_transform(sh, s -> md5('{h}:' || s)))"
        for h in range(N_MINHASH)
    )
    return f"""
    WITH base AS (
      SELECT doc_id, sh, [{sig_elems}] AS sig
      FROM (SELECT doc_id, {sh} AS sh FROM {_PLANTED_SQL})
    ),
    bands AS (
      SELECT doc_id, b AS band, array_to_string(list_slice(sig, b*4+1, b*4+4), '|') AS bucket
      FROM base, unnest(range(0, {N_BANDS})) t(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           len(list_intersect(x.sh, y.sh)) AS n_common,
           len(list_distinct(list_concat(x.sh, y.sh))) AS n_union
    FROM cand JOIN base x ON cand.doc_a = x.doc_id
              JOIN base y ON cand.doc_b = y.doc_id
    WHERE len(list_intersect(x.sh, y.sh)) * 2
          >= len(list_distinct(list_concat(x.sh, y.sh)))
    """


def dedup_simhash(spark, sf_dir):
    """16-bit SimHash per document from md5 nibble votes.

    bit i (1-based hex position) of token t = high bit of md5(t)'s i-th
    nibble = (hex char >= '8'); per-position vote sum > 0 → bit set;
    simhash = Σ bit_i · 2^(16-i). Emits (doc_id, simhash, bucket) where
    bucket = simhash >> 8 (the LSH prefix used for pairing at scale).

    Shape: ONE explode over tokens, then 16 unrolled partial-aggregate
    vote columns in a single groupBy — no per-bit row blowup, one
    shuffle total (vs explode×16 → two shuffles).
    """
    docs = _with_planted_dups(load(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    ).select("doc_id", F.md5("token").alias("h"))
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.substring("h", i, 1) >= "8", 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(1, 17)
        ]
    )
    simhash = None
    for i in range(1, 17):
        term = F.when(F.col(f"v{i}") > 0, F.lit(1 << (16 - i))).otherwise(0)
        simhash = term if simhash is None else simhash + term
    return votes.select(
        "doc_id",
        simhash.cast("long").alias("simhash"),
        (simhash.cast("long") / 256).cast("long").alias("bucket"),
    )


def dedup_simhash_sql() -> str:
    toks = tokens_sql("text")
    vote_cols = ",\n             ".join(
        f"sum(CASE WHEN substr(h, {i}, 1) >= '8' THEN 1 ELSE -1 END) AS v{i}"
        for i in range(1, 17)
    )
    simhash = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN {1 << (16 - i)} ELSE 0 END)"
        for i in range(1, 17)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, md5(unnest({toks})) AS h FROM {_PLANTED_SQL}
    ),
    votes AS (
      SELECT doc_id,
             {vote_cols}
      FROM tok GROUP BY doc_id
    )
    SELECT doc_id, ({simhash})::BIGINT AS simhash,
           (({simhash}) // 256)::BIGINT AS bucket
    FROM votes
    """


def dedup_jaccard_ngram(spark, sf_dir):
    """n-gram (3-token shingle) Jaccard near-dup pairs via
    distinct-shingle self-join (explode → shuffle on shingle → pair
    counts); threshold 4/5 integer cross-multiplied: 5·|∩| ≥ 4·|∪|.
    Shingles (not unigrams) keep the join key selective: on a
    low-entropy corpus every unigram is near-universal and the self-join
    would go quadratic, while 3-gram document frequency stays bounded."""
    docs = _with_planted_dups(load(spark, sf_dir, "documents"))
    tok = _shingle_df(docs).select(
        "doc_id", F.explode("shingles").alias("token")
    ).cache()  # feeds sizes + both sides of the pair join
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    pairs = (
        tok.alias("a")
        .join(
            tok.alias("b"),
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n", "n_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n", "n_b"
            ),
            "doc_b",
        )
        .filter(
            F.col("n_common") * 5
            >= (F.col("n_a") + F.col("n_b") - F.col("n_common")) * 4
        )
        .select("doc_a", "doc_b", "n_common", (F.col("n_a") + F.col("n_b") - F.col("n_common")).alias("n_union"))
    )


def dedup_jaccard_ngram_sql() -> str:
    sh = _shingles_sql(tokens_sql("text"))
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct({sh})) AS token FROM {_PLANTED_SQL}
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common, sa.n + sb.n - n_common AS n_union
    FROM pairs JOIN sizes sa ON pairs.doc_a = sa.doc_id
               JOIN sizes sb ON pairs.doc_b = sb.doc_id
    WHERE n_common * 5 >= (sa.n + sb.n - n_common) * 4
    """


def dedup_embedding_cosine(spark, sf_dir):
    """Embedding near-dup pairs, sign-LSH bucketed: candidates are pairs
    sharing the 8-bit sign pattern of their first 8 components (near-dups
    have near-identical components, so they collide; random pairs land in
    one of 256 buckets → the candidate join is bucket-partitioned and
    sub-quadratic, the 100-TB shape). Verification is exact integer
    cosine: quantize components to int (round(x·1000)), then cosine ≥ 0.4
    becomes dot > 0 AND 25·dot² ≥ 4·‖a‖²·‖b‖². Scoring is the
    Arrow-vectorized numpy dot (similarity._dot_pandas), exactly equal to
    the SQL oracle's integer dot.

    Round 1 joined all pairs within ``label`` — O(n²/labels) at scale and
    the slowest bench query (23.9 s); this replaces that plan."""
    from .similarity import _bucket_expr, _dot_pandas

    emb = load(spark, sf_dir, "embeddings")
    q = (
        emb.select(
            "vec_id",
            "label",
            _bucket_expr(F.col("embedding")).alias("bucket"),
            # cast float→double BEFORE arithmetic so both engines round
            # the same double (float math could differ at half-way points)
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * 1000, 0).cast("long"),
            ).alias("qv"),
        )
        .withColumn(
            "norm2",
            F.aggregate(
                "qv", F.lit(0).cast("long"), lambda acc, x: acc + x * x
            ),
        )
    )
    a = q.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("label"),
        F.col("bucket").alias("bkt"),
        F.col("qv").alias("qa"),
        F.col("norm2").alias("na"),
    )
    b = q.select(
        F.col("vec_id").alias("id_b"),
        F.col("bucket").alias("bkt"),
        F.col("qv").alias("qb"),
        F.col("norm2").alias("nb"),
    )
    joined = a.join(b, "bkt").filter(F.col("id_a") < F.col("id_b"))
    return (
        joined.withColumn("dot", _dot_pandas("qa", "qb"))
        .filter(
            (F.col("dot") > 0)
            & (F.col("dot") * F.col("dot") * 25 >= F.col("na") * F.col("nb") * 4)
        )
        .select("id_a", "id_b", "dot", "label")
    )


def dedup_embedding_cosine_sql() -> str:
    bucket = (
        "list_sum(list_transform(range(1, 9), j -> CASE WHEN "
        "embedding[j] > 0.0 THEN (1 << (j - 1)) ELSE 0 END))"
    )
    return f"""
    WITH q AS (
      SELECT vec_id, label, {bucket} AS bucket,
             list_transform(embedding, x -> cast(round(x::DOUBLE*1000) AS bigint)) AS qv
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, label, bucket, qv,
             list_sum(list_transform(qv, x -> x * x)) AS norm2
      FROM q
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_dot_product(a.qv, b.qv)::bigint AS dot,
           a.label AS label
    FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.qv, b.qv)::bigint > 0
      AND list_dot_product(a.qv, b.qv)::bigint
          * list_dot_product(a.qv, b.qv)::bigint * 25
          >= a.norm2 * b.norm2 * 4
    """


def dedup_groups_cc(spark, sf_dir):
    """Duplicate GROUPS from near-dup pairs: connected components by
    iterative min-label propagation, the step that turns pairwise
    detection into an actual keep-one-per-cluster dedup decision.

    Each iteration is one hash-shuffle join (neighbor-min) + an eager
    ``localCheckpoint`` that truncates lineage so the loop's plan depth
    stays O(1); iterations ≤ graph diameter (near-dup clusters are
    shallow — dup chains of depth d converge in d rounds). At 100 TB the
    same loop runs with reliable ``checkpoint()`` to HDFS/S3 instead of
    local blocks; for adversarial long-chain graphs swap the propagation
    body for large-star/small-star (O(log n) rounds) — the surrounding
    fixpoint driver is identical. Oracle: DuckDB recursive-CTE transitive
    closure over the same pair set."""
    # materialize the pair set ONCE before mirroring: the union would
    # otherwise evaluate the (expensive) jaccard subplan twice, and the
    # edges are reused every iteration anyway
    pairs = (
        dedup_jaccard_ngram(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    edges = pairs.union(pairs.select("doc_b", "doc_a")).toDF("src", "dst")
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("group_id", F.col("doc_id"))
        .localCheckpoint()
    )
    # near-dup components are shallow (dup chains of depth d converge in
    # d rounds); the cap is a runaway guard, not a correctness bound
    for _ in range(30):
        nbr = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("dst"),
                    F.col("group_id").alias("dst_group"),
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_group").alias("nbr_min"))
        )
        new_labels = (
            labels.join(
                nbr.withColumnRenamed("src", "doc_id"), "doc_id", "left"
            )
            .select(
                "doc_id",
                F.least(
                    F.col("group_id"),
                    F.coalesce("nbr_min", F.col("group_id")),
                ).alias("group_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.group_id") != F.col("o.group_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.orderBy("doc_id")


def dedup_groups_cc_sql() -> str:
    return f"""
    WITH RECURSIVE jp AS (
      SELECT doc_a, doc_b FROM ({dedup_jaccard_ngram_sql()}) t
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM jp
      UNION
      SELECT doc_b, doc_a FROM jp
    ),
    reach(src, dst) AS (
      SELECT src, src FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS doc_id, CAST(min(dst) AS BIGINT) AS group_id
    FROM reach GROUP BY src ORDER BY doc_id
    """


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_jaccard_ngram": dedup_jaccard_ngram,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_groups_cc": dedup_groups_cc,
}

ORACLES = {
    "dedup_exact": dedup_exact_sql(),
    "dedup_minhash_lsh": dedup_minhash_lsh_sql(),
    "dedup_simhash": dedup_simhash_sql(),
    "dedup_jaccard_ngram": dedup_jaccard_ngram_sql(),
    "dedup_embedding_cosine": dedup_embedding_cosine_sql(),
    "dedup_groups_cc": dedup_groups_cc_sql(),
}
