"""Deterministic cardinality sketch (HyperLogLog) over the corpus
token stream — the distributed-sketch primitive of a training-data
pipeline (vocabulary size tracking without a global distinct).

Engine-native approx_count_distinct can never cross-check against
another engine (different hash, different bias correction), so this is
a from-scratch HLL whose every step is integer-exact in both Spark and
DuckDB:

- hash = md5(token); register = first hex byte % M; rho window = the
  next 16 hash bits;
- rho = 17 - bitlen(window), computed by a generated integer CASE
  chain — no float log2, whose libm rounding at power-of-two
  boundaries differs across engines;
- the harmonic sum Σ 2^-rho is kept as the integer
  S = Σ 2^(17-rho) over the common denominator 2^17 (rho reaches 17
  on an all-zero window; empty registers contribute 2^17 exactly);
- the raw HLL estimate is emitted in integer milli-units:
  est_milli = (ALPHA_MILLI · M² · 2^17) // S  (α = 0.709 for M = 64).

Exact distinct-token count rides along in the same row, so the query
doubles as the sketch's own error eval. Scale shape: one explode, one
M-way aggregation (map-side partial max per register), one tiny final
reduce — the whole point of HLL is that the shuffle payload is M
integers per partition, not the token universe.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .common import load, tokens, tokens_sql

M_REGISTERS = 64
RHO_BITS = 16
ALPHA_MILLI = 709  # alpha_64 = 0.709 (Flajolet et al. 2007)


def _rho_case_sql(v: str) -> str:
    """Integer bit-length CASE chain: rho = 17 - bitlen(v), v in
    [0, 2^16). Identical text runs in Spark SQL and DuckDB."""
    branches = " ".join(
        f"WHEN {v} >= {1 << (RHO_BITS - k)} THEN {k}"
        for k in range(1, RHO_BITS + 1)
    )
    return f"(CASE {branches} ELSE {RHO_BITS + 1} END)"


def hll_distinct_tokens(spark, sf_dir):
    """One row: (m, s_inv, zero_regs, est_milli, exact_distinct).

    The sketched domain is 3-token shingles, not single tokens: the
    synthetic corpus has a ~31-word vocabulary, deep in HLL's
    small-range regime where production uses linear counting (the
    zero_regs column is emitted for exactly that switch); shingles
    (~25k distinct) put the fixture in the raw-HLL regime the estimator
    is built for. The repartition barrier pins tokenize-once-per-row
    (the CollapseProject pitfall the repetition filter documents)."""
    from .dedup import _shingles

    P = spark.sparkContext.defaultParallelism
    tok_df = (
        load(spark, sf_dir, "documents")
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .repartition(P)
    )
    toks = (
        tok_df.select(F.explode(_shingles(F.col("toks"))).alias("token"))
        .select(F.md5("token").alias("h"))
        .select(
            (F.conv(F.substring("h", 1, 2), 16, 10).cast("long") % M_REGISTERS)
            .alias("reg"),
            F.conv(F.substring("h", 3, 4), 16, 10).cast("long").alias("v"),
        )
    )
    regs = toks.groupBy("reg").agg(
        F.max(F.expr(_rho_case_sql("v"))).alias("rho")
    )
    sketch = regs.agg(
        (
            F.sum(F.expr(f"shiftleft(1L, {RHO_BITS + 1} - rho)"))
            + (M_REGISTERS - F.count("*")) * (1 << (RHO_BITS + 1))
        ).alias("s_inv"),
        (M_REGISTERS - F.count("*")).cast("long").alias("zero_regs"),
    ).select(
        F.lit(M_REGISTERS).cast("long").alias("m"),
        "s_inv",
        "zero_regs",
        F.expr(
            f"{ALPHA_MILLI * M_REGISTERS * M_REGISTERS * (1 << (RHO_BITS + 1))}L"
            " div s_inv"
        ).alias("est_milli"),
    )
    exact = tok_df.select(
        F.explode(_shingles(F.col("toks"))).alias("token")
    ).agg(F.countDistinct("token").alias("exact_distinct"))
    return sketch.crossJoin(exact)


def hll_distinct_tokens_sql() -> str:
    from .dedup import _shingles_sql

    toks = _shingles_sql(tokens_sql("text"))
    return f"""
    WITH tok AS (
      SELECT md5(unnest({toks})) AS h FROM documents
    ),
    hashed AS (
      SELECT ('0x' || substr(h, 1, 2))::BIGINT % {M_REGISTERS} AS reg,
             ('0x' || substr(h, 3, 4))::BIGINT AS v
      FROM tok
    ),
    regs AS (
      SELECT reg, max({_rho_case_sql('v')}) AS rho
      FROM hashed GROUP BY reg
    ),
    sketch AS (
      SELECT CAST(sum(1::BIGINT << ({RHO_BITS + 1} - rho)) +
                  ({M_REGISTERS} - count(*)) * {1 << (RHO_BITS + 1)} AS BIGINT)
                 AS s_inv,
             CAST({M_REGISTERS} - count(*) AS BIGINT) AS zero_regs
      FROM regs
    ),
    exact AS (
      SELECT CAST(count(DISTINCT t) AS BIGINT) AS exact_distinct
      FROM (SELECT unnest({toks}) AS t FROM documents)
    )
    SELECT CAST({M_REGISTERS} AS BIGINT) AS m, s_inv, zero_regs,
           {ALPHA_MILLI * M_REGISTERS * M_REGISTERS * (1 << (RHO_BITS + 1))}
               // s_inv AS est_milli,
           exact_distinct
    FROM sketch, exact
    """


def finalize_daily_registers(regs, events):
    """(day, reg, rho) register maxes + the raw events table → the
    sketch output (day, s_inv, zero_regs, est_milli, exact_distinct).
    Shared by the batch sketch and the streaming register drive
    (streaming/ingest.py): registers are max-mergeable, so however
    they were accumulated — one shuffle or many micro-batches — the
    finalize step is identical and the outputs bit-equal."""
    est_num = ALPHA_MILLI * M_REGISTERS * M_REGISTERS * (1 << (RHO_BITS + 1))
    sketch = (
        regs.groupBy("day")
        .agg(
            (
                F.sum(F.expr(f"shiftleft(1L, {RHO_BITS + 1} - rho)"))
                + (M_REGISTERS - F.count("*")) * (1 << (RHO_BITS + 1))
            ).alias("s_inv"),
            (M_REGISTERS - F.count("*")).cast("long").alias("zero_regs"),
        )
        .select("day", "s_inv", "zero_regs",
                F.expr(f"{est_num}L div s_inv").alias("est_milli"))
    )
    exact = events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.countDistinct("user_id").alias("exact_distinct"))
    return sketch.join(exact, "day").orderBy("day")


def hll_users_daily(spark, sf_dir):
    """Per-key sketch — the production HLL shape: daily distinct-user
    estimates over the events stream, one register set per day. The
    shuffle carries (day, reg, partial-max-rho) — M rows per day per
    partition — instead of the user universe; the exact per-day
    distinct rides along as the error eval. Same integer-exact
    register/rho/estimate arithmetic as the corpus sketch."""
    ev = load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.md5(F.col("user_id").cast("string")).alias("h"),
    )
    hashed = ev.select(
        "day",
        (F.conv(F.substring("h", 1, 2), 16, 10).cast("long") % M_REGISTERS)
        .alias("reg"),
        F.conv(F.substring("h", 3, 4), 16, 10).cast("long").alias("v"),
    )
    regs = hashed.groupBy("day", "reg").agg(
        F.max(F.expr(_rho_case_sql("v"))).alias("rho")
    )
    return finalize_daily_registers(regs, load(spark, sf_dir, "events"))


def hll_users_daily_sql() -> str:
    est_num = ALPHA_MILLI * M_REGISTERS * M_REGISTERS * (1 << (RHO_BITS + 1))
    return f"""
    WITH hashed AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))::BIGINT
                 % {M_REGISTERS} AS reg,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 4))::BIGINT
                 AS v
      FROM events
    ),
    regs AS (
      SELECT day, reg, max({_rho_case_sql('v')}) AS rho
      FROM hashed GROUP BY day, reg
    ),
    sketch AS (
      SELECT day,
             CAST(sum(1::BIGINT << ({RHO_BITS + 1} - rho)) +
                  ({M_REGISTERS} - count(*)) * {1 << (RHO_BITS + 1)}
                  AS BIGINT) AS s_inv,
             CAST({M_REGISTERS} - count(*) AS BIGINT) AS zero_regs
      FROM regs GROUP BY day
    ),
    exact AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events GROUP BY 1
    )
    SELECT s.day AS day, s.s_inv, s.zero_regs,
           {est_num} // s.s_inv AS est_milli,
           e.exact_distinct
    FROM sketch s JOIN exact e ON s.day = e.day
    ORDER BY 1
    """


CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 512  # counters per row


def cms_token_counts(spark, sf_dir, depth: int = CMS_DEPTH,
                     width: int = CMS_WIDTH):
    """Count-min sketch of the corpus token-frequency stream (Cormode &
    Muthukrishnan 2005): ``depth`` independent md5-derived hash rows of
    ``width`` counters; every token occurrence increments one counter
    per row; a point query reads min over rows (never undercounts).
    Output: the materialized sketch — (row_idx, col_idx, cnt) for every
    non-zero counter — plus, as the sketch's own error eval, the exact
    corpus frequency of the heaviest token that hashes into each
    (row, col) cell (``max_exact``; est ≥ exact always, pinned by
    pytest).

    Scale shape: one explode to token occurrences, one constant-arity
    explode to (row, col) cells, then aggregation to at most
    depth × width counters — in production the groupBy keys directly on
    (row, col) and the shuffle payload is the SKETCH (≤ 2048 counters
    per partition after map-side partial agg), not the token universe.
    Here the ``max_exact`` eval column forces a first aggregation keyed
    by (cell, token) — vocabulary-sized, like the HLL query's
    exact-distinct rider — which an eval can afford and a 10^12-row run
    drops along with the column."""
    docs = load(spark, sf_dir, "documents")
    P = spark.sparkContext.defaultParallelism
    occ = (
        docs.select(tokens(F.col("text")).alias("toks"))
        .repartition(P)
        .select(F.explode("toks").alias("tok"))
    )
    cells = occ.select(
        "tok",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row_idx"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.lit(f"{j}:"), F.col("tok")
                                        )
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("long")
                            % width
                        ).alias("col_idx"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("tok", "cell.row_idx", "cell.col_idx")
    exact = (
        cells.groupBy("row_idx", "col_idx", "tok")
        .agg(F.count("*").alias("tok_n"))
        .groupBy("row_idx", "col_idx")
        .agg(
            F.sum("tok_n").alias("cnt"),
            F.max("tok_n").alias("max_exact"),
        )
    )
    return exact.select(
        "row_idx", "col_idx", F.col("cnt").cast("long").alias("cnt"),
        F.col("max_exact").cast("long").alias("max_exact"),
    )


def cms_token_counts_sql(depth: int = CMS_DEPTH,
                         width: int = CMS_WIDTH) -> str:
    toks = tokens_sql("text")
    return f"""
    WITH occ AS (
      SELECT unnest({toks}) AS tok FROM documents
    ),
    cells AS (
      SELECT tok, j AS row_idx,
             ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || tok), 1, 8))
               ::BIGINT % {width} AS col_idx
      FROM occ, unnest(range(0, {depth})) AS u(j)
    ),
    per_tok AS (
      SELECT row_idx, col_idx, tok, count(*) AS tok_n
      FROM cells GROUP BY row_idx, col_idx, tok
    )
    SELECT row_idx, col_idx,
           CAST(sum(tok_n) AS BIGINT) AS cnt,
           CAST(max(tok_n) AS BIGINT) AS max_exact
    FROM per_tok GROUP BY row_idx, col_idx
    """


BLOOM_M = 16_384  # filter bits
BLOOM_K = 3  # hash functions
BLOOM_PROBE_MOD = 5  # member probes: every 5th doc
BLOOM_SYNTH_PROBES = 100  # guaranteed-non-member probe keys


def _bloom_pos(key_col, j: int):
    """j-th Bloom position: 32-bit md5 prefix of ``key:j`` mod M."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(key_col, F.lit(f":{j}"))), 1, 8),
            16,
            10,
        ).cast("long")
        % BLOOM_M
    )


def bloom_membership(spark, sf_dir):
    """Bloom-filter membership sketch over the corpus fingerprint set —
    the primitive behind bloom-filtered semi-join pushdown (probe a
    compact bitset before shipping rows to an expensive join). Builds a
    K=3 / M=16384 filter from every document's md5(normalized text),
    then probes it with a deterministic member subset (every 5th doc)
    plus synthetic non-member keys, emitting predicted vs actual
    membership per probe (false-positive rows are where they differ;
    false negatives are impossible by construction).

    Cross-engine exact: positions are 32-bit md5 prefixes mod M — pure
    integers. The filter is carried as its DISTINCT set-position table
    (vocabulary ≤ M rows), broadcast to the probe side: build is one
    map-side-partial distinct, probe is a broadcast join — the exact
    shape a 100-TB semi-join prefilter needs."""
    docs = load(spark, sf_dir, "documents")
    from .common import norm_text

    keys = docs.select(F.md5(norm_text(F.col("text"))).alias("key")).distinct()
    fpos = keys.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("key"), j) for j in range(1, BLOOM_K + 1)])
        ).alias("pos")
    ).distinct()
    member_probes = (
        docs.where(F.col("doc_id") % BLOOM_PROBE_MOD == 0)
        .select(F.md5(norm_text(F.col("text"))).alias("probe_key"))
        .distinct()
    )
    synth = spark.range(BLOOM_SYNTH_PROBES).select(
        F.concat(F.lit("probe:"), F.col("id").cast("string")).alias("probe_key")
    )
    probes = member_probes.unionAll(synth)
    ppos = probes.select(
        "probe_key",
        F.explode(
            F.array(
                *[_bloom_pos(F.col("probe_key"), j) for j in range(1, BLOOM_K + 1)]
            )
        ).alias("pos"),
    )
    hits = (
        ppos.join(F.broadcast(fpos), "pos")
        .groupBy("probe_key")
        .agg(F.count("*").alias("nhit"))
    )
    return (
        probes.join(hits, "probe_key", "left")
        .join(
            F.broadcast(keys.withColumnRenamed("key", "probe_key")).withColumn(
                "in_corpus", F.lit(True)
            ),
            "probe_key",
            "left",
        )
        .select(
            "probe_key",
            (F.coalesce(F.col("nhit"), F.lit(0)) == BLOOM_K).alias(
                "predicted_member"
            ),
            F.coalesce(F.col("in_corpus"), F.lit(False)).alias("actual_member"),
        )
        .orderBy("probe_key")
    )


def bloom_membership_sql() -> str:
    from .common import NORM_SQL

    norm = NORM_SQL.format(c="text")

    def pos(key: str, j: int) -> str:
        return (
            f"(('0x' || substr(md5({key} || ':{j}'), 1, 8))::BIGINT"
            f" % {BLOOM_M})"
        )

    kpos = ", ".join(pos("key", j) for j in range(1, BLOOM_K + 1))
    ppos = ", ".join(pos("probe_key", j) for j in range(1, BLOOM_K + 1))
    return f"""
    WITH keys AS (
      SELECT DISTINCT md5({norm}) AS key FROM documents
    ),
    fpos AS (
      SELECT DISTINCT unnest([{kpos}]) AS pos FROM keys
    ),
    probes AS (
      SELECT DISTINCT md5({norm}) AS probe_key FROM documents
      WHERE doc_id % {BLOOM_PROBE_MOD} = 0
      UNION ALL
      SELECT 'probe:' || CAST(i AS VARCHAR)
      FROM range(0, {BLOOM_SYNTH_PROBES}) t(i)
    ),
    ppos AS (
      SELECT probe_key, unnest([{ppos}]) AS pos FROM probes
    ),
    hits AS (
      SELECT probe_key, count(*) AS nhit
      FROM ppos JOIN fpos USING (pos) GROUP BY probe_key
    )
    SELECT p.probe_key,
           coalesce(h.nhit, 0) = {BLOOM_K} AS predicted_member,
           k.key IS NOT NULL AS actual_member
    FROM probes p
    LEFT JOIN hits h USING (probe_key)
    LEFT JOIN keys k ON k.key = p.probe_key
    ORDER BY probe_key
    """


HIST_QUANTILES = (50, 90, 99)


def histogram_quantiles(spark, sf_dir):
    """Mergeable binned-histogram quantile sketch: per-source p50/p90/
    p99 of document length from power-of-2 bins — the distributed
    alternative to an exact per-source sort (see text_length_quantiles)
    when the corpus is too large to rank. Everything is integer-exact
    cross-engine:

    - bin = floor(log2(n_chars)) via the bit-length identity
      ``length(bin(x)) - 1`` (no libm);
    - partial state = (source, bin) counts — map-side combinable and
      mergeable by plain addition, the defining sketch property: at
      100 TB the only shuffle payload is |sources| x ~40 bins rows;
    - quantile q = the smallest bin whose running count reaches
      ceil(q * total / 100) (integer ceil division), reported as the
      bin's inclusive upper bound 2^(bin+1) - 1 — a guaranteed
      overestimate of the true quantile by < 2x.

    The per-source doc count rides along so the sketch's resolution is
    auditable in the output."""
    d = load(spark, sf_dir, "documents").select(
        "source",
        (F.length(F.bin(F.greatest(F.col("n_chars"), F.lit(1)))) - 1)
        .cast("long")
        .alias("b"),
    )
    hist = d.groupBy("source", "b").agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy("source")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot_w = Window.partitionBy("source")
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "total", F.sum("cnt").over(tot_w)
    )
    aggs = [F.count("*").alias("n_bins"), F.max("total").alias("n_docs")]
    for q in HIST_QUANTILES:
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") * 100 >= F.col("total") * q,
                    F.expr("shiftleft(1L, cast(b + 1 AS int)) - 1L"),
                )
            ).alias(f"p{q}_ub")
        )
    return cum.groupBy("source").agg(*aggs).orderBy("source")


def histogram_quantiles_sql() -> str:
    qcols = ",\n       ".join(
        f"CAST(min(CASE WHEN cum * 100 >= total * {q} "
        f"THEN (CAST(1 AS BIGINT) << (b + 1)) - 1 END) AS BIGINT) AS p{q}_ub"
        for q in HIST_QUANTILES
    )
    return f"""
WITH hist AS (
  SELECT source,
         CAST(length(bin(greatest(n_chars, 1))) - 1 AS BIGINT) AS b,
         count(*) AS cnt
  FROM documents GROUP BY source, b
), cum AS (
  SELECT source, b, cnt,
         sum(cnt) OVER (PARTITION BY source ORDER BY b
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER (PARTITION BY source) AS total
  FROM hist
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST(max(total) AS BIGINT) AS n_docs,
       {qcols}
FROM cum GROUP BY source ORDER BY source
"""


QUERIES = {
    "sketch_hll_distinct": hll_distinct_tokens,
    "sketch_hll_users_daily": hll_users_daily,
    "sketch_cms_tokens": cms_token_counts,
    "sketch_bloom_membership": bloom_membership,
    "sketch_hist_quantiles": histogram_quantiles,
}
ORACLES = {
    "sketch_hll_distinct": hll_distinct_tokens_sql(),
    "sketch_hll_users_daily": hll_users_daily_sql(),
    "sketch_cms_tokens": cms_token_counts_sql(),
    "sketch_bloom_membership": bloom_membership_sql(),
    "sketch_hist_quantiles": histogram_quantiles_sql(),
}
