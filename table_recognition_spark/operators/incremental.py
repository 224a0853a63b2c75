"""Incremental aggregate maintenance — the materialized-view refresh
pattern a 100-TB pipeline lives on.

No reference counterpart (lpiwowar/table-recognition is a train-once
extraction repo); this extends the pipeline surface the way the
checkpoint/resume operator does: a standing aggregate over an append-only
fact stream must absorb a new batch by touching ONLY the partial states
it perturbs, never rescanning history. Two maintained artifacts cover
the two aggregate classes:

- **mergeable partials** (count / sum / min / max): the stored view IS
  the partial-aggregate state, one row per group; folding a delta batch
  is ``union → groupBy → re-aggregate`` where the union's left side is
  |groups| rows, not |history| rows. min/max are only append-mergeable
  — deletes would need the full-state spine below — which is exactly
  the append-only contract of the fact stream.
- **exact distinct** (n_users): count-distinct is NOT mergeable from
  counts; the standing state is the deduplicated (group, user) spine
  — the classic exact-distinct MV trick — merged with the delta's
  spine and counted at read time. (The approximate alternative is the
  HLL register table in operators/sketch.py, whose registers merge by
  max; this operator is the exact twin.)

At scale both states live as tables partitioned by the group key, so
the fold is a co-partitioned merge with no history rescan; here the
"stored" halves are ``localCheckpoint``-ed DataFrames, the same
stand-in pipeline/checkpoint.py uses for its Iceberg-shaped manifest.

The driver-gated query splits the events fixture at its midpoint
timestamp (base | delta), maintains the view incrementally, and returns
the refreshed result — the DuckDB oracle computes the SAME aggregate
directly over the full table, so the gate proves incremental == full
recompute, the invariant that makes incremental refresh trustworthy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .common import load

_GROUP = ["day", "event_type"]


def _partials(ev: DataFrame) -> DataFrame:
    """Mergeable partial-aggregate state: one row per (day, event_type).
    Money in integer cents — exact merge arithmetic, no float drift."""
    return ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("value_c"),
        F.min(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("vmin_c"),
        F.max(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("vmax_c"),
    )


def _spine(ev: DataFrame) -> DataFrame:
    """Exact-distinct state: the deduplicated (group, user) spine."""
    return ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "event_type",
        "user_id",
    ).distinct()


def merge_partials(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a delta batch's partials into the standing state — the
    refresh step. Cost: |state| + |delta groups| rows through one
    hash exchange on the group key (co-partitioned at scale)."""
    return state.unionByName(delta).groupBy(*_GROUP).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("value_c").alias("value_c"),
        F.min("vmin_c").alias("vmin_c"),
        F.max("vmax_c").alias("vmax_c"),
    )


def merge_spine(state: DataFrame, delta: DataFrame) -> DataFrame:
    return state.unionByName(delta).distinct()


def mv_incremental(spark, sf_dir) -> DataFrame:
    """Split events at the midpoint timestamp, build the view on the
    base half, fold the delta half in incrementally, and read the
    refreshed view: (day, event_type, n_events, value_c, vmin_c,
    vmax_c, n_users) ordered by group."""
    ev = load(spark, sf_dir, "events")
    mn, mx = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = mn + (mx - mn) / 2
    base = ev.filter(F.col("ts") <= F.lit(mid))
    delta = ev.filter(F.col("ts") > F.lit(mid))
    # the "stored" view state: materialized once from the base half —
    # the fold below never rescans `base`
    state_agg = _partials(base).localCheckpoint()
    state_spine = _spine(base).localCheckpoint()
    refreshed = merge_partials(state_agg, _partials(delta))
    users = merge_spine(state_spine, _spine(delta)).groupBy(*_GROUP).agg(
        F.count("*").alias("n_users")
    )
    return refreshed.join(users, _GROUP).orderBy(*_GROUP)


MV_INCREMENTAL_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c,
       CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vmin_c,
       CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS vmax_c,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


# ------------------------------------------------- SCD2 / CDC merge
# The other half of incremental maintenance: a versioned DIMENSION.
# Each event is a change record setting its user's current attribute
# (value, in cents); the type-2 slowly-changing dimension keeps every
# version as (user_id, value_c, valid_from, valid_to, is_current).
# The merge step is the CDC upsert every warehouse pipeline runs:
# close the open row of each touched user at the delta's first change
# time, append the delta's own version chain, pass untouched users
# through — all keyed by user_id, so at scale it is a co-partitioned
# join of the dimension's OPEN slice (|users| rows) against the delta,
# never a rescan of the closed history.


def _scd2(ev: DataFrame) -> DataFrame:
    """Full-history SCD2 build: one window pass per user ordered by
    (ts, event_id) — the from-scratch shape the merge must equal."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "ts", "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("value_c"),
    ).select(
        "user_id", "value_c",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def scd2_merge(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a CDC delta batch into a standing SCD2 dimension.

    ``state``: (user_id, value_c, valid_from, valid_to, is_current);
    ``delta``: raw change events. Touches only the open slice — closed
    rows stream through untouched (at scale: a partition-pruned
    pass-through, since closed history is immutable)."""
    dv = _scd2(delta)  # the delta's own version chain
    first_change = delta.groupBy("user_id").agg(
        F.min(F.struct("ts", "event_id"))["ts"].alias("first_ts")
    )
    open_rows = state.filter("is_current").drop("valid_to", "is_current")
    closed = state.filter(~F.col("is_current"))
    touched = open_rows.join(first_change, "user_id").select(
        "user_id", "value_c", "valid_from",
        F.col("first_ts").alias("valid_to"), F.lit(False).alias("is_current"),
    )
    untouched = open_rows.join(first_change, "user_id", "left_anti").select(
        "user_id", "value_c", "valid_from",
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.unionByName(touched).unionByName(untouched).unionByName(dv)


def scd2_incremental(spark, sf_dir) -> DataFrame:
    """Split events at the midpoint timestamp, build the dimension on
    the base half, merge the delta half as a CDC batch, and emit the
    refreshed dimension — equal to the from-scratch window build (the
    DuckDB oracle)."""
    ev = load(spark, sf_dir, "events")
    mn, mx = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = mn + (mx - mn) / 2
    state = _scd2(ev.filter(F.col("ts") <= F.lit(mid))).localCheckpoint()
    merged = scd2_merge(state, ev.filter(F.col("ts") > F.lit(mid)))
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return merged.select(
        "user_id", "value_c",
        F.date_format("valid_from", fmt).alias("valid_from"),
        F.date_format("valid_to", fmt).alias("valid_to"),
        F.col("is_current").cast("int").alias("is_current"),
    ).orderBy("user_id", "valid_from")


SCD2_SQL = """
SELECT user_id,
       CAST(round(value * 100) AS BIGINT) AS value_c,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
       strftime(lead(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id),
                '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
       CAST(lead(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) IS NULL AS INT)
           AS is_current
FROM events ORDER BY user_id, valid_from
"""


QUERIES = {
    "pipeline_mv_incremental": mv_incremental,
    "pipeline_scd2_merge": scd2_incremental,
}
ORACLES = {
    "pipeline_mv_incremental": MV_INCREMENTAL_SQL,
    "pipeline_scd2_merge": SCD2_SQL,
}
