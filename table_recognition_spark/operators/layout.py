"""Data layout for scan pruning — the write-side half of the 100-TB
read path.

Predicate pushdown only pays when the files' row-group statistics are
tight: a corpus written in arrival order has every row group spanning
the whole value domain, so min/max stats prune nothing and a selective
range scan still reads every byte. ``write_range_layout`` re-clusters a
table with ``repartitionByRange`` (one total range-exchange, sampled
boundaries) + ``sortWithinPartitions`` before the parquet write, which
makes row groups value-disjoint along the layout keys — a range
predicate then touches only the row groups whose [min, max] intersect
it, and Spark/DuckDB/any parquet reader skips the rest from footer
metadata alone.

``rowgroup_prune_stats`` measures the effect from the parquet footers
(no scan): how many row groups a predicate can skip. The pytest pins a
>= 60% skip rate on the laid-out table vs ~0% on the arrival-order
write of the SAME rows (tests/test_layout.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_range_layout(
    df: DataFrame,
    path: str,
    keys: list[str],
    n_files: int = 8,
) -> None:
    """Range-cluster ``df`` on ``keys`` and write parquet whose
    row-group min/max statistics are tight along those keys.

    Scale shape: ``repartitionByRange`` is ONE shuffle with sampled
    range boundaries (no global sort barrier — each output partition
    sorts independently), so the cost is the same order as any other
    full-shuffle write; the payoff is every future selective scan."""
    (
        df.repartitionByRange(n_files, *keys)
        .sortWithinPartitions(*keys)
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroup_prune_stats(
    path: str, column: str, lo, hi
) -> dict[str, int]:
    """Count parquet row groups whose [min, max] stats intersect
    [lo, hi] — footer metadata only, no data read. Returns
    {"total": N, "matching": M, "files": K}; a reader needs to scan
    only M. Recurses into hive-partitioned directory layouts."""
    import glob
    import os

    import pyarrow.parquet as pq

    total = matching = files = 0
    paths = sorted(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    for f in paths:
        md = pq.ParquetFile(f).metadata
        files += 1
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            col = next(
                (
                    g.column(i)
                    for i in range(g.num_columns)
                    if g.column(i).path_in_schema == column
                ),
                None,
            )
            if col is None:
                avail = [
                    g.column(i).path_in_schema for i in range(g.num_columns)
                ]
                raise ValueError(
                    f"column {column!r} not in parquet schema of {f}; "
                    f"available: {avail}"
                )
            st = col.statistics
            total += 1
            if st is None or st.min is None:
                matching += 1  # no stats -> reader must scan it
            elif st.min <= hi and st.max >= lo:
                matching += 1
    return {"total": total, "matching": matching, "files": files}


# --------------------------------------------------- driver-gated query
# The pruning story above, as an oracled query: lay the events table out
# by an ANALYTIC range bucketing of event_id (explicit boundaries, not
# repartitionByRange's sampled ones — sampled boundaries depend on the
# session's input-split config, which would make the written files, and
# so the footer stats, vary across driver configs; write_range_layout
# keeps the sampled path for production where determinism across
# sessions doesn't matter). Spark then MEASURES how many row groups a
# range predicate can skip from the real parquet footers, while the
# DuckDB oracle derives the same counts relationally from the bucket
# math — a genuine cross-engine check that the layout produces the
# min/max stats the 100-TB scan-pruning story depends on.

_LAYOUT_BUCKETS = 8


def layout_prune_stats(spark, sf_dir) -> DataFrame:
    """Range-cluster events on event_id into 8 bucket files, then count
    from parquet footers how many row groups a mid-range predicate
    (span/4 .. 7·span/16 — 3/16 of the domain, straddling one bucket
    boundary) must read. One row: (files_total, rowgroups_total,
    rowgroups_matching, rows_selected, rows_total)."""
    import tempfile

    from .common import load

    ev = load(spark, sf_dir, "events")
    mn, mx, n_rows = ev.agg(
        F.min("event_id"), F.max("event_id"), F.count("*")
    ).first()
    span = int(mx) - int(mn) + 1
    lo = int(mn) + span // 4
    hi = int(mn) + (span * 7) // 16
    b = _LAYOUT_BUCKETS
    bucket = F.expr(
        f"least({b - 1}, ((event_id - {mn}) * {b}) div {span})"
    )
    out_dir = tempfile.mkdtemp(prefix="trs_layout_")
    (
        ev.withColumn("bucket", bucket)
        .repartition(b, "bucket")  # each bucket lands whole in one task
        .sortWithinPartitions("event_id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out_dir)
    )
    stats = rowgroup_prune_stats(out_dir, "event_id", lo, hi)
    rows_selected = ev.filter(
        (F.col("event_id") >= lo) & (F.col("event_id") <= hi)
    ).count()
    return spark.createDataFrame(
        [
            (
                stats["files"],
                stats["total"],
                stats["matching"],
                rows_selected,
                int(n_rows),
            )
        ],
        "files_total long, rowgroups_total long, rowgroups_matching long, "
        "rows_selected long, rows_total long",
    )


def layout_prune_stats_sql() -> str:
    """DuckDB mirror: per-bucket min/max from the same analytic bucket
    assignment; a bucket's file/row group "matches" iff its [min, max]
    intersects [lo, hi]. Assumes one row group per bucket file, which
    holds for any sf this gate runs at (1250 rows/file at sf0.01 —
    parquet's 128 MB row-group floor is never split); pytest pins the
    assumption against the real footers (tests/test_layout.py)."""
    b = _LAYOUT_BUCKETS
    return f"""
    WITH lim AS (
      SELECT min(event_id) AS mn,
             max(event_id) - min(event_id) + 1 AS span
      FROM events
    ),
    pred AS (
      SELECT mn + span // 4 AS lo, mn + (span * 7) // 16 AS hi FROM lim
    ),
    per AS (
      SELECT least({b - 1}, ((e.event_id - l.mn) * {b}) // l.span) AS bucket,
             min(e.event_id) AS bmn, max(e.event_id) AS bmx
      FROM events e, lim l GROUP BY 1
    )
    SELECT CAST((SELECT count(*) FROM per) AS BIGINT) AS files_total,
           CAST((SELECT count(*) FROM per) AS BIGINT) AS rowgroups_total,
           CAST((SELECT count(*) FROM per, pred
                 WHERE bmn <= hi AND bmx >= lo) AS BIGINT)
               AS rowgroups_matching,
           CAST((SELECT count(*) FROM events, pred
                 WHERE event_id BETWEEN lo AND hi) AS BIGINT)
               AS rows_selected,
           CAST((SELECT count(*) FROM events) AS BIGINT) AS rows_total
    """


QUERIES = {"layout_prune_stats": layout_prune_stats}
ORACLES = {"layout_prune_stats": layout_prune_stats_sql()}
