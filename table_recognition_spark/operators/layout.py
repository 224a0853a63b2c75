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

from pyspark.sql import DataFrame


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
    {"total": N, "matching": M}; a reader needs to scan only M."""
    import glob
    import os

    import pyarrow.parquet as pq

    total = matching = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            col = next(
                g.column(i)
                for i in range(g.num_columns)
                if g.column(i).path_in_schema == column
            )
            st = col.statistics
            total += 1
            if st is None or st.min is None:
                matching += 1  # no stats -> reader must scan it
            elif st.min <= hi and st.max >= lo:
                matching += 1
    return {"total": total, "matching": matching}
