"""Explicit skew-handling utilities (SURVEY.md §4).

AQE's skew-join splitting covers most cases at runtime; these helpers are
for the places AQE can't see — aggregation skew and deliberate key
salting of a known-hot dimension:

- ``salted_count``: two-phase aggregation — salt the grouping key,
  partial-aggregate per (key, salt), then merge. Turns one hot reducer
  into ``n_salts`` parallel ones.
- ``salt_join``: replicate the small side ``n_salts`` times and salt the
  big side's key so a hot join key spreads over ``n_salts`` tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_salt(df: DataFrame, key: str, n_salts: int) -> DataFrame:
    """Deterministic salt derived from the WHOLE row (not the key — a
    hot key would map to one salt) so re-runs partition identically
    (no rand() — resumability)."""
    cols = [F.col(c) for c in df.columns] + [F.lit("salt")]
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*cols), F.lit(n_salts))
    )


def salted_count(
    df: DataFrame, key: str, n_salts: int = 16
) -> DataFrame:
    """groupBy(key).count() resilient to a hot key: partial per
    (key, salt), then merge. Result identical to the plain aggregate."""
    partial = (
        with_salt(df, key, n_salts)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return partial.groupBy(key).agg(F.sum("_c").alias("n"))


def salt_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 16
) -> DataFrame:
    """Equi-join where ``big`` has a hot ``key``: the small side is
    exploded across all salt values so each salted big-side partition
    finds its match locally."""
    big_s = with_salt(big, key, n_salts)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")
