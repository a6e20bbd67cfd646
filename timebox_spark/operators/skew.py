"""Skew-handling utilities for hot keys at scale.

AQE's skew-join splitting (enabled in the session factory) covers
sort-merge joins; these helpers cover the cases AQE can't:

- ``salted_distinct_count``: COUNT(DISTINCT x) GROUP BY hot_key — the
  distinct shuffle concentrates each key on one reducer. Salting by
  hash(x) % n splits a hot key across n reducers, then a second exact
  aggregation merges the per-salt partials.
- ``salted_broadcast_left``: replicate a small right side n times with
  a salt column so a skewed left key spreads over n tasks even under
  a shuffle join (for when the right side is too big to broadcast but
  small enough to replicate a few times).

Salting is deterministic (hash-derived, no RNG) so results are stable
across runs and cluster layouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_distinct_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt_buckets: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, skew-safe.

    Stage 1 groups by (key, salt=hash(value)%n) and collects per-salt
    distinct counts — a hot key's values spread over n reducers and
    each value lands in exactly one salt bucket, so stage 2 can SUM
    the partial distinct counts exactly.
    """
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt_buckets)).alias("__salt")
    partial = (
        df.select(*key_cols, F.col(value_col), salt)
        .groupBy(*key_cols, "__salt")
        .agg(F.countDistinct(value_col).alias("__partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("__partial").alias(out_col))


def salted_broadcast_left(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join where the left side has skewed keys: left rows get a
    deterministic salt from a row hash; the right side is replicated
    once per salt value so the join key becomes (on..., salt) and a
    hot key spreads across ``salt_buckets`` tasks."""
    lsalt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets)
    ).alias("__salt")
    l = left.select("*", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return l.join(r, [*on, "__salt"]).drop("__salt")
