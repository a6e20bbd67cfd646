"""Mergeable sketches: the 100 TB pattern for distinct counting.

At scale you never recompute COUNT(DISTINCT) over raw data per
reporting period — you store small mergeable sketches per fine bucket
(day) and union them to any coarser period (week/month/all-time)
without touching the base table again. Spark 4 ships Apache
DataSketches HLL natively (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``), so the whole path is JVM-side binary
columns — no Python, one shuffle to build, one tiny shuffle to merge.

The reference has no aggregation surface at all (SURVEY §2.7); this
is part of the analytics extension the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_distinct_sketches(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    lg_k: int = 12,
) -> DataFrame:
    """Per-day HLL sketch of distinct ``key_col`` values — the
    mergeable pre-aggregate to persist alongside the data. ``lg_k``
    12 ⇒ ~4 KB per sketch, ~1.6% relative error."""
    return df.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def rollup_distinct(
    sketches: DataFrame,
    period: str = "month",
    day_col: str = "day",
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge fine-grained sketches to a coarser period WITHOUT
    rescanning base data: ``hll_union_agg`` over the stored binary
    sketches, then estimate. Input is days; output is one row per
    ``period`` with the approximate distinct count."""
    return (
        sketches.groupBy(
            F.date_trunc(period, F.col(day_col)).cast("date").alias("period")
        )
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg(sketch_col, F.lit(True))
            ).alias("n_distinct_approx"),
            F.sum("n_rows").alias("n_rows"),
        )
    )
