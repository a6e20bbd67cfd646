"""As-of and range joins — time-series ops the reference lacks
(SURVEY §2.7; the reference's ``to_pandas`` only zips aligned columns
of one file, /root/reference/timebox/timebox.py:97-100).

The as-of join uses the union + last-value-window plan: tag both
sides, union, sort once per key, carry the most recent right-side
values forward, keep left rows. One shuffle (by key), no cross
product, no per-row probing — the scalable sort-based strategy. The
oracle for correctness is DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"  # 0 = right (wins ties), 1 = left


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[on] <= left[on]`` (backward as-of), optionally per ``by``
    key and within ``tolerance_us`` microseconds.

    Equal timestamps match (right row sorts before the left row).
    Left rows with no match keep nulls.
    """
    by = by or []
    value_cols = value_cols or [c for c in right.columns if c != on and c not in by]

    left_cols = left.columns
    l = left.select(
        *left_cols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(1).alias(_SIDE),
    )
    r = right.select(
        *[
            F.col(on).alias(on) if c == on else F.col(c)
            for c in ([on] + by)
        ],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c != on and c not in by],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.lit(0).alias(_SIDE),
    ).select(*l.columns)  # align column order

    unioned = l.unionByName(r)
    order = [F.unix_micros(F.col(on)), F.col(_SIDE)]
    w = (
        Window.partitionBy(*by).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        if by
        else Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned
    carried = []
    for c in value_cols:
        out = out.withColumn(f"__last_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w))
        carried.append(c)
    if tolerance_us is not None:
        out = out.withColumn(
            "__last_ts", F.last(F.when(F.col(_SIDE) == 0, F.col(on)), ignorenulls=True).over(w)
        )
    out = out.filter(F.col(_SIDE) == 1)
    for c in carried:
        val = F.col(f"__last_{c}")
        if tolerance_us is not None:
            in_tol = (
                F.unix_micros(F.col(on)) - F.unix_micros(F.col("__last_ts"))
            ) <= F.lit(tolerance_us)
            val = F.when(in_tol, val)
        out = out.withColumn(c, val)
    drop = [_SIDE] + [f"__r_{c}" for c in value_cols] + [f"__last_{c}" for c in value_cols]
    if tolerance_us is not None:
        drop.append("__last_ts")
    return out.drop(*drop)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    by: list[str] | None = None,
    bucket: str = "1 day",
) -> DataFrame:
    """Interval join: left rows to right intervals containing them.

    Naive range predicates force a broadcast-nested-loop at scale; we
    add an equi-join bucket key (time bucketed to ``bucket``; intervals
    explode to every bucket they overlap) so Catalyst plans a hash/SMJ
    join, then re-filter exactly. Bucket granularity trades row
    duplication vs join fan-in. Buckets are µs arithmetic (not
    ``F.window`` — one-window-per-plan restriction).
    """
    from timebox_spark.operators.resample import time_bucket

    by = by or []
    l = left.withColumn("__bucket", time_bucket(left_ts, bucket))
    r = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                time_bucket(right_start, bucket),
                time_bucket(right_end, bucket),
                F.expr(f"interval {bucket}"),
            )
        ),
    )
    cond = [l["__bucket"] == r["__bucket"]] + [l[k] == r[k] for k in by]
    joined = l.join(r, cond, "inner").where(
        (l[left_ts] >= r[right_start]) & (l[left_ts] <= r[right_end])
    )
    return joined.drop(l["__bucket"]).drop(r["__bucket"])
