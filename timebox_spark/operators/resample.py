"""Regular-grid resample and gap fill — time-series ops the reference
lacks (SURVEY §2.7; its only regularity notion is the implicit-dates
fast path, /root/reference/timebox/timebox.py:235-238).

Bucketing uses plain µs arithmetic (floor-divide on unix_micros), not
``F.window``: window expressions are restricted to one per plan and
fall outside some codegen paths, while the arithmetic stays in
whole-stage codegen and composes freely (grid + join + fill in one
plan).

Scale design: the dense grid is generated per key from that key's own
[min, max] span (sequence+explode — no driver loop, no global
calendar cross join), the join back is an equi-join on (key, bucket),
and forward-fill is a per-key ordered window. One shuffle by key.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_INTERVAL_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 7 * 86_400_000_000,
}


def interval_us(interval: str) -> int:
    """'1 hour' / '30 minutes' / '15 seconds' -> microseconds."""
    m = re.fullmatch(r"\s*(\d+)\s+(\w+?)s?\s*", interval)
    if not m or m.group(2) not in _INTERVAL_US:
        raise ValueError(f"unsupported interval: {interval!r}")
    return int(m.group(1)) * _INTERVAL_US[m.group(2)]


def time_bucket(col, interval: str) -> Column:
    """Floor a timestamp into its interval bucket (µs arithmetic)."""
    us = interval_us(interval)
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_micros(
        (F.floor(F.unix_micros(c) / F.lit(us)) * F.lit(us)).cast("long")
    )


def resample(
    df: DataFrame,
    interval: str,
    aggs: dict,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Tumbling-window aggregate: floor each row into an interval
    bucket, aggregate per (keys, bucket)."""
    keys = keys or []
    bucketed = df.withColumn(bucket_col, time_bucket(ts_col, interval))
    return bucketed.groupBy(*keys, bucket_col).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )


def dense_grid(
    df: DataFrame,
    interval: str,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Per-key dense bucket grid spanning that key's [min ts, max ts]."""
    keys = keys or []
    spans = df.groupBy(*keys).agg(
        time_bucket(F.min(ts_col), interval).alias("__mn"),
        time_bucket(F.max(ts_col), interval).alias("__mx"),
    )
    step = f"interval {interval}"
    return spans.select(
        *keys,
        F.explode(F.sequence(F.col("__mn"), F.col("__mx"), F.expr(step))).alias(
            bucket_col
        ),
    )


def interpolate(
    df: DataFrame,
    interval: str,
    value_cols: list[str],
    ts_col: str = "ts",
    keys: list[str] | None = None,
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Join observations onto the dense grid; missing buckets get
    LINEARLY interpolated values between the nearest observed buckets.

    ``out = prev + (next - prev) * (t - t_prev) / (t_next - t_prev)``
    computed in double; buckets before the first / after the last
    observation stay null. The reference has no interpolation at all
    (gap §2.7; its regular-spacing fast path is storage-side only,
    /root/reference/timebox/timebox.py:235-238).

    Scale: same shape as ``gap_fill`` — windows run over the
    bucket-level grid (one row per key per bucket), partitioned by key;
    one shuffle. Unkeyed grids are n_buckets rows, small by
    construction.
    """
    keys = keys or []
    grid = dense_grid(df, interval, ts_col, keys, bucket_col)
    obs = df.withColumn(bucket_col, time_bucket(ts_col, interval))
    joined = grid.join(obs, [*keys, bucket_col], "left")
    base = (
        Window.partitionBy(*keys).orderBy(bucket_col)
        if keys
        else Window.orderBy(bucket_col)
    )
    w_prev = base.rowsBetween(Window.unboundedPreceding, 0)
    w_next = base.rowsBetween(0, Window.unboundedFollowing)
    t = F.unix_micros(F.col(bucket_col)).cast("double")
    for c in value_cols:
        v = F.col(c).cast("double")
        marked_ts = F.when(F.col(c).isNotNull(), t)
        pv = F.last(v, ignorenulls=True).over(w_prev)
        pt = F.last(marked_ts, ignorenulls=True).over(w_prev)
        nv = F.first(v, ignorenulls=True).over(w_next)
        nt = F.first(marked_ts, ignorenulls=True).over(w_next)
        joined = joined.withColumn(
            c,
            F.when(F.col(c).isNotNull(), v).otherwise(
                pv + (nv - pv) * ((t - pt) / (nt - pt))
            ),
        )
    return joined


def gap_fill(
    df: DataFrame,
    interval: str,
    value_cols: list[str],
    ts_col: str = "ts",
    keys: list[str] | None = None,
    fill: str = "ffill",
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Join observations onto the dense grid; missing buckets get
    forward-filled values (``ffill``) or nulls (``none``)."""
    keys = keys or []
    grid = dense_grid(df, interval, ts_col, keys, bucket_col)
    obs = df.withColumn(bucket_col, time_bucket(ts_col, interval))
    joined = grid.join(obs, [*keys, bucket_col], "left")
    if fill == "ffill":
        # the window runs over the BUCKET-LEVEL grid (one row per
        # bucket per key), not raw rows; unkeyed grids are n_buckets
        # rows — small by construction
        w = (
            Window.partitionBy(*keys)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, 0)
            if keys
            else Window.orderBy(bucket_col).rowsBetween(Window.unboundedPreceding, 0)
        )
        for c in value_cols:
            joined = joined.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return joined
