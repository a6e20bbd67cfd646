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
    global_bucket: str = "1 day",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[on] <= left[on]`` (backward as-of), optionally per ``by``
    key and within ``tolerance_us`` microseconds.

    Equal timestamps match (right row sorts before the left row).
    Left rows with no match keep nulls. With duplicate right
    timestamps per key the winner is unspecified — pre-aggregate the
    right side per (key, ts) for determinism.

    Scale: with ``by`` keys, one shuffle partitioned by key. WITHOUT
    keys a naive global window would serialize through one task, so
    the unkeyed path partitions by a ``global_bucket`` time bucket,
    carries values within each bucket, and patches bucket-head rows
    from a tiny per-bucket summary prefix (two shuffles of the data +
    one broadcast of ~n_buckets rows — fully parallel).
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

    if by:
        w = Window.partitionBy(*by).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, 0
        )
        out = unioned
        for c in value_cols:
            out = out.withColumn(
                f"__last_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w)
            )
        if tolerance_us is not None:
            out = out.withColumn(
                "__last_ts",
                F.last(F.when(F.col(_SIDE) == 0, F.col(on)), ignorenulls=True).over(w),
            )
    else:
        out = _carry_unkeyed(unioned, on, value_cols, tolerance_us, global_bucket)

    out = out.filter(F.col(_SIDE) == 1)
    for c in value_cols:
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


def _carry_unkeyed(
    unioned: DataFrame,
    on: str,
    value_cols: list[str],
    tolerance_us: int | None,
    global_bucket: str,
) -> DataFrame:
    """Global (no-key) backward carry without a single-task window:
    in-bucket window carry + cross-bucket prefix patch."""
    from timebox_spark.operators.resample import time_bucket

    order = [F.unix_micros(F.col(on)), F.col(_SIDE)]
    bucketed = unioned.withColumn("__bucket", time_bucket(on, global_bucket))
    w = (
        Window.partitionBy("__bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = bucketed
    for c in value_cols:
        out = out.withColumn(f"__last_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w))
    out = out.withColumn(
        "__last_ts_in",
        F.last(F.when(F.col(_SIDE) == 0, F.col(on)), ignorenulls=True).over(w),
    )

    # per-bucket summary of the LAST right-side row (tiny: one row per
    # bucket), then a strictly-preceding prefix over buckets
    right_rows = bucketed.filter(F.col(_SIDE) == 0)
    summary = right_rows.groupBy("__bucket").agg(
        F.max_by(
            F.struct(
                *[F.col(f"__r_{c}").alias(f"v_{c}") for c in value_cols],
                F.col(on).alias("rts"),
            ),
            F.unix_micros(F.col(on)),
        ).alias("__lastrow")
    )
    all_buckets = bucketed.select("__bucket").distinct()
    wb = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    prefix = (
        all_buckets.join(summary, "__bucket", "left")
        .withColumn("__carry", F.last("__lastrow", ignorenulls=True).over(wb))
        .select("__bucket", "__carry")
    )

    out = out.join(F.broadcast(prefix), "__bucket", "left")
    for c in value_cols:
        out = out.withColumn(
            f"__last_{c}",
            F.coalesce(F.col(f"__last_{c}"), F.col(f"__carry.v_{c}")),
        )
    if tolerance_us is not None:
        out = out.withColumn(
            "__last_ts", F.coalesce(F.col("__last_ts_in"), F.col("__carry.rts"))
        )
    return out.drop("__bucket", "__carry", "__last_ts_in")


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
    # rename the right side's join keys: left and right commonly derive
    # from the same source table, and `l[k] == r[k]` on shared lineage
    # resolves both sides to one attribute (Spark warns "trivially true
    # equals predicate"); distinct names make the equi-join explicit.
    # The duplicate key columns are dropped from the output (the left
    # side's values are identical by the join condition).
    ren = {"__bucket": "__bucket_r", **{k: f"__{k}_r" for k in by}}
    for old, new in ren.items():
        r = r.withColumnRenamed(old, new)
    cond = [l["__bucket"] == F.col("__bucket_r")] + [
        l[k] == F.col(f"__{k}_r") for k in by
    ]
    joined = l.join(r, cond, "inner").where(
        (l[left_ts] >= F.col(right_start)) & (l[left_ts] <= F.col(right_end))
    )
    return joined.drop("__bucket", *ren.values())
