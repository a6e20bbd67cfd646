"""Time-series smoothing and downsampling: irregular-time EWMA and
LTTB (largest-triangle-three-buckets) visualization downsampling.

The reference has no smoothing/downsampling at all (gap SURVEY §2.7 —
its surface stops at storage codecs, /root/reference/timebox/
timebox.py); these are standard time-series-engine operations.

Scale design: keyed input runs ``applyInPandas`` grouped by the
series keys, so work distributes across series and each group's
points land in one Arrow batch. UNKEYED input does NOT collapse to a
single Python task: ``ewma`` switches to an exact bucketed-carry plan
(in-bucket prefix sums via a keyed window + a tiny cross-bucket decay
scan broadcast back — same shape as ``kernels.bucketed_prev``), and
``lttb`` — whose interior argmax genuinely needs the whole series —
counts its input first and refuses data-sized single-task runs.
EWMA additionally has a pure-DataFrame variant (``ewma_at_end``)
whose weighted sum stays entirely JVM-side (one agg + one broadcast
join), used as the oracle-checkable digest.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from timebox_spark.operators.resample import interval_us


def ewma(
    df: DataFrame,
    halflife: str,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-row exponentially-weighted moving average with time-aware
    decay on an irregular series (pandas ``ewm(times=...)``, adjust
    semantics):

    ``ewma_i = sum_{j<=i} 0.5^((t_i - t_j)/halflife) * v_j
               / sum_{j<=i} 0.5^((t_i - t_j)/halflife)``

    Keyed input: one pandas ``ewm`` pass per series (parallel across
    series). Unkeyed input: the exact bucketed-carry plan — no single
    Python task (see ``_ewma_bucketed``).
    """
    from timebox_spark.session import ship_package

    keys = keys or []
    if not keys:
        return _ewma_bucketed(
            df, float(interval_us(halflife)), ts_col, value_col, out_col
        )

    ship_package(df.sparkSession)
    hl = pd.Timedelta(microseconds=interval_us(halflife))
    in_cols = [*keys, ts_col, value_col]
    schema = T.StructType(
        [df.schema[c] for c in in_cols] + [T.StructField(out_col, T.DoubleType())]
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        ts = pd.to_datetime(pdf[ts_col])
        pdf[out_col] = (
            pdf[value_col].ewm(halflife=hl, times=ts, adjust=True).mean()
        )
        return pdf

    return df.select(*in_cols).groupBy(*keys).applyInPandas(smooth, schema=schema)


_EWMA_BUCKET_HALFLIVES = 16.0  # decay across one bucket = 2^-16: the
# in-bucket weight ratio stays ≤ 2^16, so double prefix sums keep
# ~2^-36 relative precision while cross-bucket state shrinks fast

EWMA_BUCKET_LIMIT = 500_000  # max carry buckets collected to the driver


def _ewma_bucketed(
    df: DataFrame,
    hl_us: float,
    ts_col: str,
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Exact adjust-form EWMA for a single global series WITHOUT a
    single-task window (the scale fix for the unkeyed landmine).

    Derivation: with bucket start S and width W = 16·halflife,
      numerator_i = Σ_{j≤i} 0.5^((t_i−t_j)/hl)·v_j
                  = 0.5^((t_i−S)/hl)·C(S) + decay_i·Σ_{j in bkt, j≤i} g_j·v_j
    where g_j = 2^((t_j−S)/hl) and C(S) carries all earlier buckets'
    weighted sum evaluated at S. Scaling by powers of two is exact, so
    the in-bucket part is a keyed running sum (Window per bucket); the
    carries (C, D) satisfy a per-bucket linear recurrence — a scan over
    the TINY per-bucket summary table, done driver-side and broadcast
    back (span/16hl rows, e.g. a year at 1h halflife = ~550 rows).
    Two shuffles total (bucket window + broadcast join), no Python.
    """
    spark = df.sparkSession
    W = _EWMA_BUCKET_HALFLIVES * hl_us
    # the per-bucket summary is collected to the driver: bucket count =
    # span / (16·halflife) and is unbounded for tiny halflives over a
    # long span — refuse past the same single-point-bottleneck limit
    # class lttb uses, with actionable advice
    span = df.agg(
        F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
    ).collect()[0]
    if span["lo"] is not None:
        n_buckets = (
            span["hi"] - span["lo"]
        ).total_seconds() * 1e6 / W
        if n_buckets > EWMA_BUCKET_LIMIT:
            raise ValueError(
                f"unkeyed ewma over this span needs ~{int(n_buckets)} "
                f"carry buckets (> {EWMA_BUCKET_LIMIT}): the driver-side "
                "carry scan would bottleneck; pass series keys or use a "
                "larger halflife"
            )
    t = F.unix_micros(F.col(ts_col)).cast("double")
    d = df.withColumn("__t", t).withColumn(
        "__b", F.floor(F.col("__t") / F.lit(W)).cast("long")
    )
    rel = (F.col("__t") - F.col("__b").cast("double") * F.lit(W)) / F.lit(hl_us)
    g = F.pow(F.lit(2.0), rel)
    decay = F.pow(F.lit(0.5), rel)
    w = Window.partitionBy("__b").orderBy(ts_col, value_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    d = (
        d.withColumn("__ga", F.sum(g * F.col(value_col)).over(w))
        .withColumn("__gb", F.sum(g).over(w))
        .withColumn("__decay", decay)
    )

    summary = (
        d.groupBy("__b")
        .agg(
            F.sum(g * F.col(value_col)).alias("ga"),
            F.sum(g).alias("gb"),
        )
        .collect()
    )
    shrink = 0.5 ** _EWMA_BUCKET_HALFLIVES  # decay across one bucket
    carries, zc, zd, prev_b = [], 0.0, 0.0, None
    for row in sorted(summary, key=lambda r: r["__b"]):
        b = row["__b"]
        if prev_b is None:
            cb = db = 0.0
        else:
            gap = 0.5 ** ((b - prev_b - 1) * _EWMA_BUCKET_HALFLIVES)
            cb, db = zc * gap, zd * gap  # decay from prev bucket end to S_b
        carries.append((b, cb, db))
        zc = (cb + row["ga"]) * shrink  # state at this bucket's end
        zd = (db + row["gb"]) * shrink
        prev_b = b
    carry_df = spark.createDataFrame(carries, schema="__b long, __c double, __d double")

    out = d.join(F.broadcast(carry_df), "__b", "left").withColumn(
        out_col,
        (F.col("__decay") * (F.col("__c") + F.col("__ga")))
        / (F.col("__decay") * (F.col("__d") + F.col("__gb"))),
    )
    return out.select(ts_col, value_col, out_col)


def ewma_at_end(
    df: DataFrame,
    halflife: str,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
    out_col: str = "ewma_end",
) -> DataFrame:
    """The EWMA value at each series' LAST timestamp, computed without
    Python: per-key max-ts agg, broadcast back, one weighted-sum agg.
    Algebraically identical to ``ewma``'s final row per key (adjust
    form), and SQL-expressible, so it serves as the DuckDB oracle
    digest for the per-row operator.
    """
    keys = keys or []
    hl_us = float(interval_us(halflife))
    if not keys:
        df = df.withColumn("__g", F.lit(0))
        keys = ["__g"]
    ends = df.groupBy(*keys).agg(F.max(ts_col).alias("__tend"))
    w = F.pow(
        F.lit(0.5),
        (F.unix_micros(F.col("__tend")) - F.unix_micros(F.col(ts_col))) / F.lit(hl_us),
    )
    return (
        df.join(F.broadcast(ends), keys)
        .groupBy(*keys)
        .agg(
            (F.sum(w * F.col(value_col)) / F.sum(w)).alias(out_col),
            F.count(F.lit(1)).alias("n"),
        )
    )


LTTB_SINGLE_TASK_LIMIT = 2_000_000


def lttb(
    df: DataFrame,
    n_out: int,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
    single_task_limit: int = LTTB_SINGLE_TASK_LIMIT,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling per series: keep
    first and last points; split the interior into ``n_out - 2``
    buckets; from each bucket keep the point forming the largest
    triangle with the previously kept point and the next bucket's
    centroid (Steinarsson 2013). Series with <= n_out points pass
    through unchanged. Deterministic: ties resolve to the first
    (lowest-ts) argmax in each bucket.

    The interior argmax chain genuinely needs the whole series, so an
    unkeyed call is one Python task: the input is counted first and
    refused above ``single_task_limit`` rows (downsampling input is
    normally an already-resampled series — tiny; for raw data, resample
    first or pass series ``keys``). Keyed series distribute across keys.
    """
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    from timebox_spark.session import ship_package

    ship_package(df.sparkSession)
    keys = keys or []
    if not keys:
        n_in = df.count()
        if n_in > single_task_limit:
            raise ValueError(
                f"unkeyed lttb over {n_in} rows would serialize the whole "
                f"series through one task (limit {single_task_limit}); "
                "resample/pre-aggregate first, pass series keys, or raise "
                "single_task_limit explicitly"
            )
    in_cols = [*keys, ts_col, value_col]
    schema = T.StructType([df.schema[c] for c in in_cols])

    def downsample(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        n = len(pdf)
        if n <= n_out:
            return pdf[in_cols]
        t = pd.to_datetime(pdf[ts_col]).astype("int64").to_numpy().astype("float64")
        v = pdf[value_col].to_numpy(dtype="float64")
        # bucket boundaries over the interior points [1, n-1)
        edges = np.linspace(1, n - 1, n_out - 1).round().astype("int64")
        keep = [0]
        a = 0  # index of the previously kept point
        for i in range(n_out - 2):
            lo, hi = edges[i], edges[i + 1]
            nlo, nhi = (hi, n) if i == n_out - 3 else (hi, edges[i + 2])
            avg_t, avg_v = t[nlo:nhi].mean(), v[nlo:nhi].mean()
            area = np.abs(
                (t[a] - avg_t) * (v[lo:hi] - v[a]) - (t[a] - t[lo:hi]) * (v[a] - avg_v)
            )
            a = lo + int(np.argmax(area))
            keep.append(a)
        keep.append(n - 1)
        return pdf.iloc[keep][in_cols]

    sel = df.select(*in_cols)
    if keys:
        return sel.groupBy(*keys).applyInPandas(downsample, schema=schema)
    return sel.groupBy(F.lit(0).alias("__g")).applyInPandas(
        lambda pdf: downsample(pdf.drop(columns="__g", errors="ignore")), schema=schema
    )
