"""Time-series smoothing and downsampling: irregular-time EWMA and
LTTB (largest-triangle-three-buckets) visualization downsampling.

The reference has no smoothing/downsampling at all (gap SURVEY §2.7 —
its surface stops at storage codecs, /root/reference/timebox/
timebox.py); these are standard time-series-engine operations.

Scale design: both operators are per-series — ``applyInPandas``
grouped by the series keys, so work distributes across series and
each group's points land in one Arrow batch. EWMA additionally has a
pure-DataFrame variant (``ewma_at_end``) whose weighted sum stays
entirely JVM-side (one agg + one broadcast join), used as the
oracle-checkable digest. Unkeyed input collapses to one group — for
giant single series, pre-bucket by day and stitch like
``kernels.bucketed_prev``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
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
    """
    from timebox_spark.session import ship_package

    ship_package(df.sparkSession)
    keys = keys or []
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

    sel = df.select(*in_cols)
    if keys:
        return sel.groupBy(*keys).applyInPandas(smooth, schema=schema)
    return sel.groupBy(F.lit(0).alias("__g")).applyInPandas(
        lambda pdf: smooth(pdf.drop(columns="__g", errors="ignore")), schema=schema
    )


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


def lttb(
    df: DataFrame,
    n_out: int,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling per series: keep
    first and last points; split the interior into ``n_out - 2``
    buckets; from each bucket keep the point forming the largest
    triangle with the previously kept point and the next bucket's
    centroid (Steinarsson 2013). Series with <= n_out points pass
    through unchanged. Deterministic: ties resolve to the first
    (lowest-ts) argmax in each bucket.
    """
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    from timebox_spark.session import ship_package

    ship_package(df.sparkSession)
    keys = keys or []
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
