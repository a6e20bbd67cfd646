"""EWMA + LTTB operator tests: hand-computed goldens, the per-row
ewma vs JVM-side ewma_at_end cross-validation, and LTTB invariants."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from timebox_spark.operators.timeseries import ewma, ewma_at_end, lttb


def _ts(h, m=0):
    return datetime(2024, 1, 1 + h // 24, h % 24, m)


def test_ewma_golden_two_points(spark):
    # v=0 at t0, v=1 one halflife later: adjust-form ewma at t1 is
    # (0.5*0 + 1*1) / (0.5 + 1) = 2/3
    df = spark.createDataFrame(
        [(_ts(0), 0.0), (_ts(1), 1.0)], schema="ts timestamp, value double"
    )
    rows = ewma(df, "1 hour").orderBy("ts").collect()
    assert rows[0]["ewma"] == 0.0
    assert abs(rows[1]["ewma"] - 2.0 / 3.0) < 1e-12


def test_ewma_constant_series_is_constant(spark):
    df = spark.createDataFrame(
        [(_ts(h), 7.5) for h in range(10)], schema="ts timestamp, value double"
    )
    rows = ewma(df, "2 hours").collect()
    assert all(abs(r["ewma"] - 7.5) < 1e-12 for r in rows)


def test_ewma_last_row_matches_ewma_at_end(spark):
    # irregular spacing, two keys
    data = [
        ("a", _ts(0, 0), 1.0),
        ("a", _ts(0, 17), 5.0),
        ("a", _ts(2, 3), -2.0),
        ("a", _ts(7, 59), 11.0),
        ("b", _ts(1, 0), 4.0),
        ("b", _ts(1, 30), 6.0),
    ]
    df = spark.createDataFrame(data, schema="k string, ts timestamp, value double")
    per_row = ewma(df, "1 hour", keys=["k"])
    last = {}
    for r in per_row.orderBy("k", "ts").collect():
        last[r["k"]] = r["ewma"]  # ordered by ts: ends on the last row
    end = {r["k"]: r["ewma_end"] for r in ewma_at_end(df, "1 hour", keys=["k"]).collect()}
    assert set(last) == {"a", "b"}
    for k in last:
        assert abs(last[k] - end[k]) < 1e-9, k


def test_lttb_endpoints_count_and_spike(spark):
    # flat series with one big spike: the spike must survive
    n = 200
    data = [(_ts(i // 60, i % 60), 100.0 if i == 117 else (0.0 if i == 0 else 1.0))
            for i in range(n)]
    df = spark.createDataFrame(data, schema="ts timestamp, value double")
    out = lttb(df, 20).orderBy("ts").collect()
    assert len(out) == 20
    ts_sorted = [r["ts"] for r in out]
    assert ts_sorted[0] == min(d[0] for d in data)
    assert ts_sorted[-1] == max(d[0] for d in data)
    assert any(r["value"] == 100.0 for r in out)


def test_lttb_small_series_passthrough_and_keys(spark):
    df = spark.createDataFrame(
        [("a", _ts(h), float(h)) for h in range(5)]
        + [("b", _ts(h), float(-h)) for h in range(40)],
        schema="k string, ts timestamp, value double",
    )
    out = lttb(df, 10, keys=["k"]).collect()
    a = [r for r in out if r["k"] == "a"]
    b = [r for r in out if r["k"] == "b"]
    assert len(a) == 5  # <= n_out passes through
    assert len(b) == 10


def test_lttb_rejects_tiny_n_out(spark):
    df = spark.createDataFrame([(_ts(0), 1.0)], schema="ts timestamp, value double")
    with pytest.raises(ValueError):
        lttb(df, 2)


def test_unkeyed_ewma_bucketed_matches_pandas(spark):
    # the unkeyed path must be the distributed bucketed-carry plan AND
    # agree with pandas ewm across bucket boundaries (halflife 1h ->
    # bucket width 16h; 300 hourly points span ~19 buckets)
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(11)
    ts = pd.date_range("2024-01-01", periods=300, freq="1h")
    # irregular: drop a third of the points to create gaps
    keep = rng.rand(300) > 0.33
    pdf = pd.DataFrame({"ts": ts[keep], "value": rng.randn(keep.sum()) * 50})
    expected = (
        pdf.sort_values("ts")["value"]
        .ewm(halflife=pd.Timedelta(hours=1), times=pd.DatetimeIndex(pdf.sort_values("ts")["ts"]), adjust=True)
        .mean()
        .to_numpy()
    )
    df = spark.createDataFrame(pdf)
    got = (
        ewma(df, "1 hour").orderBy("ts").toPandas()["ewma"].to_numpy()
    )
    np.testing.assert_allclose(got, expected, rtol=1e-9)
    # plan check: no single-partition sort of the data (the window is
    # keyed by bucket)
    plan = ewma(df, "1 hour")._jdf.queryExecution().executedPlan().toString()
    assert "__b" in plan


def test_unkeyed_lttb_refuses_data_sized_input(spark):
    import pandas as pd

    df = spark.range(0, 100).select(
        F.to_timestamp(F.lit("2024-01-01")).alias("ts"),
        F.col("id").cast("double").alias("value"),
    )
    with pytest.raises(ValueError, match="single_task_limit"):
        lttb(df, 10, single_task_limit=50)
