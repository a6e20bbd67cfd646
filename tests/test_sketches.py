"""Approximate sketches pinned against exact answers: the sketch
internals (HLL++, KLL) can't hash-match another engine, so the
contract is bounded relative error vs the exact aggregates."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from timebox_spark.plans.tables import load


def test_approx_count_distinct_within_bounds(spark):
    events = load(spark, SF_SMOKE, "events")
    row = events.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] <= 0.05


def test_hll_rollup_matches_exact_within_bounds(spark):
    from timebox_spark.operators import sketches

    events = load(spark, SF_SMOKE, "events")
    daily = sketches.daily_distinct_sketches(events, "user_id")
    monthly = sketches.rollup_distinct(daily, "month")
    exact = (
        events.groupBy(
            F.date_trunc("month", F.to_date("ts")).cast("date").alias("period")
        )
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )
    rows = monthly.join(exact, "period").collect()
    assert rows
    for r in rows:
        rel = abs(r["n_distinct_approx"] - r["n_exact"]) / max(r["n_exact"], 1)
        assert rel <= 0.05, f"{r['period']}: {rel}"


def test_hll_merge_of_dailies_close_to_direct_sketch(spark):
    from timebox_spark.operators import sketches

    events = load(spark, SF_SMOKE, "events")
    merged = sketches.rollup_distinct(
        sketches.daily_distinct_sketches(events, "user_id"), "year"
    ).collect()[0]["n_distinct_approx"]
    direct = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("n")
    ).collect()[0]["n"]
    assert abs(merged - direct) / max(direct, 1) <= 0.02


def test_percentile_approx_within_bounds(spark):
    events = load(spark, SF_SMOKE, "events")
    row = events.agg(
        F.percentile("value", 0.5).alias("exact"),
        F.percentile_approx("value", 0.5, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= 0.01 * max(abs(row["exact"]), 1.0)
