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


def test_percentile_approx_within_bounds(spark):
    events = load(spark, SF_SMOKE, "events")
    row = events.agg(
        F.percentile("value", 0.5).alias("exact"),
        F.percentile_approx("value", 0.5, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= 0.01 * max(abs(row["exact"]), 1.0)
