"""Salted aggregation/join correctness vs unsalted equivalents."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from timebox_spark.operators.skew import salted_broadcast_left, salted_distinct_count
from timebox_spark.plans.tables import load


def test_salted_distinct_count_exact(spark):
    events = load(spark, SF_SMOKE, "events")
    salted = {
        (r["event_type"],): r["n_distinct"]
        for r in salted_distinct_count(events, ["event_type"], "user_id").collect()
    }
    exact = {
        (r["event_type"],): r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert salted == exact


def test_salted_join_matches_plain_join(spark):
    events = load(spark, SF_SMOKE, "events").select("event_id", "user_id", "event_type")
    types = (
        load(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("type_n"))
    )
    salted = salted_broadcast_left(events, types, on=["event_type"])
    plain = events.join(types, "event_type")
    assert salted.count() == plain.count()
    a = sorted(map(tuple, salted.select("event_id", "type_n").collect()))
    b = sorted(map(tuple, plain.select("event_id", "type_n").collect()))
    assert a == b
