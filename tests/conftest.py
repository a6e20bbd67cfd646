from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = os.environ.get("TIMEBOX_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_CORRECT = os.environ.get("TIMEBOX_TEST_SF01_DIR", "/root/testdata/sf0.01")

# Fast default profile (round 18, r17 verdict task 1): the full suite
# runs ~75 minutes — longer than the driver's verify window, so a
# default `pytest tests/` run could never finish and a real failure
# was indistinguishable from the timeout. Tests marked `slow` (the
# multi-minute streaming drains / e2e loops, measured with
# --durations) are SKIPPED by default and run when TIMEBOX_FULL_TESTS
# is set — the builder's end-of-round gate. Nothing is deleted: the
# skip reason names the switch, and every slow test still runs in the
# full profile.
RUN_SLOW = bool(os.environ.get("TIMEBOX_FULL_TESTS"))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute streaming/e2e drains — skipped unless "
        "TIMEBOX_FULL_TESTS=1 (fast default profile, round 18)",
    )


def pytest_collection_modifyitems(config, items):
    if RUN_SLOW:
        return
    skip = pytest.mark.skip(
        reason="slow profile: set TIMEBOX_FULL_TESTS=1 to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from timebox_spark.session import get_spark

    s = get_spark(app_name="timebox-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()
