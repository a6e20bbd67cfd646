from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = os.environ.get("TIMEBOX_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_CORRECT = os.environ.get("TIMEBOX_TEST_SF01_DIR", "/root/testdata/sf0.01")


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
