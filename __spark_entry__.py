"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship hourly-rollup query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator
(SURVEY.md §2 + §2.7 extensions) with DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timebox_spark.plans import llm_queries as LQ  # noqa: E402
from timebox_spark.plans import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: hourly tumbling-window
    rollup of the events stream table (SURVEY §5.3 Q15)."""
    return Q.q15_time_bucket(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {**Q.QUERIES, **LQ.QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each key in ``queries()``."""
    return {**Q.ORACLE_SQL, **LQ.ORACLE_SQL}
