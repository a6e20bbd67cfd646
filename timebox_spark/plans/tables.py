"""Loaders for the driver testdata tables (TESTDATA.md).

The testdata ``events`` table stores TIMESTAMP(NANOS) which Spark's
parquet reader rejects. We read nanos as longs
(``spark.sql.legacy.parquet.nanosAsLong``, set in the session factory)
and floor-divide to µs — exactly what DuckDB does when it surfaces the
column as a µs TIMESTAMP, so engine and oracle agree bit-for-bit.
Only the parquet footer is inspected to find ns columns (no data read).
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@lru_cache(maxsize=256)
def _nanos_ts_cols(path: str) -> tuple[str, ...]:
    import pyarrow.dataset as ds

    schema = ds.dataset(path, format="parquet").schema
    return tuple(
        f.name
        for f in schema
        if str(f.type).startswith("timestamp[ns")
    )


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from timebox_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    for c in _nanos_ts_cols(path):
        # pyarrow reports INT96 timestamps (Spark's own default output
        # type) as timestamp[ns] too — only convert when Spark actually
        # surfaced the column as a raw long (true TIMESTAMP(NANOS))
        if dtypes.get(c) == "bigint":
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
            )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
