"""Continuity harness — recreates the REFERENCE benchmark's shape
(/root/reference/performance_tests.py:8-116: Description | Write |
Read | FileSize over CSV vs timebox vs timebox-compressed vs pickle)
on the sf0.1 events table, with the Spark-era equivalents:

  csv                  ~ pandas CSV           (performance_tests.py:22-31)
  parquet_snappy       ~ timebox uncompressed (:34-65)
  parquet_zstd         ~ timebox compressed   (:76-99)
  npb / npb_compressed = the actual interop format, driver-side

Prints one JSON line: {"metric": "continuity", "rows": N,
 "formats": {fmt: {"write_s":, "read_s":, "bytes":}}}.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from timebox_spark.plans.tables import load
from timebox_spark.session import get_spark
from timebox_spark.sources import npb


def _dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "**"), recursive=True)
        if os.path.isfile(f)
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="timebox-continuity")
    spark.range(1).count()
    base = "/tmp/timebox_continuity"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)

    events = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    n = events.count()
    results: dict[str, dict] = {}

    def run(fmt: str, write_fn, read_fn, path: str):
        t0 = time.perf_counter()
        write_fn(path)
        w = time.perf_counter() - t0
        t0 = time.perf_counter()
        assert read_fn(path) == n
        r = time.perf_counter() - t0
        size = _dir_bytes(path) if os.path.isdir(path) else os.path.getsize(path)
        results[fmt] = {
            "write_s": round(w, 3),
            "read_s": round(r, 3),
            "bytes": size,
        }

    fmtts = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    run(
        "csv",
        lambda p: events.write.mode("overwrite")
        .option("header", True)
        .option("timestampFormat", fmtts)
        .csv(p),
        lambda p: spark.read.option("header", True)
        .option("timestampFormat", fmtts)
        .schema(events.schema)
        .csv(p)
        .count(),
        f"{base}/csv",
    )
    for codec in ("snappy", "zstd"):
        run(
            f"parquet_{codec}",
            lambda p, c=codec: events.write.mode("overwrite")
            .option("compression", c)
            .parquet(p),
            lambda p: spark.read.parquet(p).count(),
            f"{base}/parquet_{codec}",
        )

    # npb: numeric projection (format is numeric-only), seconds ts
    num = events.select(
        F.date_trunc("second", "ts").alias("ts"), "event_id", "user_id", "value"
    )
    pdf = num.toPandas().set_index("ts")
    run(
        "npb",
        lambda p: npb.write_npb_file(pdf, p),
        lambda p: len(npb.read_npb_file(p)),
        f"{base}/events.npb",
    )
    run(
        "npb_compressed",
        lambda p: npb.write_npb_file(
            pdf,
            p,
            compress={"event_id": "e", "user_id": "m", "value": "m"},
            decimals={"value": 6},
        ),
        lambda p: len(npb.read_npb_file(p)),
        f"{base}/events_c.npb",
    )

    print(json.dumps({"metric": "continuity", "rows": n, "formats": results}))


if __name__ == "__main__":
    main()
