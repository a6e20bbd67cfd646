"""Full stream-drain A/B runner (round 17 §6): replicates bench.py's
stream block exactly (same staged files, same curate_and_ingest_stream
args) and reports drain_secs = [detector_sec, ingest_sec] plus kept
corpus evidence (row count + md5 over sorted kept ids) so before/after
runs prove identical results. Run on each code version; compare."""
from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from timebox_spark.plans.tables import load as tables_load
from timebox_spark.session import get_spark
from timebox_spark.streaming import ingest as ING

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="r17_detector_ab")
spark.sparkContext.setLogLevel("ERROR")

docs = tables_load(spark, sf_dir, "documents").select(
    "doc_id", "text", "source"
)
n_cycles = 3
slices = n_cycles + 1
seed1x = docs.filter(F.col("doc_id") % slices == 0)


def batch(i: int):
    b = docs.filter(F.col("doc_id") % slices == i)
    exact = seed1x.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1_000_000 * i).alias("doc_id"), "text", "source"
    )
    near = seed1x.filter(F.col("doc_id") % 20 == slices).select(
        (F.col("doc_id") + 2_000_000 * i).alias("doc_id"),
        F.concat("text", F.lit(f" bench loop near {i}")).alias("text"),
        "source",
    )
    return b.unionByName(exact).unionByName(near)


out: dict = {"label": sys.argv[1] if len(sys.argv) > 1 else "run"}
# NOTE: bench.py's stream block runs with the DEFAULT
# GATE_MIN_TREE_BYTES (it restores the saved value before the stream
# drain), so this runner must too — an early version zeroed it and
# inflated the ingest half ~3x (gates forced on broadcast-small trees)
work = tempfile.mkdtemp(prefix="timebox_r17_det_ab_")
try:
    src = f"{work}/src"
    for i in range(1, n_cycles + 1):
        batch(i).filter(F.col("doc_id") % 3 == 0).withColumn(
            "ts",
            F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") % 3600),
        ).coalesce(1).write.mode("append").parquet(src)
    out["docs_in"] = spark.read.parquet(src).count()
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, source string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    drain = ING.curate_and_ingest_stream(
        stream,
        f"{work}/store",
        f"{work}/ckpt",
        min_quality_q=0,
        min_tokens=1,
        stream_near_dup=True,
        index_verify="estimate",
        consolidate_every=8,
        cms_col="source",
    )
    t0 = time.perf_counter()
    drain.start().awaitTermination()
    out["total_sec"] = round(time.perf_counter() - t0, 3)
    out["drain_secs"] = list(getattr(drain, "drain_secs", []))
    kept = spark.read.parquet(f"{work}/store/corpus").select("doc_id")
    ids = sorted(r[0] for r in kept.collect())
    out["kept_rows"] = len(ids)
    out["kept_md5"] = hashlib.md5(
        ",".join(str(i) for i in ids).encode()
    ).hexdigest()
    hits = spark.read.parquet(f"{work}/store/near_hits_history")
    out["hit_rows"] = hits.count()
finally:
    shutil.rmtree(work, ignore_errors=True)

print(json.dumps(out))
