"""Detector-drain A/B micro-bench (round 17 §6).

Replicates bench.py's stream block input (3 staged files, one per
micro-batch, one-third doc sample at sf0.1) and drives the DETECTOR
half (curate_stream -> near_dup_hits_stream -> foreachBatch parquet
sink) with TWO sink variants alternated inside ONE Spark session:

  old: `if batch_df.isEmpty(): return` then write    (HEAD-1 behavior)
  new: persist -> count() -> write-from-cache        (the fix)

Hypothesis (confirmed by the first instrumented run): hit rows are
sparse across the stateful stage's partitions, so isEmpty()'s take(1)
escalates through sequential mostly-empty partition waves, paying the
state stage serially several times (measured 11-21 s/batch vs
2.3-2.8 s for one full parallel pass); the write afterwards reuses the
shuffle map outputs, so the map stage is NOT the double-paid part.
One persisted parallel count answers emptiness and feeds the write.

A warmup drain runs first (discarded); then old,new,old,new measured.
Each drain uses a fresh work dir + checkpoint. Hit-row counts printed
so both variants provably produce identical output.
"""
from __future__ import annotations

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
spark = get_spark(app_name="r17_detector_micro")
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


stage_root = tempfile.mkdtemp(prefix="timebox_r17_det_src_")
src = f"{stage_root}/src"
for i in range(1, n_cycles + 1):
    batch(i).filter(F.col("doc_id") % 3 == 0).withColumn(
        "ts",
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") % 3600),
    ).coalesce(1).write.mode("append").parquet(src)
docs_in = spark.read.parquet(src).count()


def drain_once(mode: str) -> dict:
    work = tempfile.mkdtemp(prefix=f"timebox_r17_det_{mode}_")
    try:
        stream = (
            spark.readStream.schema(
                "doc_id long, text string, source string, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        curated = ING.curate_stream(
            stream, min_quality_q=0, min_tokens=1, carry_cols=("ts",)
        )
        # old = HEAD-1 behavior (no fanout repartition, isEmpty sink);
        # new = the round-17 fix (id-hash fanout + persisted count)
        hits = ING.near_dup_hits_stream(
            curated, fanout=0 if mode == "old" else None
        )
        hits_path = f"{work}/near_hits"
        per_batch: list = []

        def sink_old(batch_df, batch_id):
            t0 = time.perf_counter()
            if batch_df.isEmpty():
                per_batch.append(round(time.perf_counter() - t0, 3))
                return
            batch_df.write.mode("overwrite").parquet(
                f"{hits_path}/batch={batch_id}"
            )
            per_batch.append(round(time.perf_counter() - t0, 3))

        def sink_new(batch_df, batch_id):
            t0 = time.perf_counter()
            batch_df.persist()
            try:
                if batch_df.count():
                    batch_df.write.mode("overwrite").parquet(
                        f"{hits_path}/batch={batch_id}"
                    )
            finally:
                batch_df.unpersist()
            per_batch.append(round(time.perf_counter() - t0, 3))

        writer = (
            hits.writeStream.foreachBatch(
                sink_old if mode == "old" else sink_new
            )
            .option("checkpointLocation", f"{work}/ckpt_nd")
            .trigger(availableNow=True)
        )
        t0 = time.perf_counter()
        writer.start().awaitTermination()
        total = round(time.perf_counter() - t0, 3)
        n_hits = spark.read.parquet(hits_path).count()
        return {
            "mode": mode,
            "detector_sec": total,
            "per_batch_sink_sec": per_batch,
            "hit_rows": n_hits,
            "load1": round(os.getloadavg()[0], 2),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


out = {"docs_in": docs_in, "runs": []}
try:
    drain_once("old")  # warmup, discarded
    for mode in ("old", "new", "old", "new"):
        out["runs"].append(drain_once(mode))
finally:
    shutil.rmtree(stage_root, ignore_errors=True)

print(json.dumps(out))
