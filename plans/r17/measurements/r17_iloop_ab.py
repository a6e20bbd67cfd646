"""Focused ingest-loop timing at sf0.1 — the bench _ingest_loop_stats
1x block only (3 cycles, all gates on), printed as JSON."""
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

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="r17-iloop-ab")
spark.range(1).count()
import pandas as _pd  # noqa

(
    spark.range(0, 1024)
    .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    .mapInPandas(lambda it: (pdf for pdf in it), schema="id long")
    .write.mode("overwrite").format("noop").save()
)

docs = tables_load(spark, SF, "documents").select("doc_id", "text", "source")
n_docs = docs.count()
n_cycles = 3
slices = n_cycles + 1
seed1x = docs.filter(F.col("doc_id") % slices == 0)


def batch(i):
    b = docs.filter(F.col("doc_id") % slices == i)
    seeds = seed1x
    exact = seeds.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1_000_000 * i).alias("doc_id"), "text", "source"
    )
    near = seeds.filter(F.col("doc_id") % 20 == slices).select(
        (F.col("doc_id") + 2_000_000 * i).alias("doc_id"),
        F.concat("text", F.lit(f" bench loop near {i}")).alias("text"),
        "source",
    )
    return b.unionByName(exact).unionByName(near)


kw = dict(
    near_dup=True, threshold=0.35, bloom_m=1 << 24, band_bloom_m=1 << 26,
    cms_col="source", cap_max=100_000, consolidate_every=2, keep="chain",
)

saved = ING.GATE_MIN_TREE_BYTES
ING.GATE_MIN_TREE_BYTES = 0
out = {}
try:
    work = tempfile.mkdtemp(prefix="r17_iloop_ab_")
    store = f"{work}/store"
    t0 = time.perf_counter()
    ING.run_ingest_cycle(seed1x, store, 0, **kw)
    out["seed_sec"] = round(time.perf_counter() - t0, 3)
    cyc_rows = []
    for i in range(1, n_cycles + 1):
        b = batch(i)
        n_in = b.count()
        tm = {}
        t0 = time.perf_counter()
        kept = ING.run_ingest_cycle(b, store, i, timings=tm, **kw)
        sec = time.perf_counter() - t0
        cyc_rows.append(
            {"cycle": i, "sec": round(sec, 3), "kept": kept,
             **{f"stage_{k}": v for k, v in tm.items()}}
        )
    out["cycles"] = cyc_rows
    out["cycle_sec_total"] = round(sum(c["sec"] for c in cyc_rows), 3)
    out["kept_ids_md5"] = __import__("hashlib").md5(
        str(sorted(
            r["doc_id"]
            for r in spark.read.parquet(f"{store}/corpus").collect()
        )).encode()
    ).hexdigest()
    shutil.rmtree(work, ignore_errors=True)
finally:
    ING.GATE_MIN_TREE_BYTES = saved
print(json.dumps(out), flush=True)
