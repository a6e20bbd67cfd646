"""Decompose run_ingest_cycle's state_read_gates stage: build a
3-cycle store at sf0.1 (the r17_iloop_ab recipe), then time each
sub-piece of the gate block for a would-be cycle 4, twice (cold/warm).
Printed as JSON."""
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
spark = get_spark(app_name="r17-gates-micro")
spark.range(1).count()

docs = tables_load(spark, SF, "documents").select("doc_id", "text", "source")
n_cycles = 3
slices = n_cycles + 1
seed1x = docs.filter(F.col("doc_id") % slices == 0)


def batch(i):
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


kw = dict(
    near_dup=True, threshold=0.35, bloom_m=1 << 24, band_bloom_m=1 << 26,
    cms_col="source", cap_max=100_000, consolidate_every=2, keep="chain",
)

saved = ING.GATE_MIN_TREE_BYTES
ING.GATE_MIN_TREE_BYTES = 0
out = {}
try:
    work = tempfile.mkdtemp(prefix="r17_gates_micro_")
    store = f"{work}/store"
    ING.run_ingest_cycle(seed1x, store, 0, **kw)
    for i in range(1, n_cycles + 1):
        ING.run_ingest_cycle(batch(i), store, i, **kw)

    # now decompose the gate block for cycle 4
    from timebox_spark.operators.sketches import (
        _cms_stats, bloom_merge, cms_is_weighted,
    )

    paths = ING._store_tree_paths(store)
    cycle_id = n_cycles + 1

    def read_prior(key):
        df = spark.read.parquet(paths[key])
        return df.filter(F.col("cycle") < cycle_id).drop("cycle")

    def timed(label, fn, res):
        t0 = time.perf_counter()
        v = fn()
        res[label] = round(time.perf_counter() - t0, 3)
        return v

    for attempt in ("cold", "warm"):
        res = {}
        t_all = time.perf_counter()
        fps = timed("read_fps", lambda: read_prior("fps"), res)
        timed("backfill_bloom", lambda: ING._backfill_tree(
            spark, store, paths["fps"], paths["bloom"], cycle_id,
            lambda df: None), res)
        pb = timed("read_bloom", lambda: read_prior("bloom"), res)
        bloom = timed("bloom_merge_fps", lambda: bloom_merge(pb), res)
        fs_path = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
        fs = fs_path(store).getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration())
        timed("content_summary_fps", lambda: fs.getContentSummary(
            fs_path(paths["fps"])).getLength(), res)
        prior_cms = timed("read_cms", lambda: read_prior("cms"), res)
        timed("cms_stats", lambda: _cms_stats(
            prior_cms, 1024, 4, "micro"), res)
        timed("cms_is_weighted", lambda: cms_is_weighted(prior_cms), res)
        timed("backfill_cms", lambda: ING._backfill_tree(
            spark, store, paths["corpus"], paths["cms"], cycle_id,
            lambda df: None), res)
        banded = timed("read_banded", lambda: read_prior("banded"), res)
        sets = timed("read_sets", lambda: read_prior("sets"), res)
        timed("backfill_bloom_band", lambda: ING._backfill_tree(
            spark, store, paths["banded"], paths["bloom_band"], cycle_id,
            lambda df: None), res)
        pbb = timed("read_bloom_band", lambda: read_prior("bloom_band"), res)
        timed("bloom_merge_band", lambda: bloom_merge(pbb), res)
        timed("content_summary_banded", lambda: fs.getContentSummary(
            fs_path(paths["banded"])).getLength(), res)
        res["TOTAL"] = round(time.perf_counter() - t_all, 3)
        out[attempt] = res
    shutil.rmtree(work, ignore_errors=True)
finally:
    ING.GATE_MIN_TREE_BYTES = saved
print(json.dumps(out), flush=True)
