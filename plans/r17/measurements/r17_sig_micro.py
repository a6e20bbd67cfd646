"""Micro-benchmark: portable minhash signature aggregation, two
value-identical formulations over the same ~1,600-doc batch shape.

A: explode (id, shingle) + groupBy(id).agg(32 x min(md5...))  [current]
B: per-doc HOF: 32 x array_min(transform(__sh, md5...))        [map-only]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from timebox_spark.operators.dedup import (
    _md5_u32,
    _portable_sets,
)
from timebox_spark.plans.tables import load
from timebox_spark.session import ensure_parallelism, get_spark

spark = get_spark(app_name="r17-sig-micro")
spark.range(1).count()

docs = load(spark, "/root/testdata/sf0.1", "documents").select(
    "doc_id", "text"
).filter(F.col("doc_id") % 4 == 1)  # ~the cycle batch size
num_perm = 32

d = _portable_sets(
    ensure_parallelism(docs), "doc_id", "text", 5
).localCheckpoint()
print("docs:", d.count(), flush=True)


def run_a():
    ex = d.select("doc_id", F.explode("__sh").alias("s"))
    return ex.groupBy("doc_id").agg(
        *[
            F.min(_md5_u32(F.col("s"), str(i))).alias(f"h{i}")
            for i in range(num_perm)
        ]
    )


def _mk_hash(i):
    # factory, not a default-arg lambda: a two-parameter lambda to
    # F.transform is treated as (element, index) — the repo's HOF trap
    return lambda s: _md5_u32(s, str(i))


def run_b():
    dd = d.filter(F.col("__sh").isNotNull())
    return dd.select(
        "doc_id",
        *[
            F.array_min(F.transform("__sh", _mk_hash(i))).alias(f"h{i}")
            for i in range(num_perm)
        ],
    )


for name, fn in (("A_explode_agg", run_a), ("B_hof_arraymin", run_b)):
    for rep in range(3):
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        print(f"{name} rep{rep}: {time.perf_counter()-t0:.3f}s", flush=True)

# value equality check
import hashlib

ha = hashlib.md5(str(sorted(map(tuple, run_a().collect()))).encode()).hexdigest()
hb = hashlib.md5(str(sorted(map(tuple, run_b().collect()))).encode()).hexdigest()
print("A==B:", ha == hb, ha, hb, flush=True)
