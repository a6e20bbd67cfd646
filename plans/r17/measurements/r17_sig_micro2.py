"""Decompose banded-ckpt cost: shingling vs sig-agg vs band explode."""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from timebox_spark.operators.dedup import (
    _md5_u32,
    _portable_index_parts,
    _portable_sets,
)
from timebox_spark.plans.tables import load
from timebox_spark.session import ensure_parallelism, get_spark

spark = get_spark(app_name="r17-sig-micro2")
spark.range(1).count()

docs = load(spark, "/root/testdata/sf0.1", "documents").select(
    "doc_id", "text"
).filter(F.col("doc_id") % 4 == 1).localCheckpoint()
print("docs:", docs.count(), flush=True)


def t(name, df):
    for rep in range(3):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        print(f"{name} rep{rep}: {time.perf_counter()-t0:.3f}s", flush=True)


# 1. shingling alone (post-fix shape: repartition below the scan)
d = _portable_sets(ensure_parallelism(docs), "doc_id", "text", 5)
t("shingle_only", d)

# 2. full banded (current code path)
banded, _d, _sigs = _portable_index_parts(docs, "doc_id", "text", 32, 8, 5)
t("banded_full", banded)

# 3. sigs only (explode+agg over unshared d)
ex = d.select("doc_id", F.explode("__sh").alias("s"))
sigs = ex.groupBy("doc_id").agg(
    *[F.min(_md5_u32(F.col("s"), str(i))).alias(f"h{i}") for i in range(32)]
)
t("sigs_explode_agg", sigs)
