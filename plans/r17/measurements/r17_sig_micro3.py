"""Banded table end-to-end: current explode+agg vs HOF array_min,
both inline from raw docs (no checkpoint), values compared."""
import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from timebox_spark.operators.dedup import _md5_u32, _portable_sets
from timebox_spark.plans.tables import load
from timebox_spark.session import ensure_parallelism, get_spark

spark = get_spark(app_name="r17-sig-micro3")
spark.range(1).count()

docs = load(spark, "/root/testdata/sf0.1", "documents").select(
    "doc_id", "text"
).filter(F.col("doc_id") % 4 == 1).localCheckpoint()
print("docs:", docs.count(), flush=True)
num_perm, bands = 32, 8
r = num_perm // bands


def _mk_hash(i):
    return lambda s: _md5_u32(s, str(i))


def band_cols(sigs):
    structs = [
        F.struct(
            F.lit(j).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"h{j * r + k}").cast("string")
                        for k in range(r)
                    ],
                )
            ).alias("key"),
        )
        for j in range(bands)
    ]
    return sigs.select(
        "doc_id", F.explode(F.array(*structs)).alias("b")
    ).select("doc_id", "b.band", "b.key")


def banded_a():
    d = _portable_sets(ensure_parallelism(docs), "doc_id", "text", 5)
    ex = d.select("doc_id", F.explode("__sh").alias("s"))
    sigs = ex.groupBy("doc_id").agg(
        *[
            F.min(_md5_u32(F.col("s"), str(i))).alias(f"h{i}")
            for i in range(num_perm)
        ]
    )
    return band_cols(sigs)


def banded_b():
    d = _portable_sets(ensure_parallelism(docs), "doc_id", "text", 5)
    sigs = d.filter(F.col("__sh").isNotNull()).select(
        "doc_id",
        *[
            F.array_min(F.transform("__sh", _mk_hash(i))).alias(f"h{i}")
            for i in range(num_perm)
        ],
    )
    return band_cols(sigs)


for name, fn in (("A_current", banded_a), ("B_hof", banded_b)):
    for rep in range(3):
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        print(f"{name} rep{rep}: {time.perf_counter()-t0:.3f}s", flush=True)

ha = hashlib.md5(
    str(sorted(map(tuple, banded_a().collect()))).encode()
).hexdigest()
hb = hashlib.md5(
    str(sorted(map(tuple, banded_b().collect()))).encode()
).hexdigest()
print("A==B:", ha == hb, ha, hb, flush=True)
