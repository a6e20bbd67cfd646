"""Alternated same-JVM A/B for the round-18 stream-sink change: run
the ingest half of the bench's streaming drain (3 micro-batch-sized
slices through curate -> run_ingest_cycle against a fresh store) with
the micro-batch either UN-materialized (mode A — the pre-round-18
sink: every pre-checkpoint action re-runs the curation chain) or
eagerly localCheckpointed and owner-released (mode B — the round-18
sink). Modes alternate A,B,A,B,... in one JVM so page cache and JIT
state are shared; kept counts must be identical. Usage:

    python plans/r18/measurements/r18_sink_ckpt_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."),
)

from pyspark.sql import functions as F  # noqa: E402

from timebox_spark.operators.dedup import (  # noqa: E402
    _tracked_local_checkpoint,
    unpersist_owned,
)
from timebox_spark.plans.tables import load as tables_load  # noqa: E402
from timebox_spark.session import get_spark  # noqa: E402
from timebox_spark.streaming import ingest as ING  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    spark = get_spark(app_name="r18-sink-ckpt-ab")
    ING.GATE_MIN_TREE_BYTES = 0  # same convention as bench's loop
    docs = tables_load(spark, SF_DIR, "documents").select(
        "doc_id", "text", "source"
    )
    # the bench stream drain's staging: 3 slices, one-third sample
    work0 = tempfile.mkdtemp(prefix="r18_ab_src_")
    srcs = []
    slices = 4
    seed = docs.filter(F.col("doc_id") % slices == 0)
    for i in range(1, 4):
        b = docs.filter(F.col("doc_id") % slices == i)
        exact = seed.filter(F.col("doc_id") % 20 == 0).select(
            (F.col("doc_id") + 1_000_000 * i).alias("doc_id"),
            "text", "source",
        )
        src = f"{work0}/b{i}"
        b.unionByName(exact).filter(
            F.col("doc_id") % 3 == 0
        ).coalesce(1).write.parquet(src)
        srcs.append(src)

    kw = dict(
        near_dup=True, threshold=0.35, bloom_m=1 << 24,
        band_bloom_m=1 << 26, cms_col="source",
        index_verify="estimate",
    )

    def run(mode: str) -> tuple[float, list[int]]:
        work = tempfile.mkdtemp(prefix=f"r18_ab_{mode}_")
        store = f"{work}/store"
        kept = []
        t0 = time.perf_counter()
        try:
            for i, src in enumerate(srcs):
                raw = spark.read.parquet(src)
                batch = ING.curate_stream(
                    raw, min_quality_q=0, min_tokens=1,
                    carry_cols=("source",),
                ).select("doc_id", "text", "source")
                owned: list = []
                try:
                    if mode == "ckpt":
                        batch = _tracked_local_checkpoint(batch, owned)
                    kept.append(
                        ING.run_ingest_cycle(batch, store, i, **kw)
                    )
                finally:
                    unpersist_owned(owned)
            return time.perf_counter() - t0, kept
        finally:
            shutil.rmtree(work, ignore_errors=True)

    results: dict[str, list] = {"lazy": [], "ckpt": []}
    keeps: dict[str, list] = {"lazy": [], "ckpt": []}
    # one unrecorded warmup of each mode, then alternated reps
    for mode in ("lazy", "ckpt"):
        run(mode)
    for _ in range(REPS):
        for mode in ("lazy", "ckpt"):
            sec, kept = run(mode)
            results[mode].append(round(sec, 3))
            keeps[mode].append(kept)
    assert keeps["lazy"] == keeps["ckpt"], (keeps, "kept rows differ!")
    out = {
        "sf_dir": SF_DIR,
        "reps": REPS,
        "kept_per_cycle": keeps["ckpt"][0],
        "lazy_secs": results["lazy"],
        "ckpt_secs": results["ckpt"],
        "lazy_med": round(statistics.median(results["lazy"]), 3),
        "ckpt_med": round(statistics.median(results["ckpt"]), 3),
    }
    out["speedup"] = round(out["lazy_med"] / max(out["ckpt_med"], 1e-9), 2)
    print(json.dumps(out), flush=True)
    shutil.rmtree(work0, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
