"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "headline_total", "value": N, "unit": "sec",
   "queries": {"q11": sec, ...}, "sf": 0.1}

Execution is forced with the noop sink (full plan runs, nothing is
collected to the driver), matching how a cluster job would be bound.
Mirrors the reference harness shape (write/read timing,
/root/reference/performance_tests.py:8-116) via the q01 round-trip
entry, then covers each operator family: scan+agg, join, window,
as-of, time bucketing, text, dedup, similarity.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timebox_spark.plans import llm_queries as LQ
from timebox_spark.plans import queries as Q
from timebox_spark.session import get_spark

HEADLINE = {
    "q01_roundtrip": Q.q01_roundtrip,
    "q06_delta_reconstruct": Q.q06_delta_reconstruct,
    "q11_filter_agg": Q.q11_filter_agg,
    "q12_join_topk": Q.q12_join_topk,
    "q14_window_rank": Q.q14_window_rank,
    "q15_time_bucket": Q.q15_time_bucket,
    "q16_asof": Q.q16_asof,
    "q17_npb_roundtrip": Q.q17_npb_roundtrip,
    "q18_resample_gapfill": Q.q18_resample_gapfill,
    "q20_text_stats": LQ.q20_text_stats,
    "q25_minhash_dedup": LQ.q25_minhash_dedup,
    "q28_knn_bruteforce": LQ.q28_knn_bruteforce,
    "q35_range_join": Q.q35_range_join,
    "q47_ivf_ann": LQ.q47_ivf_ann,
    "q50_tpch_q5_shape": Q.q50_tpch_q5_shape,
    "q54_curation_pipeline": LQ.q54_curation_pipeline,
    "q59_tpch_q3_shape": Q.q59_tpch_q3_shape,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_spark(app_name="timebox-bench")

    # warm the JVM/codegen/committer once: a trivial action plus a tiny
    # parquet write+read so the first measured query isn't paying
    # one-time parquet/committer initialization (~1.7s locally)
    spark.range(1).count()
    warm = "/tmp/timebox_bench_warmup"
    spark.range(100).write.mode("overwrite").parquet(warm)
    spark.read.parquet(warm).count()
    # spin up the (reused) Python workers once so the first
    # mapInPandas-bearing query isn't billed for worker startup —
    # spark.python.worker.reuse keeps them alive between queries
    import pandas as _pd

    (
        spark.range(0, 1024)
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .mapInPandas(lambda it: (pdf for pdf in it), schema="id long")
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    assert _pd is not None  # keep the import local to the warmup

    def run_pass(d: str) -> dict[str, float]:
        out: dict[str, float] = {}
        for name, fn in HEADLINE.items():
            t0 = time.perf_counter()
            fn(spark, d).write.mode("overwrite").format("noop").save()
            out[name] = round(time.perf_counter() - t0, 3)
        return out

    # compile-warm every query once at the smallest SF: whole-stage
    # codegen + JIT of each plan's generated code is 1-3s/query of
    # run-to-run NOISE otherwise (measured 27-56s headline swings on
    # identical code); after this, measured passes reflect data
    # processing, not JVM compilation
    smallest = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(smallest):
        run_pass(smallest)

    timings = run_pass(sf_dir)       # first data pass at target SF
    warm_timings = run_pass(sf_dir)  # steady-state repeat

    # scale-stress: the dedup/ANN/curation path again on a 10×
    # duplicate-amplified corpus (see plans/scale_stress.py) — the
    # ratio vs the 1× pass shows whether the blocking/bucketing keeps
    # the shuffle sub-quadratic before a real cluster would
    from timebox_spark.plans import scale_stress

    amp_factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
    amp_dir = f"/tmp/timebox_scale{amp_factor}_{os.path.basename(sf_dir.rstrip('/'))}"
    t0 = time.perf_counter()
    scale_stress.amplify_sf_dir(spark, sf_dir, amp_dir, factor=amp_factor)
    amp_build = round(time.perf_counter() - t0, 3)
    scale_queries = {
        "q25_minhash_dedup": LQ.q25_minhash_dedup,
        "q47_ivf_ann": LQ.q47_ivf_ann,
        "q54_curation_pipeline": LQ.q54_curation_pipeline,
    }
    scale_timings: dict[str, float] = {}
    for name, fn in scale_queries.items():
        t0 = time.perf_counter()
        fn(spark, amp_dir).write.mode("overwrite").format("noop").save()
        scale_timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "warm_total": round(sum(warm_timings.values()), 3),
                "warm_queries": warm_timings,
                "scale10_queries": scale_timings,
                "scale10_factor": amp_factor,
                "scale10_build_sec": amp_build,
                "scale10_ratio": {
                    k: round(scale_timings[k] / timings[k], 2)
                    for k in scale_timings
                    if timings.get(k)
                },
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
