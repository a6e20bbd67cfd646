"""Capture .explain("formatted") for every declared driver query.

Usage: python plans/r18/capture_plans.py <out_suffix> [key ...]
Writes plans/r18/<key>_<out_suffix>.txt for each declared key (all
keys when none are named). Runs at sf0.01 (the driver's correctness
scale) — plan SHAPE is what these files pin; bench carries the
timings. Suite queries that stage side state (bucketed tables, tmp
dirs) run their staging as usual; only the final plan is recorded.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from timebox_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("TIMEBOX_PLAN_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    import __spark_entry__ as entry

    spark = get_spark(app_name="timebox-plan-capture")
    qs = entry.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # record the failure, keep going
            plan = f"CAPTURE FAILED: {type(e).__name__}: {e}"
        out = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"wrote {out} ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()
