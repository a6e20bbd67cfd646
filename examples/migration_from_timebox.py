"""Migration walkthrough: everything a user of the reference timebox
package does, done here — same surface, Spark semantics.

Reference usage (from its README/tests):
    tb = TimeBox.save_pandas(df, 'data.npb')     # ingest + persist
    tb = TimeBox('data.npb'); tb.read()          # scan
    df = TimeBox('data.npb').to_pandas()         # egest

Run: python examples/migration_from_timebox.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from timebox_spark.api import TimeBoxEngine
from timebox_spark.operators import kernels
from timebox_spark.session import get_spark
from timebox_spark.sources import npb
from timebox_spark.table import TimeBoxTable


def main() -> None:
    spark = get_spark(app_name="migration-demo")

    # the same kind of frame the reference ingests: datetime index +
    # numeric columns (uint8 / int16 / float32 like its test fixture F1)
    idx = pd.date_range("2018-01-01", periods=8, freq="1h")
    pdf = pd.DataFrame(
        {
            "tag_0": np.array([1, 2, 3, 4, 5, 6, 7, 8], dtype=np.uint8),
            "tag_1": np.array([-4, -2, 0, 2000, 5, 6, 7, 8], dtype=np.int16),
            "tag_2": np.linspace(0.5, 8.0, 8, dtype=np.float32),
        },
        index=idx,
    )

    # 1. save_pandas / read / to_pandas — the reference's whole API
    table = TimeBoxTable.save_pandas(spark, pdf, "/tmp/demo_timebox")
    back = TimeBoxTable.load(spark, "/tmp/demo_timebox").to_pandas()
    print("round trip equal:", bool((back["tag_1"].to_numpy() == pdf["tag_1"].to_numpy()).all()))

    # 2. the codec transforms the reference applies at write time,
    #    available as queryable operators
    enc = kernels.delta_encode(table.df, "tag_1", order_by=["ts"])
    print("deltas:", [r["tag_1_delta"] for r in enc.orderBy("ts").collect()])

    # 3. what the reference cannot do: SQL over the same table
    engine = TimeBoxEngine(spark)
    engine.register("demo", table)
    engine.sql(
        "SELECT date_trunc('hour', ts) AS h, sum(tag_0) AS s FROM demo GROUP BY 1 ORDER BY 1"
    ).show(3)

    # 4. bidirectional .npb interop with the original file format
    npb.write_npb_file(pdf, "/tmp/demo.npb")
    print("npb file read back:", len(npb.read_npb_file("/tmp/demo.npb")), "rows")

    # 5. partial reads the reference left as a TODO (timebox.py:105)
    sub = table.select_tags("tag_2").between("2018-01-01 02:00:00", "2018-01-01 05:00:00")
    print("partial read rows:", sub.num_points())

    spark.stop()


if __name__ == "__main__":
    main()
