"""timebox_spark — a PySpark-native time-series + analytics engine.

Re-expresses the capabilities of the reference numpy engine
(BrianKopp/timebox, a columnar time-series file format + pandas bridge,
see /root/reference/timebox/timebox.py) as an idiomatic Spark stack:

- ``timebox_spark.table.TimeBoxTable`` — the TimeBox data model on
  DataFrames + Parquet (reference ``timebox.py:20-36``).
- ``timebox_spark.schema`` — the i/u/f × {1,2,4,8} type system mapped
  onto Spark types (reference ``numpy_utils.py:60-100``).
- ``timebox_spark.operators`` — the reference's numpy kernels as
  DataFrame transforms (delta/FOR/quantize, ``numpy_utils.py:187-262``),
  plus the query surface the reference lacks (as-of joins, resample,
  dedup, similarity, text analysis).
- ``timebox_spark.sources.npb`` — interop codec for the reference's
  ``.npb`` binary file format (``timebox.py:201-279``).
- ``timebox_spark.streaming`` — Structured Streaming ingest replacing
  the reference's fcntl lock protocol (``timebox.py:405-455``).
"""

from timebox_spark.session import get_spark
from timebox_spark.table import TimeBoxTable

__version__ = "0.1.0"

__all__ = ["get_spark", "TimeBoxTable", "__version__"]
