"""JSONL (line-delimited JSON) corpus source/sink.

One document per line is the de-facto interchange format for LLM
training corpora (The Pile, RedPajama, Dolma all ship JSONL). Spark's
native json reader/writer is distributed and splittable out of the
box, so these wrappers only pin the conventions that matter at scale:

- **Explicit schema on read.** Schema inference costs an extra full
  scan of the corpus and can drift types between runs (an all-null
  shard infers string); at 100 TB both are unacceptable.
- **Compression choice is a scale decision.** gzip files are NOT
  splittable — one 10 GB gzip shard becomes one task. Prefer
  ``zstd`` (splittable via frame seeking in Spark's codec, good
  ratio) or ``none`` for hot paths.
- Exact text round-trip (JSON escaping of newlines, quotes, unicode)
  is gated by the q01_io_suite 'jsonl' member: a per-doc md5-based
  digest of the text column must survive write→read bit-for-bit.

The reference has no text source at all (numeric time series only,
/root/reference/timebox/timebox.py:20); this is part of the
BASELINE.json extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(
    df: DataFrame, path: str, compression: str | None = None
) -> None:
    """Write one JSON object per row, one file per partition —
    repartition first to control shard count/size (a training-export
    layout would pair this with ``sampling.shuffle_shards``)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """Read JSONL with a REQUIRED explicit schema (see module doc).
    Corrupt lines land in ``_corrupt_record`` if the schema declares
    it; otherwise Spark's default PERMISSIVE mode nulls the row's
    fields — pass ``.option`` via a follow-up reader if FAILFAST
    semantics are wanted."""
    return spark.read.schema(schema).json(path)
