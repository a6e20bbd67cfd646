"""Spark 4 Python Data Source for the ``.npb`` format.

Registers the format so users can write idiomatic Spark:

    from timebox_spark.sources.npb_datasource import register_npb
    register_npb(spark)
    df = spark.read.format("npb").load("/data/boxes")
    df = (spark.read.format("npb")
          .option("columns", "ts,value").load(...))   # pruned decode

One input partition per file → full cluster parallelism across a
million-file corpus; per-partition decode reuses the
block-skipping codec (timebox_spark.sources.npb). Arrow batches are
emitted directly, so rows never pass through Python one at a time.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql import types as T

_NP_TO_SPARK = {
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.DoubleType(),  # DataSource API path keeps it simple
    "float16": T.FloatType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
}


def _list_files(path: str) -> list[str]:
    import glob
    import os

    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.npb")))
    return sorted(glob.glob(path))


class NpbDataSource(DataSource):
    """spark.read.format("npb").option("columns", "a,b").load(path)"""

    @classmethod
    def name(cls) -> str:
        return "npb"

    def schema(self):
        from timebox_spark.sources.npb import read_npb_file

        files = _list_files(self.options["path"])
        if not files:
            raise FileNotFoundError(f"no .npb files at {self.options['path']}")
        sample = read_npb_file(files[0])
        wanted = self._columns()
        fields = [T.StructField("ts", T.TimestampType(), False)]
        for c in sample.columns:
            if wanted is not None and str(c) not in wanted:
                continue
            fields.append(
                T.StructField(str(c), _NP_TO_SPARK[str(sample[c].dtype)], True)
            )
        return T.StructType(fields)

    def _columns(self):
        cols = self.options.get("columns")
        return None if not cols else [c.strip() for c in cols.split(",")]

    def reader(self, schema):
        return NpbReader(self.options["path"], [f.name for f in schema.fields if f.name != "ts"])

    def writer(self, schema, overwrite: bool):
        if overwrite:  # driver-side: clear prior files before tasks run
            import os

            for f in _list_files(self.options["path"]):
                try:
                    os.remove(f)
                except OSError:
                    pass
        return NpbWriter(self.options["path"], overwrite)


class NpbReader(DataSourceReader):
    def __init__(self, path: str, columns: list[str]):
        self.path = path
        self.columns = columns

    def partitions(self):
        return [InputPartition(f) for f in _list_files(self.path)]

    def read(self, partition):
        import pyarrow as pa

        from timebox_spark.sources.npb import decode_timebox

        with open(partition.value, "rb") as fh:
            frame = decode_timebox(fh.read(), columns=self.columns)
        frame.columns = [str(c) for c in frame.columns]
        out = frame.reset_index().rename(columns={"index": "ts"})
        for c in self.columns:
            dt = str(out[c].dtype)
            if dt.startswith("uint") and dt != "uint64":
                out[c] = out[c].astype(f"int{min(64, 16 * out[c].dtype.itemsize)}")
            elif dt == "uint64":
                out[c] = out[c].astype("float64")
            elif dt == "float16":
                out[c] = out[c].astype("float32")
        out["ts"] = out["ts"].astype("datetime64[us]")  # Spark Arrow path rejects ns
        table = pa.Table.from_pandas(
            out[["ts"] + self.columns], preserve_index=False
        )
        yield from table.to_batches()


@dataclass
class NpbCommit(WriterCommitMessage):
    file: str
    rows: int


class NpbWriter(DataSourceWriter):
    """``df.write.format("npb").save(path)`` — one file per task
    partition (callers control file sizing via repartitionByRange on
    ts upstream, exactly like the parquet path)."""

    def __init__(self, path: str, overwrite: bool):
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator):
        import os
        import uuid

        import pandas as pd

        from timebox_spark.sources.npb import write_npb_file

        rows = list(iterator)
        fname = os.path.join(self.path, f"part-{uuid.uuid4().hex[:12]}.npb")
        if not rows:
            return NpbCommit(file="", rows=0)
        pdf = pd.DataFrame([r.asDict() for r in rows])
        pdf = pdf.set_index("ts")
        os.makedirs(self.path, exist_ok=True)
        write_npb_file(pdf, fname)
        return NpbCommit(file=fname, rows=len(pdf))

    def commit(self, messages):
        return None

    def abort(self, messages):
        import os

        for m in messages:
            if m and getattr(m, "file", ""):
                try:
                    os.remove(m.file)
                except OSError:
                    pass


def register_npb(spark) -> None:
    from timebox_spark.session import ship_package

    ship_package(spark)
    spark.dataSource.register(NpbDataSource)
