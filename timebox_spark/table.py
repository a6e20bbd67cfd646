"""TimeBoxTable — the reference's TimeBox data model on Spark.

Reference: one TimeBox = one ``.npb`` file = one time-indexed columnar
table, fully materialized in memory (/root/reference/timebox/
timebox.py:20-36). Here: one TimeBoxTable = one DataFrame with a ``ts``
TimestampType column, persisted as a Parquet directory that is
range-clustered and sorted by ``ts`` — so Parquet row-group min/max
stats give time-range pruning for free, the scalable analog of the
reference's sorted-by-time invariant (timebox.py:67, 370-374).

Concurrency: the reference coordinates cross-process access with fcntl
reader/writer locks and a writer-priority sentinel file
(timebox.py:405-455). Immutable Parquet directories with atomic commit
make that protocol unnecessary: concurrent readers see the old or the
new snapshot, never a partial file — strictly stronger than X1–X3.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timebox_spark import schema as tb_schema


class DateDataError(ValueError):
    """Unsortable/invalid time index (reference raises the same-named
    error at /root/reference/timebox/timebox.py:52-53, 374)."""


class TimeBoxTable:
    """A time-indexed columnar table.

    Mirrors the public surface of the reference ``TimeBox``
    (save_pandas / read / to_pandas, /root/reference/timebox/
    timebox.py:38-121) with Spark semantics: lazy scans, predicate
    pushdown, and no row/column caps (the reference caps at 255 tags
    and 2^32−1 rows, timebox.py:209-210 — deliberately not reproduced).
    """

    TS_COL = "ts"

    def __init__(self, df: DataFrame, ts_col: str = TS_COL):
        if ts_col not in df.columns:
            raise DateDataError(f"missing time column {ts_col!r}")
        self.df = df if ts_col == self.TS_COL else df.withColumnRenamed(ts_col, self.TS_COL)

    # -- ingest (reference S8/S10: from_pandas / save_pandas, timebox.py:38-88)

    @classmethod
    def from_pandas(cls, spark: SparkSession, pdf: pd.DataFrame) -> "TimeBoxTable":
        """pandas frame (datetime-coercible index) -> TimeBoxTable.

        Reference ``from_pandas`` sorts by index and coerces it to
        datetime64 (timebox.py:56-88); we do the same via a datetime
        index conversion + Arrow createDataFrame with the explicit
        widened schema (SURVEY §1.4).
        """
        import warnings

        try:
            with warnings.catch_warnings():
                # mixed-format string indexes parse element-wise; the
                # "could not infer format" UserWarning is expected there
                warnings.simplefilter("ignore", UserWarning)
                idx = pd.to_datetime(pdf.index)
        except (ValueError, TypeError) as exc:
            raise DateDataError(f"index not datetime-coercible: {exc}") from exc
        sp_schema = tb_schema.timebox_schema_from_pandas(pdf)
        out = pdf.reset_index(drop=True)
        out.insert(0, cls.TS_COL, idx.tz_localize(None) if idx.tz is not None else idx)
        out = out.sort_values(cls.TS_COL).reset_index(drop=True)
        out.columns = [f.name for f in sp_schema.fields]
        out = tb_schema.widen_pandas_for_arrow(out)
        return cls(spark.createDataFrame(out, schema=sp_schema))

    @classmethod
    def save_pandas(
        cls, spark: SparkSession, pdf: pd.DataFrame, path: str
    ) -> "TimeBoxTable":
        """One-call ingest + persist (reference timebox.py:38-54)."""
        table = cls.from_pandas(spark, pdf)
        table.save(path)
        return table

    # -- persistence (reference S1/S2: write/read, timebox.py:102-159)

    PARTITION_COL = "ts_date"

    def save(
        self,
        path: str,
        mode: str = "overwrite",
        buckets: int | None = None,
        partition_by_day: bool = False,
    ) -> None:
        """Persist as Parquet, clustered + sorted by time.

        ``repartitionByRange(ts)`` + ``sortWithinPartitions(ts)`` gives
        globally range-clustered files without a single-reducer global
        sort — at 100 TB each output file covers a tight ts range, so
        min/max row-group stats prune time-predicate scans. This is the
        scalable replacement for the reference's single sorted file
        (timebox.py:123-159).

        ``partition_by_day=True`` additionally hive-partitions by
        ``ts_date`` — directory-level pruning, so a one-day query on a
        multi-year table lists exactly one partition instead of
        footer-probing every file. The day column is derived (dropped
        on load).
        """
        df = self.df
        if buckets is None:
            buckets = self._auto_buckets()
        if partition_by_day:
            out = df.withColumn(self.PARTITION_COL, F.to_date(self.TS_COL))
            (
                out.repartitionByRange(
                    max(buckets, 1), F.col(self.PARTITION_COL), F.col(self.TS_COL)
                )
                .sortWithinPartitions(self.PARTITION_COL, self.TS_COL)
                .write.mode(mode)
                .partitionBy(self.PARTITION_COL)
                .parquet(path)
            )
            return
        writer = df.repartitionByRange(buckets, F.col(self.TS_COL)).sortWithinPartitions(
            self.TS_COL
        )
        writer.write.mode(mode).parquet(path)

    _TARGET_BUCKET_BYTES = 96 * 1024 * 1024  # ~96 MiB of source parquet per bucket

    def _auto_buckets(self) -> int:
        """Size the range shuffle to the input: one bucket per ~96 MiB
        of source data (a 100 TB input gets ~1M well-sized buckets; a
        2 MB test table gets 1 — no 32-task overhead on tiny data).
        Falls back to the session's shuffle parallelism when the input
        size is unknowable (non-file sources)."""
        import os

        try:
            total = sum(
                os.path.getsize(f.replace("file:", ""))
                for f in self.df.inputFiles()
            )
        except Exception:
            total = 0
        if total <= 0:
            return int(self.df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        return max(1, -(-total // self._TARGET_BUCKET_BYTES))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "TimeBoxTable":
        """Lazy scan (reference read() materializes everything,
        timebox.py:102-121; the 'read certain tags/dates' TODO at
        timebox.py:105 is free here via pushdown/pruning). Day
        partitions, if present, stay available for pruning but are
        dropped from the logical schema."""
        df = spark.read.parquet(path)
        if cls.PARTITION_COL in df.columns:
            df = df.drop(cls.PARTITION_COL)
        return cls(df)

    def compact(self, path: str, buckets: int | None = None) -> None:
        """Rewrite a table directory into well-sized range-clustered
        files — the maintenance job a streaming sink needs (each
        micro-batch commit adds small files; compaction restores scan
        efficiency).

        Snapshot-versioned swap: ``path`` becomes a symlink to an
        immutable version directory; each compact writes a NEW version
        and atomically repoints the link (``os.replace`` of a symlink),
        RETAINING the previous version so in-flight lazy scans that
        already resolved file paths keep reading a complete snapshot —
        this preserves the immutable-snapshot guarantee the module
        header advertises. Versions older than the immediately-previous
        one are removed. The very first compact of a plain directory
        has one brief non-atomic window (directory rename + link
        creation) — unavoidable because a directory cannot be atomically
        replaced by a symlink; every subsequent swap is atomic.
        """
        import glob as _glob
        import os
        import shutil
        import uuid

        version = f"{path}.__v_{uuid.uuid4().hex[:8]}"
        TimeBoxTable(self.df).save(version, buckets=buckets)
        prev = None
        if os.path.islink(path):
            prev = os.path.realpath(path)
            tmplink = f"{path}.__lnk_{uuid.uuid4().hex[:8]}"
            os.symlink(version, tmplink)
            os.replace(tmplink, path)  # atomic repoint
        else:
            if os.path.exists(path):
                prev = f"{path}.__v_prev_{uuid.uuid4().hex[:8]}"
                os.rename(path, prev)  # legacy layout: brief window
            os.symlink(version, path)
        for d in _glob.glob(f"{path}.__v_*"):
            if os.path.abspath(d) not in (
                os.path.abspath(version),
                os.path.abspath(prev or version),
            ):
                shutil.rmtree(d, ignore_errors=True)

    # -- egest (reference S9: to_pandas, timebox.py:90-100)

    def to_pandas(self) -> pd.DataFrame:
        """Collect to pandas with the time index restored.

        The reference's fresh-handle auto-read (timebox.py:95-96) is
        inherent here (the scan is lazy until collect). Arrow transfer.
        Driver-side materialization — bounded use only; at scale keep
        computation in Spark.
        """
        pdf = self.df.toPandas()
        # the reference's to_pandas always yields time order (its dates
        # array IS the order); partition scan order isn't — restore it
        return pdf.set_index(self.TS_COL).sort_index(kind="stable")

    # -- validation (reference O2/O3: timebox.py:281-303, 370-374)

    def monotonicity_violations(self, keys: list[str] | None = None) -> int:
        """Count of rows whose ts precedes the previous row's ts.

        Reference rejects unsorted dates via
        ``np.amin(np.ediff1d(dates)) < 0`` (timebox.py:370-374).
        Distributed analog: previous-ts via the bucketed-lag kernel —
        no single-task global window even without keys.
        """
        from timebox_spark.operators.kernels import bucketed_prev

        flagged = bucketed_prev(
            self.df.select(*(keys or []), self.TS_COL),
            order_by=[self.TS_COL],
            value_col=self.TS_COL,
            bucket=F.date_trunc("day", F.col(self.TS_COL)),
            out_col="_prev",
            partition_by=keys,
        ).filter(F.col(self.TS_COL) < F.col("_prev"))
        return flagged.count()

    def assert_monotonic(self, keys: list[str] | None = None) -> None:
        n = self.monotonicity_violations(keys)
        if n:
            raise DateDataError(f"{n} out-of-order timestamps")

    # -- partial reads (the reference's acknowledged TODO: "read
    # certain tags/dates", timebox.py:105 — free here via Catalyst
    # column pruning + parquet row-group skipping on the sorted ts)

    def select_tags(self, *tags: str) -> "TimeBoxTable":
        return TimeBoxTable(self.df.select(self.TS_COL, *tags))

    def between(self, start, end) -> "TimeBoxTable":
        """Rows with start <= ts <= end. The predicate reaches the
        parquet scan; with range-clustered files (see save) whole
        row groups/files outside the range are skipped."""
        return TimeBoxTable(
            self.df.filter(
                (F.col(self.TS_COL) >= F.lit(start))
                & (F.col(self.TS_COL) <= F.lit(end))
            )
        )

    # -- basic stats (reference O4: start date = np.amin(dates), timebox.py:369)

    def time_range(self) -> tuple:
        row = self.df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(self.TS_COL).alias("start"),
            F.max(self.TS_COL).alias("end"),
        ).collect()[0]
        return row["n"], row["start"], row["end"]

    @property
    def start_date(self):
        return self.df.agg(F.min(self.TS_COL)).collect()[0][0]

    def num_points(self) -> int:
        return self.df.count()


def save_bucketed(
    df,
    table_name: str,
    path: str,
    key: str,
    n_buckets: int = 32,
):
    """Bucketed co-located layout: ``bucketBy(key) + sortBy(key)``
    external parquet table — the storage lever for repeated big-big
    joins and aggregations on the same key. Two tables bucketed on the
    join key with the same bucket count join WITHOUT a shuffle on
    either side (the q01 'bucketed' member flags this mechanically:
    its co-located join plan must contain zero hashpartitioning
    exchanges), and a groupBy on the bucket key skips its exchange
    too. At 100 TB this turns every recurring fact-fact join on the
    bucketed key from a full-corpus shuffle into a local merge.

    Uses the session (in-memory) catalog with an explicit ``path`` so
    no warehouse/metastore state is created; ``mode=overwrite`` makes
    reruns idempotent. Returns the re-read table."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table_name)
    )
    return df.sparkSession.table(table_name)
