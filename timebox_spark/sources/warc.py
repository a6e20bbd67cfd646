"""WARC (Web ARChive, ISO 28500) corpus source/sink.

WARC is the interchange format of the crawl FRONT of an LLM data
pipeline — Common Crawl ships ~100 TB/month of it, and C4/CCNet/
RefinedWeb all start from WARC response records. This module makes
the engine able to round-trip that front natively:

- ``warc_record`` builds a spec-shaped ``WARC/1.0`` response record
  per row entirely in-engine (JVM ``concat`` — the writer never
  funnels through the driver).
- ``write_warc`` writes one concatenated record stream per partition
  via the text datasource (records carry their own ``Content-Length``
  framing, so the writer's per-record newline is transparent to the
  reader).
- ``read_warc`` is a distributed reader: one task per WARC file
  (exactly how Common Crawl is processed at scale — the unit of
  parallelism is the ~1 GB shard), each task walking records with
  the Content-Length header, NOT by scanning for a separator — a
  payload containing ``\\r\\n\\r\\n`` or even a nested ``WARC/1.0``
  literal parses correctly.

Scale notes: record building and digesting are map-only JVM; the
reader is an Arrow ``mapInPandas`` over ``binaryFile`` rows (batch =
files, bytes ops per record, no per-record Python string churn).
Plain (uncompressed) WARC only: real crawls use per-record gzip
members, which need a gzip library on executors — the framing walker
here is the part Spark has to get right, and it is identical either
way.

The reference engine has no web-format source at all (numeric series
only, /root/reference/timebox/timebox.py:20); this extends the
BASELINE.json surface like sources/jsonl.py. Round-trip losslessness
is gated by the q01_io_suite 'warc' member: per-doc md5-based digests
of the payload must survive write -> read bit-for-bit against the
raw parquet oracle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

CRLF = "\r\n"

WARC_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("target_uri", StringType()),
        StructField("text", StringType()),
    ]
)


def warc_record(
    id_col: str = "doc_id", text_col: str = "text"
) -> Column:
    """A ``WARC/1.0`` response record for one row, built in-engine:
    named headers + ``Content-Length`` in octets (UTF-8 bytes, the
    spec's unit — NOT characters) + the payload + the spec's blank
    trailer lines. ``WARC-Record-ID``/``Target-URI`` derive from the
    id, so the reader can recover it without a side table."""
    sid = F.col(id_col).cast("string")
    payload = F.col(text_col)
    return F.concat(
        F.lit("WARC/1.0" + CRLF),
        F.lit("WARC-Type: response" + CRLF),
        F.lit("WARC-Record-ID: <urn:timebox:doc:"), sid, F.lit(">" + CRLF),
        F.lit("WARC-Target-URI: http://corpus.invalid/doc/"), sid,
        F.lit(CRLF),
        F.lit("Content-Type: text/plain" + CRLF),
        F.lit("Content-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit(CRLF + CRLF),
        payload,
        F.lit(CRLF + CRLF),
    )


def write_warc(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Write one WARC stream per partition (repartition first to
    control shard size — the file is the reader's unit of
    parallelism). The text sink appends one ``\\n`` per record; the
    Content-Length walker skips it."""
    df.select(warc_record(id_col, text_col).alias("value")).write.mode(
        "overwrite"
    ).text(path)


def _walk_records(blob: bytes) -> Iterator[tuple[int, str, str]]:
    """Yield (doc_id, target_uri, payload) from a concatenated WARC
    byte stream by Content-Length framing."""
    pos, n = 0, len(blob)
    marker = b"WARC/1.0\r\n"
    while True:
        start = blob.find(marker, pos)
        if start < 0:
            return
        hdr_end = blob.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in blob[start + len(marker): hdr_end].split(b"\r\n"):
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode()] = v.strip().decode()
        length = int(headers["content-length"])
        body_start = hdr_end + 4
        payload = blob[body_start: body_start + length]
        uri = headers.get("warc-target-uri", "")
        doc_id = int(uri.rsplit("/", 1)[-1]) if uri else -1
        yield doc_id, uri, payload.decode("utf-8")
        pos = body_start + length
        if pos >= n:
            return


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC reader: ``binaryFile`` rows (one per shard)
    walked record-by-record with Content-Length framing in an Arrow
    ``mapInPandas`` kernel. Returns (doc_id, target_uri, text)."""
    from timebox_spark.session import ship_package

    ship_package(spark)
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                rec
                for blob in pdf["content"]
                for rec in _walk_records(bytes(blob))
            ]
            yield pd.DataFrame(
                rows, columns=["doc_id", "target_uri", "text"]
            )

    return files.mapInPandas(parse, WARC_OUT_SCHEMA)
