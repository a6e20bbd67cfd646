"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas functions over ``mapInPandas`` so each task processes whole
record batches (never per-row Python). The actual media decode is
STUBBED (no image/audio libs in this container): ``decode_image``
raises NotImplementedError, and ``fake_decode_features`` is the
deterministic stand-in that keeps the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — real and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from timebox_spark.session import ensure_parallelism

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_hex", T.StringType()),
        T.StructField("byte_sum_mod", T.LongType()),
    ]
)


def to_media_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Pack a text table into the multimodal layout (payload = UTF-8
    bytes standing in for encoded media)."""
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """Real media decode — not available in this container.

    At deploy time this becomes Pillow/torchvision/ffmpeg inside the
    same mapInPandas harness; the batch shape and schema don't change.
    """
    raise NotImplementedError("media decode libs not present in this environment")


def fake_decode_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Deterministic stand-in feature extractor over mapInPandas.

    Computes (n_bytes, first-8-bytes hex, byte-sum mod 2^31) per
    payload — enough to prove Arrow batch transfer, schema handling,
    and partition parallelism without media libs."""

    from timebox_spark.session import ship_package

    ship_package(media.sparkSession)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "head_hex": payloads.map(lambda b: bytes(b[:8]).hex()),
                    "byte_sum_mod": payloads.map(
                        lambda b: sum(b) % 2147483647
                    ).astype("int64"),
                }
            )

    return ensure_parallelism(media).mapInPandas(extract, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum_mod", T.LongType()),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, every_n: int = 4
) -> DataFrame:
    """Frame sampling for video-like payloads: the payload is treated
    as a sequence of fixed-size frames; every ``every_n``-th frame is
    emitted with per-frame features. Exercises the 1→N row shape of
    mapInPandas (one input row fans out to many frame rows inside the
    same Arrow batch — no explode shuffle, no driver round-trip). At
    deploy time the chunker becomes an ffmpeg keyframe reader with the
    same output schema."""

    from timebox_spark.session import ship_package

    ship_package(media.sparkSession)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = -(-len(b) // frame_bytes)  # ceil
                for i in range(0, n_frames, every_n):
                    chunk = b[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    sizes.append(len(chunk))
                    sums.append(sum(chunk) % 2147483647)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "byte_sum_mod": pd.Series(sums, dtype="int64"),
                }
            )

    return ensure_parallelism(media.select("doc_id", "payload")).mapInPandas(
        sample, schema=FRAME_SCHEMA
    )


def resize_payload(media: DataFrame, target_bytes: int = 128) -> DataFrame:
    """Deterministic stride resample of each payload to
    ``target_bytes`` — the stand-in for image resize (real impl: PIL
    ``Image.resize`` inside the same mapInPandas harness; schema and
    batch shape identical). Output keeps the media layout with
    ``meta.n_bytes`` updated, so resize composes with the other
    multimodal stages."""

    from timebox_spark.session import ship_package

    ship_package(media.sparkSession)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                if len(b) <= target_bytes:
                    out_payload.append(b)
                else:
                    out_payload.append(
                        bytes(b[i * len(b) // target_bytes] for i in range(target_bytes))
                    )
            meta = pd.DataFrame(
                {
                    "format": [m["format"] for m in pdf["meta"]],
                    "n_bytes": pd.Series(map(len, out_payload), dtype="int64"),
                    "source": [m["source"] for m in pdf["meta"]],
                }
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": out_payload,
                    "meta": meta.to_dict("records"),
                }
            )

    return ensure_parallelism(media).mapInPandas(resize, schema=MEDIA_SCHEMA)
