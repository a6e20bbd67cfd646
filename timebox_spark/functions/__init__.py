"""User-facing column-function surface of the engine.

One import point for the engine's reusable column expressions —
mirrors how ``pyspark.sql.functions`` exposes Catalyst expressions:

    from timebox_spark import functions as TF
    df.select(TF.quantize("price", 2), TF.time_bucket("ts", "1 hour"))

Everything here is a pure column expression (JVM-side, codegen-
friendly); DataFrame-shaped operators live in ``timebox_spark.operators``.
"""

from timebox_spark.operators.kernels import (
    dequantize,
    float32_roundtrip_exact,
    quantize,
)
from timebox_spark.operators.resample import interval_us, time_bucket
from timebox_spark.operators.similarity import cosine, int8_vec, quantized_vec
from timebox_spark.operators.dedup import chunk_lines
from timebox_spark.operators.text import (
    apply_bpe,
    bpe_ish_token_count,
    dsir_bucket,
    fingerprint,
    hashed_linear_score,
    lang_id,
    lang_id_ngram,
    punct_count,
    quality_score_q,
    redact,
    stopword_count,
    token_count,
)

__all__ = [
    "quantize",
    "dequantize",
    "float32_roundtrip_exact",
    "time_bucket",
    "interval_us",
    "cosine",
    "token_count",
    "bpe_ish_token_count",
    "apply_bpe",
    "chunk_lines",
    "dsir_bucket",
    "punct_count",
    "stopword_count",
    "quality_score_q",
    "lang_id",
    "lang_id_ngram",
    "fingerprint",
    "hashed_linear_score",
    "redact",
    "int8_vec",
    "quantized_vec",
]
