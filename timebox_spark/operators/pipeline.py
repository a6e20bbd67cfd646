"""End-to-end training-data curation pipeline.

Composes the text / dedup / sampling operators into the standard
curate flow for LLM corpus preparation:

    annotate (lang-id, quality, tokens, fingerprint)   map-side
    → filter (language + quality + length gates)        map-side
    → exact dedup (keep smallest id per fingerprint)    1 shuffle
    → deterministic split (train/val/test)              map-side

One scan, one shuffle. Every stage is a column expression or a
fingerprint-partitioned window — no Python in the path, so the same
plan runs unchanged over a 100 TB corpus (the dedup shuffle
partitions by md5 fingerprint, which is uniform by construction).

The reference has no analog (it stores numeric time series only);
this implements the BASELINE.json north-star extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timebox_spark.operators import dedup, text
from timebox_spark.operators.sampling import deterministic_split
from timebox_spark.session import ensure_parallelism


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: tuple[str, ...] = ("en",),
    min_quality_q: int = 500_000,
    min_tokens: int = 10,
    split_weights: dict[str, int] | None = None,
    gopher_gates: bool = False,
) -> DataFrame:
    """Return the curated corpus: one row per kept document with
    ``(id, lang_pred, quality_q, n_tokens, split)``. Duplicate texts
    (after whitespace/case normalization) keep the smallest id.
    ``gopher_gates`` additionally requires ``text.gopher_pass`` (word
    count, mean word length, stopword presence, 2-gram repetition) —
    still map-side column expressions, no extra scan or shuffle."""
    annotated = ensure_parallelism(docs).select(
        F.col(id_col),
        text.lang_id(text_col).alias("lang_pred"),
        text.quality_score_q(text_col).alias("quality_q"),
        text.token_count(text_col).alias("n_tokens"),
        F.md5(F.encode(dedup.normalize_text(text_col), "UTF-8")).alias("__fp"),
        *([text.gopher_pass(text_col).alias("__gopher")] if gopher_gates else []),
    )
    kept = annotated.filter(
        F.col("lang_pred").isin(list(langs))
        & (F.col("quality_q") >= min_quality_q)
        & (F.col("n_tokens") >= min_tokens)
    )
    if gopher_gates:
        kept = kept.filter(F.col("__gopher") == 1).drop("__gopher")
    w = Window.partitionBy("__fp").orderBy(id_col)
    deduped = (
        kept.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__fp")
    )
    return deterministic_split(deduped, key=id_col, weights=split_weights)
