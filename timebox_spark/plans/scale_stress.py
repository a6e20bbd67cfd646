"""Duplicate-amplified corpus builder for local scale-stress runs.

``amplify_sf_dir`` writes a synthetic sf_dir with ``factor``×
documents and embeddings derived deterministically from a real
testdata dir, so the headline dedup/ANN/curation queries run
UNMODIFIED against it (bench points them at the amplified dir).

Amplification is designed to stress the right things:

- every ``exact_copy_every``-th copy is byte-identical (the exact /
  near-dup volume grows LINEARLY with the corpus — matching how real
  crawl duplication scales), while
- the remaining copies replace every 3rd whitespace token with an
  md5-derived token: ~60% of the char-5-gram shingles change, pushing
  Jaccard well below the 0.35 near-dup threshold, so mutated copies
  do NOT join the originals' dup clusters and the LSH candidate count
  cannot blow up quadratically;
- embeddings are rotated by the copy index — norms are preserved,
  cosine structure is scrambled, so IVF cells stay balanced.

All derivation is JVM column expressions — amplification itself runs
at scan speed with no Python in the path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ID_STRIDE = 100_000_000


def amplified_documents(
    docs: DataFrame, factor: int = 10, exact_copy_every: int = 20
) -> DataFrame:
    copies = [docs]
    for k in range(1, factor):
        mutated = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda t, i: F.when(
                    (i % 3 == 2)
                    & ((F.col("doc_id") + F.lit(k)) % exact_copy_every != 0),
                    F.substring(F.md5(F.concat(t, F.lit(str(k)))), 1, 6),
                ).otherwise(t),
            ),
            " ",
        )
        copies.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * ID_STRIDE)).alias("doc_id"),
                mutated.alias("text"),
                "lang",
                "source",
                F.length(mutated).cast("long").alias("n_chars"),
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def amplified_embeddings(emb: DataFrame, factor: int = 10, dim: int = 64) -> DataFrame:
    copies = [emb]
    for k in range(1, factor):
        roll = k % dim or 1
        rolled = F.concat(
            F.slice(F.col("embedding"), roll + 1, dim - roll),
            F.slice(F.col("embedding"), 1, roll),
        )
        copies.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * ID_STRIDE)).alias("vec_id"),
                rolled.alias("embedding"),
                "label",
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def amplify_sf_dir(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    factor: int = 10,
    exact_copy_every: int = 20,
) -> str:
    """Write documents.parquet and embeddings.parquet at ``factor``×
    into ``out_dir`` (idempotent: skipped if already present)."""
    from timebox_spark.plans.tables import load

    os.makedirs(out_dir, exist_ok=True)
    docs_path = os.path.join(out_dir, "documents.parquet")
    emb_path = os.path.join(out_dir, "embeddings.parquet")
    if not os.path.exists(docs_path):
        amplified_documents(
            load(spark, sf_dir, "documents"), factor, exact_copy_every
        ).write.mode("overwrite").parquet(docs_path)
    if not os.path.exists(emb_path):
        amplified_embeddings(
            load(spark, sf_dir, "embeddings"), factor
        ).write.mode("overwrite").parquet(emb_path)
    return out_dir
