"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force top-k — the correctness baseline. The
  query set is broadcast (it's small by construction); each partition
  scores its corpus slice; per-query top-k via window on the quantized
  score. Work is |corpus|·|queries| dot products, fully partition-
  parallel, no shuffle until the final per-query reduction.
- ``lsh_topk``: the scale path — deterministic random-hyperplane LSH
  buckets both sides; only same-bucket pairs are scored. Recall < 1 by
  design; the baseline is the oracle for recall measurement.

Cosine is computed with zip_with/aggregate (JVM, no UDF). Scores are
quantized to 1e-9 before ranking so Spark and the DuckDB oracle
(list_cosine_similarity) rank identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(x, y):
    return _dot(x, y) / (F.sqrt(_dot(x, x)) * F.sqrt(_dot(y, y)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine. ``queries`` must be small (broadcast).
    Ties broken by corpus id. Self-matches (same id) are excluded."""
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qvec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    sim_q = F.round(cosine(F.col(vec_col), F.col("__qvec")) * 1e9).cast("long")
    scored = scored.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        sim_q.alias("cosine_q"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_q"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cosine_q")
    )


def _lsh_bucket(vec_col, planes: int, dim: int, seed: int = 11):
    """Deterministic random-hyperplane signature: plane p's component
    for dimension d is ±1 from xxhash64(seed, p, d); the bucket is the
    integer of sign bits. Pure column expressions — reproducible on
    any cluster."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        # dot(x, h_p) with h_p[d] = ±1 derived from a hash
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda v, d: v.cast("double")
                * F.when(
                    F.pmod(F.xxhash64(F.lit(seed), F.lit(p), d), F.lit(2)) == 1,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(
            proj > 0, F.shiftleft(F.lit(1).cast("long"), p)
        ).otherwise(0)
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    planes: int = 8,
    dim: int = 64,
    tables: int = 4,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing an LSH
    bucket with the query in ANY of ``tables`` independent hash tables
    (OR-amplification — the standard LSH-forest recall lever). At
    100 TB the bucket join replaces the full scan; ``planes`` trades
    bucket size vs selectivity, ``tables`` trades work vs recall."""

    def buckets(df, out_id, vec_out):
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(vec_out),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            _lsh_bucket(
                                F.col(vec_col), planes, dim, seed=11 + 97 * t
                            ).alias("bkt"),
                        )
                        for t in range(tables)
                    ]
                )
            ).alias("__b"),
        ).select(out_id, vec_out, "__b.tbl", "__b.bkt")

    cb = buckets(corpus, id_col, vec_col)
    qb = buckets(queries, query_id_col, "__qvec")
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bkt"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(id_col, vec_col, query_id_col, "__qvec")
        .dropDuplicates([id_col, query_id_col])
    )
    scored = cand
    sim_q = F.round(cosine(F.col(vec_col), F.col("__qvec")) * 1e9).cast("long")
    scored = scored.select(
        F.col(query_id_col),
        F.col(id_col).alias("neighbor_id"),
        sim_q.alias("cosine_q"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_q"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cosine_q")
    )
