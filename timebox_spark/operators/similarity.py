"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force top-k — the correctness baseline. The
  query set is broadcast (it's small by construction); each partition
  scores its corpus slice; per-query top-k via window on the quantized
  score. Work is |corpus|·|queries| dot products, fully partition-
  parallel, no shuffle until the final per-query reduction.
- ``lsh_topk``: a scale path — deterministic random-hyperplane LSH
  buckets both sides; only same-bucket pairs are scored. Recall < 1 by
  design; the baseline is the oracle for recall measurement.
- ``ivf_topk``: the other scale path — IVF (inverted-file) index:
  spherical k-means centroids trained distributed, corpus bucketed by
  nearest centroid, queries probe only ``nprobe`` nearest cells.

Cosine is computed with zip_with/aggregate (JVM, no UDF). Scores are
quantized to 1e-9 before ranking so Spark and the DuckDB oracle
(list_cosine_similarity) rank identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timebox_spark.session import ensure_parallelism


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(x, y):
    return _dot(x, y) / (F.sqrt(_dot(x, x)) * F.sqrt(_dot(y, y)))


def _score_topk(
    cand: DataFrame, k: int, id_col: str, vec_col: str, query_id_col: str
) -> DataFrame:
    """Shared tail: cosine-score (corpus vec, ``__qvec``) candidate
    pairs, keep top-``k`` per query. Ties broken by corpus id."""
    sim_q = F.round(cosine(F.col(vec_col), F.col("__qvec")) * 1e9).cast("long")
    scored = cand.select(
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
    cand = ensure_parallelism(corpus.select(id_col, vec_col)).crossJoin(
        F.broadcast(q)
    ).filter(F.col(id_col) != F.col(query_id_col))
    return _score_topk(cand, k, id_col, vec_col, query_id_col)


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

    cb = buckets(ensure_parallelism(corpus.select(id_col, vec_col)), id_col, vec_col)
    qb = buckets(queries, query_id_col, "__qvec")
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bkt"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(id_col, vec_col, query_id_col, "__qvec")
        .dropDuplicates([id_col, query_id_col])
    )
    return _score_topk(cand, k, id_col, vec_col, query_id_col)


# ---------------------------------------------------------------- IVF


def _assign_clusters(
    df: DataFrame,
    centroids,
    id_col: str,
    vec_col: str,
    nprobe: int = 1,
) -> DataFrame:
    """Nearest-centroid assignment via an Arrow numpy kernel: one
    BLAS matmul per batch against the (nlist × dim) unit-norm centroid
    matrix shipped in the closure — the IVF scale path (centroids are
    tiny; the corpus never leaves its partitions). Emits ``nprobe``
    rows per vector (cell ids in descending similarity order);
    argmax over the dot with unit centroids equals the cosine argmax
    because the vector's own norm is constant per row."""
    import numpy as np
    import pandas as pd

    from timebox_spark.session import ship_package

    ship_package(df.sparkSession)
    cmat = np.ascontiguousarray(centroids, dtype=np.float64)
    n_out = min(nprobe, len(cmat))

    def compute(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            sims = mat @ cmat.T  # (batch × nlist)
            order = np.argsort(-sims, axis=1, kind="stable")[:, :n_out]
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), n_out),
                    vec_col: pdf[vec_col].iloc[
                        np.repeat(np.arange(len(pdf)), n_out)
                    ].to_numpy(),
                    "cluster": order.reshape(-1).astype(np.int32),
                }
            )

    schema = f"{id_col} long, {vec_col} array<float>, cluster int"
    return ensure_parallelism(df.select(id_col, vec_col)).mapInPandas(
        compute, schema=schema
    )


def ivf_train(
    corpus: DataFrame,
    nlist: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 1337,
):
    """Distributed spherical k-means for IVF cells. Seeds = the
    ``nlist`` corpus vectors with smallest ``xxhash64(id, seed)``
    (deterministic sample, TakeOrdered — no full sort). Each Lloyd
    iteration is one corpus scan: kernel assignment, then an
    elementwise mean via posexplode + groupBy(cluster, pos) — only
    nlist × dim aggregated rows ever reach the driver. Centroids are
    unit-normalized and rounded to 1e-6 so re-training is reproducible
    across partitionings. Returns a numpy (nlist × dim) matrix."""
    import numpy as np

    rows = (
        corpus.select(
            vec_col,
            F.xxhash64(F.col(id_col), F.lit(seed)).alias("__h"),
            F.col(id_col).alias("__i"),
        )
        .orderBy("__h", "__i")
        .limit(nlist)
        .collect()
    )
    cmat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])

    def _unit(m):
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return np.round(m / norms, 6)

    cmat = _unit(cmat)
    for _ in range(iters):
        assigned = _assign_clusters(corpus, cmat, id_col, vec_col, nprobe=1)
        sums = (
            assigned.select("cluster", F.posexplode(vec_col))
            .groupBy("cluster", "pos")
            .agg(F.sum(F.col("col").cast("double")).alias("s"))
            .collect()
        )
        new = cmat.copy()  # empty cells keep their centroid
        acc = np.zeros_like(cmat)
        touched = np.zeros(len(cmat), dtype=bool)
        for r in sums:
            acc[r["cluster"], r["pos"]] = r["s"]
            touched[r["cluster"]] = True
        new[touched] = acc[touched]
        cmat = _unit(new)
    return cmat


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    seed: int = 1337,
) -> DataFrame:
    """Approximate top-k via an IVF index: corpus vectors live in
    their single nearest-centroid cell; each query probes its
    ``nprobe`` nearest cells, so scored pairs drop from |corpus| to
    ~|corpus|·nprobe/nlist per query. At 100 TB: nlist ~ sqrt(N)
    cells, centroid training is iters+1 corpus scans (all map-side
    matmuls + one tiny agg), and the candidate join shuffles the
    corpus once by cell id with the probe table broadcast. Candidate
    pairs are unique by construction (one cell per corpus vector) —
    no dedup step, unlike multi-table LSH."""
    cmat = ivf_train(corpus, nlist, iters, id_col, vec_col, seed)
    cb = _assign_clusters(corpus, cmat, id_col, vec_col, nprobe=1)
    qb = _assign_clusters(
        queries.select(
            F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qvec")
        ),
        cmat,
        query_id_col,
        "__qvec",
        nprobe=nprobe,
    )
    cand = (
        cb.join(F.broadcast(qb), "cluster")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(id_col, vec_col, query_id_col, "__qvec")
    )
    return _score_topk(cand, k, id_col, vec_col, query_id_col)
