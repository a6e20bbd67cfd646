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
    sample_max: int = 4096,
):
    """Spherical k-means for IVF cells, trained on a bounded
    deterministic sample — the standard IVF recipe (Faiss trains its
    coarse quantizer on ≤ ~256·nlist points, not the corpus): at
    100 TB, running Lloyd over every vector would cost iters+1 full
    corpus scans for centroids that a fixed-size sample estimates just
    as well. The sample is the ``sample_max`` vectors with smallest
    ``xxhash64(id, seed)`` (TakeOrdered — one O(n) scan, no full
    sort, partitioning-independent); Lloyd then runs driver-local in
    numpy over at most sample_max × dim floats, so driver traffic is a
    CONSTANT ~2 MB regardless of corpus size. Seeds are the ``nlist``
    smallest-hash vectors (unchanged from the distributed variant).
    Centroids are unit-normalized and rounded to 1e-6 so re-training
    is reproducible across partitionings. Ties in assignment break to
    the lowest cluster id (argmax-first), matching the distributed
    kernel. Returns a numpy (nlist × dim) matrix."""
    import numpy as np

    rows = (
        corpus.select(
            vec_col,
            F.xxhash64(F.col(id_col), F.lit(seed)).alias("__h"),
            F.col(id_col).alias("__i"),
        )
        .orderBy("__h", "__i")
        .limit(max(sample_max, nlist))
        .collect()
    )
    sample = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])

    def _unit(m):
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return np.round(m / norms, 6)

    cmat = _unit(sample[:nlist].copy())
    for _ in range(iters):
        sims = sample @ cmat.T  # (n_sample × nlist)
        assign = np.argmax(sims, axis=1)  # first max = lowest cluster id
        new = cmat.copy()  # empty cells keep their centroid
        for j in range(len(cmat)):
            members = sample[assign == j]
            if len(members):
                new[j] = members.sum(axis=0)
        cmat = _unit(new)
    return cmat


# ------------------------------------------------- portable (exact) ANN
# Engine-portable variants of the LSH and IVF paths, used by the driver
# correctness key q29_ann_suite. Every reduction is an exact BIGINT sum
# over 1e-6-quantized components, and every float op is a deterministic
# scalar (divide / sqrt / floor) on identical integer inputs — so a
# DuckDB oracle re-derives hyperplane buckets, k-means centroids,
# candidate sets, cosine scores, AND recall bit-for-bit. The xxhash /
# float64-matmul variants above remain the throughput path (bench q47);
# these share their algorithmic shape but trade a little speed for an
# airtight cross-engine contract. The reference has no similarity
# search; this extends it for LLM-pipeline workloads.

ANN_QSCALE = 1_000_000  # embedding component quantization (1e-6)
ANN_COS_SCALE = 1_000_000_000  # cosine quantization (1e-9)
ANN_DIM = 64
ANN_PLANES = 4  # 16 buckets/table on the test corpus
ANN_TABLES = 8  # OR-amplification: ~76% recall@5 scoring ~43% of pairs
ANN_NLIST = 16
ANN_NPROBE = 6
ANN_ITERS = 2
ANN_K = 5
ANN_NULL_SCORE = -2 * ANN_COS_SCALE  # zero-norm guard, both engines
# driver-gated floor for the FAST (xxhash/float) paths' overlap with
# the portable exact top-k: measured 30-37 of 50 across sf0.001/0.01/
# 0.1; a broken bucket/centroid path collapses to <= ~10. The q29
# suite emits a within-bounds flag row per fast method (q55 pattern).
ANN_FAST_FLOOR_HITS = 20


def lsh_plane_signs(
    tables: int = ANN_TABLES, planes: int = ANN_PLANES, dim: int = ANN_DIM
):
    """±1 hyperplane components derived from md5 of "t|p|d" — computed
    once driver-side and embedded as plain literals in BOTH the Spark
    plan and the oracle SQL, so neither engine's hash functions are in
    the contract."""
    import hashlib

    return [
        [
            [
                1
                if int(hashlib.md5(f"{t}|{p}|{d}".encode()).hexdigest()[:8], 16) % 2
                else -1
                for d in range(dim)
            ]
            for p in range(planes)
        ]
        for t in range(tables)
    ]


def quantized_vec(vec_col):
    """array<float> → array<long> at 1e6 scale via floor(x*1e6 + 0.5)
    (explicit half-up: Spark CAST truncates, DuckDB CAST rounds)."""
    return F.transform(
        vec_col,
        lambda e: F.floor(
            e.cast("double") * F.lit(float(ANN_QSCALE)) + F.lit(0.5)
        ).cast("long"),
    )


def _dot_long(x, y):
    """Exact integer dot product (order-free — safe against partition
    nondeterminism, unlike float accumulation)."""
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _cosine_q_portable(vq, qq):
    dot = _dot_long(vq, qq)
    na = _dot_long(vq, vq)
    nb = _dot_long(qq, qq)
    return (
        F.when((na == 0) | (nb == 0), F.lit(ANN_NULL_SCORE).cast("long"))
        .otherwise(
            F.floor(
                dot.cast("double")
                / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double")))
                * F.lit(float(ANN_COS_SCALE))
                + F.lit(0.5)
            ).cast("long")
        )
    )


def _score_topk_portable(cand: DataFrame, k: int, query_id_col: str) -> DataFrame:
    """Integer-cosine top-k tail over candidate pairs carrying __vq
    (corpus) and __qq (query) quantized vectors."""
    scored = cand.select(
        F.col(query_id_col),
        F.col("vec_id").alias("neighbor_id"),
        _cosine_q_portable(F.col("__vq"), F.col("__qq")).alias("cosine_q"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_q"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cosine_q")
    )


def _quantize_sides(corpus: DataFrame, queries: DataFrame, id_col, vec_col, query_id_col):
    cq = ensure_parallelism(
        corpus.select(F.col(id_col).alias("vec_id"), quantized_vec(F.col(vec_col)).alias("__vq"))
    )
    qq = queries.select(
        F.col(id_col).alias(query_id_col), quantized_vec(F.col(vec_col)).alias("__qq")
    )
    return cq, qq


def portable_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = ANN_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force top-k on quantized vectors — the recall
    baseline the oracle can recompute verbatim."""
    cq, qq = _quantize_sides(corpus, queries, id_col, vec_col, query_id_col)
    cand = cq.crossJoin(F.broadcast(qq)).filter(
        F.col("vec_id") != F.col(query_id_col)
    )
    return _score_topk_portable(cand, k, query_id_col)


def portable_bucket_array(
    vq,
    tables: int = ANN_TABLES,
    planes: int = ANN_PLANES,
    dim: int = ANN_DIM,
):
    """Array of per-table LSH buckets for a quantized vector:
    bucket_t = Σ_p weight_p · [dot(vq, plane_{t,p}) > 0], with the
    literal ±1 hyperplanes from ``lsh_plane_signs`` — a pure BIGINT
    computation both engines reproduce bit-for-bit.

    The sign tensor rides as ONE nested-array Literal and all
    tables×planes projections are a single nested higher-order
    expression (transform over tables → zip_with planes/bit-weights →
    inner integer dot), keeping the Catalyst tree small (see
    portable_lsh_topk's plan-compile note)."""
    signs = lsh_plane_signs(tables, planes, dim)
    planes_lit = F.lit(
        [[[int(s) for s in pl] for pl in tbl] for tbl in signs]
    ).cast("array<array<array<long>>>")
    weights_lit = F.lit([1 << p for p in range(planes)]).cast("array<long>")
    return F.transform(
        planes_lit,
        lambda tbl: F.aggregate(
            F.zip_with(
                tbl,
                weights_lit,
                lambda plane, wt: F.when(
                    F.aggregate(
                        F.zip_with(vq, plane, lambda v, s: v * s),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc + x,
                    )
                    > 0,
                    wt,
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )


def portable_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = ANN_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    planes: int = ANN_PLANES,
    tables: int = ANN_TABLES,
    dim: int = ANN_DIM,
) -> DataFrame:
    """LSH top-k with literal ±1 hyperplanes and exact integer
    projections: bucket membership is a pure BIGINT computation, so
    the DuckDB oracle reproduces the candidate set exactly.

    The sign tensor rides as ONE nested-array Literal
    (array<array<array<long>>>) and ALL tables×planes projections are
    a single nested higher-order expression (transform over tables →
    zip_with planes/bit-weights → inner integer dot) — NOT
    tables×planes separate aggregate() trees over inlined 64-element
    literal arrays. Same values, same oracle; the Catalyst tree
    shrinks from ~2k literal leaves + ~100 HOF nodes per side to ~20
    nodes, which is what dominated the q29 suite's wall time (every
    DataFrame step re-analyzes the whole tree; plan compile, not
    execution — suites.py note)."""
    def bucket_array(vq):
        return portable_bucket_array(vq, tables=tables, planes=planes, dim=dim)

    def with_buckets(df, idc, vecc):
        return df.select(
            idc,
            vecc,
            F.posexplode(bucket_array(F.col(vecc))).alias("tbl", "bkt"),
        )

    cq, qq = _quantize_sides(corpus, queries, id_col, vec_col, query_id_col)
    cb = with_buckets(cq, "vec_id", "__vq")
    qb = with_buckets(qq, query_id_col, "__qq")
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bkt"])
        .filter(F.col("vec_id") != F.col(query_id_col))
        .select("vec_id", "__vq", query_id_col, "__qq")
        .dropDuplicates(["vec_id", query_id_col])
    )
    return _score_topk_portable(cand, k, query_id_col)


def _portable_ivf_assign(
    df: DataFrame, cmat, id_col: str, vec_col: str, nprobe: int = 1
) -> DataFrame:
    """Nearest-centroid assignment on integer vectors: int64 matmul
    (exact), then score = dot / sqrt(||c||²) as elementwise float64 —
    identical scalar arithmetic to the oracle's per-pair expression.
    Ties break to the smallest centroid id (argsort is stable)."""
    import numpy as np
    import pandas as pd

    from timebox_spark.session import ship_package

    ship_package(df.sparkSession)
    cm = np.ascontiguousarray(cmat, dtype=np.int64)
    n2 = (cm * cm).sum(axis=1)
    denom = np.sqrt(n2.astype(np.float64))
    denom[n2 == 0] = 1.0
    n_out = min(nprobe, len(cm))

    def compute(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.int64)
            score = (mat @ cm.T).astype(np.float64) / denom[None, :]
            score[:, n2 == 0] = -1e308
            order = np.argsort(-score, axis=1, kind="stable")[:, :n_out]
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), n_out),
                    vec_col: pdf[vec_col].iloc[
                        np.repeat(np.arange(len(pdf)), n_out)
                    ].to_numpy(),
                    "cluster": order.reshape(-1).astype(np.int32),
                }
            )

    schema = f"{id_col} long, {vec_col} array<long>, cluster int"
    return ensure_parallelism(df.select(id_col, vec_col)).mapInPandas(
        compute, schema=schema
    )


def portable_ivf_train(
    corpus_q: DataFrame,
    nlist: int = ANN_NLIST,
    iters: int = ANN_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "__vq",
):
    """Integer k-means: seeds are the ``nlist`` vectors with smallest
    (md5-prefix(id), id); each Lloyd step sums BIGINT components
    exactly (order-free) and the new centroid component is
    floor(sum/count + 0.5) — one deterministic double division per
    (cluster, dim). Empty clusters keep their centroid. Returns an
    int64 (nlist × dim) matrix the oracle re-derives exactly."""
    import math

    import numpy as np

    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    rows = (
        corpus_q.select(vec_col, h.alias("__h"), F.col(id_col).alias("__i"))
        .orderBy("__h", "__i")
        .limit(nlist)
        .collect()
    )
    cmat = np.array([list(r[vec_col]) for r in rows], dtype=np.int64)
    for _ in range(iters):
        assigned = _portable_ivf_assign(corpus_q, cmat, id_col, vec_col, nprobe=1)
        sums = (
            assigned.select("cluster", F.posexplode(vec_col))
            .groupBy("cluster", "pos")
            .agg(F.sum("col").alias("s"), F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        new = cmat.copy()
        for r in sums:
            new[r["cluster"], r["pos"]] = math.floor(
                float(r["s"]) / float(r["cnt"]) + 0.5
            )
        cmat = new
    return cmat


def portable_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = ANN_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    nlist: int = ANN_NLIST,
    nprobe: int = ANN_NPROBE,
    iters: int = ANN_ITERS,
    cmat=None,
) -> DataFrame:
    """IVF top-k over the integer k-means index. Same plan shape as
    ``ivf_topk`` (corpus shuffles once by cell, probes broadcast);
    candidate pairs unique by construction. Pass a pre-trained
    ``cmat`` (``portable_ivf_train``) to share one index across
    consumers (e.g. the q29 suite reuses it for SemDeDup)."""
    cq, qq = _quantize_sides(corpus, queries, id_col, vec_col, query_id_col)
    if cmat is None:
        cmat = portable_ivf_train(cq, nlist, iters, id_col="vec_id", vec_col="__vq")
    cb = _portable_ivf_assign(cq, cmat, "vec_id", "__vq", nprobe=1)
    qb = _portable_ivf_assign(qq, cmat, query_id_col, "__qq", nprobe=nprobe)
    cand = (
        cb.join(F.broadcast(qb), "cluster")
        .filter(F.col("vec_id") != F.col(query_id_col))
        .select("vec_id", "__vq", query_id_col, "__qq")
    )
    return _score_topk_portable(cand, k, query_id_col)


# SemDeDup gate threshold, in ANN_COS_SCALE (1e-9) units. The driver
# testdata's embeddings are near-uniform (max within-cluster cosine
# ~0.51 at sf0.01), so a production eps (~0.95) would make the prune
# path vacuously green — the q27 lesson. 0.40 keeps a real, small
# pruned set flowing through the gate at every SF; production callers
# pass their own eps_q.
SEM_EPS_Q = 400_000_000


def semdedup_clusters(
    corpus_q: DataFrame,
    cmat,
    eps_q: int = SEM_EPS_Q,
    id_col: str = "vec_id",
    vec_col: str = "__vq",
) -> DataFrame:
    """SemDeDup (Abbas et al., arXiv:2303.09540): k-means-cluster the
    embedding space, then prune, within each cluster, every document
    whose cosine to a LOWER-id cluster-mate reaches ``eps_q`` — one
    representative (the smallest id) survives per semantic-duplicate
    group, and only intra-cluster pairs are ever scored.

    Takes 1e6-quantized integer vectors (``quantized_vec``) and a
    trained integer centroid matrix (``portable_ivf_train``) so the
    DuckDB oracle re-derives every row bit-for-bit. Returns one row
    per non-empty cluster: ``n`` members, ``n_pruned``, and ``digest``
    = Σ ((id%P)·(2 if pruned else 1) mod Q) — which pins every
    document's cluster assignment AND pruned status, so a single
    misassigned or mispruned doc breaks the driver hash.

    At 100 TB this is the whole point of SemDeDup: nlist grows with N
    so cluster size stays bounded (~N/nlist), the pair join is
    equi-blocked on the cluster id (never all-pairs), and the reduce
    is one groupBy on the same key. The reference has no embedding
    ops at all (SURVEY §2.7) — this is extension surface.
    """
    assigned = _portable_ivf_assign(corpus_q, cmat, id_col, vec_col, nprobe=1)
    a = assigned.select(
        "cluster", F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")
    )
    b = assigned.select(
        "cluster", F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb")
    )
    pruned_ids = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(_cosine_q_portable(F.col("__va"), F.col("__vb")) >= F.lit(eps_q))
        .select("cluster", F.col("id_b").alias(id_col))
        .distinct()
    )
    p, q = 1_000_003, 1_000_000_007
    flagged = assigned.join(
        pruned_ids.withColumn("__pruned", F.lit(1)),
        ["cluster", id_col],
        "left",
    )
    return (
        flagged.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("__pruned"), F.lit(0))).alias("n_pruned"),
            F.sum(
                (F.col(id_col) % p)
                * F.when(F.col("__pruned").isNotNull(), 2).otherwise(1)
                % q
            ).alias("digest"),
        )
    )


def recall_hits(
    ann_topk: DataFrame, exact_topk: DataFrame, query_id_col: str = "query_id"
) -> DataFrame:
    """Per-query |ann ∩ exact| — an exact integer the oracle
    recomputes (it derives both top-k sets itself)."""
    hits = (
        ann_topk.join(
            exact_topk.select(query_id_col, "neighbor_id"),
            [query_id_col, "neighbor_id"],
            "left_semi",
        )
        .groupBy(query_id_col)
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    qids = exact_topk.select(query_id_col).distinct()
    return qids.join(hits, query_id_col, "left").select(
        query_id_col, F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits")
    )


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
    cells, centroid training is ONE bounded-sample TakeOrdered scan +
    driver-local Lloyd (see ``ivf_train``), and the candidate join
    shuffles the corpus once by cell id with the probe table
    broadcast — two corpus scans total, end to end. Candidate pairs
    are unique by construction (one cell per corpus vector) — no
    dedup step, unlike multi-table LSH."""
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


# int8 symmetric quantization (shared with the q29 DuckDB oracle):
# per-vector scale so the largest-magnitude component maps to ±127 —
# the standard ANN storage/re-rank compression (4x smaller than f32).
INT8_MAX = 127


def int8_vec(vq):
    """1e6-long-quantized vector → per-vector symmetric int8 codes:
    code_d = floor(v_d · 127 / max|v| + 0.5), zero vector → zeros.

    Derived from the already-integer ``quantized_vec`` form, so the
    only float step is one exactly-rounded IEEE division per component
    (integers ≤ 1.27e8 are exact in double) — bit-identical on any
    engine. At 100 TB this is the column you persist: 64 bytes/vector
    instead of 256, scanned with exact integer dot products.
    """
    vmax = F.array_max(F.transform(vq, F.abs))
    return F.when(
        vmax == 0, F.transform(vq, lambda e: F.lit(0).cast("long"))
    ).otherwise(
        F.transform(
            vq,
            lambda e: F.floor(
                e.cast("double")
                * F.lit(float(INT8_MAX))
                / vmax.cast("double")
                + F.lit(0.5)
            ).cast("long"),
        )
    )


def portable_int8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = ANN_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force top-k by exact integer dot product over int8-coded
    vectors — the quantized-retrieval primitive (score in the
    compressed domain, rank desc, id tiebreak). Composes with the IVF
    probe join for the 100 TB path: score int8 codes over the probed
    cells' candidates instead of all pairs; the scoring expression is
    identical. Ranking uses the raw int8 dot product (monotone in
    cosine for unit-normalized corpora); the 'int8_recall' rows in the
    q29 suite measure its agreement with the exact float-free top-k.
    """
    cq, qq = _quantize_sides(corpus, queries, id_col, vec_col, query_id_col)
    c8 = cq.select("vec_id", int8_vec(F.col("__vq")).alias("__v8"))
    q8 = qq.select(query_id_col, int8_vec(F.col("__qq")).alias("__q8"))
    scored = (
        c8.crossJoin(F.broadcast(q8))
        .filter(F.col("vec_id") != F.col(query_id_col))
        .select(
            F.col(query_id_col),
            F.col("vec_id").alias("neighbor_id"),
            _dot_long(F.col("__v8"), F.col("__q8")).alias("cosine_q"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_q"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cosine_q")
    )


def portable_hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = ANN_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining for contrastive embedding training: for
    each query, the k most-similar corpus vectors with a DIFFERENT
    label (quantized cosine, id tiebreak) — the negatives that sit
    closest to the decision boundary (SimCSE/DPR-style in-corpus
    mining; the reference has no similarity ops, SURVEY §2.7).

    Same integer-exact scoring as ``portable_cosine_topk``; at 100 TB
    the all-pairs scan composes with the ANN index exactly like exact
    search does — probe the IVF cells, then apply the label-mismatch
    filter before scoring, so candidate generation stays sublinear.
    """
    cq = corpus.select(
        F.col(id_col).alias("vec_id"),
        quantized_vec(F.col(vec_col)).alias("__vq"),
        F.col(label_col).alias("__cl"),
    )
    qq = queries.select(
        F.col(id_col).alias(query_id_col),
        quantized_vec(F.col(vec_col)).alias("__qq"),
        F.col(label_col).alias("__ql"),
    )
    cand = (
        cq.crossJoin(F.broadcast(qq))
        .filter(
            (F.col("vec_id") != F.col(query_id_col))
            & (F.col("__cl") != F.col("__ql"))
        )
        .drop("__cl", "__ql")
    )
    return _score_topk_portable(cand, k, query_id_col)


def ivf_int8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = ANN_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    nlist: int = ANN_NLIST,
    nprobe: int = ANN_NPROBE,
    iters: int = ANN_ITERS,
    cmat=None,
) -> DataFrame:
    """The composed 100 TB retrieval plan the int8 docstrings promise:
    IVF candidate generation (corpus shuffled once by cell, probes
    broadcast — sublinear candidates) + scoring in the int8 compressed
    domain (exact integer dot products over 4×-smaller codes) — the
    IVFx,SQ8-style layout of a production vector index. Candidate
    generation is identical to ``portable_ivf_topk``; only the scoring
    expression changes, so the plan shape (and its scale posture) is
    unchanged."""
    cq, qq = _quantize_sides(corpus, queries, id_col, vec_col, query_id_col)
    if cmat is None:
        cmat = portable_ivf_train(cq, nlist, iters, id_col="vec_id", vec_col="__vq")
    # encode int8 codes ONCE PER VECTOR before the cluster join (the
    # store-the-codes posture: candidates×dim work if derived inside
    # the post-join projection), same as portable_int8_topk
    cb = _portable_ivf_assign(cq, cmat, "vec_id", "__vq", nprobe=1).select(
        "vec_id", "cluster", int8_vec(F.col("__vq")).alias("__v8")
    )
    qb = _portable_ivf_assign(
        qq, cmat, query_id_col, "__qq", nprobe=nprobe
    ).select(query_id_col, "cluster", int8_vec(F.col("__qq")).alias("__q8"))
    cand = (
        cb.join(F.broadcast(qb), "cluster")
        .filter(F.col("vec_id") != F.col(query_id_col))
        .select(
            F.col(query_id_col),
            F.col("vec_id").alias("neighbor_id"),
            _dot_long(F.col("__v8"), F.col("__q8")).alias("cosine_q"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_q"), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cosine_q")
    )


def text_embedding_topk(
    docs: DataFrame,
    k: int = ANN_K,
    max_query_id: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end text retrieval: infer hashed sentence embeddings
    (text.hashed_embedding — the text→vector step the embeddings
    table otherwise pre-supposes), then quantized-cosine top-k of
    every document against the first ``max_query_id`` docs as
    queries. Same integer-exact scoring as ``portable_cosine_topk``
    (vectors are already integer arrays here, no 1e6 quantization
    step needed)."""
    from timebox_spark.operators.text import hashed_embedding

    emb = docs.select(
        F.col(id_col), hashed_embedding(text_col).alias("__vq")
    )
    queries = emb.filter(F.col(id_col) < max_query_id).select(
        F.col(id_col).alias("query_id"), F.col("__vq").alias("__qq")
    )
    cand = emb.crossJoin(F.broadcast(queries)).filter(
        F.col(id_col) != F.col("query_id")
    )
    return _score_topk_portable(
        cand.withColumnRenamed(id_col, "vec_id"), k, "query_id"
    )


# ------------------------------------------ product quantization (PQ)

# The remaining member of the Faiss index family (Jégou et al. 2011,
# "Product Quantization for Nearest Neighbor Search"): split the
# vector into PQ_M subspaces, k-means each subspace to PQ_KSUB
# codewords, store one small code per subspace — PQ_M bytes/vector
# instead of 4·dim (32× here) — and score queries against codes via
# an ADC (asymmetric distance computation) lookup table, never
# reconstructing vectors. Inner-product flavor: score(q, x) ≈
# Σ_m <q_m, c_{m, code_m(x)}>, which ranks like the dot product the
# rest of this module uses. Engine-portable like the IVF path:
# quantized integer subvectors, exact BIGINT sums everywhere, one
# deterministic floor(sum/cnt + 0.5) per centroid component — the
# DuckDB oracle (plans.ann_oracle) re-derives codebooks, codes, ADC
# tables, and rankings bit-for-bit. The reference has no similarity
# ops (SURVEY §2.7); this completes Flat / LSH / IVF / SQ8 / IVF+SQ8
# with the PQ compression point of the design space.

PQ_M = 8       # subspaces (64-dim → 8 dims each)
PQ_KSUB = 16   # codewords per subspace → 4-bit codes, 8 B/vector
PQ_ITERS = 1   # Lloyd refinements over the seed codebook


def _pq_subdim(dim: int = ANN_DIM, m: int = PQ_M) -> int:
    assert dim % m == 0, (dim, m)
    return dim // m


def _pq_encode(df: DataFrame, cb, id_col: str, vec_col: str) -> DataFrame:
    """(id, quantized vec) → (id, codes array<int> of length PQ_M):
    per subspace, the L2-nearest codeword (exact integer squared
    distance, ties to the smallest code). Arrow numpy kernel, one
    pass, no shuffle — at 100 TB this is the encode-once scan whose
    output is the column you persist."""
    import numpy as np
    import pandas as pd

    from timebox_spark.session import ship_package

    ship_package(df.sparkSession)
    cbm = np.ascontiguousarray(cb, dtype=np.int64)  # (M, K, ds)
    m_sub, ksub, ds = cbm.shape

    def compute(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.int64)
            sub = mat.reshape(len(pdf), m_sub, ds)
            # (n, M, K) squared L2 via expansion: ||x||² - 2x·c + ||c||²
            # (exact: int64 partials well under 2^63 for 1e6-scale ints)
            x2 = (sub * sub).sum(axis=2)[:, :, None]
            c2 = (cbm * cbm).sum(axis=2)[None, :, :]
            xc = np.einsum("nmd,mkd->nmk", sub, cbm)
            dist = x2 - 2 * xc + c2
            codes = dist.argmin(axis=2)  # first min = smallest code
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "codes": list(codes.astype(np.int32)),
                }
            )

    return ensure_parallelism(df.select(id_col, vec_col)).mapInPandas(
        compute, schema=f"{id_col} long, codes array<int>"
    )


def portable_pq_train(
    corpus_q: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "__vq",
):
    """Per-subspace integer k-means, all subspaces trained in ONE
    distributed pass per Lloyd step (subspace id is just another
    grouping key — the oracle mirrors it the same way, so CTE depth
    doesn't multiply by M). Seeds: the ``ksub`` vectors with smallest
    (md5-prefix(id), id), each contributing its m-th subvector to
    subspace m — identical seed ids across subspaces, re-derivable by
    both engines. Update: floor(sum/cnt + 0.5) per (m, code, dim);
    empty cells keep their codeword. Returns int64 (m, ksub, ds)."""
    import math

    import numpy as np

    ds = _pq_subdim(ANN_DIM, m)
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    rows = (
        corpus_q.select(vec_col, h.alias("__h"), F.col(id_col).alias("__i"))
        .orderBy("__h", "__i")
        .limit(ksub)
        .collect()
    )
    if len(rows) < ksub:
        # fail loudly and identically to the oracle (whose seed LIMIT
        # would silently yield a partial codebook) on degenerate input
        raise ValueError(
            f"portable_pq_train needs at least ksub={ksub} corpus "
            f"vectors to seed the codebook, got {len(rows)}"
        )
    seeds = np.array([list(r[vec_col]) for r in rows], dtype=np.int64)
    cb = np.ascontiguousarray(
        seeds.reshape(ksub, m, ds).transpose(1, 0, 2)
    )  # (m, ksub, ds)
    for _ in range(iters):
        assigned = _pq_encode(corpus_q, cb, id_col, vec_col)
        joined = corpus_q.join(assigned, id_col).select(
            F.posexplode(vec_col).alias("pos", "comp"),
            F.col("codes"),
        )
        sums = (
            joined.select(
                (F.col("pos") / ds).cast("int").alias("m"),
                (F.col("pos") % ds).alias("d"),
                F.element_at(
                    F.col("codes"), (F.col("pos") / ds).cast("int") + 1
                ).alias("j"),
                "comp",
            )
            .groupBy("m", "j", "d")
            .agg(F.sum("comp").alias("s"), F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        new = cb.copy()
        for r in sums:
            new[r["m"], r["j"], r["d"]] = math.floor(
                float(r["s"]) / float(r["cnt"]) + 0.5
            )
        cb = new
    return cb


def portable_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = ANN_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    cb=None,
) -> DataFrame:
    """PQ/ADC top-k: corpus scored purely from its codes. Per query,
    an ADC table adc[m][j] = <q_m, c_{m,j}> (exact BIGINT, computed
    driver-free inside the plan: PQ_M·PQ_KSUB literal-centroid dots
    per query row); per candidate, score = Σ_m adc[m][code_m] — an
    O(M) integer fold per pair instead of an O(dim) dot on a vector
    the compressed store no longer holds. Queries broadcast by
    contract; ranking (score DESC, id) as everywhere."""
    cq, qq = _quantize_sides(corpus, queries, id_col, vec_col, query_id_col)
    if cb is None:
        cb = portable_pq_train(cq)
    m_sub, ksub, _ds = cb.shape
    codes = _pq_encode(cq, cb, "vec_id", "__vq")
    qadc = qq.select(
        query_id_col, _pq_adc_array(cb, "__qq").alias("__adc")
    )
    scored = (
        codes.crossJoin(F.broadcast(qadc))
        .filter(F.col("vec_id") != F.col(query_id_col))
        .select(
            F.col(query_id_col),
            F.col("vec_id").alias("neighbor_id"),
            _pq_adc_score(m_sub, ksub).alias("cosine_q"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_q"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cosine_q")
    )


def _pq_adc_array(cb, qvec_col: str):
    """Per-query ADC table as one flat array<long> of length M·K:
    adc[m·K + j + 1] = <q_m, c_{m,j}> with LITERAL centroid
    components (exact BIGINT — computed inside the plan, driver-free,
    M·K·ds multiply-adds per query row)."""
    m_sub, ksub, ds = cb.shape
    entries = []
    for mi in range(m_sub):
        for j in range(ksub):
            dot = None
            for d in range(ds):
                t = F.element_at(F.col(qvec_col), mi * ds + d + 1) * F.lit(
                    int(cb[mi, j, d])
                )
                dot = t if dot is None else dot + t
            entries.append(dot.cast("long"))
    return F.array(*entries)


def _pq_adc_score(m_sub: int, ksub: int):
    """score = Σ_m adc[m·K + code_m] — an O(M) integer fold per
    (candidate, query) pair over the ``codes`` and ``__adc`` cols."""
    return F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m_sub - 1)),
            lambda c, mi: F.element_at(
                F.col("__adc"), (mi * ksub + c + 1).cast("int")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = ANN_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    nlist: int = ANN_NLIST,
    nprobe: int = ANN_NPROBE,
    iters: int = ANN_ITERS,
    cmat=None,
    cb=None,
) -> DataFrame:
    """IVFADC (Jégou et al. 2011 §IV): the scale-canonical composed
    index — prune candidates by IVF cell (corpus hard-assigned once,
    queries probe ``nprobe`` cells), then score survivors purely from
    their PQ codes via the per-query ADC table. This is what fixes
    flat-ADC's remaining full scan: per query only ~nprobe/nlist of
    the code table is touched, and each touch is an O(M) integer
    fold. Raw-vector PQ (no residual encoding) — both stages share
    the same quantized-int contract, so the DuckDB oracle composes
    the existing ``af``/``qp`` cell CTEs with ``pq_codes``/``pq_adc``
    and re-derives every row bit-for-bit. Candidate pairs are unique
    by construction (corpus vector lives in exactly one cell).
    Pre-trained ``cmat``/``cb`` can be shared across consumers (the
    q29 suite reuses both)."""
    cq, qq = _quantize_sides(corpus, queries, id_col, vec_col, query_id_col)
    if cmat is None:
        cmat = portable_ivf_train(cq, nlist, iters)
    if cb is None:
        cb = portable_pq_train(cq)
    m_sub, ksub, _ds = cb.shape
    cells = _portable_ivf_assign(cq, cmat, "vec_id", "__vq", nprobe=1).select(
        "cluster", "vec_id"
    )
    coded = cells.join(_pq_encode(cq, cb, "vec_id", "__vq"), "vec_id")
    qb = _portable_ivf_assign(qq, cmat, query_id_col, "__qq", nprobe=nprobe)
    qadc = qb.select(
        "cluster", query_id_col, _pq_adc_array(cb, "__qq").alias("__adc")
    )
    scored = (
        coded.join(F.broadcast(qadc), "cluster")
        .filter(F.col("vec_id") != F.col(query_id_col))
        .select(
            F.col(query_id_col),
            F.col("vec_id").alias("neighbor_id"),
            _pq_adc_score(m_sub, ksub).alias("cosine_q"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_q"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cosine_q")
    )


def _centroid_literal(cmat):
    """The (nlist × dim) integer centroid matrix as ONE nested-array
    plan literal — nlist is small by construction, so this rides with
    the task binary like the LSH sign tensor."""
    return F.lit([[int(x) for x in row] for row in cmat]).cast(
        "array<array<long>>"
    )


def ivf_pq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = ANN_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    nlist: int = ANN_NLIST,
    nprobe: int = ANN_NPROBE,
    iters: int = ANN_ITERS,
    cmat=None,
    cb=None,
) -> DataFrame:
    """IVFADC with RESIDUAL encoding — the full Jégou et al. 2011 §IV
    construction ``ivf_pq_topk`` approximates: each corpus vector is
    PQ-encoded as r = v − c_cell(v) (the codebook is trained on the
    residuals), and a candidate's score decomposes exactly as
    <q, v̂> = <q, c_cell> + <q, r̂> — a per-(query, probed-cell) BIGINT
    bias plus the same O(M) ADC fold. Residuals matter because they
    are centered near zero: one shared codebook quantizes every
    cell's local geometry instead of the global point spread, so
    recall holds as nlist grows where raw-vector PQ degrades (the
    admitted gap in ``ivf_pq_topk``'s docstring).

    Plan shape is identical to ``ivf_pq_topk`` — residual subtraction
    is a map-side ``zip_with`` against the centroid literal, the bias
    is computed on the broadcast query-probe rows, and the scoring
    join still touches only ~nprobe/nlist of the code table per
    query. Everything stays exact BIGINT, so the q29 oracle
    re-derives 'ivfpq_res' bit-for-bit. ``cb`` here is the RESIDUAL
    codebook (never interchangeable with the raw one)."""
    cq, qq = _quantize_sides(corpus, queries, id_col, vec_col, query_id_col)
    if cmat is None:
        cmat = portable_ivf_train(cq, nlist, iters)
    cents = _centroid_literal(cmat)
    cells = _portable_ivf_assign(cq, cmat, "vec_id", "__vq", nprobe=1)
    res = cells.select(
        "cluster",
        "vec_id",
        F.zip_with(
            "__vq",
            F.element_at(cents, F.col("cluster") + 1),
            lambda a, b: a - b,
        ).alias("__vr"),
    )
    if cb is None:
        cb = portable_pq_train(res.select("vec_id", "__vr"), vec_col="__vr")
    m_sub, ksub, _ds = cb.shape
    coded = res.select("cluster", "vec_id").join(
        _pq_encode(res, cb, "vec_id", "__vr"), "vec_id"
    )
    qb = _portable_ivf_assign(qq, cmat, query_id_col, "__qq", nprobe=nprobe)
    bias = F.aggregate(
        F.zip_with(
            "__qq",
            F.element_at(cents, F.col("cluster") + 1),
            lambda a, b: a * b,
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    qadc = qb.select(
        "cluster",
        query_id_col,
        bias.alias("__bias"),
        _pq_adc_array(cb, "__qq").alias("__adc"),
    )
    scored = (
        coded.join(F.broadcast(qadc), "cluster")
        .filter(F.col("vec_id") != F.col(query_id_col))
        .select(
            F.col(query_id_col),
            F.col("vec_id").alias("neighbor_id"),
            (F.col("__bias") + _pq_adc_score(m_sub, ksub)).alias(
                "cosine_q"
            ),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_q"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", "neighbor_id", "cosine_q")
    )
