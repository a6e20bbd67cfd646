"""DuckDB oracle for the portable ANN suite (q29).

Generates one SQL statement that independently re-derives, from the
``embeddings`` table alone, everything the Spark side computes in
``operators.similarity`` (portable variants):

- 1e6-quantized integer vectors (floor(x*1e6 + 0.5)),
- LSH buckets from the SAME literal ±1 hyperplanes (exact BIGINT
  projections — no engine hash functions in the contract),
- the integer k-means index: seeded by md5-prefix order, ``ITERS``
  Lloyd steps unrolled as CTE layers, all cluster sums exact BIGINT,
  centroid components floor(sum/count + 0.5),
- candidate sets, integer-cosine scores (quantized 1e-9), top-k with
  (score DESC, neighbor_id) tie-break, and per-query recall hits
  against the exact baseline.

Float ops are deterministic scalars (divide/sqrt/floor) on identical
integer inputs, so both engines produce bit-identical rows; the driver
hash check passes for real rather than by declaration.
"""

from __future__ import annotations

from timebox_spark.operators.similarity import (
    ANN_COS_SCALE,
    ANN_DIM,
    ANN_ITERS,
    ANN_K,
    ANN_NLIST,
    ANN_NPROBE,
    ANN_NULL_SCORE,
    ANN_PLANES,
    ANN_QSCALE,
    ANN_TABLES,
    PQ_ITERS,
    PQ_KSUB,
    PQ_M,
    SEM_EPS_Q,
    _pq_subdim,
    lsh_plane_signs,
)

ANN_QUERY_MAX_ID = 10  # queries = embeddings with vec_id < 10


def _dot(x: str, y: str) -> str:
    return (
        f"list_sum(list_transform(range(1, {ANN_DIM + 1}), d -> {x}[d] * {y}[d]))"
    )


def _n2(x: str) -> str:
    return f"list_sum(list_transform({x}, x -> x * x))"


def _cos_q(v: str, q: str) -> str:
    return f"""CASE WHEN {_n2(v)} = 0 OR {_n2(q)} = 0 THEN CAST({ANN_NULL_SCORE} AS BIGINT)
      ELSE CAST(floor(CAST({_dot(v, q)} AS DOUBLE)
                / (sqrt(CAST({_n2(v)} AS DOUBLE)) * sqrt(CAST({_n2(q)} AS DOUBLE)))
                * {ANN_COS_SCALE} + 0.5) AS BIGINT) END"""


def _topk(src: str, qid: str = "query_id") -> str:
    return f"""SELECT {qid}, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine_q FROM (
      SELECT *, row_number() OVER (PARTITION BY {qid}
               ORDER BY cosine_q DESC, neighbor_id) AS rank FROM {src}
    ) WHERE rank <= {ANN_K}"""


def _bucket(v: str, t: int, signs, planes: int = ANN_PLANES) -> str:
    terms = []
    for p in range(planes):
        arr = "[" + ", ".join(str(s) for s in signs[t][p]) + "]"
        proj = (
            f"list_sum(list_transform(range(1, {ANN_DIM + 1}),"
            f" d -> {v}[d] * ({arr})[d]))"
        )
        terms.append(f"CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


def _assign(centroids: str, src: str, idc: str, vecc: str, rn_bound: int) -> str:
    """Assignment block: row per (vector, probed cell). ``rn_bound=1``
    is hard assignment; larger = query probes."""
    score = f"""CASE WHEN {_n2('c.c')} = 0 THEN -1e308
          ELSE CAST({_dot(f'e.{vecc}', 'c.c')} AS DOUBLE)
               / sqrt(CAST({_n2('c.c')} AS DOUBLE)) END"""
    return f"""SELECT {idc}, {vecc}, j FROM (
      SELECT e.{idc}, e.{vecc}, c.j,
             row_number() OVER (PARTITION BY e.{idc} ORDER BY {score} DESC, c.j) AS rn
      FROM {src} e CROSS JOIN {centroids} c
    ) WHERE rn <= {rn_bound}"""


def _pq_assign(cb: str, es: str = "pq_es") -> str:
    """Per (vector, subspace): the L2-nearest codeword of ``cb``
    (exact integer squared distance, ties to the smallest code) —
    mirrors similarity._pq_encode's argmin. ``es`` selects the
    subvector source (raw ``pq_es`` or residual ``pqr_es``)."""
    ds = _pq_subdim()
    dist = (
        f"list_sum(list_transform(range(1, {ds + 1}),"
        f" d -> (e.sv[d] - c.c[d]) * (e.sv[d] - c.c[d])))"
    )
    return f"""SELECT vec_id, m, j, sv FROM (
      SELECT e.vec_id, e.m, c.j, e.sv,
             row_number() OVER (PARTITION BY e.vec_id, e.m
                                ORDER BY {dist}, c.j) AS rn
      FROM {es} e JOIN {cb} c ON c.m = e.m
    ) WHERE rn = 1"""


def _pq_lloyd_layers(pfx: str, es: str) -> str:
    """The PQ_ITERS integer Lloyd layers as prefixed CTEs — shared by
    the raw codebook (``pq_``) and the residual codebook (``pqr_``,
    similarity.ivf_pq_residual_topk)."""
    ds = _pq_subdim()
    lloyd = []
    for i in range(PQ_ITERS):
        lloyd.append(
            f"{pfx}a{i + 1} AS ({_pq_assign(f'{pfx}c{i}', es)}),\n"
            f"{pfx}m{i + 1} AS (\n"
            f"  SELECT m, j, r.range AS d, CAST(sum(sv[r.range]) AS BIGINT) AS s,\n"
            f"         count(*) AS cnt\n"
            f"  FROM {pfx}a{i + 1} CROSS JOIN range(1, {ds + 1}) r GROUP BY 1, 2, 3\n"
            f"),\n"
            f"{pfx}g{i + 1} AS (\n"
            f"  SELECT m, j, list(CAST(floor(CAST(s AS DOUBLE) / cnt + 0.5) AS BIGINT)\n"
            f"                    ORDER BY d) AS c\n"
            f"  FROM {pfx}m{i + 1} GROUP BY 1, 2\n"
            f"),\n"
            f"{pfx}c{i + 1} AS (SELECT p.m, p.j, coalesce(g.c, p.c) AS c\n"
            f"  FROM {pfx}c{i} p LEFT JOIN {pfx}g{i + 1} g ON g.m = p.m AND g.j = p.j)"
        )
    return ",\n".join(lloyd)


def _pq_blocks() -> str:
    """CTE block re-deriving the PQ index (similarity.portable_pq_*):
    subvector split, md5-seeded per-subspace codebooks, PQ_ITERS
    integer Lloyd steps (floor(sum/cnt + 0.5), empty cells keep their
    codeword), final codes, per-query ADC tables adc[m][j] =
    <q_m, c_{m,j}> (exact BIGINT), and ADC scores = Σ_m adc[m][code_m]
    ranked (score DESC, neighbor_id)."""
    ds = _pq_subdim()
    lloyd_sql = _pq_lloyd_layers("pq_", "pq_es")
    cfin = f"pq_c{PQ_ITERS}"
    rfin = f"pqr_c{PQ_ITERS}"
    ivf_cfin = f"c{ANN_ITERS}"
    return f"""pq_es AS (
  SELECT vec_id, r.range AS m,
         list_slice(v, r.range * {ds} + 1, (r.range + 1) * {ds}) AS sv
  FROM eq CROSS JOIN range(0, {PQ_M}) r
),
pq_seed AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS j, vec_id FROM (
    SELECT ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT AS h,
           vec_id
    FROM eq ORDER BY 1, 2 LIMIT {PQ_KSUB}
  )
),
pq_c0 AS (
  SELECT s.m, p.j, s.sv AS c FROM pq_seed p JOIN pq_es s ON s.vec_id = p.vec_id
),
{lloyd_sql},
pq_codes AS ({_pq_assign(cfin)}),
pq_adc AS (
  SELECT q.query_id, c.m, c.j,
         CAST(list_sum(list_transform(range(1, {ds + 1}),
           d -> list_slice(q.qv, c.m * {ds} + 1, (c.m + 1) * {ds})[d] * c.c[d]))
           AS BIGINT) AS adc
  FROM qe q CROSS JOIN {cfin} c
),
pq_s AS (
  SELECT a.query_id, e.vec_id AS neighbor_id,
         CAST(sum(a.adc) AS BIGINT) AS cosine_q
  FROM pq_codes e JOIN pq_adc a ON a.m = e.m AND a.j = e.j
  WHERE e.vec_id <> a.query_id
  GROUP BY 1, 2
),
pq_k AS ({_topk('pq_s')}),
pq_rec AS (
  SELECT q.query_id, CAST(count(x.neighbor_id) AS BIGINT) AS hits
  FROM qids q LEFT JOIN (
    SELECT l.query_id, l.neighbor_id
    FROM pq_k l JOIN ex_k e ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
  ) x ON x.query_id = q.query_id GROUP BY q.query_id
),
-- IVFADC (similarity.ivf_pq_topk): candidates from the SAME
-- probe-join as ivf_k (af = hard cell per corpus vector, qp = query
-- probes), scored from the SAME pq_codes/pq_adc — both stages are
-- re-derived, so the composition is too
ipq_s AS (
  SELECT qp.query_id, af.vec_id AS neighbor_id,
         CAST(sum(a.adc) AS BIGINT) AS cosine_q
  FROM af JOIN qp ON af.j = qp.j
  JOIN pq_codes e ON e.vec_id = af.vec_id
  JOIN pq_adc a ON a.query_id = qp.query_id AND a.m = e.m AND a.j = e.j
  WHERE af.vec_id <> qp.query_id
  GROUP BY 1, 2
),
ipq_k AS ({_topk('ipq_s')}),
ipq_rec AS (
  SELECT q.query_id, CAST(count(x.neighbor_id) AS BIGINT) AS hits
  FROM qids q LEFT JOIN (
    SELECT l.query_id, l.neighbor_id
    FROM ipq_k l JOIN ex_k e ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
  ) x ON x.query_id = q.query_id GROUP BY q.query_id
),
-- residual IVFADC (similarity.ivf_pq_residual_topk, Jégou §IV): the
-- codebook is re-trained on r = v - c_cell(v) (same md5 seed ids),
-- candidates come from the SAME af/qp probe-join, and the score is
-- the per-(query, cell) bias <q, c_cell> plus the residual ADC fold
pqr_rv AS (
  SELECT af.vec_id,
         list_transform(range(1, {ANN_DIM + 1}),
                        d -> af.v[d] - cf.c[d]) AS rv
  FROM af JOIN {ivf_cfin} cf ON cf.j = af.j
),
pqr_es AS (
  SELECT vec_id, r.range AS m,
         list_slice(rv, r.range * {ds} + 1, (r.range + 1) * {ds}) AS sv
  FROM pqr_rv CROSS JOIN range(0, {PQ_M}) r
),
pqr_c0 AS (
  SELECT s.m, p.j, s.sv AS c FROM pq_seed p JOIN pqr_es s ON s.vec_id = p.vec_id
),
{_pq_lloyd_layers("pqr_", "pqr_es")},
pqr_codes AS ({_pq_assign(rfin, "pqr_es")}),
pqr_adc AS (
  SELECT q.query_id, c.m, c.j,
         CAST(list_sum(list_transform(range(1, {ds + 1}),
           d -> list_slice(q.qv, c.m * {ds} + 1, (c.m + 1) * {ds})[d] * c.c[d]))
           AS BIGINT) AS adc
  FROM qe q CROSS JOIN {rfin} c
),
pqr_bias AS (
  SELECT qp.query_id, qp.j,
         CAST(list_sum(list_transform(range(1, {ANN_DIM + 1}),
           d -> qp.qv[d] * cf.c[d])) AS BIGINT) AS bias
  FROM qp JOIN {ivf_cfin} cf ON cf.j = qp.j
),
ipr_s AS (
  SELECT qp.query_id, af.vec_id AS neighbor_id,
         CAST(min(b.bias) + sum(a.adc) AS BIGINT) AS cosine_q
  FROM af JOIN qp ON af.j = qp.j
  JOIN pqr_codes e ON e.vec_id = af.vec_id
  JOIN pqr_adc a ON a.query_id = qp.query_id AND a.m = e.m AND a.j = e.j
  JOIN pqr_bias b ON b.query_id = qp.query_id AND b.j = af.j
  WHERE af.vec_id <> qp.query_id
  GROUP BY 1, 2
),
ipr_k AS ({_topk('ipr_s')}),
ipr_rec AS (
  SELECT q.query_id, CAST(count(x.neighbor_id) AS BIGINT) AS hits
  FROM qids q LEFT JOIN (
    SELECT l.query_id, l.neighbor_id
    FROM ipr_k l JOIN ex_k e ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
  ) x ON x.query_id = q.query_id GROUP BY q.query_id
)"""


def portable_ann_sql() -> str:
    signs = lsh_plane_signs()

    cb = " UNION ALL ".join(
        f"SELECT vec_id, v, {t} AS tbl, {_bucket('v', t, signs)} AS bkt FROM eq"
        for t in range(ANN_TABLES)
    )
    qb = " UNION ALL ".join(
        f"SELECT query_id, qv, {t} AS tbl, {_bucket('qv', t, signs)} AS bkt FROM qe"
        for t in range(ANN_TABLES)
    )

    # unrolled integer k-means: c0 → (a1, m1, g1, c1) → ... → c{ITERS}
    kmeans = []
    for i in range(ANN_ITERS):
        kmeans.append(
            f"a{i + 1} AS ({_assign(f'c{i}', 'eq', 'vec_id', 'v', 1)}),\n"
            f"m{i + 1} AS (\n"
            f"  SELECT j, r.range AS d, CAST(sum(v[r.range]) AS BIGINT) AS s,\n"
            f"         count(*) AS cnt\n"
            f"  FROM a{i + 1} CROSS JOIN range(1, {ANN_DIM + 1}) r GROUP BY 1, 2\n"
            f"),\n"
            f"g{i + 1} AS (\n"
            f"  SELECT j, list(CAST(floor(CAST(s AS DOUBLE) / cnt + 0.5) AS BIGINT)\n"
            f"                 ORDER BY d) AS c\n"
            f"  FROM m{i + 1} GROUP BY j\n"
            f"),\n"
            f"c{i + 1} AS (SELECT p.j, coalesce(g.c, p.c) AS c\n"
            f"            FROM c{i} p LEFT JOIN g{i + 1} g ON g.j = p.j)"
        )
    kmeans_sql = ",\n".join(kmeans)
    cfin = f"c{ANN_ITERS}"

    return f"""
WITH eq AS (
  SELECT vec_id,
         list_transform(embedding,
           e -> CAST(floor(CAST(e AS DOUBLE) * {ANN_QSCALE} + 0.5) AS BIGINT)) AS v
  FROM embeddings
),
qe AS (SELECT vec_id AS query_id, v AS qv FROM eq WHERE vec_id < {ANN_QUERY_MAX_ID}),
ex_s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_cos_q('e.v', 'q.qv')} AS cosine_q
  FROM eq e CROSS JOIN qe q WHERE e.vec_id <> q.query_id
),
ex_k AS ({_topk('ex_s')}),
cb AS ({cb}),
qb AS ({qb}),
lsh_cand AS (
  SELECT DISTINCT a.vec_id, q.query_id
  FROM cb a JOIN qb q ON a.tbl = q.tbl AND a.bkt = q.bkt AND a.vec_id <> q.query_id
),
lsh_s AS (
  SELECT p.query_id, p.vec_id AS neighbor_id, {_cos_q('a.v', 'q.qv')} AS cosine_q
  FROM lsh_cand p JOIN eq a ON a.vec_id = p.vec_id JOIN qe q ON q.query_id = p.query_id
),
lsh_k AS ({_topk('lsh_s')}),
c0 AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS j, c FROM (
    SELECT ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT AS h,
           vec_id, v AS c
    FROM eq ORDER BY 1, 2 LIMIT {ANN_NLIST}
  )
),
{kmeans_sql},
af AS ({_assign(cfin, 'eq', 'vec_id', 'v', 1)}),
qp AS ({_assign(cfin, 'qe', 'query_id', 'qv', ANN_NPROBE)}),
ivf_s AS (
  SELECT qp.query_id, af.vec_id AS neighbor_id, {_cos_q('af.v', 'qp.qv')} AS cosine_q
  FROM af JOIN qp ON af.j = qp.j WHERE af.vec_id <> qp.query_id
),
ivf_k AS ({_topk('ivf_s')}),
-- int8 symmetric quantization re-rank (similarity.portable_int8_topk):
-- per-vector scale to ±127 from the SAME 1e6-long form, exact integer
-- dot products in the compressed domain
i8 AS (
  SELECT vec_id,
         CASE WHEN vmax = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
              ELSE list_transform(v, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0
                     / CAST(vmax AS DOUBLE) + 0.5) AS BIGINT)) END AS v8
  FROM (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS vmax FROM eq)
),
qi8 AS (SELECT vec_id AS query_id, v8 AS q8 FROM i8 WHERE vec_id < {ANN_QUERY_MAX_ID}),
i8_s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         CAST({_dot('e.v8', 'q.q8')} AS BIGINT) AS cosine_q
  FROM i8 e CROSS JOIN qi8 q WHERE e.vec_id <> q.query_id
),
i8_k AS ({_topk('i8_s')}),
-- composed IVF+int8 (similarity.ivf_int8_topk, IVFx,SQ8-style): the
-- SAME probe-join candidates as ivf_k, scored in the int8 compressed
-- domain — candidate generation and scoring both re-derived
ii_s AS (
  SELECT qp.query_id, af.vec_id AS neighbor_id,
         CAST({_dot('ev.v8', 'qv.q8')} AS BIGINT) AS cosine_q
  FROM af JOIN qp ON af.j = qp.j
  JOIN i8 ev ON ev.vec_id = af.vec_id
  JOIN qi8 qv ON qv.query_id = qp.query_id
  WHERE af.vec_id <> qp.query_id
),
ii_k AS ({_topk('ii_s')}),
-- hard-negative mining (similarity.portable_hard_negatives): closest
-- corpus vectors with a DIFFERENT label, same quantized-cosine rank
el AS (SELECT eq.vec_id, eq.v, e.label FROM eq JOIN embeddings e USING (vec_id)),
qlb AS (SELECT vec_id AS query_id, v AS qv, label AS qlabel
        FROM el WHERE vec_id < {ANN_QUERY_MAX_ID}),
hn_s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_cos_q('e.v', 'q.qv')} AS cosine_q
  FROM el e CROSS JOIN qlb q
  WHERE e.vec_id <> q.query_id AND e.label <> q.qlabel
),
hn_k AS ({_topk('hn_s')}),
qids AS (SELECT DISTINCT query_id FROM qe),
i8_rec AS (
  SELECT q.query_id, CAST(count(x.neighbor_id) AS BIGINT) AS hits
  FROM qids q LEFT JOIN (
    SELECT l.query_id, l.neighbor_id
    FROM i8_k l JOIN ex_k e ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
  ) x ON x.query_id = q.query_id GROUP BY q.query_id
),
lsh_rec AS (
  SELECT q.query_id, CAST(count(x.neighbor_id) AS BIGINT) AS hits
  FROM qids q LEFT JOIN (
    SELECT l.query_id, l.neighbor_id
    FROM lsh_k l JOIN ex_k e ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
  ) x ON x.query_id = q.query_id GROUP BY q.query_id
),
ivf_rec AS (
  SELECT q.query_id, CAST(count(x.neighbor_id) AS BIGINT) AS hits
  FROM qids q LEFT JOIN (
    SELECT l.query_id, l.neighbor_id
    FROM ivf_k l JOIN ex_k e ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
  ) x ON x.query_id = q.query_id GROUP BY q.query_id
),
ii_rec AS (
  SELECT q.query_id, CAST(count(x.neighbor_id) AS BIGINT) AS hits
  FROM qids q LEFT JOIN (
    SELECT l.query_id, l.neighbor_id
    FROM ii_k l JOIN ex_k e ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
  ) x ON x.query_id = q.query_id GROUP BY q.query_id
),
-- SemDeDup (arXiv:2303.09540) over the SAME trained index: within
-- each k-means cell, a doc is pruned iff some lower-id cell-mate's
-- cosine reaches SEM_EPS_Q; the digest pins every doc's (cell,
-- pruned) pair
sem_pr AS (
  SELECT a.j, b.vec_id
  FROM af a JOIN af b ON a.j = b.j AND a.vec_id < b.vec_id
  WHERE {_cos_q('a.v', 'b.v')} >= {SEM_EPS_Q}
  GROUP BY 1, 2
),
sem AS (
  SELECT af.j,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(p.vec_id) AS BIGINT) AS n_pruned,
         CAST(sum((af.vec_id % 1000003)
                  * (CASE WHEN p.vec_id IS NOT NULL THEN 2 ELSE 1 END)
                  % 1000000007) AS BIGINT) AS digest
  FROM af LEFT JOIN sem_pr p ON p.j = af.j AND p.vec_id = af.vec_id
  GROUP BY af.j
),
{_pq_blocks()}
SELECT 'exact' AS method, query_id, rank, neighbor_id, cosine_q FROM ex_k
UNION ALL
SELECT 'lsh', query_id, rank, neighbor_id, cosine_q FROM lsh_k
UNION ALL
SELECT 'ivf', query_id, rank, neighbor_id, cosine_q FROM ivf_k
UNION ALL
SELECT 'lsh_recall', query_id, CAST(0 AS INTEGER), CAST(-1 AS BIGINT), hits FROM lsh_rec
UNION ALL
SELECT 'ivf_recall', query_id, CAST(0 AS INTEGER), CAST(-1 AS BIGINT), hits FROM ivf_rec
UNION ALL
-- fast-path gates (q55 within-bounds pattern): the Spark side emits
-- flag=1 iff the xxhash/float fast path's overlap with the portable
-- exact top-k lies in [ANN_FAST_FLOOR_HITS, k*n_queries]; a fast-path
-- recall collapse flips the flag and breaks the driver hash
SELECT 'fast_lsh_floor', CAST(-1 AS BIGINT), CAST(0 AS INTEGER),
       (SELECT CAST(count(*) AS BIGINT) FROM qids), CAST(1 AS BIGINT)
UNION ALL
SELECT 'fast_ivf_floor', CAST(-1 AS BIGINT), CAST(0 AS INTEGER),
       (SELECT CAST(count(*) AS BIGINT) FROM qids), CAST(1 AS BIGINT)
UNION ALL
SELECT 'hardneg', query_id, rank, neighbor_id, cosine_q FROM hn_k
UNION ALL
SELECT 'int8', query_id, rank, neighbor_id, cosine_q FROM i8_k
UNION ALL
SELECT 'int8_recall', query_id, CAST(0 AS INTEGER), CAST(-1 AS BIGINT), hits FROM i8_rec
UNION ALL
SELECT 'ivf_int8', query_id, rank, neighbor_id, cosine_q FROM ii_k
UNION ALL
SELECT 'ivf_int8_recall', query_id, CAST(0 AS INTEGER), CAST(-1 AS BIGINT), hits FROM ii_rec
UNION ALL
SELECT 'semdedup', j, CAST(n_pruned AS INTEGER), n, digest FROM sem
UNION ALL
SELECT 'pq', query_id, rank, neighbor_id, cosine_q FROM pq_k
UNION ALL
SELECT 'pq_recall', query_id, CAST(0 AS INTEGER), CAST(-1 AS BIGINT), hits FROM pq_rec
UNION ALL
SELECT 'ivfpq', query_id, rank, neighbor_id, cosine_q FROM ipq_k
UNION ALL
SELECT 'ivfpq_recall', query_id, CAST(0 AS INTEGER), CAST(-1 AS BIGINT), hits FROM ipq_rec
UNION ALL
SELECT 'ivfpq_res', query_id, rank, neighbor_id, cosine_q FROM ipr_k
UNION ALL
SELECT 'ivfpq_res_recall', query_id, CAST(0 AS INTEGER), CAST(-1 AS BIGINT), hits FROM ipr_rec
"""
