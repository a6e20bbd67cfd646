"""Link-graph ranking operators (PageRank in exact integer fixed
point) — the graph-curation step of a web-scale training-data
pipeline: rank registrable domains (or documents) by link structure
and keep/weight the corpus by rank, the CommonCrawl-derived-pipeline
pattern (CCNet/RefinedWeb-style domain ranking). The reference has no
relational surface at all (SURVEY §2.7 / ``/root/reference/timebox/
timebox.py:105``); this extends the engine's existing iterative-graph
family (``dedup.connected_components*``) with a weighted ranking.

Why INTEGER fixed point: float PageRank sums doubles across a shuffle,
so the low bits depend on partitioning/visit order and no cross-engine
bit-for-bit oracle exists. Here rank is a BIGINT in ``unit`` ticks and
every step is integer multiply / integer (floor) division / integer
sum — fully associative and order-independent — so DuckDB re-derives
the ranks EXACTLY (``duckdb_pagerank_sql`` renders the oracle from the
same constants). The floor divisions leak sub-tick remainder mass each
iteration (total mass only ever shrinks); that loss is part of the
algorithm's definition, identical in both engines, and bounded by
(n_edges + n_nodes) sub-unit ticks per iteration.

100 TB posture: ranks and degrees are O(nodes) — for domain graphs,
orders of magnitude below O(docs) — while the edge list is scanned
once per iteration (join on ``src``, aggregate on ``dst``: the two
shuffles an iteration fundamentally needs; AQE broadcasts the rank
side when it fits — no forced hint, the round-13 advisor rule). Each
iteration's result is ``localCheckpoint``-ed to sever lineage (the
iterative-join plan would otherwise grow exponentially), tracked
per-owner via ``dedup._tracked_local_checkpoint`` so concurrent
callers never sweep each other's blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# damping 0.85 as the exact rational 17/20 (the classic constant);
# kept as module constants so the Spark loop, the DuckDB renderer, and
# the q69 suite all read the same values.
DAMPING_NUM = 17
DAMPING_DEN = 20
RANK_UNIT = 10**9


def out_degrees(edges: DataFrame, src: str = "src") -> DataFrame:
    """(src, deg) out-degree table — parallel edges each count
    (multigraph semantics; ``edges.distinct()`` first for simple-graph
    semantics). One groupBy on the edge list."""
    return edges.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping_num: int = DAMPING_NUM,
    damping_den: int = DAMPING_DEN,
    unit: int = RANK_UNIT,
    owned_rdds: list | None = None,
) -> DataFrame:
    """Fixed-point PageRank: returns (node, rank) after exactly
    ``iterations`` power-iteration rounds, with rank a BIGINT in
    ``unit`` ticks (initial rank = ``unit`` per node, so total mass
    starts at n_nodes·unit and the conventional PageRank probability
    is ``rank / (n_nodes·unit)``).

    Per round, all in BIGINT:

    - each edge (s → t) contributes ``(rank_s · dn) DIV (dd · deg_s)``
      to t (dn/dd = damping, floor division);
    - DANGLING nodes (no out-edge) contribute ``(rank · dn) DIV dd``
      to a pot split evenly: every node gets ``pot DIV n_nodes``;
    - every node's new rank = ``(unit·(dd−dn)) DIV dd`` (the teleport
      term) + dangling share + incoming contributions.

    Nodes = distinct(src) ∪ distinct(dst); parallel edges contribute
    once EACH (weighted-multigraph semantics — dedup first for simple
    graphs); self-loops are ordinary edges. Deterministic on any
    engine/partitioning: integer sums are exact and floor division is
    defined, so the DuckDB oracle (``duckdb_pagerank_sql``) matches
    bit-for-bit.

    Overflow is checked loudly up front: the theoretical rank bound is
    total mass n_nodes·unit, and the hottest intermediate is
    ``rank·dn``, so n_nodes·unit·dn must stay under 2^63 (at the
    default unit=1e9 that allows ~5·10^8 nodes — far above any
    domain-graph cardinality; pass a smaller ``unit`` for document
    graphs beyond that). ANSI mode would also throw mid-iteration, but
    the precondition names the fix.

    ``owned_rdds``: pass a list to receive the localCheckpoint RDD
    handles for per-owner cleanup (``dedup.unpersist_owned``) after
    the RESULT has been consumed — the returned frame is itself a
    checkpoint, so unpersisting before the final action loses it.
    """
    from timebox_spark.operators.dedup import _tracked_local_checkpoint

    if iterations < 0:
        raise ValueError("pagerank: iterations must be >= 0")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = out_degrees(e, "src")
    # edges+degree is re-scanned every iteration — checkpoint ONCE so
    # each round reads materialized blocks, not the derivation.
    edges_deg = _tracked_local_checkpoint(
        e.join(deg, "src"), owned_rdds
    )
    nodes = _tracked_local_checkpoint(nodes, owned_rdds)
    dangling = _tracked_local_checkpoint(
        nodes.join(deg.select(F.col("src").alias("node")), "node", "left_anti"),
        owned_rdds,
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank"))
    if n_nodes * unit > (2**63 - 1) // max(damping_num, 1):
        raise ValueError(
            f"pagerank: n_nodes·unit·damping_num = "
            f"{n_nodes}·{unit}·{damping_num} would overflow BIGINT — "
            f"pass a smaller unit (rank resolution) for this graph size"
        )
    base = (unit * (damping_den - damping_num)) // damping_den
    ranks = nodes.select(
        "node", F.lit(int(unit)).cast("long").alias("rank")
    )
    for _ in range(iterations):
        contrib = (
            edges_deg.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"(rank * {damping_num}) DIV ({damping_den} * deg)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        # pot/n via double would lose exactness past 2^53 — use DIV.
        pot = (
            ranks.join(dangling, "node", "left_semi")
            .agg(
                F.coalesce(
                    F.sum(
                        F.expr(f"(rank * {damping_num}) DIV {damping_den}")
                    ),
                    F.lit(0).cast("long"),
                ).alias("pot")
            )
            .select(F.expr(f"pot DIV {n_nodes}").alias("share"))
        )
        ranks = _tracked_local_checkpoint(
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(pot))  # 1-row scalar, repo convention
            .select(
                "node",
                (
                    F.lit(int(base)).cast("long")
                    + F.col("share")
                    + F.coalesce(F.col("in_sum"), F.lit(0).cast("long"))
                ).alias("rank"),
            ),
            owned_rdds,
        )
    return ranks


def duckdb_pagerank_sql(
    edges_sql: str,
    iterations: int = 10,
    damping_num: int = DAMPING_NUM,
    damping_den: int = DAMPING_DEN,
    unit: int = RANK_UNIT,
) -> str:
    """DuckDB oracle for :func:`pagerank`, UNROLLED as one
    MATERIALIZED CTE per iteration (the q68 lesson: DuckDB inlines
    CTEs by default, and an iterative chain re-evaluated per step is
    quadratic; AS MATERIALIZED pins each round to run once). The SQL
    is rendered from the SAME constants as the Spark loop — repo
    oracle convention — so ranks compare bit-for-bit. ``edges_sql``
    must select columns (src, dst). ``//`` is DuckDB floor division,
    matching Spark's DIV on the non-negative operands used here.
    Yields SELECT (node, rank)."""
    dn, dd = damping_num, damping_den
    base = (unit * (dd - dn)) // dd
    parts = [
        f"__e AS MATERIALIZED (SELECT src, dst FROM ({edges_sql}))",
        "__deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM __e GROUP BY src)",
        "__ed AS MATERIALIZED (SELECT e.src, e.dst, d.deg FROM __e e JOIN __deg d ON e.src = d.src)",
        "__nodes AS MATERIALIZED (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM __e UNION SELECT dst FROM __e))",
        "__n AS MATERIALIZED (SELECT count(*) AS cnt FROM __nodes)",
        f"__pr0 AS MATERIALIZED (SELECT node, CAST({unit} AS BIGINT) AS rank FROM __nodes)",
    ]
    for i in range(1, iterations + 1):
        p = f"__pr{i - 1}"
        parts.append(
            f"""__pr{i} AS MATERIALIZED (
  SELECT n.node,
         CAST({base} AS BIGINT) + d.share + COALESCE(c.in_sum, 0) AS rank
  FROM __nodes n
  LEFT JOIN (
    SELECT e.dst AS node, SUM((p.rank * {dn}) // ({dd} * e.deg)) AS in_sum
    FROM __ed e JOIN {p} p ON e.src = p.node
    GROUP BY e.dst
  ) c ON n.node = c.node
  CROSS JOIN (
    SELECT COALESCE(SUM((p.rank * {dn}) // {dd}), 0)
           // (SELECT cnt FROM __n) AS share
    FROM {p} p ANTI JOIN __deg g ON p.node = g.src
  ) d
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, rank FROM __pr{iterations}"
    )
