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
    weight: str | None = None,
    seeds: DataFrame | None = None,
    owned_rdds: list | None = None,
    residuals: list | None = None,
    tol_ticks: int | None = None,
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

    ``weight`` names an edge column of POSITIVE INTEGERS (e.g. link
    counts between domains — the aggregated form of a multigraph):
    the out-flow splits proportionally, each edge contributing
    ``(rank_s · dn · w) DIV (dd · W_s)`` with W_s the source's weight
    sum. Unweighted is exactly the weighted form at w = 1. Weights
    are validated up front (loud raise on NULL/< 1; the column must
    already be an integral type — fractional weights should be
    pre-scaled to integers by the caller, preserving exactness).

    ``seeds`` switches to PERSONALIZED PageRank — the topic-focused
    curation variant (rank domains by proximity to a trusted seed
    set): a one-column DataFrame of seed nodes; the per-round
    teleport mass ``(n_nodes·unit·(dd−dn)) DIV dd`` and the dangling
    pot then flow ONLY to seeds, split evenly (integer DIV n_seeds),
    so mass concentrates on the seeds' link neighborhoods and
    unreachable nodes decay toward 0. Seed nodes absent from the
    edge list still participate (added to the node set); an empty
    seed set raises. The uniform path is untouched — its arithmetic
    (and oracle) stays bit-identical.

    Nodes = distinct(src) ∪ distinct(dst); parallel edges contribute
    once EACH (multigraph semantics — dedup first for simple
    graphs); self-loops are ordinary edges. Deterministic on any
    engine/partitioning: integer sums are exact and floor division is
    defined, so the DuckDB oracle (``duckdb_pagerank_sql``) matches
    bit-for-bit.

    Overflow is checked loudly up front: the theoretical rank bound is
    total mass n_nodes·unit, and the hottest intermediate is
    ``rank·dn·w``, so n_nodes·unit·dn·max_w must stay under 2^63 (at
    the default unit=1e9 that allows ~5·10^8 unweighted nodes — far
    above any domain-graph cardinality; pass a smaller ``unit`` for
    document graphs or heavy weights beyond that). ANSI mode would
    also throw mid-iteration, but the precondition names the fix.

    ``owned_rdds``: pass a list to receive the localCheckpoint RDD
    handles for per-owner cleanup (``dedup.unpersist_owned``) after
    the RESULT has been consumed — the returned frame is itself a
    checkpoint, so unpersisting before the final action loses it.
    With ``owned_rdds=None`` every internal checkpoint is released
    on success EXCEPT the one backing the result (and all of them on
    a raise); that final block stays persisted for the session —
    pass a list when you need to reclaim it too.

    ``residuals`` (round-15 verdict task 4 — the convergence signal):
    pass a list to receive, per completed round, the INTEGER L1 rank
    delta ``Σ|rank_i − rank_{i−1}|`` in ticks — exact (integer sums
    are order-independent), monotone-decaying in practice, and the
    number an operator reads to pick ``iterations`` for a new graph
    instead of guessing. Costs one O(nodes) join+agg per round, only
    when requested. ``tol_ticks`` adds EARLY EXIT: the loop stops
    after the first round whose delta is ≤ ``tol_ticks`` (that
    round's ranks are returned; ``iterations`` stays the hard cap —
    if the cap is hit first, the last residual tells the caller
    whether the run converged or was truncated, the CLAUDE.md
    final-probe rule applied to a tolerance). The driver's q31
    members pass neither, so their fixed-N oracle arithmetic is
    untouched.
    """
    from timebox_spark.operators.dedup import (
        _tracked_local_checkpoint,
        unpersist_owned,
    )

    if iterations < 0:
        raise ValueError("pagerank: iterations must be >= 0")
    # leak guard (round-15 advisor): validations below (weight
    # values, overflow bound) run AFTER the eager checkpoints — with
    # owned_rdds=None a raise would leak the persisted blocks for the
    # session lifetime. Track internally and unpersist on ANY raise
    # when no caller owns the lifecycle; callers that do own it
    # unpersist in their own finally.
    _own = owned_rdds if owned_rdds is not None else []
    try:
        return _pagerank_body(
            edges, src, dst, iterations, damping_num, damping_den,
            unit, weight, seeds, _own, residuals, tol_ticks,
            cleanup=owned_rdds is None,
        )
    except BaseException:
        if owned_rdds is None:
            unpersist_owned(_own)
        raise


def _release_all_but(owned: list, keep) -> None:
    """Unpersist every tracked checkpoint RDD except ``keep`` (the one
    backing the returned frame — a local checkpoint severs lineage, so
    its blocks must outlive the caller's consuming action). Success-
    path counterpart of the raise guard (round-15 advisor: with
    owned_rdds=None the internal list was dropped untracked and every
    per-iteration block stayed persisted for the session lifetime)."""
    for r in owned:
        if r is not keep:
            r.unpersist(False)
    owned[:] = [keep] if keep is not None else []


def _pagerank_body(
    edges: DataFrame,
    src: str,
    dst: str,
    iterations: int,
    damping_num: int,
    damping_den: int,
    unit: int,
    weight: str | None,
    seeds: DataFrame | None,
    owned_rdds: list,
    residuals: list | None = None,
    tol_ticks: int | None = None,
    cleanup: bool = False,
) -> DataFrame:
    from timebox_spark.operators.dedup import _tracked_local_checkpoint

    w_col = F.col(weight) if weight is not None else F.lit(1)
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        w_col.cast("long").alias("w"),
    )
    if weight is not None:
        wtype = dict(edges.dtypes).get(weight, "")
        if wtype not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"pagerank: weight column {weight!r} has type {wtype} "
                f"— weights must be positive INTEGERS (pre-scale "
                f"fractional weights; float arithmetic would break the "
                f"exact fixed-point guarantee)"
            )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds_df = None
    n_seeds = 0
    if seeds is not None:
        seeds_df = seeds.select(
            F.col(seeds.columns[0]).alias("node")
        ).distinct()
        # loud validation, the weight-column rule (round-14 review): a
        # NULL seed would join nothing (excluded from n_seeds) yet add
        # a phantom NULL node feeding the dangling pot — and diverge
        # from an oracle whose count(*) includes it
        if seeds_df.filter(F.col("node").isNull()).limit(1).count():
            raise ValueError(
                "pagerank: seeds contain NULL — a NULL seed receives "
                "no teleport mass and adds a phantom node; drop NULLs "
                "before seeding"
            )
        n_seeds = seeds_df.count()
        if n_seeds == 0:
            raise ValueError(
                "pagerank: seeds produced an empty seed set — "
                "personalized teleport mass has nowhere to go"
            )
        # seed nodes outside the edge list still receive teleport mass
        nodes = nodes.unionByName(seeds_df).distinct()
    deg = e.groupBy("src").agg(F.sum("w").alias("wsum"))
    # edges+degree is re-scanned every iteration — checkpoint ONCE so
    # each round reads materialized blocks, not the derivation.
    edges_deg = _tracked_local_checkpoint(
        e.join(deg, "src"), owned_rdds
    )
    nodes = _tracked_local_checkpoint(nodes, owned_rdds)
    # the zero-iteration and empty-graph returns project over THIS
    # checkpoint — the success-path cleanup must keep it
    nodes_rdd = owned_rdds[-1]
    dangling = _tracked_local_checkpoint(
        nodes.join(deg.select(F.col("src").alias("node")), "node", "left_anti"),
        owned_rdds,
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        if cleanup:
            _release_all_but(owned_rdds, nodes_rdd)
        return nodes.select("node", F.lit(0).cast("long").alias("rank"))
    wrow = e.agg(
        F.min("w").alias("min_w"), F.max("w").alias("max_w")
    ).collect()[0]
    min_w = wrow["min_w"] if wrow["min_w"] is not None else 1
    max_w = wrow["max_w"] if wrow["max_w"] is not None else 1
    if weight is not None and (
        min_w < 1 or e.filter(F.col("w").isNull()).limit(1).count()
    ):
        raise ValueError(
            f"pagerank: weight column {weight!r} carries NULL or "
            f"non-positive values (min {min_w}) — weights must be "
            f">= 1 (a zero/negative out-flow is undefined; drop or "
            f"clamp such edges first)"
        )
    if n_nodes * unit > (2**63 - 1) // max(damping_num * max_w, 1):
        raise ValueError(
            f"pagerank: n_nodes·unit·damping_num·max_w = "
            f"{n_nodes}·{unit}·{damping_num}·{max_w} would overflow "
            f"BIGINT — pass a smaller unit (rank resolution) for this "
            f"graph/weight size"
        )
    base = (unit * (damping_den - damping_num)) // damping_den
    ranks = nodes.select(
        "node", F.lit(int(unit)).cast("long").alias("rank")
    )
    if seeds_df is not None:
        flagged = _tracked_local_checkpoint(
            nodes.join(
                seeds_df.withColumn("__seed", F.lit(True)), "node", "left"
            ),
            owned_rdds,
        )
        # whole-graph teleport mass, split over the seeds only
        # (n_seeds counted and validated up front, before the empty-
        # graph early return — round-14 review)
        ts = ((n_nodes * unit * (damping_den - damping_num))
              // damping_den) // n_seeds

    def _contrib(r):
        return (
            edges_deg.join(
                r.select(F.col("node").alias("src"), "rank"), "src"
            )
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"(rank * {damping_num} * w) DIV ({damping_den} * wsum)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )

    def _pot(r, divisor):
        # pot/n via double would lose exactness past 2^53 — use DIV.
        return (
            r.join(dangling, "node", "left_semi")
            .agg(
                F.coalesce(
                    F.sum(
                        F.expr(f"(rank * {damping_num}) DIV {damping_den}")
                    ),
                    F.lit(0).cast("long"),
                ).alias("pot")
            )
            .select(F.expr(f"pot DIV {divisor}").alias("share"))
        )

    track = residuals is not None or tol_ticks is not None
    for _ in range(iterations):
        prev = ranks
        if seeds_df is None:
            ranks = _tracked_local_checkpoint(
                nodes.join(_contrib(ranks), "node", "left")
                # 1-row scalar, repo convention
                .crossJoin(F.broadcast(_pot(ranks, n_nodes)))
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
        else:
            ranks = _tracked_local_checkpoint(
                flagged.join(_contrib(ranks), "node", "left")
                .crossJoin(F.broadcast(_pot(ranks, n_seeds)))
                .select(
                    "node",
                    (
                        F.when(
                            F.col("__seed"),
                            F.lit(int(ts)).cast("long") + F.col("share"),
                        ).otherwise(F.lit(0).cast("long"))
                        + F.coalesce(F.col("in_sum"), F.lit(0).cast("long"))
                    ).alias("rank"),
                ),
                owned_rdds,
            )
        if track:
            # exact integer L1 delta — both sides are checkpoints, so
            # this is one O(nodes) join+agg, no lineage growth; the
            # node sets are identical by construction (both derive
            # from `nodes`), so an inner join loses nothing
            delta = (
                ranks.join(
                    prev.select(
                        "node", F.col("rank").alias("__prev")
                    ),
                    "node",
                )
                .agg(
                    F.coalesce(
                        F.sum(F.abs(F.col("rank") - F.col("__prev"))),
                        F.lit(0).cast("long"),
                    ).alias("d")
                )
                .collect()[0]["d"]
            )
            if residuals is not None:
                residuals.append(int(delta))
            if tol_ticks is not None and delta <= tol_ticks:
                break
    if cleanup:
        # the final ranks IS the last tracked checkpoint (or, with
        # iterations=0, a projection over the nodes checkpoint) —
        # release everything else now that no return path needs it
        _release_all_but(
            owned_rdds, owned_rdds[-1] if iterations > 0 else nodes_rdd
        )
    return ranks


def duckdb_pagerank_sql(
    edges_sql: str,
    iterations: int = 10,
    damping_num: int = DAMPING_NUM,
    damping_den: int = DAMPING_DEN,
    unit: int = RANK_UNIT,
    weighted: bool = False,
    seeds_sql: str | None = None,
) -> str:
    """DuckDB oracle for :func:`pagerank`, UNROLLED as one
    MATERIALIZED CTE per iteration (the q68 lesson: DuckDB inlines
    CTEs by default, and an iterative chain re-evaluated per step is
    quadratic; AS MATERIALIZED pins each round to run once). The SQL
    is rendered from the SAME constants as the Spark loop — repo
    oracle convention — so ranks compare bit-for-bit. ``edges_sql``
    must select columns (src, dst) — plus an integer weight column
    ``w`` when ``weighted=True`` (the unweighted form is w = 1).
    ``seeds_sql`` (one column ``node``) renders the PERSONALIZED
    variant: teleport mass and dangling pot flow only to seeds,
    ``// n_seeds``. ``//`` is DuckDB floor division, matching Spark's
    DIV on the non-negative operands used here. Yields SELECT
    (node, rank)."""
    dn, dd = damping_num, damping_den
    base = (unit * (dd - dn)) // dd
    w_sel = "w" if weighted else "1 AS w"
    node_src = (
        "SELECT src AS node FROM __e UNION SELECT dst FROM __e"
        if seeds_sql is None
        else "SELECT src AS node FROM __e UNION SELECT dst FROM __e "
        "UNION SELECT node FROM __seeds"
    )
    parts = [
        f"__e AS MATERIALIZED (SELECT src, dst, {w_sel} FROM ({edges_sql}))",
        "__deg AS MATERIALIZED (SELECT src, SUM(w) AS wsum FROM __e GROUP BY src)",
        "__ed AS MATERIALIZED (SELECT e.src, e.dst, e.w, d.wsum FROM __e e JOIN __deg d ON e.src = d.src)",
    ]
    if seeds_sql is not None:
        parts.append(
            f"__seeds AS MATERIALIZED (SELECT DISTINCT node FROM ({seeds_sql}))"
        )
    parts += [
        f"__nodes AS MATERIALIZED (SELECT DISTINCT node FROM ({node_src}))",
        "__n AS MATERIALIZED (SELECT count(*) AS cnt FROM __nodes)",
        f"__pr0 AS MATERIALIZED (SELECT node, CAST({unit} AS BIGINT) AS rank FROM __nodes)",
    ]
    if seeds_sql is not None:
        parts.append(
            "__ns AS MATERIALIZED (SELECT count(*) AS cnt FROM __seeds)"
        )
        # whole-graph teleport mass split over seeds, all integer
        parts.append(
            f"__ts AS MATERIALIZED (SELECT "
            f"(((SELECT cnt FROM __n) * {unit} * {dd - dn}) // {dd}) "
            f"// (SELECT cnt FROM __ns) AS ts)"
        )
        rank_expr = (
            "CASE WHEN s.node IS NOT NULL THEN "
            "(SELECT ts FROM __ts) + d.share ELSE 0 END "
            "+ COALESCE(c.in_sum, 0)"
        )
        seed_join = "LEFT JOIN __seeds s ON n.node = s.node"
        pot_div = "(SELECT cnt FROM __ns)"
    else:
        rank_expr = f"CAST({base} AS BIGINT) + d.share + COALESCE(c.in_sum, 0)"
        seed_join = ""
        pot_div = "(SELECT cnt FROM __n)"
    for i in range(1, iterations + 1):
        p = f"__pr{i - 1}"
        parts.append(
            f"""__pr{i} AS MATERIALIZED (
  SELECT n.node,
         {rank_expr} AS rank
  FROM __nodes n
  {seed_join}
  LEFT JOIN (
    SELECT e.dst AS node, SUM((p.rank * {dn} * e.w) // ({dd} * e.wsum)) AS in_sum
    FROM __ed e JOIN {p} p ON e.src = p.node
    GROUP BY e.dst
  ) c ON n.node = c.node
  CROSS JOIN (
    SELECT COALESCE(SUM((p.rank * {dn}) // {dd}), 0)
           // {pot_div} AS share
    FROM {p} p ANTI JOIN __deg g ON p.node = g.src
  ) d
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, rank FROM __pr{iterations}"
    )
