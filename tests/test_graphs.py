"""Fixed-point PageRank (operators/graphs.py): exact cross-engine
parity with the DuckDB renderer, dangling-mass handling, degenerate
inputs, and the overflow precondition. The driver-facing gate is the
q31 'pagerank' member (plans/suites.py), which runs the same operator
over the synthetic doc_id link graph."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from timebox_spark.operators import graphs as G
from timebox_spark.operators.dedup import unpersist_owned


def _duck_ranks(edges, iterations, **kw):
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
        con.executemany("INSERT INTO e VALUES (?, ?)", edges)
        sql = G.duckdb_pagerank_sql(
            "SELECT src, dst FROM e", iterations=iterations, **kw
        )
        return sorted(con.execute(sql).fetchall())
    finally:
        con.close()


def _spark_ranks(spark, edges, iterations, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    owned: list = []
    try:
        pr = G.pagerank(df, iterations=iterations, owned_rdds=owned, **kw)
        return sorted((r["node"], r["rank"]) for r in pr.collect())
    finally:
        unpersist_owned(owned)


def test_pagerank_matches_duckdb_bitforbit(spark):
    """Hubs, cycles, a self-loop, and dangling nodes (dst values 13..16
    never appear as src): every rank tick must match the oracle —
    integer fixed point is order-independent, so any divergence is a
    real semantics bug, not float noise."""
    edges = sorted(
        {(i % 13, (i * 31 + j) % 17) for i in range(100) for j in (1, 2)}
    )
    edges.append((5, 5))  # self-loop
    s = _spark_ranks(spark, edges, 6)
    d = _duck_ranks(edges, 6)
    assert s == d
    # mass conservation modulo floor leakage: total only ever shrinks,
    # by less than (n_edges + n_nodes) ticks per iteration
    total = sum(r for _, r in s)
    n = len(s)
    assert total <= n * G.RANK_UNIT
    assert n * G.RANK_UNIT - total < 6 * (len(edges) + n)


def test_pagerank_dangling_mass_redistributed(spark):
    """Two nodes, one edge a→b: b is dangling. Without redistribution
    b's rank would sink to the teleport floor and a would never
    recover mass; with it, a receives b's damped mass back every
    round. Pin exact values vs the oracle AND the qualitative shape
    (a's rank stays well above the teleport floor)."""
    edges = [(0, 1)]
    s = _spark_ranks(spark, edges, 8)
    d = _duck_ranks(edges, 8)
    assert s == d
    ranks = dict(s)
    floor = (G.RANK_UNIT * 3) // 20
    assert ranks[0] > floor * 2  # fed by the dangling pot
    assert ranks[1] > ranks[0]  # b gets a's whole out-flow + pot


def test_pagerank_zero_iterations_and_empty(spark):
    assert _spark_ranks(spark, [(1, 2)], 0) == [
        (1, G.RANK_UNIT),
        (2, G.RANK_UNIT),
    ]
    empty = spark.createDataFrame([], "src long, dst long")
    owned: list = []
    try:
        assert G.pagerank(empty, iterations=3, owned_rdds=owned).count() == 0
    finally:
        unpersist_owned(owned)


def test_pagerank_overflow_precondition_raises(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="overflow"):
        G.pagerank(df, iterations=1, unit=2**62)


def test_pagerank_string_nodes(spark):
    """Node type is generic — domain-ranking uses registrable domains
    as string nodes."""
    edges = [("a.com", "b.com"), ("b.com", "a.com"), ("a.com", "c.com")]
    df = spark.createDataFrame(edges, "src string, dst string")
    owned: list = []
    try:
        ranks = {
            r["node"]: r["rank"]
            for r in G.pagerank(df, iterations=5, owned_rdds=owned).collect()
        }
    finally:
        unpersist_owned(owned)
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    d = dict(
        con.execute(
            G.duckdb_pagerank_sql("SELECT src, dst FROM e", iterations=5)
        ).fetchall()
    )
    con.close()
    assert ranks == d
    assert ranks["a.com"] > ranks["c.com"]  # two in-links beat one


def test_pagerank_parallel_edges_are_multigraph(spark):
    """Parallel edges each contribute (documented); dedup first for
    simple-graph semantics — the two must differ on this graph, and
    each must match its own oracle."""
    edges = [(0, 1), (0, 1), (0, 2)]
    multi = _spark_ranks(spark, edges, 4)
    assert multi == _duck_ranks(edges, 4)
    simple_edges = sorted(set(edges))
    simple = _spark_ranks(spark, simple_edges, 4)
    assert simple == _duck_ranks(simple_edges, 4)
    assert dict(multi)[1] > dict(simple)[1]


def test_pagerank_weighted_matches_duckdb_and_semantics(spark):
    """Weighted edges split out-flow proportionally: 0→1 with w=3 and
    0→2 with w=1 must rank 1 above 2; exact ticks match the weighted
    oracle; and an all-ones weight column reproduces the unweighted
    result exactly."""
    edges = [(0, 1, 3), (0, 2, 1), (1, 0, 1), (2, 0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long, w int")
    owned: list = []
    try:
        ranks = dict(
            (r["node"], r["rank"])
            for r in G.pagerank(
                df, iterations=5, weight="w", owned_rdds=owned
            ).collect()
        )
    finally:
        unpersist_owned(owned)
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT, w INT)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", edges)
    d = dict(
        con.execute(
            G.duckdb_pagerank_sql(
                "SELECT src, dst, w FROM e", iterations=5, weighted=True
            )
        ).fetchall()
    )
    con.close()
    assert ranks == {k: int(v) for k, v in d.items()}
    assert ranks[1] > ranks[2]
    ones = df.withColumn("w", F.lit(1))
    owned2: list = []
    try:
        w1 = dict(
            (r["node"], r["rank"])
            for r in G.pagerank(
                ones, iterations=5, weight="w", owned_rdds=owned2
            ).collect()
        )
        uw = dict(
            (r["node"], r["rank"])
            for r in G.pagerank(
                ones, iterations=5, owned_rdds=owned2
            ).collect()
        )
    finally:
        unpersist_owned(owned2)
    assert w1 == uw


def test_pagerank_weight_validation(spark):
    df = spark.createDataFrame(
        [(0, 1, 0), (1, 0, 2)], "src long, dst long, w int"
    )
    with pytest.raises(ValueError, match="non-positive"):
        G.pagerank(df, iterations=1, weight="w")
    fdf = spark.createDataFrame(
        [(0, 1, 1.5)], "src long, dst long, w double"
    )
    with pytest.raises(ValueError, match="INTEGERS"):
        G.pagerank(fdf, iterations=1, weight="w")
    ndf = spark.createDataFrame(
        [(0, 1, None), (1, 0, 2)], "src long, dst long, w int"
    )
    with pytest.raises(ValueError, match="NULL"):
        G.pagerank(ndf, iterations=1, weight="w")


def test_personalized_pagerank_matches_duckdb_and_concentrates(spark):
    """Seeded teleport: mass flows only to the seed set and its link
    neighborhood — exact parity with the seeded oracle, higher rank
    near the seed than far from it, and an off-graph seed node still
    appears in the output."""
    edges = sorted(
        {(i % 13, (i * 31 + j) % 17) for i in range(100) for j in (1, 2)}
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(3,), (99,)], "node long")  # 99: off-graph
    owned: list = []
    try:
        pr = dict(
            (r["node"], r["rank"])
            for r in G.pagerank(
                df, iterations=6, seeds=seeds, owned_rdds=owned
            ).collect()
        )
    finally:
        unpersist_owned(owned)
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    d = dict(
        con.execute(
            G.duckdb_pagerank_sql(
                "SELECT src, dst FROM e",
                iterations=6,
                seeds_sql="SELECT 3 AS node UNION ALL SELECT 99",
            )
        ).fetchall()
    )
    con.close()
    assert pr == {k: int(v) for k, v in d.items()}
    assert 99 in pr  # off-graph seed participates
    # seed 3's direct successors outrank nodes with no path advantage
    succ = {t for s, t in edges if s == 3}
    non_succ_non_seed = [
        n for n in pr
        if n not in succ and n not in (3, 99) and n >= 13  # dangling tier
    ]
    assert min(pr[t] for t in succ) > max(
        (pr[n] for n in non_succ_non_seed), default=-1
    ) or not non_succ_non_seed
    # total mass stays bounded by the uniform initial mass
    assert sum(pr.values()) <= len(pr) * G.RANK_UNIT


def test_personalized_pagerank_empty_seeds_raise(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    empty = spark.createDataFrame([], "node long")
    with pytest.raises(ValueError, match="empty seed set"):
        G.pagerank(df, iterations=1, seeds=empty)


def test_personalized_pagerank_null_seed_and_empty_graph_raise(spark):
    """Round-14 review: a NULL seed must raise (it would join nothing
    yet add a phantom node), and the empty-seed raise must fire even
    when the edge list is ALSO empty (the empty-graph early return
    used to preempt it)."""
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    null_seeds = spark.createDataFrame([(None,), (1,)], "node long")
    with pytest.raises(ValueError, match="NULL"):
        G.pagerank(df, iterations=1, seeds=null_seeds)
    empty_edges = spark.createDataFrame([], "src long, dst long")
    empty_seeds = spark.createDataFrame([], "node long")
    with pytest.raises(ValueError, match="empty seed set"):
        G.pagerank(empty_edges, iterations=1, seeds=empty_seeds)
    # seeds-nonempty / edges-empty still works: seeds ARE the graph
    owned: list = []
    try:
        lone = dict(
            (r["node"], r["rank"])
            for r in G.pagerank(
                empty_edges,
                iterations=2,
                seeds=spark.createDataFrame([(7,)], "node long"),
                owned_rdds=owned,
            ).collect()
        )
    finally:
        unpersist_owned(owned)
    assert set(lone) == {7} and lone[7] > 0


def test_pagerank_residuals_and_early_exit(spark):
    """Round-15 verdict task 4: the per-round integer L1 residual is
    exact and decaying on a known graph; tol_ticks stops the loop at
    the first round at/below tolerance with ranks identical to the
    fixed-N run of that length; fixed-N results are unchanged by
    tracking."""
    from timebox_spark.operators import graphs as G
    from timebox_spark.operators.dedup import unpersist_owned

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a")],
        "src string, dst string",
    )
    own1, res = [], []
    try:
        full = {
            r["node"]: r["rank"]
            for r in G.pagerank(
                edges, iterations=8, owned_rdds=own1, residuals=res
            ).collect()
        }
    finally:
        unpersist_owned(own1)
    assert len(res) == 8
    # round 1 redistributes mass hard, the tail decays monotonically
    assert res[0] > res[-1] > 0
    assert all(b <= a for a, b in zip(res[2:], res[3:]))
    # untracked fixed-N run is bit-identical
    own2 = []
    try:
        plain = {
            r["node"]: r["rank"]
            for r in G.pagerank(edges, iterations=8, owned_rdds=own2).collect()
        }
    finally:
        unpersist_owned(own2)
    assert plain == full
    # early exit: tol at the round-5 residual stops after round 5,
    # ranks equal the fixed-5 run
    own3, res3 = [], []
    try:
        early = {
            r["node"]: r["rank"]
            for r in G.pagerank(
                edges, iterations=8, owned_rdds=own3,
                residuals=res3, tol_ticks=res[4],
            ).collect()
        }
    finally:
        unpersist_owned(own3)
    assert len(res3) == 5, res3
    own4 = []
    try:
        five = {
            r["node"]: r["rank"]
            for r in G.pagerank(edges, iterations=5, owned_rdds=own4).collect()
        }
    finally:
        unpersist_owned(own4)
    assert early == five


def test_pagerank_success_path_releases_internal_checkpoints(spark):
    """Round-15 advisor: with owned_rdds=None the internal checkpoint
    blocks must be released on SUCCESS too — all but the one backing
    the returned frame (a local checkpoint severs lineage, so that one
    must survive until the caller's action). Before the fix every
    per-iteration block stayed persisted for the session lifetime."""
    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], "src long, dst long"
    )
    pr = G.pagerank(edges, iterations=5)
    after = set(jsc.getPersistentRDDs().keySet().toArray())
    leaked = after - before
    # exactly the result-backing checkpoint survives
    assert len(leaked) == 1, leaked
    # and the returned frame is still consumable (its block was kept)
    assert pr.count() == 4
    for rid in leaked:  # leave the session clean for later tests
        jsc.getPersistentRDDs().get(rid).unpersist(False)

    # zero iterations: the result projects over the NODES checkpoint —
    # cleanup must keep that one, and the frame must still collect
    before0 = set(jsc.getPersistentRDDs().keySet().toArray())
    pr0 = G.pagerank(edges, iterations=0)
    got = {r["node"]: r["rank"] for r in pr0.collect()}
    assert got == {1: 10**9, 2: 10**9, 3: 10**9, 4: 10**9}
    leaked0 = set(jsc.getPersistentRDDs().keySet().toArray()) - before0
    assert len(leaked0) == 1, leaked0
    for rid in leaked0:
        jsc.getPersistentRDDs().get(rid).unpersist(False)
