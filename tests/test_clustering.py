"""Connected-components clustering vs a driver-side union-find."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from timebox_spark.operators import dedup
from timebox_spark.plans.tables import load


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_connected_components_matches_union_find(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (3, 4)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == _union_find(edges)


def test_dedup_clusters_on_documents(spark):
    docs = load(spark, SF_SMOKE, "documents")
    pairs = dedup.minhash_dedup(docs, threshold=0.35)
    clusters = dedup.dedup_clusters(docs, pairs)
    # every doc appears exactly once; canonical <= member id
    assert clusters.count() == docs.count()
    bad = clusters.filter(F.col("canonical_id") > F.col("doc_id")).count()
    assert bad == 0
    # cluster assignment agrees with union-find on the same pairs
    edge_list = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    uf = _union_find(edge_list)
    got = {r["doc_id"]: r["canonical_id"] for r in clusters.collect()}
    for node, root in uf.items():
        assert got[node] == root


def test_minhash_prefilter_preserves_results(spark):
    docs = load(spark, SF_SMOKE, "documents")
    plain = dedup.minhash_dedup(docs, threshold=0.35)
    screened = dedup.minhash_dedup(docs, threshold=0.35, estimate_margin=0.25)
    a = sorted((r["id_a"], r["id_b"]) for r in plain.collect())
    b = sorted((r["id_a"], r["id_b"]) for r in screened.collect())
    assert a == b and len(a) > 0


def test_ngram_contamination_semantics(spark):
    """Docs sharing a 12-gram with the probe set are flagged with the
    exact distinct-overlap count; clean docs are not."""
    from timebox_spark.operators.dedup import ngram_contamination

    probes = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (10, "i saw the quick brown fox yesterday morning"),  # overlap
            (11, "completely unrelated text about spark plans"),  # clean
            (12, "the quick brown fox jumps over the lazy dog"),  # verbatim
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["n_overlap"]
        for r in ngram_contamination(docs, probes, shingle_n=12).collect()
    }
    assert 11 not in rows
    assert rows[10] >= 1
    # the verbatim copy shares every probe shingle
    norm = "the quick brown fox jumps over the lazy dog"
    assert rows[12] == len(set(norm[i : i + 12] for i in range(len(norm) - 11)))
