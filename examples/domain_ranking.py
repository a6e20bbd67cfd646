"""Domain-ranking curation walkthrough: the graph tier of a crawl
pipeline, end to end on the engine's operators.

    messy URLs ──canonicalize──▶ registrable domains
        ──link graph──▶ (src_domain, dst_domain, link_count) edges
        ──PageRank──▶ exact integer ranks (uniform + seeded variants)
        ──rank filter──▶ keep docs whose domain clears the rank bar
        ──count-min──▶ corpus-horizon domain frequencies, heavy
                       hitters without rescanning text

Everything is deterministic: ranks are BIGINT fixed-point (bit-equal
on any partitioning — the property that lets the q31 driver oracle
pin them), the count-min sketch is exact integer counters.

Run: python examples/domain_ranking.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from timebox_spark.operators import graphs as G
from timebox_spark.operators import sketches as SK
from timebox_spark.operators import urls as U
from timebox_spark.operators.dedup import unpersist_owned
from timebox_spark.session import get_spark


def main() -> None:
    spark = get_spark(app_name="domain-ranking-example")

    # --- a small synthetic crawl: docs with messy URLs + outlinks
    docs = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("HTTP://WWW.Site"),
            (F.col("id") % 20).cast("string"),
            F.lit("-news.COM/p/"),
            F.col("id").cast("string"),
            F.lit("?utm_source=feed"),
        ).alias("url"),
        # each doc links to two other sites (a hub-ish pattern)
        F.array(
            F.concat(
                F.lit("http://site"),
                ((F.col("id") * 7 + 1) % 20).cast("string"),
                F.lit("-news.com/x"),
            ),
            F.concat(
                F.lit("http://site"),
                ((F.col("id") * 3 + 2) % 23).cast("string"),  # some targets
                F.lit("-news.com/y"),                         # never link out
            ),
        ).alias("outlinks"),
    )

    # --- canonical domains for the page and its outlinks
    dom = U.registrable_domain(U.url_host("url"))
    edges = (
        docs.select(
            dom.alias("src"),
            F.explode("outlinks").alias("out_url"),
        )
        .select(
            "src",
            U.registrable_domain(U.url_host("out_url")).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("int").alias("w"))
    )

    # --- uniform weighted PageRank over the domain graph
    owned: list = []
    try:
        ranks = G.pagerank(edges, iterations=8, weight="w", owned_rdds=owned)
        top = ranks.orderBy(F.desc("rank")).limit(5).collect()
        print("top domains by rank:")
        for r in top:
            print(f"  {r['node']:<28} {r['rank']}")

        # --- personalized: teleport only to a trusted seed domain
        seeds = spark.createDataFrame(
            [("site1-news.com",)], "node string"
        )
        pranks = G.pagerank(
            edges, iterations=8, weight="w", seeds=seeds, owned_rdds=owned
        )
        ptop = pranks.orderBy(F.desc("rank")).limit(5).collect()
        print("top domains by seeded rank (trust site1):")
        for r in ptop:
            print(f"  {r['node']:<28} {r['rank']}")

        # --- rank-gated corpus through the production pipeline
        # (round 15: the gate is a first-class curate stage — one
        # broadcast join keyed on the doc's registrable domain,
        # applied with the other filters before dedup)
        bar = sorted(r["rank"] for r in ranks.collect())[
            max(0, ranks.count() // 5)
        ]
        docs_txt = docs.withColumn(
            "text",
            F.concat(
                F.lit("the quick brown fox story number "),
                F.col("doc_id").cast("string"),
                F.lit(" with some more english words in the body"),
            ),
        )
        from timebox_spark.operators import pipeline

        kept = pipeline.curate(
            docs_txt, langs=("en",), min_quality_q=0, min_tokens=3,
            url_col="url", rank_gate=(ranks, bar),
        )
        print(f"rank gate at {bar}: kept {kept.count()} of {docs.count()} docs")
    finally:
        unpersist_owned(owned)

    # --- count-min: persistable domain-frequency sketch + heavy hitters
    cms = SK.cms_build(docs.select(dom.alias("d")), "d", width=128, depth=4)
    cands = docs.select(dom.alias("d")).distinct().withColumn(
        "cid", F.monotonically_increasing_id()
    )
    hh = SK.cms_heavy_hitters(
        cands, "cid", "d", cms, min_count=15, width=128, depth=4
    )
    print(f"domains with >=15 docs (sketched, no rescan): {hh.count()}")

    spark.stop()


if __name__ == "__main__":
    main()
