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


# the amplified-relational skew knobs: in every non-base copy, ~30% of
# event rows collapse onto one hot user and ~2% of lineitem rows keep
# their BASE orderkey — so those keys grow linearly with the factor and
# the q59 fact-fact join sees genuinely skewed build sides (the case
# AQE skew splitting / operators/skew.py exist for)
HOT_USER = 7
EVENT_SKEW_MOD, EVENT_SKEW_HITS = 10, 3
LINEITEM_HOT_EVERY = 50


def amplified_events(events: DataFrame, factor: int = 10) -> DataFrame:
    """factor× events: fresh event_ids, same timestamp distribution
    (duplicate timestamps stress the as-of dedup path), skewed users."""
    copies = [events]
    for k in range(1, factor):
        copies.append(
            events.withColumn(
                "event_id", F.col("event_id") + F.lit(k * ID_STRIDE)
            ).withColumn(
                "user_id",
                F.when(
                    F.pmod(F.col("user_id"), F.lit(EVENT_SKEW_MOD))
                    < EVENT_SKEW_HITS,
                    F.lit(HOT_USER).cast("long"),
                ).otherwise(F.col("user_id") + F.lit(k * 1000)),
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def amplified_orders_lineitem(
    orders: DataFrame, lineitem: DataFrame, factor: int = 10
) -> tuple[DataFrame, DataFrame]:
    """factor× fact-fact pair with consistent join keys: copy k's
    orders get fresh orderkeys; its lineitem rows follow, EXCEPT every
    ``LINEITEM_HOT_EVERY``-th orderkey, which keeps the base key — the
    base orders' rows accumulate factor× lineitem fan-out (hot keys).
    o_custkey is left alone so the broadcast customer dim still
    matches every copy."""
    ocopies, lcopies = [orders], [lineitem]
    for k in range(1, factor):
        ocopies.append(
            orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(k * ID_STRIDE)
            )
        )
        lcopies.append(
            lineitem.withColumn(
                "l_orderkey",
                F.when(
                    F.pmod(F.col("l_orderkey"), F.lit(LINEITEM_HOT_EVERY)) == 0,
                    F.col("l_orderkey"),
                ).otherwise(F.col("l_orderkey") + F.lit(k * ID_STRIDE)),
            )
        )
    o, li = ocopies[0], lcopies[0]
    for c in ocopies[1:]:
        o = o.unionByName(c)
    for c in lcopies[1:]:
        li = li.unionByName(c)
    return o, li


def amplify_sf_dir(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    factor: int = 10,
    exact_copy_every: int = 20,
) -> str:
    """Write factor× documents/embeddings (LLM path) and factor×
    events/orders/lineitem (relational path, skewed keys) into
    ``out_dir``, symlinking every other base table so ANY driver query
    runs unmodified against the amplified dir (idempotent per file)."""
    from timebox_spark.plans.tables import load

    os.makedirs(out_dir, exist_ok=True)

    def write(name: str, df_fn) -> None:
        path = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(path):
            df_fn().write.mode("overwrite").parquet(path)

    write(
        "documents",
        lambda: amplified_documents(
            load(spark, sf_dir, "documents"), factor, exact_copy_every
        ),
    )
    write(
        "embeddings",
        lambda: amplified_embeddings(load(spark, sf_dir, "embeddings"), factor),
    )
    write(
        "events",
        lambda: amplified_events(load(spark, sf_dir, "events"), factor),
    )
    if not os.path.exists(
        os.path.join(out_dir, "orders.parquet")
    ) or not os.path.exists(os.path.join(out_dir, "lineitem.parquet")):
        o, li = amplified_orders_lineitem(
            load(spark, sf_dir, "orders"),
            load(spark, sf_dir, "lineitem"),
            factor,
        )
        write("orders", lambda: o)
        write("lineitem", lambda: li)
    for name in ("region", "nation", "customer", "supplier", "part"):
        dst = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(sf_dir, f"{name}.parquet"), dst)
    return out_dir
