"""LLM training-corpus curation walkthrough: the standard pre-training
data flow, end to end, on the engine's operators.

    documents ──ann──▶ lang/quality/tokens ──gate──▶ kept
        ──dedup(exact fp)──▶ unique ──split──▶ train/val/test
        ──shuffle_shards──▶ seeded-shuffled export shards
    plus: minhash near-dup clusters and IVF similarity probes on the
    embeddings table.

Run: python examples/curate_corpus.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from timebox_spark.operators import dedup, pipeline, similarity
from timebox_spark.plans.tables import load
from timebox_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="curate-example")

    docs = load(spark, sf_dir, "documents")

    # 1. curate: annotate -> gate -> exact-dedup -> split (one shuffle)
    curated = pipeline.curate(docs, langs=("en",), min_quality_q=500_000)
    print("curated per split:")
    curated.groupBy("split").count().orderBy("split").show()

    # 2. fuzzy dedup on what survived: minhash near-dup clusters
    pairs = dedup.minhash_dedup(docs, threshold=0.35)
    clusters = dedup.dedup_clusters(docs, pairs)
    n_clustered = clusters.groupBy("canonical_id").count().filter("count > 1")
    print(f"near-dup clusters (>1 member): {n_clustered.count()}")

    # 3. training export: deterministic seeded shuffle into shards —
    # writer = repartition(shard) + sortWithinPartitions(shuffle_h)
    from timebox_spark.operators.sampling import shuffle_shards

    sharded = shuffle_shards(docs, key="doc_id", n_shards=4)
    print("export shard sizes (reproducible on any engine):")
    sharded.groupBy("shard").count().orderBy("shard").show()

    # 4. similarity probe: IVF ANN over the embeddings table
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    print("IVF top-3 neighbors for 3 probe vectors:")
    similarity.ivf_topk(emb, probes, k=3, nlist=16, nprobe=6).orderBy(
        "query_id", "rank"
    ).show()

    # 5. mixture rebalancing: sample head languages down to ~sqrt mix
    from timebox_spark.operators.sampling import mixture_sample

    print("language mix before/after temperature rebalancing:")
    docs.groupBy("lang").count().orderBy("lang").show()
    mixture_sample(docs, group_col="lang").groupBy("lang").count().orderBy(
        "lang"
    ).show()

    # 6. model-style quality signals: classifier score, perplexity,
    # and the first BPE merge candidates
    from timebox_spark.operators import text

    print("classifier top-5 and most-LM-typical top-5 docs:")
    text.classifier_topk(docs, k=5).show()
    text.perplexity_topk(docs, k=5).show()
    print("top BPE merge-pair candidates:")
    text.bpe_pair_counts(docs).show(5)

    # 7. contrastive training: hardest different-label negatives, and
    # the int8-compressed retrieval that would serve them at scale
    print("hard negatives for 3 probes (closest different-label):")
    similarity.portable_hard_negatives(emb, probes, k=3).orderBy(
        "query_id", "rank"
    ).show()
    print("same probes in the int8 compressed domain:")
    similarity.portable_int8_topk(emb, probes, k=3).orderBy(
        "query_id", "rank"
    ).show()

    # 8. line-level dedup (RefinedWeb): drop lines repeated across
    # documents, keep the rest in order — pseudo-lines of 8 tokens
    # since this corpus is single-line (real corpora: F.split('\n'))
    ld = dedup.line_dedup(docs, dedup.chunk_lines("text", 8))
    print("line dedup (pseudo-lines): lines kept vs total:")
    ld.agg(
        F.sum("n_lines").alias("total_lines"),
        F.sum("n_kept").alias("kept_lines"),
        F.sum((F.col("n_kept") == 0).cast("long")).alias("docs_emptied"),
    ).show()

    # 9. tokenizer training: full iterative BPE (merge list is the
    # tokenizer artifact; apply_bpe tokenizes the corpus with it)
    merges, _ = text.bpe_train(docs, n_merges=6)
    print(f"learned BPE merges: {[(a, b) for a, b, _ in merges]}")
    toks = docs.select(F.explode(text.apply_bpe("text", merges)).alias("t"))
    print("post-merge corpus tokens:", toks.count())

    # 10. DSIR data selection: raw docs that look most like the 'en'
    # slice (hashed-n-gram importance resampling)
    print("DSIR top-5 target-lookalike docs:")
    text.dsir_topk(docs, docs.filter(F.col("lang") == "en"), k=5).show()

    # 11. the dataset datasheet a curation run publishes with its output
    print("data card (exact corpus summary):")
    pipeline.data_card(docs).orderBy("section", "key").show(12)

    # 12. the capstone: one call from raw corpus to written training
    # shards (curate -> train split -> sorted shard files + manifest)
    import tempfile

    out = tempfile.mkdtemp(prefix="timebox_train_export_")
    print(f"one-call corpus -> training shards at {out}:")
    pipeline.curate_to_shards(
        docs, out, n_shards=4, langs=("en", "es"), min_quality_q=0,
        min_tokens=3,
    ).show()

    # 13. token-id export: the trainer-facing artifact — BPE sub-word
    # ids through the same vocab/id path as whitespace tokens, all
    # JVM-side (map-literal lookup, zero Python in the plan)
    btoks = text.apply_bpe("text", merges)
    bvocab = text.build_vocab(docs, tokens=btoks)
    bseqs = text.tokens_to_ids(docs, bvocab, tokens=btoks)
    print("BPE token-id sequences (first 3 docs):")
    bseqs.orderBy("doc_id").show(3, truncate=60)

    # 14. the steady-state ingest loop: disk-backed corpus + persisted
    # fingerprint/near-dup-index state, one compaction cycle per
    # arriving batch — corpus text is never re-read
    from timebox_spark.streaming import ingest

    store = tempfile.mkdtemp(prefix="timebox_ingest_store_")
    half = docs.select("doc_id", "text")
    b0 = half.filter(F.col("doc_id") % 2 == 1)
    b1 = half.filter(F.col("doc_id") % 2 == 0)
    n0 = ingest.run_ingest_cycle(b0, store, 0)
    n1 = ingest.run_ingest_cycle(b1, store, 1)
    print(f"ingest cycles appended {n0} then {n1} docs; store at {store}")

    spark.stop()


if __name__ == "__main__":
    main()
