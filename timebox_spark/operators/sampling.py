"""Deterministic sampling / dataset splitting for training pipelines.

Random sampling is engine- and partitioning-dependent; training-data
pipelines need splits that are REPRODUCIBLE and stable under
re-partitioning, backfills, and engine swaps. These operators derive
buckets from md5 of a stable key, so the same row lands in the same
split on any engine (the DuckDB oracle reproduces them exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from md5 of the key's string
    form — engine-portable (md5 is standardized; xxhash/murmur seeds
    are not)."""
    c = F.col(key) if isinstance(key, str) else key
    hex8 = F.substring(F.md5(F.encode(c.cast("string"), "UTF-8")), 1, 8)
    return (F.conv(hex8, 16, 10).cast("long") % F.lit(buckets)).alias("bucket")


def deterministic_split(
    df: DataFrame,
    key: str,
    weights: dict[str, int] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash bucket, e.g.
    {'train': 80, 'val': 10, 'test': 10} (percentages, sum 100)."""
    weights = weights or {"train": 80, "val": 10, "test": 10}
    if sum(weights.values()) != 100:
        raise ValueError("split weights must sum to 100")
    b = hash_bucket(key, 100)
    expr = None
    acc = 0
    for name, w in weights.items():
        acc += w
        cond = b < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr)


def hash_sample(df: DataFrame, key: str, rate_pct: int, buckets: int = 100) -> DataFrame:
    """Deterministic ~rate% sample: keep rows whose bucket < rate."""
    return df.filter(hash_bucket(key, buckets) < F.lit(rate_pct))


# defaults shared with the q44 DuckDB oracle (llm_queries._Q44_SQL)
SHUFFLE_SEED = "shuffle"
SHUFFLE_SHARDS = 8


def shuffle_hash(key: Column | str, seed: str = SHUFFLE_SEED) -> Column:
    """Seeded md5 permutation key: first 8 hex chars of
    md5('<seed>:<key>') as a BIGINT in [0, 2^32) — the same value on
    any engine, so the shuffle order is a property of the DATA, not
    of the job that produced it."""
    c = F.col(key) if isinstance(key, str) else key
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(seed), c.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")


# tokens per packed context window (shared with the q44 DuckDB oracle)
PACK_BUDGET = 512


def pack_sequences(
    df: DataFrame,
    key: str,
    token_col: str,
    budget: int = PACK_BUDGET,
    n_shards: int = SHUFFLE_SHARDS,
    seed: str = SHUFFLE_SEED,
    pack_col: str = "pack",
) -> DataFrame:
    """Concat-and-chunk sequence packing for training export.

    Within each shuffled shard, documents are concatenated in the
    deterministic export order (shuffle_h, key) and the resulting
    token stream is cut into fixed ``budget``-token context windows —
    the standard GPT-style pretraining layout where a document may
    span a window boundary. Each document is stamped with the pack id
    of the window its FIRST token lands in:
    ``pack = floor(tokens_before / budget)``.

    This is the split-allowed packing semantic (concatenate, then
    chunk), chosen over first-fit-no-split because it is a closed-form
    function of the running token sum — no sequential bin state, so it
    is a per-shard window cumsum on ANY engine and the assignment is
    reproducible across engines and partitionings (the DuckDB oracle
    recomputes it exactly).

    At 100 TB: one shuffle on the shard key + a keyed window cumsum —
    the SAME partitioning and in-partition sort the shard export
    already performs, so packing adds zero extra exchanges to the
    export plan. No global sort, no driver state.
    """
    from pyspark.sql import Window

    sharded = shuffle_shards(df, key, n_shards, seed)
    w = Window.partitionBy("shard").orderBy("shuffle_h", key)
    before = F.sum(token_col).over(w) - F.col(token_col)
    return sharded.withColumn(
        pack_col, F.floor(before / F.lit(budget)).cast("long")
    )


def pack_token_rows(
    seqs: DataFrame,
    key: str = "doc_id",
    ids_col: str = "ids",
    budget: int = PACK_BUDGET,
    n_shards: int = SHUFFLE_SHARDS,
    seed: str = SHUFFLE_SEED,
) -> DataFrame:
    """The MATERIALIZED training rows ``pack_sequences`` only stamps:
    (shard, pack, ids array<long>, n_tokens) — within each shuffled
    shard, documents' id sequences (``tokens_to_ids`` output) are
    concatenated in the deterministic export order and cut into
    fixed ``budget``-token windows, documents splitting across window
    boundaries (the GPT pretraining layout a data loader feeds the
    trainer verbatim). Every pack holds exactly ``budget`` ids except
    each shard's last.

    Plan: NO per-token explode — each document fans out only to the
    ≤ ceil(len/budget)+1 packs it overlaps (`sequence` over the pack
    range), contributes the `slice` of its array landing in each, and
    packs assemble with a (shard, pack)-keyed aggregation whose group
    size is bounded by ``budget`` pieces (`array_sort` on the
    stream-offset struct keeps concatenation order without a window).
    One shuffle on the shard key + one on (shard, pack), both
    bounded-row; the running-offset window is the same keyed cumsum
    the shard export already runs. Empty documents contribute
    nothing (and shift nothing). Deterministic md5 order end-to-end,
    so the q44 'packrow' oracle re-derives every row's exact id
    content."""
    from pyspark.sql import Window

    sharded = shuffle_shards(seqs, key, n_shards, seed)
    nt = F.size(ids_col).cast("long")
    w = Window.partitionBy("shard").orderBy("shuffle_h", key)
    staged = sharded.withColumn("__before", F.sum(nt).over(w) - nt)
    first_pack = F.floor(F.col("__before") / budget)
    last_pack = F.floor((F.col("__before") + nt - 1) / budget)
    spans = staged.filter(nt > 0).select(
        "shard",
        F.col("__before").alias("ord"),
        F.col(ids_col).alias("__ids"),
        F.explode(F.sequence(first_pack, last_pack)).alias("pack"),
    )
    lo = F.greatest(F.col("pack") * budget - F.col("ord"), F.lit(0))
    hi = F.least(
        (F.col("pack") + 1) * budget - F.col("ord"),
        F.size("__ids").cast("long"),
    )
    pieces = spans.select(
        "shard",
        "pack",
        "ord",
        F.slice("__ids", (lo + 1).cast("int"), (hi - lo).cast("int")).alias(
            "piece"
        ),
    )
    return (
        pieces.groupBy("shard", "pack")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ord", "piece"))
                    ),
                    lambda s: s["piece"],
                )
            ).alias("ids")
        )
        .withColumn("n_tokens", F.size("ids").cast("long"))
    )


def export_packed_shards(
    seqs: DataFrame,
    path: str,
    key: str = "doc_id",
    ids_col: str = "ids",
    budget: int = PACK_BUDGET,
    n_shards: int = SHUFFLE_SHARDS,
    seed: str = SHUFFLE_SEED,
) -> DataFrame:
    """Write ``pack_token_rows`` output as the on-disk training set:
    (shard, pack, ids, n_tokens) parquet partitioned by shard — each
    shard directory is one data-loader stream of fixed-budget rows in
    ``pack`` order. Returns the read-back DataFrame so callers can
    digest what was physically persisted."""
    packed = pack_token_rows(seqs, key, ids_col, budget, n_shards, seed)
    (
        packed.repartition("shard")
        .sortWithinPartitions("pack")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return seqs.sparkSession.read.parquet(path)


def shuffle_shards(
    df: DataFrame,
    key: str,
    n_shards: int = SHUFFLE_SHARDS,
    seed: str = SHUFFLE_SEED,
    shard_col: str = "shard",
    hash_col: str = "shuffle_h",
) -> DataFrame:
    """Deterministic corpus shuffle for training export: each row gets
    a shard in [0, n_shards) and a permutation key; the export order
    is (shard, shuffle_h, key). This is the standard "seeded global
    shuffle into N shards" every LLM data pipeline runs before
    training — expressed so the permutation is reproducible across
    engines, partitionings, and backfills (md5, not a seeded RNG).

    At 100 TB: the writer is
    ``df.repartition(n_shards, shard).sortWithinPartitions(hash_col,
    key).write...`` — one shuffle on the shard key, one in-partition
    sort per shard (the sort IS the product: within-shard order is
    what the trainer consumes). No global sort, no driver state.
    """
    h = shuffle_hash(key, seed)
    return df.withColumn(hash_col, h).withColumn(
        shard_col, F.pmod(F.col(hash_col), F.lit(n_shards)).cast("int")
    )

# temperature-mixing constants shared with the q44 DuckDB oracle
MIX_SCALE = 1_000_000
MIX_SEED = "mix"


def mixture_rates(
    df: DataFrame, group_col: str = "lang", alpha_sqrt: bool = True
) -> DataFrame:
    """Per-group keep-rate (ppm) for temperature-based domain/language
    rebalancing: rate_g ∝ n_g^(α−1) with α = 0.5, normalized so the
    SMALLEST group keeps everything. Sampling each group at rate_g
    yields an expected mixture ∝ n_g^α — the exponential-smoothing
    rebalance multilingual pipelines apply so head languages/domains
    don't drown the tail (the reference has no sampling surface at
    all, SURVEY §2.7; this is extension surface).

    rate_ppm_g = floor(MIX_SCALE · sqrt(n_min) / sqrt(n_g)).
    IEEE sqrt and division are exactly rounded, so the rate table is
    bit-identical on any engine — the DuckDB oracle recomputes it.

    Plan shape: one count aggregation (map-side combine) reduced to
    O(n_groups) rows; the unpartitioned min-window runs on that tiny
    summary table only (the repo's bucketed-carry rule allows unkeyed
    windows over reduced bucket summaries).
    """
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_total"))
    n_min = F.min("n_total").over(Window.partitionBy())
    return counts.withColumn(
        "rate_ppm",
        F.floor(
            F.sqrt(n_min.cast("double"))
            / F.sqrt(F.col("n_total").cast("double"))
            * F.lit(float(MIX_SCALE))
        ).cast("long"),
    )


def mixture_sample(
    df: DataFrame,
    group_col: str = "lang",
    key: str = "doc_id",
    seed: str = MIX_SEED,
) -> DataFrame:
    """Deterministic temperature-rebalanced corpus sample: keep a row
    iff md5('<seed>:<key>') % MIX_SCALE < rate_ppm(group). Membership
    is a pure function of (key, group counts) — stable across engines,
    partitionings, and backfills, like every sampler in this module.

    At 100 TB: the rate table is O(n_groups) rows and broadcast; the
    filter is map-only. One count-aggregation pass + one map-only
    filtered scan — no data-sized shuffle anywhere.
    """
    rates = mixture_rates(df, group_col)
    h = shuffle_hash(key, seed) % F.lit(MIX_SCALE)
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(h < F.col("rate_ppm"))
        .drop("n_total", "rate_ppm")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str = "doc_id",
    n_shards: int = SHUFFLE_SHARDS,
    seed: str = SHUFFLE_SEED,
) -> DataFrame:
    """Materialize the training export: hive layout ``shard=N/`` with
    ONE parquet file per shard whose ROW ORDER is the deterministic
    (shuffle_h, key) permutation the trainer consumes — the artifact
    every upstream operator in this module exists to produce.

    ``repartition(n_shards, shard)`` hash-places each whole shard in
    one task, so every ``shard=N`` directory receives exactly one
    sorted file and Parquet's row order IS the export order (pinned
    by the read-back test). Returns the manifest: per shard, row
    count and the same overflow-safe permutation digest the q44
    driver oracle checks, computed from a re-read of the written
    files. The digest certifies shard MEMBERSHIP and the key→position
    mapping under the canonical (shuffle_h, key) sort — it re-sorts
    on read, so it is invariant to on-disk row order; the physical
    row order itself is pinned by the read-back pytest
    (tests/test_text.py), not by this digest.
    """
    from pyspark.sql import Window

    sharded = shuffle_shards(df, key, n_shards, seed)
    # the partitioned writer inserts its own (non-stable) sort on the
    # partition columns unless the data already arrives sorted by
    # them — lead the in-partition sort with `shard` so the writer's
    # requirement is satisfied and OUR (shuffle_h, key) order survives
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_h", key)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    spark = df.sparkSession
    written = spark.read.parquet(path)
    w = Window.partitionBy("shard").orderBy("shuffle_h", key)
    return (
        written.withColumn("pos", F.row_number().over(w))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                (F.col(key) % 1_000_003) * (F.col("pos") % 1_000_003)
                % 1_000_000_007
            ).alias("order_digest"),
        )
        .orderBy("shard")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str = "source",
    key: str = "doc_id",
    max_per_group: int = 1000,
    order_by: list | None = None,
    cms: DataFrame | None = None,
    cms_width: int | None = None,
    cms_depth: int | None = None,
) -> DataFrame:
    """Frequency capping: keep at most ``max_per_group`` rows per
    ``group_col``, ranked by ``order_by`` (default: ``key`` ascending
    — deterministic; pass e.g. ``[F.length("text").desc(), "doc_id"]``
    to keep the longest/highest-quality docs). The standard
    CommonCrawl-pipeline guard against a single domain dominating the
    training mix — the deterministic complement of the rate-based
    ``mixture_sample``.

    One keyed window per group (groups are the partition key, so no
    single-task sort); the rank column is dropped. At 100 TB a
    pathologically hot group funnels through one task — for that
    regime pre-filter with ``hash_sample`` per group or raise
    ``spark.sql.shuffle.partitions``; typical per-domain counts are
    far below task size.

    ``cms`` (round-15 verdict task 8 — CORPUS-HORIZON capping): exact
    capping sees only this frame, so a forever-stream admitting
    ``max_per_group`` rows of one domain every cycle enforces nothing
    cumulatively. Pass the merged historical count-min sketch of
    ``group_col`` (``streaming.ingest.read_store_cms`` over the
    ``run_ingest_cycle(cms_col=...)`` tree, or ``sketches.cms_merge``
    of per-cycle builds) and this frame's per-group allowance becomes
    ``max(0, max_per_group − est_prior)``. CMS never under-counts, so
    the budget is SAFE — the cumulative total can never exceed the
    cap; over-admission is impossible, under-admission happens at the
    sketch's over-count rate (size width accordingly). The estimate
    join is ``sketches.cms_query`` — broadcast sketch, probe side =
    this frame's distinct groups, then one broadcast join back onto
    the frame: no new data-sized shuffle beyond the existing keyed
    window. ``cms_width``/``cms_depth`` default to the sketch-module
    defaults; pass the build-time geometry (sentinels raise on
    mismatch). NULL groups probe 0 (never counted), so they keep the
    plain in-frame cap."""
    from pyspark.sql import Window

    order = order_by if order_by is not None else [key]
    w = Window.partitionBy(group_col).orderBy(*order)
    ranked = df.withColumn("__cap_rn", F.row_number().over(w))
    if cms is None:
        return ranked.filter(F.col("__cap_rn") <= max_per_group).drop(
            "__cap_rn"
        )
    from timebox_spark.operators.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_query,
    )

    width = CMS_WIDTH if cms_width is None else cms_width
    depth = CMS_DEPTH if cms_depth is None else cms_depth
    groups = df.select(group_col).distinct()
    est = cms_query(
        groups, group_col, group_col, cms, width=width, depth=depth
    ).select(
        F.col(group_col),
        F.col("est_count").alias("__cap_prior"),
    )
    allowance = F.greatest(
        F.lit(0).cast("long"),
        F.lit(int(max_per_group)).cast("long")
        - F.coalesce(F.col("__cap_prior"), F.lit(0).cast("long")),
    )
    return (
        ranked.join(F.broadcast(est), group_col, "left")
        .filter(F.col("__cap_rn") <= allowance)
        # the equi-join moved group_col first — restore the caller's
        # column order (downstream schema-positional writes rely on it)
        .select(*df.columns)
    )


def token_budget_per_group(
    df: DataFrame,
    group_col: str = "source",
    token_col: str = "n_tokens",
    budget: int = 100_000,
    key: str = "doc_id",
    order_by: list | None = None,
    cms: DataFrame | None = None,
    cms_width: int | None = None,
    cms_depth: int | None = None,
) -> DataFrame:
    """Token-denominated frequency capping: keep, per ``group_col``,
    the maximal deterministic PREFIX of rows (ordered by ``order_by``,
    default ``key`` ascending) whose cumulative ``token_col`` stays at
    or below ``budget``. Training mixtures are specified in TOKENS,
    not documents — this is :func:`cap_per_group`'s complement for
    "at most N tokens of source X in the mix" recipes.

    Prefix semantics: the first row whose tokens would push the
    running total past ``budget`` stops the group (cumulative sums of
    non-negative counts are monotone, so ``cumsum <= budget`` IS the
    maximal prefix). A later, smaller doc is NOT pulled in to backfill
    the gap — prefix selection is replayable and order-stable under
    corpus growth (appending docs never changes which earlier docs
    were kept), which best-fit packing is not. NULL token counts are
    treated as 0 (kept, consuming no budget); NULL groups form their
    own group and get their own budget.

    Scale (round 17): token budgets are quoted per SOURCE ("≤300B
    tokens of web"), and a 100 TB corpus has a handful of sources — so
    unlike ``cap_per_group``'s per-domain default, the LOW-cardinality
    group is this operator's primary regime and a plain
    ``Window.partitionBy(group)`` cumsum would funnel each source's
    entire data through ONE sort task. The default ascending-``key``
    order therefore routes through ``kernels.bucketed_running_sum``
    (partition = group, bucket = monotone ``auto_bucket`` of the key):
    per-(group, bucket) window tasks of ~100k rows plus a broadcast
    per-bucket prefix — identical inclusive cumsum, no single-task
    sort. Costs one extra key-column min/max/count scan (the
    ``auto_bucket`` bounds agg) — O(columnar key scan), not O(data
    shuffle). A custom ``order_by`` keeps the windowed path: an
    arbitrary order admits no engine-derivable monotone bucket, so
    that regime keeps the ``cap_per_group`` hot-group caveat (pre-
    split hot groups or pass a naturally bucketed order key). A
    non-numeric/non-timestamp ``key`` also falls back to the windowed
    path (no distribution bucket derivable).

    ``cms`` (round 16 — CORPUS-HORIZON token budgets): exact budgets
    see only this frame, so a forever-stream admitting ``budget``
    tokens of one source every cycle enforces nothing cumulatively.
    Pass the merged historical WEIGHTED count-min sketch of
    ``group_col`` (``sketches.cms_build(..., weight=token_col)`` per
    cycle, ``cms_merge`` across cycles) and this frame's per-group
    allowance becomes ``max(0, budget − est_prior_tokens)``. The
    weighted CMS never under-counts, so the cumulative TOKEN total
    can never exceed the budget (the ``cap_per_group(cms=...)``
    guarantee, token-denominated); the probe side is this frame's
    distinct groups, broadcast joins only — no new data-sized
    shuffle."""
    from pyspark.sql import Window

    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    order = order_by if order_by is not None else [key]
    tok_long = F.coalesce(
        F.col(token_col).cast("long"), F.lit(0).cast("long")
    )
    cum = None
    if order_by is None:
        # scale-safe default path (see docstring): bucketed carry, no
        # per-source single-task sort
        from timebox_spark.operators.kernels import (
            auto_bucket,
            bucketed_running_sum,
        )

        try:
            bkt = auto_bucket(df.select(key), [key])
        except ValueError:
            bkt = None  # non-numeric key: keyed-window fallback below
        if bkt is not None:
            # NULL handling so the bucketed plan matches the windowed
            # one exactly: a NULL key buckets to -1 (sorts before every
            # real bucket = the window's NULLS FIRST); the group key is
            # struct-wrapped because the kernel's broadcast prefix
            # re-attaches by equi-join and bare NULL keys never join —
            # struct equality is null-safe on nested fields (pinned by
            # tests/test_text.py's NULL-fixture equivalence test)
            cum = (
                bucketed_running_sum(
                    df.withColumn("__tb_v", tok_long).withColumn(
                        "__tb_g", F.struct(F.col(group_col).alias("g"))
                    ),
                    order_by=[key],
                    value_col="__tb_v",
                    bucket=F.coalesce(bkt, F.lit(-1)),
                    out_col="__tb_cum",
                    partition_by=["__tb_g"],
                )
                .select(*df.columns, "__tb_cum")
            )
    if cum is None:
        w = (
            Window.partitionBy(group_col)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = df.withColumn("__tb_cum", F.sum(tok_long).over(w))
    if cms is None:
        return cum.filter(F.col("__tb_cum") <= budget).drop("__tb_cum")
    from timebox_spark.operators.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_query,
    )

    width = CMS_WIDTH if cms_width is None else cms_width
    depth = CMS_DEPTH if cms_depth is None else cms_depth
    groups = df.select(group_col).distinct()
    est = cms_query(
        groups, group_col, group_col, cms, width=width, depth=depth
    ).select(
        F.col(group_col),
        F.col("est_count").alias("__tb_prior"),
    )
    allowance = F.greatest(
        F.lit(0).cast("long"),
        F.lit(int(budget)).cast("long")
        - F.coalesce(F.col("__tb_prior"), F.lit(0).cast("long")),
    )
    return (
        cum.join(F.broadcast(est), group_col, "left")
        .filter(F.col("__tb_cum") <= allowance)
        # restore the caller's column order (the cap_per_group rule)
        .select(*df.columns)
    )
