"""Mergeable sketches: the 100 TB pattern for distinct counting.

At scale you never recompute COUNT(DISTINCT) over raw data per
reporting period — you store small mergeable sketches per fine bucket
(day) and union them to any coarser period (week/month/all-time)
without touching the base table again. Spark 4 ships Apache
DataSketches HLL natively (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``), so the whole path is JVM-side binary
columns — no Python, one shuffle to build, one tiny shuffle to merge.

The reference has no aggregation surface at all (SURVEY §2.7); this
is part of the analytics extension the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def daily_distinct_sketches(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    lg_k: int = 12,
) -> DataFrame:
    """Per-day HLL sketch of distinct ``key_col`` values — the
    mergeable pre-aggregate to persist alongside the data. ``lg_k``
    12 ⇒ ~4 KB per sketch, ~1.6% relative error."""
    return df.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def rollup_distinct(
    sketches: DataFrame,
    period: str = "month",
    day_col: str = "day",
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge fine-grained sketches to a coarser period WITHOUT
    rescanning base data: ``hll_union_agg`` over the stored binary
    sketches, then estimate. Input is days; output is one row per
    ``period`` with the approximate distinct count."""
    return (
        sketches.groupBy(
            F.date_trunc(period, F.col(day_col)).cast("date").alias("period")
        )
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg(sketch_col, F.lit(True))
            ).alias("n_distinct_approx"),
            F.sum("n_rows").alias("n_rows"),
        )
    )


# histogram-quantile sketch constants (shared with the q57 oracle)
QSKETCH_SCALE = 100  # fixed-point cents before bucketing
QSKETCH_PS = (50, 90, 99)


def log2_histogram(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    period: str = "month",
) -> DataFrame:
    """Per-period power-of-two histogram of a positive metric — the
    deterministic mergeable quantile sketch: bucket = bit-length of
    the fixed-point value, so counts are exact integers, the sketch is
    O(64) rows per period, and rollup to any coarser period is a
    plain SUM (same persist-fine/merge-coarse pattern as the HLL
    distinct sketches above). Unlike t-digest/KLL there is no
    randomness or order dependence — the same data yields the same
    sketch on any engine, so the DuckDB oracle hash-checks it.

    bucket b holds values with bit_length(round(v·100)) = b, i.e.
    [2^(b-1), 2^b - 1] in cents; non-positive values land in bucket 0.
    """
    vi = F.floor(
        F.col(value_col).cast("double") * F.lit(float(QSKETCH_SCALE))
        + F.lit(0.5)
    ).cast("long")
    bucket = F.when(vi <= 0, F.lit(0)).otherwise(
        F.length(F.conv(vi.cast("string"), 10, 2))
    )
    return df.groupBy(
        F.date_trunc(period, F.col(ts_col)).alias("period"),
        bucket.cast("int").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))


def histogram_quantiles(
    hist: DataFrame, ps: tuple[int, ...] = QSKETCH_PS
) -> DataFrame:
    """Quantile estimates from the histogram alone (no base-data
    rescan): for percentile p, the first bucket whose cumulative
    count reaches rank = ceil(p·N/100); the estimate is the bucket's
    inclusive upper bound 2^b − 1 (cents), which over-states the true
    quantile by at most the bucket width — the classic
    guaranteed-error histogram bound.

    All arithmetic is integer (ceil-division via (x+99)//100), and the
    cumulative window is keyed by period over O(64) bucket-summary
    rows — never over data-sized input. Returns
    (period, p, rank, est_hi, cum) per requested percentile.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("period").orderBy("bucket")
    wt = Window.partitionBy("period")
    cum = (
        hist.withColumn("cum", F.sum("n").over(w))
        .withColumn("total", F.sum("n").over(wt))
    )
    pdf = cum.sparkSession.createDataFrame(
        [(int(p),) for p in ps], "p int"
    )
    # integer `div`, NOT floor(double /): the double path loses
    # exactness once total*p exceeds 2^53, silently diverging from the
    # DuckDB oracle's integer // at extreme scale
    ranked = cum.crossJoin(F.broadcast(pdf)).withColumn(
        "rank",
        F.expr("(total * p + 99) div 100").cast("long"),
    )
    wp = Window.partitionBy("period", "p").orderBy("bucket")
    return (
        ranked.filter(F.col("cum") >= F.col("rank"))
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select(
            "period",
            "p",
            "rank",
            (F.expr("shiftleft(CAST(1 AS BIGINT), bucket)") - 1).alias(
                "est_hi"
            ),
            "cum",
        )
    )


# ---------------------------------------------------------------- Bloom

def bloom_build(
    df: DataFrame, col: str, m_bits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """Sparse Bloom bitset of ``df[col]`` values as a MERGEABLE
    (word int, bits long) table — the membership sketch a growing
    corpus persists per ingest cycle so exact-dedup pre-gating is a
    broadcast, not an O(corpus) fingerprint join (see
    ``dedup.incremental_exact_dedup(corpus_bloom=...)``).

    Hash family: position_i(v) = md5(f"{i}|" + v)[:8 hex] % m_bits
    (``dedup._md5_u32`` — deterministic and SQL-expressible, so the
    q23 'bloom' oracle re-derives the bitset bit-for-bit). Each long
    word carries 32 bits (bit index <= 31, so neither engine's
    shift-left can overflow — the repo's 1<<63 trap). Merging cycles
    = ``groupBy(word).agg(bit_or(bits))`` (``bloom_merge``); Bloom
    union is exact, so incremental maintenance never rebuilds.

    Sizing (standard formulas): m ≈ −n·ln(fpr)/ln²2, k ≈ (m/n)·ln 2 —
    1%% fpr costs ~9.6 bits/doc (~120 MB per 10⁸ docs: broadcastable;
    at 10⁹ docs prefer sharding or the plain fingerprint join).

    The sketch CARRIES its (m_bits, k) as sentinel rows (word −1 / −2
    — real words are >= 0): probing or merging a persisted sketch
    with mismatched parameters would silently break the
    no-false-negative guarantee — a duplicate would bypass the
    dedup's exact join as 'definitely new' — so ``bloom_probe`` and
    ``bloom_merge`` validate the sentinels and raise instead (same
    defect class as the estimate-index num_perm guard)."""
    from timebox_spark.operators.dedup import _md5_u32

    pos = [
        (_md5_u32(F.col(col), str(i)) % F.lit(m_bits)) for i in range(k)
    ]
    spark = df.sparkSession
    sentinels = spark.createDataFrame(
        [(-1, int(m_bits)), (-2, int(k))], "word int, bits long"
    )
    return (
        df.select(F.explode(F.array(*pos)).alias("p"))
        .select(
            F.shiftright("p", 5).cast("int").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 32) AS INT))"
            ).alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("bits"))
        .unionByName(sentinels)
    )


# Broadcast budget for bloom_probe (round-14 verdict task 5): the
# sketch is broadcast to every executor, so a caller sizing m_bits for
# 10^10 docs must get a RAISE with sharding advice, not a driver OOM.
# ~20 bytes/row covers the (int word, long bits) data plus JVM row
# overhead; 1 GiB keeps the probe well under Spark's 8 GB broadcast
# hard limit and typical driver headroom. Module-level (read at call
# time) so deployments — and the budget pytest — can adjust it.
BLOOM_BROADCAST_BUDGET_BYTES = 1 << 30
_BLOOM_ROW_BYTES = 20


class BloomBroadcastBudgetError(ValueError):
    """The sketch's estimated broadcast size exceeds the budget —
    raised by ``bloom_probe`` BEFORE attempting the broadcast (the
    alternative is a silent driver/executor OOM at exactly the corpus
    size the gate was meant to serve).
    ``dedup.incremental_exact_dedup`` catches this and falls back to
    the plain fingerprint anti-join (logged via ``warnings``)."""


def _bloom_stats(bloom: DataFrame, m_bits: int, k: int, ctx: str) -> int:
    """One-scan validation of a sketch before probing: (a) embedded
    (m_bits, k) sentinels must match the caller's — absent sentinels
    (a pre-round-13 or hand-built sketch) pass silently, CONFLICTING
    sentinels (a raw union of different-geometry sketches) raise;
    (b) returns the distinct-word count for the broadcast budget
    check. Replaces the old 2-row sentinel collect, which hid
    conflicts (dict comprehension kept the last row) and couldn't
    size the broadcast."""
    row = bloom.agg(
        F.count_distinct("word").alias("n_words"),
        F.count_distinct(
            F.when(F.col("word") == -1, F.col("bits"))
        ).alias("n_m"),
        F.count_distinct(
            F.when(F.col("word") == -2, F.col("bits"))
        ).alias("n_k"),
        F.max(F.when(F.col("word") == -1, F.col("bits"))).alias("m"),
        F.max(F.when(F.col("word") == -2, F.col("bits"))).alias("k"),
    ).collect()[0]
    if row["n_m"] > 1 or row["n_k"] > 1:
        raise ValueError(
            f"{ctx}: sketch carries CONFLICTING (m_bits, k) sentinel "
            f"rows — it is a raw union of sketches built with "
            f"different geometries; merge same-geometry sketches with "
            f"bloom_merge (which raises on this) and rebuild otherwise"
        )
    got_m, got_k = row["m"], row["k"]
    if (got_m is not None and got_m != m_bits) or (
        got_k is not None and got_k != k
    ):
        raise ValueError(
            f"{ctx}: sketch was built with (m_bits={got_m}, k={got_k}) "
            f"but the call uses (m_bits={m_bits}, k={k}) — a mismatch "
            f"silently breaks the no-false-negative guarantee (a dup "
            f"would bypass exact dedup as 'definitely new'); pass the "
            f"build-time parameters"
        )
    return int(row["n_words"])


def bloom_merge(blooms: DataFrame) -> DataFrame:
    """Union of Bloom sketches built with the SAME (m_bits, k): OR the
    words together. Exact (Bloom union loses nothing), so per-cycle
    sketch partitions merge at read time without a rebuild. Mixed
    parameters RAISE: the input's sentinel rows must agree (OR-ing
    bitsets of different geometries is silent corruption)."""
    bad = (
        blooms.filter(F.col("word") < 0)
        .groupBy("word")
        .agg(F.count_distinct("bits").alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .count()
    )
    if bad:
        raise ValueError(
            "bloom_merge: inputs carry conflicting (m_bits, k) "
            "sentinels — sketches of different geometries cannot be "
            "merged; rebuild with one parameter set"
        )
    return blooms.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    df: DataFrame,
    id_col: str,
    col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 5,
    max_broadcast_bytes: int | None = None,
    strategy: str = "broadcast",
    validate: str = "eager",
) -> DataFrame:
    """(id_col, maybe_present) membership probe against a
    ``bloom_build`` sketch with the SAME (m_bits, k): maybe_present is
    TRUE iff all k positions' bits are set — NO false negatives (a
    value that was built in always probes true), false positives at
    the sketch's design rate. The sketch is broadcast and the probe
    rows fan out k-fold map-side; the only shuffle is the
    probe-side-sized groupBy back to one row per id. The sketch's
    embedded (m_bits, k) sentinels are validated against the call's —
    a mismatch (or a raw union of conflicting-geometry sketches)
    raises instead of silently losing the no-false-negative
    guarantee.

    The sketch is defensively re-aggregated per word (``bit_or``)
    before the broadcast join (advisor round 13): a sketch with
    MULTIPLE rows per word — a raw union of per-cycle sketches, or a
    consolidated tree read without ``bloom_merge`` — would otherwise
    fan the left join out per duplicate row, and ``min(hit)`` would
    require the bit set in EVERY copy: a true member could probe
    ``maybe_present=false`` and bypass exact dedup as definitely new.
    Sentinel rows are idempotent under ``bit_or`` once the conflict
    check above has passed (same geometry ⇒ identical sentinel bits).

    ``max_broadcast_bytes`` (default: module-level
    ``BLOOM_BROADCAST_BUDGET_BYTES``, 1 GiB) bounds the estimated
    broadcast size (distinct words × ~20 B, counted in the same
    validation scan): above it the probe raises
    :class:`BloomBroadcastBudgetError` with sharding advice BEFORE
    the broadcast is attempted — a sketch sized for 10¹⁰ docs must
    fail loudly, not OOM the driver. Callers that can degrade
    gracefully (``dedup.incremental_exact_dedup``) catch it and fall
    back to the SHUFFLE strategy below.

    ``strategy`` (round 14 — the past-broadcast-scale path):

    - ``'broadcast'`` (default): budget-checked broadcast hash join —
      zero shuffle on either side, the right call while the sketch
      fits executor memory;
    - ``'shuffle'``: NO broadcast hint and NO budget — a plain join
      the optimizer plans freely (AQE still broadcasts a small
      sketch; an over-budget one becomes a shuffled hash join whose
      sketch side is ~word-count rows ≈ bits/32 — at 10 bits/doc
      that is ~docs/3 narrow rows, strictly smaller than the full
      fingerprint tree the gate replaces). Results are identical to
      'broadcast' bit-for-bit;
    - ``'auto'``: 'broadcast' within budget, else 'shuffle'.

    ``validate`` (round 18 — the gates' two eager full-tree
    validation jobs removed):

    - ``'eager'`` (default): run the ``_bloom_stats`` scan BEFORE
      building the probe — sentinel mismatches raise at call time and
      the scan's distinct-word count sizes the broadcast-budget check
      exactly. The right default for arbitrary / foreign sketches.
    - ``'inline'``: no pre-scan. Sentinel validation is woven into
      the probe plan as a PER-ROW assert evaluated while the sketch
      side is read (before the defensive ``bit_or`` merge, so it is
      at least as strong as the eager check: every sentinel row is
      compared against the call's (m_bits, k) individually — the
      ``bit_or``-aliasing that makes post-merge checks weak cannot
      happen, and a conflicting-geometry union raises on whichever
      row disagrees). Absent sentinels (pre-round-13 or hand-built
      sketches) pass silently, exactly like the eager path. The
      budget check uses the structural bound distinct words ≤
      m_bits/32 + 2 sentinels; if that bound exceeds the budget the
      eager count runs anyway, so over-budget behavior is unchanged.
      A mismatch raises from the FIRST action that consumes the probe
      (as a Spark execution error carrying the same message) instead
      of at call time — callers that own the tree's write path and
      probe it in the same breath (``run_ingest_cycle``'s gates, the
      measured ~2 full-tree scans/cycle this removes) take this; keep
      the default for sketches you didn't write."""
    from timebox_spark.operators.dedup import _md5_u32

    if strategy not in ("broadcast", "shuffle", "auto"):
        raise ValueError(
            f"bloom_probe: unknown strategy {strategy!r} — expected "
            f"'broadcast', 'shuffle', or 'auto'"
        )
    if validate not in ("eager", "inline"):
        raise ValueError(
            f"bloom_probe: unknown validate {validate!r} — expected "
            f"'eager' or 'inline'"
        )
    budget = (
        BLOOM_BROADCAST_BUDGET_BYTES
        if max_broadcast_bytes is None
        else max_broadcast_bytes
    )
    if validate == "inline":
        # structural bound: a sketch holds at most m_bits/32 distinct
        # data words plus the 2 sentinel rows — no scan needed to
        # budget-check sketches sized sanely. Past the budget, fall
        # back to the exact eager count (which also validates), so an
        # over-budget sketch raises/degrades exactly as before.
        est_bytes = (m_bits // 32 + 2) * _BLOOM_ROW_BYTES
        if est_bytes > budget and strategy != "shuffle":
            n_words = _bloom_stats(bloom, m_bits, k, "bloom_probe")
            est_bytes = n_words * _BLOOM_ROW_BYTES
            validate = "eager"  # the stats scan already validated
    else:
        n_words = _bloom_stats(bloom, m_bits, k, "bloom_probe")
        est_bytes = n_words * _BLOOM_ROW_BYTES
    if strategy == "auto":
        strategy = "shuffle" if est_bytes > budget else "broadcast"
    if strategy == "broadcast" and est_bytes > budget:
        raise BloomBroadcastBudgetError(
            f"bloom_probe: sketch holds {n_words} words ≈ {est_bytes} "
            f"bytes broadcast, over the {budget}-byte budget — pass "
            f"strategy='shuffle' (or 'auto') to probe without the "
            f"broadcast, shard the sketch (partition fingerprints by "
            f"a stable prefix, one independent sketch per shard, probe "
            f"each batch row against its own shard's sketch), or use "
            f"the plain fingerprint anti-join; raise "
            f"max_broadcast_bytes only with matching driver/executor "
            f"memory headroom"
        )
    if validate == "inline":
        # per-row sentinel assert, evaluated while the sketch side is
        # scanned and BEFORE the bit_or merge below (pre-aggregation:
        # a conflicting-geometry union raises on whichever row
        # disagrees — bit_or can never alias it past this check).
        # assert_true yields NULL when the condition holds, so the
        # coalesce keeps every row and the filter's only effect is to
        # force the evaluation.
        sentinel_ok = (
            F.when(F.col("word") == -1, F.col("bits") == F.lit(int(m_bits)))
            .when(F.col("word") == -2, F.col("bits") == F.lit(int(k)))
            .otherwise(F.lit(True))
        )
        bloom = bloom.filter(
            F.coalesce(
                F.assert_true(
                    sentinel_ok,
                    F.lit(
                        f"bloom_probe: sketch sentinel mismatch — the "
                        f"tree carries a (m_bits, k) sentinel different "
                        f"from the call's (m_bits={m_bits}, k={k}), or "
                        f"is a raw union of different geometries; a "
                        f"mismatch silently breaks the "
                        f"no-false-negative guarantee (a dup would "
                        f"bypass exact dedup as 'definitely new') — "
                        f"pass the build-time parameters or rebuild "
                        f"with one geometry"
                    ),
                ),
                F.lit(True),
            )
        )
    bloom = bloom.groupBy("word").agg(F.bit_or("bits").alias("bits"))
    pos = [
        (_md5_u32(F.col(col), str(i)) % F.lit(m_bits)) for i in range(k)
    ]
    p = df.select(
        F.col(id_col), F.explode(F.array(*pos)).alias("p")
    ).select(
        id_col,
        F.shiftright("p", 5).cast("int").alias("word"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 32) AS INT))"
        ).alias("m"),
    )
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("m")) != 0
    ).cast("int")
    sketch_side = F.broadcast(bloom) if strategy == "broadcast" else bloom
    return (
        p.join(sketch_side, "word", "left")
        .groupBy(id_col)
        .agg(F.min(hit).alias("__mp"))
        .select(id_col, (F.col("__mp") == 1).alias("maybe_present"))
    )


# ------------------------------------------------------- Count-min

# CMS defaults + the hash-salt prefix (shared with the q57 'cms'
# oracle renderer in plans/suites.py — repo convention: both engines
# derive positions from the same constants).
CMS_WIDTH = 512
CMS_DEPTH = 4
CMS_SALT = "cms"


def _cms_stats(cms: DataFrame, width: int, depth: int, ctx: str) -> int:
    """One-scan sentinel validation for a count-min sketch (the
    bloom _bloom_stats pattern): conflicting embedded (width, depth)
    sentinels raise (a raw union of different geometries), a mismatch
    with the caller's parameters raises (wrong-width positions silently
    under-count), absent sentinels pass. Returns the data-row count
    for the broadcast budget check."""
    return _cms_stats_mode(cms, width, depth, ctx, check_mode=False)[0]


def _cms_stats_mode(
    cms: DataFrame,
    width: int,
    depth: int,
    ctx: str,
    check_mode: bool = True,
) -> tuple[int, bool | None]:
    """``_cms_stats``'s geometry validation and ``cms_is_weighted``'s
    mode read fused into ONE aggregation job (round 17): the ingest
    gate ran them back-to-back over the same tree, paying two
    full-tree scans where one answers both. Returns (data-row count,
    weighted mode: True/False per the row −3 sentinel, None for
    legacy sentinel-less trees). ``check_mode=True`` raises on a
    count/weighted MIX exactly like ``cms_is_weighted``;
    ``check_mode=False`` is the plain ``_cms_stats`` contract
    (probes answer whatever denomination the tree holds)."""
    row = cms.agg(
        F.count(F.when(F.col("row") >= 0, 1)).alias("n_rows"),
        F.count_distinct(
            F.when(F.col("row") == -1, F.col("cnt"))
        ).alias("n_w"),
        F.count_distinct(
            F.when(F.col("row") == -2, F.col("cnt"))
        ).alias("n_d"),
        F.count_distinct(
            F.when(F.col("row") == -3, F.col("cnt"))
        ).alias("n_mode"),
        F.max(F.when(F.col("row") == -1, F.col("cnt"))).alias("w"),
        F.max(F.when(F.col("row") == -2, F.col("cnt"))).alias("d"),
        F.max(F.when(F.col("row") == -3, F.col("cnt"))).alias("mode"),
    ).collect()[0]
    if row["n_w"] > 1 or row["n_d"] > 1:
        raise ValueError(
            f"{ctx}: sketch carries CONFLICTING (width, depth) "
            f"sentinels — it is a raw union of sketches built with "
            f"different geometries; counters of different widths hash "
            f"to different cells and cannot be combined — rebuild with "
            f"one parameter set"
        )
    got_w, got_d = row["w"], row["d"]
    if (got_w is not None and got_w != width) or (
        got_d is not None and got_d != depth
    ):
        raise ValueError(
            f"{ctx}: sketch was built with (width={got_w}, "
            f"depth={got_d}) but the call uses (width={width}, "
            f"depth={depth}) — mismatched geometry silently corrupts "
            f"estimates; pass the build-time parameters"
        )
    if check_mode and row["n_mode"] > 1:
        raise ValueError(
            f"{ctx}: sketch mixes count-mode and weighted-mode "
            f"partitions — their sums answer neither 'how many rows' "
            f"nor 'how much weight'; rebuild the tree in one mode"
        )
    mode = None if row["mode"] is None else bool(row["mode"])
    return int(row["n_rows"]), mode


def cms_build(
    df: DataFrame,
    col: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
    weight: str | Column | None = None,
) -> DataFrame:
    """Count-min sketch of ``df[col]`` frequencies as a MERGEABLE
    (row int, idx int, cnt long) counter table — the fixed-size
    frequency summary a 100 TB pipeline persists per ingest
    cycle/day so later "how often has this domain/token appeared so
    far?" probes never rescan history: merging cycles is a plain SUM
    (``cms_merge``), and a probe (``cms_query``) broadcasts the
    ≤ depth·width-row sketch. Estimates NEVER under-count (est ≥
    true count always); over-count is bounded by 2eN/width with
    probability 1−(1/2)^depth — the classic CMS guarantee.

    Hash family: idx_j(v) = md5(f"{CMS_SALT}{j}|" + v) first 8 hex as
    int, mod width (``dedup._md5_u32``) — deterministic and
    SQL-expressible, so the q57 'cms' oracle re-derives every counter
    exactly. Integer counts ⇒ the sketch is identical on any engine
    and partitioning. NULL values are skipped (not counted); probe
    NULLs estimate 0.

    The sketch carries (width, depth) as sentinel rows (row −1 / −2,
    idx 0 — real rows are >= 0): ``cms_merge`` and ``cms_query``
    validate them and raise on mismatch, the same silent-geometry
    failure class as the Bloom gate's.

    ``weight`` (round 16): counters accumulate ``SUM(weight)`` per
    value instead of row counts — the WEIGHTED sketch behind
    token-denominated corpus-horizon budgets ("how many TOKENS of
    source X so far?", ``sampling.token_budget_per_group(cms=...)``)
    where the count sketch answers "how many docs?". Weights must be
    NON-NEGATIVE integers (a negative weight voids the never-
    under-count guarantee; NULL weights add 0 while still claiming
    the value's cells); merge/query/heavy-hitter paths are unchanged
    — a weighted sketch is the count sketch of weight-fold repeated
    rows."""
    from timebox_spark.operators.dedup import _md5_u32

    spark = df.sparkSession
    # row −3 records WEIGHTEDNESS (cnt 1 weighted / 0 count): a tree
    # mixing count and weighted cycles answers neither "how many
    # docs?" nor "how many tokens?" — cms_merge's per-row sentinel
    # conflict check now catches that mix exactly like a geometry mix
    sentinels = spark.createDataFrame(
        [
            (-1, 0, int(width)),
            (-2, 0, int(depth)),
            (-3, 0, 1 if weight is not None else 0),
        ],
        "row int, idx int, cnt long",
    )
    cells = [
        F.struct(
            F.lit(j).cast("int").alias("row"),
            (_md5_u32(F.col(col), f"{CMS_SALT}{j}") % F.lit(width))
            .cast("int")
            .alias("idx"),
        )
        for j in range(depth)
    ]
    if weight is None:
        inc = F.lit(1).cast("long")
    else:
        w = F.col(weight) if isinstance(weight, str) else weight
        inc = F.coalesce(w.cast("long"), F.lit(0).cast("long"))
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.explode(F.array(*cells)).alias("c"), inc.alias("__w"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.idx").alias("idx"))
        .agg(F.sum("__w").alias("cnt"))
        .unionByName(sentinels)
    )


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Sum of count-min sketches built with the SAME (width, depth):
    counters add cell-wise (CMS merge is exact — the merged sketch
    equals the sketch of the concatenated data). Mixed geometries
    RAISE via the sentinel check. Sentinel rows are deduplicated, not
    summed (they are metadata, not counters)."""
    bad = (
        sketches.filter(F.col("row") < 0)
        .groupBy("row")
        .agg(F.count_distinct("cnt").alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .count()
    )
    if bad:
        raise ValueError(
            "cms_merge: inputs carry conflicting sentinels (width, "
            "depth, or count-vs-weighted mode) — sketches of "
            "different geometries hash to different cells, and a "
            "count/weighted mix answers neither denomination; "
            "rebuild with one parameter set"
        )
    data = (
        sketches.filter(F.col("row") >= 0)
        .groupBy("row", "idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return data.unionByName(
        sketches.filter(F.col("row") < 0).distinct()
    )


def cms_is_weighted(cms: DataFrame) -> bool | None:
    """Read a sketch's weightedness sentinel (row −3): True =
    weighted (``cms_build(weight=...)``), False = count, None =
    legacy sketch built before the sentinel existed (treat as count
    — weighted builds have always stamped it). Raises on a
    count/weighted MIX (a raw union of both modes — summing them
    answers neither denomination)."""
    vals = {
        r["cnt"]
        for r in cms.filter(F.col("row") == -3)
        .select("cnt")
        .distinct()
        .collect()
    }
    if len(vals) > 1:
        raise ValueError(
            "cms_is_weighted: sketch mixes count-mode and "
            "weighted-mode partitions — their sums answer neither "
            "'how many rows' nor 'how much weight'; rebuild the tree "
            "in one mode"
        )
    if not vals:
        return None
    return bool(vals.pop())


def cms_query(
    df: DataFrame,
    id_col: str,
    col: str,
    cms: DataFrame,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
    max_broadcast_bytes: int | None = None,
) -> DataFrame:
    """(id_col, est_count) frequency estimates for ``df[col]`` against
    a ``cms_build`` sketch with the SAME (width, depth):
    est = min over the depth rows of the addressed counters (missing
    cell ⇒ 0). Never under-counts a value the sketch ingested. The
    sketch is defensively re-aggregated per cell (SUM — duplicate
    cell rows from a raw union of per-cycle sketches merge exactly,
    ``cms_merge`` semantics) and broadcast; probe rows fan out
    depth-fold map-side, and the only shuffle is the probe-sized
    groupBy back to one row per id. Geometry sentinels are validated
    against the call's; the broadcast budget is enforced like
    ``bloom_probe``'s (:class:`BloomBroadcastBudgetError` — a sketch
    is depth·width cells, so this only fires on degenerate widths)."""
    from timebox_spark.operators.dedup import _md5_u32

    n_rows = _cms_stats(cms, width, depth, "cms_query")
    budget = (
        BLOOM_BROADCAST_BUDGET_BYTES
        if max_broadcast_bytes is None
        else max_broadcast_bytes
    )
    # budget the frame actually broadcast (round-15 advisor): cmsd is
    # the re-aggregated sketch, bounded by depth·width cells — a tall
    # raw union of thousands of per-cycle sketches must not spuriously
    # raise for a broadcast that collapses to that bound
    est_bytes = min(n_rows, depth * width) * 24
    if est_bytes > budget:
        raise BloomBroadcastBudgetError(
            f"cms_query: sketch holds {min(n_rows, depth * width)} "
            f"post-aggregation cells ≈ {est_bytes} "
            f"bytes broadcast, over the {budget}-byte budget — use a "
            f"smaller width or raise max_broadcast_bytes with matching "
            f"executor memory headroom"
        )
    cmsd = (
        cms.filter(F.col("row") >= 0)
        .groupBy("row", "idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    cells = [
        F.struct(
            F.lit(j).cast("int").alias("row"),
            (_md5_u32(F.col(col), f"{CMS_SALT}{j}") % F.lit(width))
            .cast("int")
            .alias("idx"),
        )
        for j in range(depth)
    ]
    p = df.select(F.col(id_col), F.explode(F.array(*cells)).alias("c")).select(
        id_col, F.col("c.row").alias("row"), F.col("c.idx").alias("idx")
    )
    return (
        p.join(F.broadcast(cmsd), ["row", "idx"], "left")
        .groupBy(id_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(
                "est_count"
            )
        )
    )


def cms_heavy_hitters(
    candidates: DataFrame,
    id_col: str,
    col: str,
    cms: DataFrame,
    min_count: int,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Candidates whose CMS-estimated frequency reaches ``min_count``
    — the heavy-hitter gate over a SMALL candidate set (this batch's
    distinct domains/tokens) against the merged historical sketch.
    No false negatives (est ≥ true): every true heavy hitter among
    the candidates survives; false positives at the sketch's
    over-count rate are the caller's exact-verify problem (the Bloom
    gate's contract shape)."""
    return cms_query(
        candidates, id_col, col, cms, width=width, depth=depth
    ).filter(F.col("est_count") >= int(min_count))
