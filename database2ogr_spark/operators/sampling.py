"""Deterministic sampling and sequence-packing operators for training-data
pipelines. Both are pure DataFrame transforms with reproducible semantics (no
RNG state — sampling keys off a content hash, packing off a total order), so
the same inputs give the same sample/bins on any cluster size or retry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from database2ogr_spark.functions.hashing import stable_hash64


def deterministic_sample(
    df: DataFrame,
    *,
    pct: int,
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Keep ~pct% of rows, chosen by hash of the id — deterministic,
    resumable, and stable under repartitioning (unlike ``df.sample``, whose
    output depends on partition layout). ``pct`` is integer percent.

    Narrow (no shuffle): the hash-mod predicate evaluates per row and can even
    be pushed into a scan over a hash-partitioned layout.
    """
    bucket = stable_hash64(F.col(id_col).cast("string"), seed=seed) % 100
    return df.filter(bucket < pct)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, int],
    *,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 7,
    default_pct: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ~``fractions[stratum]``
    percent of each stratum (integer percent; strata absent from the map get
    ``default_pct``) — the data-mixing knob of a training pipeline
    (up/down-weighting languages or sources).

    Same hash-mod machinery as :func:`deterministic_sample`, so unlike
    ``DataFrame.sampleBy`` the selection is reproducible across cluster
    sizes, retries, and repartitioning, and a row's fate depends only on its
    id — raising a stratum's rate strictly grows its sample (nested samples,
    the property that makes mixture re-runs comparable). Narrow: the
    per-stratum threshold is a broadcastable CASE over the hash bucket, no
    shuffle.
    """
    bucket = stable_hash64(F.col(id_col).cast("string"), seed=seed) % 100
    threshold = F.lit(default_pct)
    for stratum, pct in sorted(fractions.items()):
        threshold = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(threshold)
    return df.filter(bucket < threshold)


def split_corpus(
    df: DataFrame,
    splits: dict[str, int],
    *,
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Deterministic disjoint corpus split (train/val/test): integer percents
    summing to 100, assigned by hash bucket ranges in sorted split-name
    order. Adds a ``split`` column.

    Every row gets exactly one split; assignment depends only on the id and
    the split table — stable under repartitioning, retries, cluster
    resizes, and appends (a new doc's split does not disturb old ones, the
    property that keeps eval sets frozen as the corpus grows). Narrow: one
    CASE over the hash bucket, no shuffle.
    """
    if sum(splits.values()) != 100:
        raise ValueError(f"split percents must sum to 100, got {splits}")
    bucket = stable_hash64(F.col(id_col).cast("string"), seed=seed) % 100
    expr = F.lit(None).cast("string")
    lo = 0
    for name, pct in sorted(splits.items()):
        expr = F.when((bucket >= lo) & (bucket < lo + pct), F.lit(name)).otherwise(
            expr
        )
        lo += pct
    return df.withColumn("split", expr)


def cap_per_group(
    df: DataFrame,
    *,
    cap: int,
    group_col: str = "domain",
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Keep at most ``cap`` rows per ``group_col`` (per-domain quotas — the
    standard guard against one crawl host flooding the mixture), chosen
    deterministically: rows rank by hash of their id within the group and
    ranks > ``cap`` drop. Same id → same fate on any cluster size or retry;
    raising ``cap`` strictly grows every group's keep set (nested quotas).

    Scale: one shuffle (window partitioned by ``group_col``). A mega-domain
    makes a fat partition — the sort is per-group and spills, but if one
    domain is a double-digit share of the corpus, pre-filter it separately
    rather than paying its sort here.
    """
    w = Window.partitionBy(group_col).orderBy(
        stable_hash64(F.col(id_col).cast("string"), seed=seed).asc(),
        F.col(id_col).asc(),
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def top_fraction_per_group(
    df: DataFrame,
    *,
    fraction: float,
    score_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the best ``fraction`` of each group by ``score_col`` — per-source
    quality calibration: a global score threshold over-prunes weak sources
    and under-prunes strong ones; taking the top X% *within* each source
    keeps the mixture while raising quality everywhere.

    Deterministic: rank by (score desc, id asc) — ties cannot flip between
    runs — and a group keeps ``ceil(fraction * n)`` rows so tiny groups
    never vanish. One shuffle (window partitioned by group); same
    mega-group caveat as :func:`cap_per_group`.
    """
    if not 0 < fraction <= 1:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    n = F.count(F.lit(1)).over(Window.partitionBy(group_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .withColumn("__n", n)
        .filter(F.col("__rk") <= F.ceil(F.col("__n") * F.lit(float(fraction))))
        .drop("__rk", "__n")
    )


def pack_sequences(
    df: DataFrame,
    *,
    budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Greedy sequence packing: within each ``group_col`` partition, walk
    docs in ``id_col`` order accumulating token counts; a doc whose running
    total crosses the ``budget`` boundary starts a new bin. Output adds
    ``bin_id`` (0-based per group).

    Bin id = floor((cumsum - n_tokens) / budget) — the running total *before*
    this doc. Docs never straddle bins; a bin may overflow ``budget`` by less
    than one document (boundary-based packing — strict ≤budget packing is a
    sequential fold, not expressible as a fixed window; trim or split
    oversized docs upstream if hard caps are required).

    Scale: the window partitions by ``group_col`` — parallelism = number of
    groups, the determinism/scale trade documented here on purpose. For
    unordered max-throughput packing, pre-repartition by a salt column and
    pack per partition instead.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    return df.withColumn(
        "bin_id", F.floor((cum - F.col(token_col)) / F.lit(budget)).cast("bigint")
    )


def temperature_resample(
    df: DataFrame,
    *,
    alpha: float = 0.3,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 17,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Temperature-based source rebalancing WITH upsampling — the
    multilingual-LLM mixture rule (public XLM-R / mT5 recipe): source
    shares are flattened to ``q_s ∝ p_s^alpha`` (alpha<1 boosts the tail),
    and the corpus is materialized at its original total size by REPEATING
    tail-source documents (cleaning.mix_sources is the downsample-only
    twin — it never repeats a row).

    Per source the resample rate is ``r_s = q_s·N / n_s`` (rounded to 6
    decimals — the cross-engine determinism contract): every row emits
    ``floor(r_s)`` copies, plus one more where the id-hash falls under the
    fractional part — deterministic, layout-independent, no RNG. Output =
    input columns plus ``epoch_col`` (0-based copy index; loaders treat
    epoch>0 as repetition).

    Scale: per-source counts are one partial-agg'd groupBy (rows =
    #sources); rates come back via a broadcast join; the copy fan-out is
    a narrow ``explode(sequence())`` — no corpus shuffle anywhere, and
    expected output size is ~N by construction (Σ q_s·N = N).

    Rows with a NULL ``source_col`` are DROPPED (the rate join cannot
    match a null key and no mixture share is defined for them) — fill or
    filter unattributed rows upstream if they must survive.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    tot = counts.agg(
        F.sum("__n").alias("__N"),
        F.sum(F.pow(F.col("__n").cast("double"), F.lit(float(alpha)))).alias(
            "__Z"
        ),
    )
    nn = F.col("c.__n").cast("double")
    rates = (
        counts.alias("c")
        .crossJoin(F.broadcast(tot).alias("t"))
        .select(
            source_col,
            F.round(
                F.pow(nn, F.lit(float(alpha)))
                / F.col("t.__Z")
                * F.col("t.__N")
                / nn,
                6,
            ).alias("__r"),
        )
    )
    h = stable_hash64(F.col(id_col).cast("string"), seed=seed) % 1_000_000
    n_copies = (
        F.floor(F.col("__r")).cast("int")
        + F.when(
            h < F.round((F.col("__r") - F.floor(F.col("__r"))) * 1_000_000).cast(
                "long"
            ),
            1,
        ).otherwise(0)
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .withColumn("__copies", n_copies)
        .filter(F.col("__copies") > 0)
        .withColumn(
            epoch_col, F.explode(F.sequence(F.lit(0), F.col("__copies") - 1))
        )
        .drop("__r", "__copies")
    )


def score_buckets(
    df: DataFrame,
    *,
    n_buckets: int = 10,
    score_col: str = "score",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group quantile bucketing of a quality score — the curriculum /
    CCNet-style tiering step (public CCNet buckets docs by LM perplexity
    into head/middle/tail per language): each group's rows are ranked by
    (score desc, id asc — the deterministic tie-break every hash-graded
    operator here uses) and dealt into ``n_buckets`` equal-frequency tiers
    via ``ntile``; bucket 1 is the best-scoring tier.

    Output: input columns + ``bucket`` (1..n_buckets). One shuffle on the
    group key; groups sort-and-spill independently, the same shape (and
    the same mega-group caveat) as cap_per_group.
    """
    # explicit NULLS LAST: Spark's desc() defaults to nulls-last but ANSI
    # engines (DuckDB) default DESC to nulls-FIRST — pinning it keeps the
    # operator's tiering portable when scores can be NULL (a NULL score =
    # worst tier, which is also the sane semantics)
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc_nulls_last(), F.col(id_col).asc()
    )
    return df.withColumn("bucket", F.ntile(n_buckets).over(w))


def training_order(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    seed: int = 7,
    n_buckets: int = 256,
) -> DataFrame:
    """Deterministic global training order: every row gets a unique dense
    ``position`` (0..n-1) in hash-shuffled order — the reproducible corpus
    shuffle a training run needs (same data + seed → same order, on any
    cluster size).

    The naive form — ``row_number() OVER (ORDER BY hash)`` — funnels the
    whole corpus through ONE task; ``monotonically_increasing_id`` is
    partition-layout-dependent (not stable) and ``zipWithIndex`` drops to
    RDDs. This is the scale shape, all DataFrame ops:

    1. order key ``h = stable_hash64(id, seed)``;
    2. ARITHMETIC range bucket ``h >> 52`` — monotone in ``h`` and a pure
       function of the row (unlike ``repartitionByRange``, whose sampled
       boundaries are not deterministic across runs); ``stable_hash64`` is
       a 60-bit nonnegative hash, so the top-8-bit slice is bits 52..59 →
       ``n_buckets`` (power of two; default 256) uniformly populated
       buckets from the top bits — shift ``60 - log2(n_buckets)`` (a
       56-shift would populate only 16 of 256 — the round-4 advisor
       catch);
    3. per-bucket dense rank (windows parallelize across buckets);
    4. bucket offsets from a #buckets-row count aggregate, broadcast back;
       ``position = offset + rank - 1``.

    Hash buckets are uniform for any real corpus; a pathological id set
    collapsing into few buckets degrades parallelism, not correctness.
    Output: input columns + ``position`` (bigint, dense, 0-based).
    """
    if n_buckets < 1 or n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    shift = max(60 - (n_buckets.bit_length() - 1), 0)
    h = stable_hash64(F.col(id_col).cast("string"), seed=seed)
    b = F.shiftright(h, shift)
    staged = df.withColumn("_h", h).withColumn("_b", b.cast("int"))
    w = Window.partitionBy("_b").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    ranked = staged.withColumn("_rank", F.row_number().over(w))
    sizes = (
        staged.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    )
    w_off = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, -1
    )  # #buckets rows — the single-partition window is 256 rows, not the corpus
    offsets = sizes.withColumn(
        "_offset", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    ).select("_b", "_offset")
    return (
        ranked.join(F.broadcast(offsets), "_b")
        .withColumn(
            "position", (F.col("_offset") + F.col("_rank") - 1).cast("bigint")
        )
        .drop("_h", "_b", "_rank", "_offset")
    )


def pack_manifest(
    df: DataFrame,
    *,
    budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Loader-ready packing manifest: :func:`pack_sequences`' bin
    assignment plus each document's [start, end) TOKEN OFFSETS inside its
    packed sequence — exactly what a training loader needs to build the
    block-diagonal attention mask that stops cross-document attention
    inside a packed context window.

    Offsets come from the same per-group window as the packing itself
    (running token total within (group, bin), minus the doc's own count),
    so the manifest adds ZERO new shuffles — one more projection over the
    already-sorted window. Output: (group, bin_id, doc_id, start, end).
    """
    packed = pack_sequences(
        df, budget=budget, group_col=group_col, id_col=id_col, token_col=token_col
    )
    w = (
        Window.partitionBy(group_col, "bin_id")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    end = F.sum(token_col).over(w)
    return packed.select(
        F.col(group_col),
        "bin_id",
        id_col,
        (end - F.col(token_col)).cast("bigint").alias("start"),
        end.cast("bigint").alias("end"),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    *,
    group_col: str | None = None,
    id_col: str = "doc_id",
    seed: int = 13,
    key_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement — the
    quality-weighted corpus subsample (pick k docs per group with
    probability proportional to a score) via the public
    Efraimidis-Spirakis A-ES scheme: each row gets key u^(1/w) for a
    uniform u, and the k largest keys ARE a weight-proportional sample.

    Determinism is the repo's sampling contract (``deterministic_sample``):
    u is derived from ``stable_hash64(id, seed)`` — no ``rand()``, so the
    sample is reproducible across runs, partitionings, and engines.  The
    key is compared in log form ``ln(u)/w`` (monotone in u^(1/w)), rounded
    to 9 decimals with id tie-break so the DuckDB oracle replays the exact
    selection.

    Scale: grouped top-k is one window per group (shuffle on the group
    key); the global variant (``group_col=None``) is ``orderBy().limit(k)``
    — Spark's distributed take-ordered, NOT a single-task global sort.
    Rows with non-positive or NULL weight are excluded (their sampling
    probability is 0).  ``key_col`` optionally exposes the rounded key.
    """
    u = (
        stable_hash64(F.col(id_col).cast("string"), seed=seed) + F.lit(1)
    ).cast("double") / F.lit(float(1 << 60))
    lkey = F.round(F.log(u) / F.col(weight_col).cast("double"), 9)
    out_key = key_col or "_wkey"
    base = df.filter(F.col(weight_col) > 0).withColumn(out_key, lkey)
    if group_col is not None:
        w = Window.partitionBy(group_col).orderBy(
            F.col(out_key).desc(), F.col(id_col).asc()
        )
        picked = (
            base.withColumn("_wrn", F.row_number().over(w))
            .filter(F.col("_wrn") <= k)
            .drop("_wrn")
        )
    else:
        picked = base.orderBy(F.col(out_key).desc(), F.col(id_col).asc()).limit(k)
    return picked if key_col else picked.drop(out_key)


def curriculum_order(
    df: DataFrame,
    *,
    score_col: str = "n_chars",
    group_col: str = "source",
    n_buckets: int = 10,
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Curriculum training schedule: global dense ``position`` that visits
    quality tiers in order (per-``group_col`` ntile buckets of
    ``score_col``, best first — the CCNet-style tiering of
    :func:`score_buckets`, so every source contributes to every tier) while
    hash-shuffling WITHIN each tier (no accidental ordering by score or
    id inside a tier).

    The composition of two graded operators, with :func:`training_order`'s
    funnel-free enumeration generalized to a (bucket, hash-subbucket)
    partitioning: per-partition dense ranks + a (n_buckets·256)-row offset
    broadcast — no single-task global sort anywhere.  Output: input
    columns + ``bucket`` + ``position`` (bigint, dense, 0-based,
    tier-major).
    """
    tiers = score_buckets(
        df, n_buckets=n_buckets, score_col=score_col, group_col=group_col
    )
    h = stable_hash64(F.col(id_col).cast("string"), seed=seed)
    staged = tiers.withColumn("_h", h).withColumn(
        "_sb", F.shiftright(h, 52).cast("int")
    )
    w = Window.partitionBy("bucket", "_sb").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    ranked = staged.withColumn("_rank", F.row_number().over(w))
    sizes = staged.groupBy("bucket", "_sb").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("bucket", "_sb").rowsBetween(
        Window.unboundedPreceding, -1
    )  # n_buckets*256 rows — not the corpus
    offsets = sizes.withColumn(
        "_offset", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    ).select("bucket", "_sb", "_offset")
    return (
        ranked.join(F.broadcast(offsets), ["bucket", "_sb"])
        .withColumn(
            "position", (F.col("_offset") + F.col("_rank") - 1).cast("bigint")
        )
        .drop("_h", "_sb", "_rank", "_offset")
    )


def length_bucketed_batches(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 16,
    bucket_width: int = 32,
    seed: int = 11,
    n_subbuckets: int = 256,
) -> DataFrame:
    """Padding-efficient batch construction: group documents into
    fixed-width LENGTH buckets (``floor(n_tokens / bucket_width)``),
    hash-shuffle deterministically within each bucket, and cut consecutive
    runs of ``batch_size`` into batches — the standard loader trick that
    makes batch members near-equal length so per-batch padding
    (``batch_max − each``) stays small. Emits the per-batch efficiency
    report a pipeline owner tunes ``bucket_width`` against:
    (length_bucket, batch_index, n_docs, batch_max_tokens, total_tokens,
    pad_frac).

    Scale shape — per-bucket dense positions use the same funnel-free
    technique as :func:`training_order`, one level down: the window
    partitions on (length_bucket, hash-subbucket) so no bucket funnels
    through one task; subbucket offsets come from a
    #length_buckets×#subbuckets-row aggregate (windowed per length bucket
    — tiny), broadcast back. The subbucket slice of ``stable_hash64`` is
    its top bits, so ordering by (subbucket, hash) ≡ ordering by hash —
    the oracle can replay with a plain sort. ``ntile`` length buckets
    would need a global sort; fixed arithmetic widths don't.
    """
    if n_subbuckets < 1 or n_subbuckets & (n_subbuckets - 1):
        raise ValueError("n_subbuckets must be a power of two")
    from database2ogr_spark.functions.hashing import words

    shift = max(60 - (n_subbuckets.bit_length() - 1), 0)
    h = stable_hash64(F.col(id_col).cast("string"), seed=seed)
    # batching needs a length: NULL-text docs have no tokens to pad
    # against (documents-family dirty-data contract, twin mirrored)
    df = df.filter(F.col(text_col).isNotNull())
    staged = (
        df.select(
            F.col(id_col),
            F.size(words(text_col)).alias("n_tokens"),
        )
        .withColumn("_lb", F.floor(F.col("n_tokens") / bucket_width).cast("int"))
        .withColumn("_h", h)
        .withColumn("_sb", F.shiftright(F.col("_h"), shift).cast("int"))
    )
    w = Window.partitionBy("_lb", "_sb").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    ranked = staged.withColumn("_rank", F.row_number().over(w))
    sizes = staged.groupBy("_lb", "_sb").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.partitionBy("_lb").orderBy("_sb").rowsBetween(
        Window.unboundedPreceding, -1
    )  # ≤ #length_buckets × n_subbuckets rows — never the corpus
    offsets = sizes.withColumn(
        "_offset", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    ).select("_lb", "_sb", "_offset")
    positioned = ranked.join(F.broadcast(offsets), ["_lb", "_sb"]).withColumn(
        "_batch", F.floor((F.col("_offset") + F.col("_rank") - 1) / batch_size)
    )
    return (
        positioned.groupBy("_lb", "_batch")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").alias("batch_max_tokens"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .select(
            F.col("_lb").alias("length_bucket"),
            F.col("_batch").cast("bigint").alias("batch_index"),
            "n_docs",
            "batch_max_tokens",
            "total_tokens",
            F.round(
                F.lit(1.0)
                - F.col("total_tokens").cast("double")
                / (F.col("batch_max_tokens") * F.col("n_docs")),
                6,
            ).alias("pad_frac"),
        )
    )


def select_to_budget(
    df: DataFrame,
    *,
    budget: int,
    cost_col: str,
    score_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy budgeted selection: walk each group best-first (score desc,
    id asc) and keep rows while the running cost total stays within
    ``budget`` — the "fill N tokens of training data from the best
    documents" step of a pretraining mix. A row is kept iff the cumulative
    cost INCLUDING it is ≤ budget (first-fit prefix, not best-fit knapsack
    — the greedy prefix is the industry-standard semantics and the only
    deterministic one worth distributing).

    Output: input columns + ``cum_cost`` (the running total including the
    row). One shuffle — the per-group cumulative sum is a single window
    partitioned by ``group_col``; there is no driver-side loop and no
    second pass. At 100 TB the caveat is the same as every per-group
    window: a single group is sorted within its partition, so a mega-group
    bounds the parallelism — shard hot groups upstream (salting cannot work
    here: a running total is order-carrying), or use per-source budgets
    precisely so each group stays executor-sized.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("cum_cost", F.sum(F.col(cost_col)).over(w))
        .filter(F.col("cum_cost") <= budget)
    )


def dsir_weights(
    df: DataFrame,
    target_filter,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document DSIR importance log-weight (public Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"): score
    every document by how much more likely its hashed-n-gram features are
    under the TARGET distribution (the rows matching ``target_filter``,
    e.g. a trusted high-quality subset) than under the RAW corpus — the
    cheap, model-free data-selection signal that picks "looks like the
    target domain" documents out of a web crawl.

    Features are unigrams + space-joined bigrams of the normalized token
    stream, hashed into ``n_buckets`` buckets with the engine's
    cross-engine-stable md5 hash (``stable_hash64 % n_buckets``). Both
    bag-of-buckets models use add-``alpha`` smoothing over the bucket
    space; a document's weight is

        log w(x) = Σ_grams [ ln p_target(bucket) − ln p_raw(bucket) ]

    Documents with no tokens get ``(0, 0.0)`` (no evidence either way)
    rather than vanishing. Output: ``(id_col, n_feats, log_weight)`` with
    the weight rounded to 6 dp.

    Scale: the corpus is read twice — once to build the two bucket-count
    models (a single partial-agg'd shuffle on the bucket key producing
    BOTH counts: raw count + target count via a conditional sum), once to
    score (the ≤ ``n_buckets``-row log-ratio table broadcasts; the per-doc
    sum is one agg on the id key). Model size is ``n_buckets`` —
    INDEPENDENT of corpus size, the property that makes DSIR run at
    100 TB: no vocabulary ever materializes, hot grams are flattened by
    map-side combine, and the second pass is embarrassingly parallel. We
    deliberately do not cache the gram stream between the two passes — a
    corpus-sized cache costs more than the re-scan it saves.
    """
    from database2ogr_spark.functions.hashing import words
    from database2ogr_spark.operators.partitioning import spread

    if n_buckets <= 1:
        raise ValueError(f"n_buckets must be > 1, got {n_buckets}")
    ws = words(text_col)
    n = F.size(ws)
    m = F.greatest(n - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(ws, 1, m), F.slice(ws, 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = F.concat(ws, bigrams)
    toks = spread(df).select(
        F.col(id_col).alias("id"),
        F.when(target_filter, F.lit(1)).otherwise(F.lit(0)).alias("__tgt"),
        F.explode(grams).alias("g"),
    ).select(
        "id", "__tgt", (stable_hash64(F.col("g")) % n_buckets).alias("bucket")
    )
    counts = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("c_r"), F.sum("__tgt").alias("c_t")
    )
    totals = counts.agg(
        F.sum("c_r").alias("n_r"), F.sum("c_t").alias("n_t")
    )
    a = F.lit(float(alpha))
    b_tot = F.lit(float(alpha * n_buckets))
    ratio = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("c_t") + a) / (F.col("n_t") + b_tot))
            - F.log((F.col("c_r") + a) / (F.col("n_r") + b_tot))
        ).alias("__lr"),
    )
    scored = (
        toks.join(F.broadcast(ratio), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.round(F.sum("__lr"), 6).alias("log_weight"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("bigint").alias("n_feats"),
            F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
        )
    )


def dsir_sample(
    df: DataFrame,
    target_filter,
    *,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    alpha: float = 1.0,
    temperature: float = 1.0,
    seed: int = 7,
) -> DataFrame:
    """Gumbel-top-k importance RESAMPLING over :func:`dsir_weights` — the
    selection half of DSIR: draw ``k`` documents without replacement with
    probability ∝ exp(log_weight / temperature), via the Gumbel-max trick
    with a HASH-DERIVED uniform (``u = (stable_hash64(id, seed)+0.5)/2^60``,
    ``g = −ln(−ln u)``) so the "random" draw is deterministic, replayable
    on any cluster layout, and cross-engine verifiable. ``temperature → 0``
    degenerates to deterministic top-k by weight; large temperatures
    approach uniform sampling.

    Output: ``(id_col, n_feats, log_weight, score)`` for the k selected
    rows, score = round(log_weight/T + gumbel, 6), ordered by
    (score desc, id asc) with the deterministic tie-break.

    Scale: everything is :func:`dsir_weights` plus one in-row gumbel
    expression and a distributed TakeOrdered cut — no global sort.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    wts = dsir_weights(
        df, target_filter, id_col=id_col, text_col=text_col,
        n_buckets=n_buckets, alpha=alpha,
    )
    h = stable_hash64(F.col(id_col).cast("string"), seed=seed)
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    gumbel = -F.log(-F.log(u))
    return (
        wts.withColumn(
            "score",
            F.round(F.col("log_weight") / F.lit(float(temperature)) + gumbel, 6),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def skipgram_negative_samples(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 2,
    n_neg: int = 2,
    power: float = 0.75,
    weight_scale: int = 1000,
    seed: int = 11,
) -> DataFrame:
    """Skip-gram-with-negative-sampling training pairs (public Mikolov et
    al. 2013, word2vec SGNS): for every (center, context) co-occurrence
    within ±``window``, emit the positive pair plus ``n_neg`` negatives
    drawn from the unigram^``power`` noise distribution — the classic
    embedding-training data-prep step, deterministic end to end.

    The noise draw is exact integer inverse-CDF sampling: vocab weights
    are ``max(1, round(count^power · weight_scale))`` (integers), the
    cumulative table assigns each word an interval [lo, hi) of the total
    weight space T, and each (occurrence, j) draws ``u = h64(payload) mod
    T`` with the md5-stable hash — replayable in any engine, no RNG
    state. The interval lookup is a BUCKETIZED equi-join (intervals
    explode over ~1024 fixed-width buckets of the weight space; each draw
    computes its bucket) — never a nested-loop range scan, the same shape
    as timeseries.range_join. Negatives may occasionally equal the true
    context (the standard implementations tolerate this; resampling would
    break the fixed-fanout determinism).

    Output: ``(id_col, pos, ctx_offset, center, context, label, neg_ix)`` —
    ``label`` 1 for the observed pair (neg_ix 0), 0 for negatives
    (neg_ix 1..n_neg); ``ctx_offset`` is the signed context offset (named to dodge the
    reserved word).

    Scale: pair extraction is slice+zip_with per offset in codegen
    (windowed_pmi's shape); the vocab/cumulative/bucket tables are
    vocabulary-sized and broadcast; the draw join is an equi-join on the
    bucket key. Output fanout is exactly (1 + n_neg) × positives.
    """
    from database2ogr_spark.functions.hashing import words

    if window < 1 or n_neg < 1:
        raise ValueError(f"window and n_neg must be >= 1, got {window}, {n_neg}")
    spark = df.sparkSession
    ws = words(text_col)
    parts = []
    for d in range(1, window + 1):
        m = F.greatest(F.size(ws) - d, F.lit(0))
        zipped = df.select(
            F.col(id_col).alias("id"),
            F.posexplode(
                F.arrays_zip(
                    F.slice(ws, 1, m).alias("wa"),
                    F.slice(ws, 1 + d, m).alias("wb"),
                )
            ).alias("i", "z"),
        ).select(
            "id",
            F.col("i").alias("pos"),
            F.col("z.wa").alias("wa"),
            F.col("z.wb").alias("wb"),
        )
        # both orientations (+d and −d) emitted from ONE pass via an
        # inline 2-element explode: referencing `zipped` from two separate
        # union branches planned (and executed) the slice+zip subtree twice
        # per offset — 2× the corpus scans for identical output rows
        # (r11 plan audit)
        parts.append(
            zipped.select(
                "id",
                F.explode(
                    F.array(
                        F.struct(
                            F.col("pos").alias("pos"),
                            F.lit(d).alias("ctx_offset"),
                            F.col("wa").alias("center"),
                            F.col("wb").alias("context"),
                        ),
                        F.struct(
                            (F.col("pos") + d).alias("pos"),
                            F.lit(-d).alias("ctx_offset"),
                            F.col("wb").alias("center"),
                            F.col("wa").alias("context"),
                        ),
                    )
                ).alias("p"),
            ).select(
                "id",
                F.col("p.pos").alias("pos"),
                F.col("p.ctx_offset").alias("ctx_offset"),
                F.col("p.center").alias("center"),
                F.col("p.context").alias("context"),
            )
        )
    pos_pairs = parts[0]
    for p in parts[1:]:
        pos_pairs = pos_pairs.unionByName(p)

    counts = df.select(F.explode(ws).alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )
    wtd = counts.select(
        "w",
        F.greatest(
            F.lit(1),
            F.round(F.pow(F.col("c").cast("double"), F.lit(float(power)))
                    * F.lit(int(weight_scale))).cast("bigint"),
        ).alias("wt"),
    )
    cw = Window.orderBy(F.col("wt").desc(), F.col("w").asc())
    # NOT persisted (r12, reverting the r11 persist on driver evidence —
    # skipgram_negatives regressed ×1.24 on the driver machine, local A/B
    # neutral): the interval table's two references (the total and the
    # bucket explode) replay an IDENTICAL subtree whose corpus unigram
    # explode+count sits under an Exchange, so AQE exchange/stage reuse
    # already executes it once — the r11 #16 rule; the persist only added
    # a cache-materialization barrier.
    cum = wtd.select(
        "w", "wt",
        (F.coalesce(
            F.sum("wt").over(cw.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )).alias("lo"),
    ).withColumn("hi", F.col("lo") + F.col("wt"))
    tot = cum.agg(F.max("hi").alias("T"), F.count(F.lit(1)).alias("V"))

    # bucketized interval lookup over the integer weight space
    bucketed = (
        cum.crossJoin(F.broadcast(tot))
        .withColumn("__bw", F.greatest(F.floor(F.col("T") / 1024), F.lit(1)))
        .withColumn(
            "__bk",
            F.explode(
                F.sequence(
                    F.floor(F.col("lo") / F.col("__bw")),
                    F.floor((F.col("hi") - 1) / F.col("__bw")),
                )
            ),
        )
        .select("w", "lo", "hi", "__bk")
    )
    draws = (
        pos_pairs.crossJoin(F.broadcast(tot))
        .select(
            "id", "pos", "ctx_offset", "center", "context", "T",
            F.explode(F.array(*[F.lit(j) for j in range(1, n_neg + 1)])).alias(
                "neg_ix"
            ),
        )
        .withColumn(
            "__u",
            stable_hash64(
                F.concat_ws(
                    ":",
                    F.col("id").cast("string"),
                    F.col("pos").cast("string"),
                    F.col("ctx_offset").cast("string"),
                    F.col("neg_ix").cast("string"),
                ),
                seed=seed,
            )
            % F.col("T"),
        )
        .withColumn(
            "__bk", F.floor(F.col("__u") / F.greatest(F.floor(F.col("T") / 1024), F.lit(1)))
        )
    )
    negs = (
        draws.join(F.broadcast(bucketed), "__bk")
        .filter((F.col("__u") >= F.col("lo")) & (F.col("__u") < F.col("hi")))
        .select(
            "id", "pos", "ctx_offset", "center",
            F.col("w").alias("context"),
            F.lit(0).alias("label"),
            "neg_ix",
        )
    )
    pos_out = pos_pairs.select(
        "id", "pos", "ctx_offset", "center", "context",
        F.lit(1).alias("label"), F.lit(0).alias("neg_ix"),
    )
    return pos_out.unionByName(negs).select(
        F.col("id").alias(id_col), "pos", "ctx_offset", "center", "context",
        "label", "neg_ix",
    )


def temporal_split(
    events: DataFrame,
    *,
    cutoff: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Leakage-safe temporal train/test split over an event stream — the
    evaluation protocol for behavioral/recommendation models: everything
    before ``cutoff`` trains; only events from users with NO pre-cutoff
    history test (cold-start users); post-cutoff events of KNOWN users
    are DISCARDED, because a model that saw a user's history answers
    their future from memorization, not generalization (the user-blocked
    protocol — time-based splitting alone leaks identity).

    ``cutoff`` is an ISO timestamp string literal, so the split is a pure
    function of the data. Output: all event columns + ``split`` ∈
    {'train', 'test', 'discard'}.

    Scale: one per-user min-timestamp aggregation (partial-agg'd on the
    user key) joined back on the same key — AQE broadcasts it when the
    user dimension is small; the labeling is in-row.
    """
    cut = F.lit(cutoff).cast("timestamp")
    first = events.groupBy(F.col(user_col).alias("__u")).agg(
        F.min(F.col(ts_col)).alias("__first")
    )
    joined = events.join(
        first, events[user_col] == F.col("__u"), "left"
    )
    # the protocol labels EVERY event: rows with no time or no identity
    # cannot be placed on either side of the cutoff safely → 'discard'
    # (explicit first branch, so NULL comparisons never decide a label)
    split = (
        F.when(
            F.col(ts_col).isNull() | F.col(user_col).isNull(), F.lit("discard")
        )
        .when(F.col(ts_col) < cut, F.lit("train"))
        .when(F.col("__first") >= cut, F.lit("test"))
        .otherwise(F.lit("discard"))
    )
    return joined.select(*events.columns, split.alias("split"))


def kfold_assign(
    df: DataFrame,
    *,
    k: int = 5,
    id_col: str = "doc_id",
    stratify_col: str | None = None,
    seed: int = 11,
) -> DataFrame:
    """Stratified k-fold cross-validation assignment: adds a ``fold``
    column (0..k−1) with EXACT per-stratum balance — within each stratum
    the fold sizes differ by at most one, the property hash-mod
    assignment only approximates (a 5% lang stratum at k=5 can easily
    land 2:1 skewed by hash luck; exact balance is what keeps per-fold
    metrics comparable).

    Assignment: hash-shuffle rows within each stratum (stable_hash64 of
    the id, id tie-break), take ``row_number() % k``. Deterministic
    under repartitioning and retries; NOT append-stable (adding rows
    renumbers a stratum — use :func:`split_corpus` for frozen eval
    sets; k-fold is a within-snapshot protocol by nature).

    Scale: ONE shuffle, partitioned by stratum. For the unstratified
    form (``stratify_col=None``) a single global row_number would
    funnel through one task — instead the hash itself becomes a 256-way
    sub-stratum (balanced in expectation at corpus scale, exact within
    each sub-stratum), keeping the window parallel.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    h = stable_hash64(F.col(id_col).cast("string"), seed=seed)
    if stratify_col is not None:
        part = [F.col(stratify_col)]
    else:
        # 256 hash sub-strata: parallel windows, ±1 balance within each
        part = [F.shiftright(h, 52)]
    w = Window.partitionBy(*part).orderBy(h.asc(), F.col(id_col).asc())
    return df.withColumn(
        "fold", ((F.row_number().over(w) - 1) % k).cast("int")
    )


def class_weights(
    df: DataFrame,
    label_col: str,
    *,
    beta: float = 0.999,
) -> DataFrame:
    """Class-balanced loss weights (public Cui et al. 2019, 'effective
    number of samples'): per label, ``w = (1−β)/(1−β^n)`` normalized so
    weights average 1 over classes — the table a trainer joins against
    an imbalanced corpus instead of naive 1/n re-weighting (which
    over-boosts tiny noisy classes; the effective-number form saturates).
    β→1 approaches inverse-frequency, β=0 gives uniform.

    Output: (label_col, n, effective_n, weight) — one row per label,
    doubles rounded 6. NULL labels form their own class (they will hit
    the loss too).

    Scale: ONE label-keyed partial-agg'd count; the weight arithmetic
    and normalization run on #classes rows.
    """
    if not 0.0 <= beta < 1.0:
        raise ValueError("beta must be in [0, 1)")
    per = df.groupBy(F.col(label_col)).agg(F.count(F.lit(1)).alias("n"))
    eff = (F.lit(1.0) - F.pow(F.lit(beta), F.col("n").cast("double"))) / F.lit(
        1.0 - beta
    )
    raw = F.lit(1.0) / eff
    tot = per.select(F.sum(raw).alias("s"), F.count(F.lit(1)).alias("k"))
    return per.crossJoin(F.broadcast(tot)).select(
        label_col,
        F.col("n").cast("bigint").alias("n"),
        F.round(eff, 6).alias("effective_n"),
        F.round(raw * F.col("k").cast("double") / F.col("s"), 6).alias("weight"),
    )


def nested_subsets(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    mass_col: str | None = None,
    levels: int = 6,
    seed: int = 23,
) -> DataFrame:
    """Nested power-of-two subsets for scaling-law / learning-curve runs:
    level k keeps rows whose 60-bit id-hash falls below 2⁶⁰/2^(levels−1−k)
    — so every smaller subset is a SUBSET of every larger one (the
    property that makes loss curves comparable across scales; fresh
    random samples per size are not nested and confound the curve) and
    membership is stable under repartitioning, retries, and appends.

    Output: (level, keep_fraction, n_rows, mass) — one row per level
    0..levels−1 (level levels−1 = the full corpus), mass = Σ mass_col
    (row count when None). A trainer materializes level k via the same
    hash predicate; this report is the manifest.

    Scale: ONE pass — each row contributes to every level it belongs to
    via a conditional-sum aggregate (no per-level scans, no explode).
    """
    if levels < 2:
        raise ValueError("levels must be >= 2")
    h = stable_hash64(F.col(id_col).cast("string"), seed=seed)
    m = F.lit(1).cast("long") if mass_col is None else F.col(mass_col)
    space = 1 << 60
    aggs = []
    for k in range(levels):
        cut = space // (1 << (levels - 1 - k))
        aggs += [
            F.sum(F.when(h < cut, 1).otherwise(0)).cast("bigint").alias(f"n{k}"),
            F.sum(F.when(h < cut, m).otherwise(0)).cast("bigint").alias(f"m{k}"),
        ]
    row = df.agg(*aggs)
    per = F.array(
        *[
            F.struct(
                F.lit(k).alias("level"),
                F.round(F.lit(1.0 / (1 << (levels - 1 - k))), 9).alias(
                    "keep_fraction"
                ),
                F.col(f"n{k}").alias("n_rows"),
                F.col(f"m{k}").alias("mass"),
            )
            for k in range(levels)
        ]
    )
    return row.select(F.explode(per).alias("p")).select("p.*")
