"""Snapshot reconciliation: classify rows between two dataset versions.

Incremental 100 TB pipelines re-export corpora continuously; before
promoting a new snapshot you want to know WHAT moved — rows added, removed,
changed, unchanged — without shipping either snapshot anywhere. This is the
FULL OUTER JOIN surface: both sides reduce to (id, fingerprint) projections
before the join, so the shuffle carries two 8-byte-ish columns per row
regardless of row width, and the classification is a narrow CASE.

Fingerprints are md5 over the compared columns joined with a unit separator
(0x1f) and a NULL sentinel — hex md5 is identical in Spark and DuckDB, so
the operator is exactly oracle-reproducible. Compare columns should be
strings/integers; floats cast to string are engine-formatting-sensitive and
belong behind an explicit round/format first (documented contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: field / null sentinels for the fingerprint concat — ASCII control chars
#: that cannot appear in the data columns of a sane corpus
_SEP = "\x1f"
_NULL = "\x00"


def row_fingerprint(cols: list[str]) -> F.Column:
    """Hex md5 over the named columns, NULL-safe and order-pinned."""
    return F.md5(
        F.concat_ws(
            _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
        )
    )


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    *,
    compare_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Return one row per id present in either snapshot:
    (id_col, status ∈ {added, removed, changed, unchanged}).

    Both sides project to (id, fp) BEFORE the full outer join — at scale
    the wide row bodies never shuffle, only ids and 32-char fingerprints.
    """
    cols = list(compare_cols) if compare_cols else [
        c for c in new.columns if c != id_col
    ]
    o = old.select(F.col(id_col).alias("_id"), row_fingerprint(cols).alias("old_fp"))
    n = new.select(F.col(id_col).alias("_id"), row_fingerprint(cols).alias("new_fp"))
    return (
        o.join(n, "_id", "full_outer")
        .select(
            F.col("_id").alias(id_col),
            F.when(F.col("old_fp").isNull(), F.lit("added"))
            .when(F.col("new_fp").isNull(), F.lit("removed"))
            .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
            .otherwise(F.lit("changed"))
            .alias("status"),
        )
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    id_col: str = "doc_id",
    *,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC batch to a snapshot — the MERGE half of the
    reconciliation surface (:func:`dataset_diff` tells you what moved;
    this produces the next snapshot): ``changes`` carries the base schema
    plus ``op_col`` ∈ {'upsert', 'delete'}; the result is

    - base rows whose key is untouched by the batch, plus
    - the batch's upsert rows (inserts AND updates — last-write-wins by
      key within the batch is the CALLER's contract: feed one row per
      key, e.g. via ``dedup`` or a max-timestamp reduction upstream).

    Scale shape: ONE left-anti equi-join of base against the batch's key
    projection (a CDC batch is ≪ the snapshot, so AQE broadcasts the key
    side — the base never shuffles) + a union. No full outer join, no
    window. Unknown ops raise rather than silently drop.
    """
    ops = [r[0] for r in changes.select(op_col).distinct().collect()]  # ≤ #op kinds
    unknown = set(ops) - {"upsert", "delete"}
    if unknown:
        raise ValueError(f"unknown {op_col!r} values: {sorted(unknown)}")
    touched = changes.select(F.col(id_col)).distinct()
    kept = base.join(touched, id_col, "left_anti")
    upserts = changes.filter(F.col(op_col) == "upsert").drop(op_col)
    return kept.unionByName(upserts)


def drift_report(
    base: DataFrame,
    current: DataFrame,
    *,
    value_col: str,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Distribution-drift report between two snapshots of one numeric
    column: per-bin counts/fractions plus the Population Stability Index
    term ``(p_cur − p_base)·ln(p_cur / p_base)`` — Σ of the column is the
    classic PSI (<0.1 stable, 0.1-0.25 drifting, >0.25 shifted).

    Bin edges are EQUAL-WIDTH over the BASE min/max (drift must be read
    against the base frame); current values outside the base range clamp
    into the edge bins — exactly where out-of-range drift should show up.
    A constant base column (max = min) degenerates to width 1, putting all
    base mass in bin 0. Zero-count bins are ``eps``-smoothed so the log is
    total. All fractions and PSI terms are rounded to 6 after the exact
    arithmetic.

    Scale: one 2-value aggregate over base (broadcast), one ≤``n_bins``-key
    partial-agg'd groupBy per side, and a ``range(n_bins)`` spine so empty
    bins appear (silently dropping them understates PSI). Nothing
    corpus-sized shuffles; the report is n_bins rows.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    bounds = base.agg(
        F.min(F.col(value_col).cast("double")).alias("mn"),
        F.max(F.col(value_col).cast("double")).alias("mx"),
    )

    def _binned(df: DataFrame) -> DataFrame:
        width = F.when(F.col("mx") > F.col("mn"),
                       (F.col("mx") - F.col("mn")) / F.lit(float(n_bins))
                       ).otherwise(F.lit(1.0))
        raw = F.floor((F.col(value_col).cast("double") - F.col("mn")) / width)
        clamped = F.least(
            F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)
        ).cast("int")
        return (
            df.filter(F.col(value_col).isNotNull())
            .crossJoin(F.broadcast(bounds))
            .select(clamped.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    spine = base.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    b = _binned(base).withColumnRenamed("n", "base_n")
    c = _binned(current).withColumnRenamed("n", "cur_n")
    joined = (
        spine.join(b, "bin", "left")
        .join(c, "bin", "left")
        .select(
            "bin",
            F.coalesce("base_n", F.lit(0)).alias("base_n"),
            F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
        )
    )
    tot = joined.agg(
        F.sum("base_n").alias("bt"), F.sum("cur_n").alias("ct")
    )
    # try_divide: a zero-row side yields NULL shares, and greatest()
    # skips NULLs, so empty snapshots degrade to the eps floor instead
    # of an ANSI DIVIDE_BY_ZERO crash; identical arithmetic otherwise
    pb = F.greatest(F.try_divide(F.col("base_n"), F.col("bt")), F.lit(float(eps)))
    pc = F.greatest(F.try_divide(F.col("cur_n"), F.col("ct")), F.lit(float(eps)))
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "base_n",
            "cur_n",
            F.round(pb, 6).alias("base_frac"),
            F.round(pc, 6).alias("cur_frac"),
            F.round((pc - pb) * F.log(pc / pb), 6).alias("psi_term"),
        )
    )


def ks_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test between two groups' numeric
    distributions — the exact, binning-free companion to
    :func:`drift_report`'s PSI (PSI needs a bin width and saturates;
    the KS statistic D = sup |F_a(x) − F_b(x)| is parameter-free and
    comes with a significance threshold). NULL values are excluded (a
    CDF has no place for them); rows in other groups are ignored.

    Output is ONE row: ``(n_a, n_b, d_stat, d_crit_95, reject_95)`` —
    D, the asymptotic 95% critical value ``1.358·√((n_a+n_b)/(n_a·n_b))``
    (public Smirnov approximation), and the comparison, all rounded 6 dp.

    Scale: the same distinct-value histogram trick as quantile_normalize
    and classifier_auc — one (value → conditional counts) partial-agg'd
    shuffle, then the cumulative window runs over DISTINCT VALUES only
    (bounded by value cardinality, not row count). No corpus global sort.
    """
    sel = df.filter(
        F.col(group_col).isin(group_a, group_b)
        & F.col(value_col).isNotNull()
    ).select(
        F.col(value_col).cast("double").alias("v"),
        (F.col(group_col) == group_a).alias("is_a"),
    )
    hist = sel.groupBy("v").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("cb"),
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        F.sum("ca").over(w).alias("fa"), F.sum("cb").over(w).alias("fb")
    )
    tot = hist.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
    )
    d = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "n_a",
            "n_b",
            # try_divide: a zero-row sample makes the test undefined
            # (NULL), not an ANSI DIVIDE_BY_ZERO crash; identical when
            # both samples are non-empty
            F.abs(
                F.try_divide(F.col("fa").cast("double"), F.col("n_a"))
                - F.try_divide(F.col("fb").cast("double"), F.col("n_b"))
            ).alias("__d"),
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("__d").alias("__dmax"))
    )
    crit = F.lit(1.358) * F.sqrt(
        F.try_divide(
            (F.col("n_a") + F.col("n_b")).cast("double"),
            (F.col("n_a") * F.col("n_b")).cast("double"),
        )
    )
    return d.select(
        "n_a",
        "n_b",
        F.round(F.col("__dmax"), 6).alias("d_stat"),
        F.round(crit, 6).alias("d_crit_95"),
        (F.round(F.col("__dmax"), 6) > F.round(crit, 6)).alias("reject_95"),
    )


def randomization_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    *,
    id_col: str = "doc_id",
    n_perm: int = 200,
    seed: int = 17,
) -> DataFrame:
    """Randomization test for a difference in group means — the
    significance companion to :func:`ks_test` (KS asks "same
    distribution?"; this asks "is THIS mean gap explainable by label
    noise?"). Null draws are RANDOM REALLOCATIONS of rows to the two
    groups in the observed proportion (the unconditional randomization /
    bootstrap-style null — group sizes vary binomially per draw, the
    standard large-sample variant; exact size-preserving permutations
    would need a per-draw global rank). Every draw is a pure function of
    ``(id, draw index, seed)`` via the md5-stable hash — deterministic,
    partition-independent, cross-engine replayable.

        p = (1 + #{ |diff_j| ≥ |observed| }) / (n_perm + 1)

    with both sides rounded to 6 dp before the comparison (the
    engine-stable cut). NULL values and other groups are excluded.
    Output: ONE row (n_a, n_b, obs_diff, n_perm, p_value).

    Scale: the draw table is an in-row ×``n_perm`` explode of the
    (id, value) stream; per-draw sums are ONE partial-agg'd shuffle on
    the draw index (≤ n_perm keys); everything after runs on n_perm rows.
    """
    if n_perm < 1:
        raise ValueError(f"n_perm must be >= 1, got {n_perm}")
    from database2ogr_spark.functions.hashing import stable_hash64

    sel = df.filter(
        F.col(group_col).isin(group_a, group_b)
        & F.col(value_col).isNotNull()
    ).select(
        F.col(id_col).cast("string").alias("rid"),
        F.col(value_col).cast("double").alias("v"),
        (F.col(group_col) == group_a).alias("is_a"),
    )
    obs = sel.agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).cast("bigint").alias("n_b"),
        (
            F.avg(F.when(F.col("is_a"), F.col("v")))
            - F.avg(F.when(~F.col("is_a"), F.col("v")))
        ).alias("obs_diff"),
    )
    draws = (
        sel.crossJoin(F.broadcast(obs.select("n_a", "n_b")))
        .select(
            "rid",
            "v",
            "n_a",
            "n_b",
            F.explode(F.array(*[F.lit(j) for j in range(1, n_perm + 1)])).alias(
                "j"
            ),
        )
        .select(
            "v",
            "j",
            (
                stable_hash64(
                    F.concat_ws(":", F.col("rid"), F.col("j").cast("string")),
                    seed=seed,
                )
                % (F.col("n_a") + F.col("n_b"))
                < F.col("n_a")
            ).alias("to_a"),
        )
    )
    per_j = draws.groupBy("j").agg(
        F.sum(F.when(F.col("to_a"), F.col("v"))).alias("sa"),
        F.sum(F.when(F.col("to_a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(~F.col("to_a"), F.col("v"))).alias("sb"),
        F.sum(F.when(~F.col("to_a"), 1).otherwise(0)).alias("cb"),
    ).filter((F.col("ca") > 0) & (F.col("cb") > 0))
    hits = per_j.crossJoin(F.broadcast(obs)).agg(
        F.sum(
            F.when(
                F.round(
                    F.abs(F.col("sa") / F.col("ca") - F.col("sb") / F.col("cb")),
                    6,
                )
                >= F.round(F.abs(F.col("obs_diff")), 6),
                1,
            ).otherwise(0)
        ).alias("n_ge")
    )
    return (
        obs.crossJoin(F.broadcast(hits))
        .select(
            "n_a",
            "n_b",
            F.round(F.col("obs_diff"), 6).alias("obs_diff"),
            F.lit(n_perm).alias("n_perm"),
            F.round(
                (F.lit(1) + F.col("n_ge")) / F.lit(float(n_perm + 1)), 6
            ).alias("p_value"),
        )
    )


#: Poisson(1) inverse-CDF thresholds scaled to the 60-bit hash space:
#: P(X <= k) for k = 0..4 (then capped at 5) — shared by the operator and
#: its DuckDB twin so every weight replays exactly.
_POIS1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
]


def bootstrap_ci(
    df: DataFrame,
    value_col: str,
    *,
    id_col: str = "doc_id",
    n_boot: int = 200,
    alpha: float = 0.05,
    seed: int = 23,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for a mean (public Chamandy
    et al. / Google's "Estimating Uncertainty for Massive Data Streams"
    — THE bootstrap that works at scale): instead of resampling rows
    (which needs global coordination), each (row, replicate) draws an
    independent Poisson(1) weight, which for large n is equivalent to
    sampling with replacement — and here the draw is the md5-stable hash
    pushed through the Poisson(1) inverse CDF (capped at 5), so every
    replicate is deterministic, partition-independent, and replayable.

    The CI is the exact order-statistic percentile of the ``n_boot``
    replicate means (smallest value with rank ≥ ⌈q·n⌉ — the same integer
    rule as the datasheet median). NULL values are excluded. Output: ONE
    row (n_rows, n_boot, mean, ci_lo, ci_hi), rounded 6 dp.

    Scale: the replicate table is an in-row ×``n_boot`` explode; per-
    replicate weighted sums are ONE partial-agg'd shuffle on the
    replicate index (≤ n_boot keys); the percentile runs over n_boot
    rows. Work is n_boot × |rows| scan — no resampling state anywhere.
    """
    if n_boot < 2:
        raise ValueError(f"n_boot must be >= 2, got {n_boot}")
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    from database2ogr_spark.functions.hashing import stable_hash64

    sel = df.filter(F.col(value_col).isNotNull()).select(
        F.col(id_col).cast("string").alias("rid"),
        F.col(value_col).cast("double").alias("v"),
    )
    obs = sel.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.avg("v").alias("mu"),
    )
    u = (
        stable_hash64(
            F.concat_ws(":", F.col("rid"), F.col("j").cast("string")),
            seed=seed,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 60))
    w = (
        F.when(F.col("__u") < _POIS1_CDF[0], 0)
        .when(F.col("__u") < _POIS1_CDF[1], 1)
        .when(F.col("__u") < _POIS1_CDF[2], 2)
        .when(F.col("__u") < _POIS1_CDF[3], 3)
        .when(F.col("__u") < _POIS1_CDF[4], 4)
        .otherwise(5)
    )
    draws = (
        sel.select(
            "rid",
            "v",
            F.explode(F.array(*[F.lit(j) for j in range(1, n_boot + 1)])).alias(
                "j"
            ),
        )
        .withColumn("__u", u)
        .select("v", "j", w.alias("w"))
    )
    per_j = (
        draws.groupBy("j")
        .agg(
            F.sum(F.col("w") * F.col("v")).alias("sv"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select(F.round(F.col("sv") / F.col("sw"), 6).alias("bm"))
    )
    from pyspark.sql.window import Window

    lo_rank = int(-(-n_boot * (alpha / 2) // 1))  # ceil
    hi_rank = int(-(-n_boot * (1 - alpha / 2) // 1))
    ranked = per_j.withColumn(
        "rk", F.row_number().over(Window.orderBy("bm"))
    )
    ci = ranked.agg(
        F.min(F.when(F.col("rk") >= lo_rank, F.col("bm"))).alias("ci_lo"),
        F.min(F.when(F.col("rk") >= hi_rank, F.col("bm"))).alias("ci_hi"),
    )
    return (
        obs.crossJoin(F.broadcast(ci))
        .select(
            "n_rows",
            F.lit(n_boot).alias("n_boot"),
            F.round(F.col("mu"), 6).alias("mean"),
            "ci_lo",
            "ci_hi",
        )
    )
