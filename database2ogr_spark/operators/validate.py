"""Declarative data-quality constraints — the validation gate a pipeline
runs before promoting a snapshot to training (the Deequ/expectations
pattern, expressed as one Catalyst plan).

Each rule compiles to a conditional COUNT inside aggregates over single
scans — N column rules on one table cost ONE pass regardless of N, never a
pass per rule. Uniqueness and referential integrity need their own shuffle
by nature (a distinct-count and an anti-join probe); both reduce to the
key columns before shuffling.

Output is one row per rule: (rule, violations). A gate is then
``violations == 0`` per rule — kept as counts, not booleans, because at
100 TB you want the magnitude (3 bad rows vs 3 billion) before deciding to
block a run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _count_rule(name: str, bad: F.Column) -> F.Column:
    return F.sum(F.when(bad, 1).otherwise(0)).cast("bigint").alias(name)


def validate_constraints(
    df: DataFrame,
    *,
    not_null: tuple[str, ...] = (),
    unique: tuple[str, ...] = (),
    in_range: dict[str, tuple[float, float]] | None = None,
    accepted_values: dict[str, tuple[str, ...]] | None = None,
    foreign_keys: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Return (rule, violations) for every declared constraint.

    - ``not_null``: columns that must not contain NULL.
    - ``unique``: columns whose values must be distinct (violations = rows
      beyond the first per duplicated value).
    - ``in_range``: col -> (lo, hi) inclusive numeric bounds (NULL passes —
      combine with not_null to forbid).
    - ``accepted_values``: col -> allowed literals (NULL passes).
    - ``foreign_keys``: col -> one-column DataFrame of valid keys;
      violations = rows whose non-null key has no match (left-anti probe on
      the reduced key column).
    """
    in_range = in_range or {}
    accepted_values = accepted_values or {}
    foreign_keys = foreign_keys or {}

    row_rules = []
    for c in not_null:
        row_rules.append(_count_rule(f"not_null:{c}", F.col(c).isNull()))
    for c, (lo, hi) in in_range.items():
        row_rules.append(
            _count_rule(
                f"in_range:{c}",
                F.col(c).isNotNull() & ~F.col(c).between(lo, hi),
            )
        )
    for c, vals in accepted_values.items():
        row_rules.append(
            _count_rule(
                f"accepted_values:{c}",
                F.col(c).isNotNull() & ~F.col(c).isin(list(vals)),
            )
        )

    spark = df.sparkSession
    parts = []
    if row_rules:
        wide = df.agg(*row_rules)
        stack = ", ".join(
            f"'{c}', `{c}`" for c in wide.columns
        )
        parts.append(
            wide.select(
                F.expr(
                    f"stack({len(wide.columns)}, {stack}) AS (rule, violations)"
                )
            )
        )
    for c in unique:
        dup = (
            df.select(c)
            .filter(F.col(c).isNotNull())
            .groupBy(c)
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.coalesce(F.sum(F.col("n") - 1), F.lit(0))
                .cast("bigint")
                .alias("violations")
            )
            .select(F.lit(f"unique:{c}").alias("rule"), "violations")
        )
        parts.append(dup)
    for c, keys in foreign_keys.items():
        orphan = (
            df.select(c)
            .filter(F.col(c).isNotNull())
            .join(keys.toDF("__k"), F.col(c) == F.col("__k"), "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
            .select(F.lit(f"foreign_key:{c}").alias("rule"), "violations")
        )
        parts.append(orphan)
    if not parts:
        return spark.createDataFrame([], "rule string, violations bigint")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    exact_distinct: bool = False,
) -> DataFrame:
    """Per-column profiling report — the discovery half of the data-quality
    surface (:func:`validate_constraints` is the gating half): for every
    column, row/null/distinct counts plus min/max rendered as strings.

    ONE corpus pass: all per-column aggregates ride a single aggregation.
    ``exact_distinct=False`` (default — the 100 TB path) uses HLL
    ``approx_count_distinct``, which keeps the plan a plain partial-agg;
    ``exact_distinct=True`` computes exact distincts (Spark plans an
    expand — rows × #columns — worth it only when the report must be
    reproducible bit-for-bit, e.g. under the DuckDB oracle).

    Output long form: (column, n_rows, n_nulls, n_distinct, min_value,
    max_value) — one row per profiled column, deterministic order by name.
    """
    cols = list(cols) if cols is not None else [f.name for f in df.schema.fields]
    distinct_of = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"{c}__nulls"),
            distinct_of(c).cast("bigint").alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in sorted(cols)
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")


def mutual_information(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """Dependence audit between two categorical columns: entropies and
    mutual information in nats — the leakage detector (is ``source`` a
    proxy for ``lang``? is a metadata column secretly the label?) that
    complements the distribution-level drift_report.

    ONE corpus pass builds the joint (x, y, n) table; marginals, totals,
    and all three entropies are computed FROM that table (its size is
    #combinations, not #rows), so the big data is touched exactly once.
    NULLs count as a category, consistent with k_anonymity_report.

    Output: one row ``(col_x, col_y, h_x, h_y, h_xy, mi, nmi)`` — plug-in
    estimates rounded 6 dp; ``nmi = mi / min(h_x, h_y)`` (NULL when a
    column is constant, i.e. min entropy 0).
    """
    # NOT persisted (r11 A/B): the joint count is referenced by five
    # branches and the textual plan prints the corpus subtree five times,
    # but AQE exchange reuse executes the identical agg ONCE at runtime —
    # a persist here measured as a pure cache-barrier pessimization
    # (see OPTIMIZATION_r11.md #16)
    joint = (
        df.select(
            F.col(col_x).alias("x"), F.col(col_y).alias("y")
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    d = "double"

    def _ent(counts: DataFrame) -> F.Column:
        # -sum(p ln p) over the given count table (expects column n, tot)
        p = F.col("n").cast(d) / F.col("tot")
        return -F.sum(p * F.log(p))

    tot = joint.agg(F.sum("n").alias("tot"))
    j = joint.crossJoin(F.broadcast(tot))
    h_xy = j.agg(_ent(j).alias("h_xy"))
    mx = (
        joint.groupBy("x")
        .agg(F.sum("n").alias("n"))
        .crossJoin(F.broadcast(tot))
    )
    h_x = mx.agg(_ent(mx).alias("h_x"))
    my = (
        joint.groupBy("y")
        .agg(F.sum("n").alias("n"))
        .crossJoin(F.broadcast(tot))
    )
    h_y = my.agg(_ent(my).alias("h_y"))
    return (
        h_x.crossJoin(h_y)
        .crossJoin(h_xy)
        .select(
            F.lit(col_x).alias("col_x"),
            F.lit(col_y).alias("col_y"),
            F.round("h_x", 6).alias("h_x"),
            F.round("h_y", 6).alias("h_y"),
            F.round("h_xy", 6).alias("h_xy"),
            F.round(
                F.col("h_x") + F.col("h_y") - F.col("h_xy"), 6
            ).alias("mi"),
            F.when(
                F.least("h_x", "h_y") > 0,
                F.round(
                    (F.col("h_x") + F.col("h_y") - F.col("h_xy"))
                    / F.least("h_x", "h_y"),
                    6,
                ),
            ).alias("nmi"),
        )
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    *,
    k: int = 5,
) -> DataFrame:
    """Privacy screening: k-anonymity over a quasi-identifier combination
    — the release-gate complement to PII redaction (functions/text.py
    redact_pii scrubs direct identifiers; this flags rows whose
    quasi-identifier combination is so rare it re-identifies).

    One row per distinct quasi-identifier combination:
    ``(*quasi_cols, n bigint, at_risk int)`` with ``at_risk = 1`` when
    the group has fewer than ``k`` members (NULLs group together, as an
    attacker would treat them). Downstream either drops at-risk rows
    (semi-join back on the quasi columns) or generalizes a column and
    re-runs — the report is the fixed point check of that loop.

    Scale: one groupBy on the quasi columns — the same shuffle any
    release-time aggregate pays; output is #combinations, not #rows.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *quasi_cols,
            "n",
            (F.col("n") < k).cast("int").alias("at_risk"),
        )
    )


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    *,
    child_key: str,
    parent_key: str,
    relation: str | None = None,
) -> DataFrame:
    """Referential-integrity audit for one FK relation: how many child
    rows point at no parent. NULL FKs are reported separately (a NULL FK
    is "unknown", not "dangling" — conflating them hides both problems).

    Output: ONE row (relation, n_child, n_null_fk, n_orphans,
    orphan_frac) — union several calls for a whole-schema report.

    Scale: the orphan count is a LEFT ANTI join on the key — Spark plans
    broadcast or shuffled hash anti per AQE size estimates, and with AQE
    the parent's DISTINCT key projection is what builds, never parent
    rows. No row data crosses the wire beyond the keys.
    """
    rel = relation or f"{child_key}->{parent_key}"
    non_null = child.filter(F.col(child_key).isNotNull())
    orphans = non_null.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    totals = child.agg(
        F.count(F.lit(1)).alias("n_child"),
        F.sum(F.col(child_key).isNull().cast("bigint")).alias("n_null_fk"),
    )
    n_orph = orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
    return (
        totals.crossJoin(n_orph)
        .select(
            F.lit(rel).alias("relation"),
            "n_child",
            "n_null_fk",
            "n_orphans",
            # NULL (not a DIVIDE_BY_ZERO crash) when the child table is empty
            F.round(F.try_divide(F.col("n_orphans"), F.col("n_child")), 6).alias(
                "orphan_frac"
            ),
        )
    )


def cohens_kappa(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Cohen's kappa between two categorical columns — chance-corrected
    agreement, the standard audit when two LABEL SOURCES rate the same
    rows (two annotators, a classifier vs gold metadata, two model
    versions): raw accuracy rewards majority-class collapse; kappa does
    not.

        κ = (p_o − p_e) / (1 − p_e)
        p_o = Σ_k joint(k, k) / N          (observed agreement)
        p_e = Σ_k p_a(k) · p_b(k)          (chance agreement)

    NULL labels are a real category (coalesced to the sentinel ``'∅'``
    first, so the diagonal and the marginal join are plain equality in
    every engine). κ is NULL when p_e = 1 (both raters constant — the
    statistic is undefined). Output is ONE row:
    ``(col_a, col_b, n_rows, po, pe, kappa)`` rounded 6 dp.

    Scale: one corpus pass builds the (a, b) joint-count table (one
    partial-agg'd shuffle, ≤ #categories² rows); p_o, the marginals, and
    p_e all derive from that bounded table — the same
    audit-operator shape as mutual_information.
    """
    a = F.coalesce(F.col(col_a).cast("string"), F.lit("∅"))
    b = F.coalesce(F.col(col_b).cast("string"), F.lit("∅"))
    # NOT persisted (r11 A/B): four branches reference the joint count,
    # but AQE exchange reuse already executes the identical agg (and its
    # featurize upstream) once at runtime; a persist only added a cache
    # barrier (see OPTIMIZATION_r11.md #16)
    joint = (
        df.select(a.alias("x"), b.alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = joint.agg(F.sum("n").alias("nn"))
    po = joint.filter(F.col("x") == F.col("y")).agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("agree")
    )
    ma = joint.groupBy("x").agg(F.sum("n").alias("na"))
    mb = joint.groupBy("y").agg(F.sum("n").alias("nb"))
    pe = (
        ma.join(mb, ma["x"] == mb["y"])
        .crossJoin(F.broadcast(tot))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("na").cast("double")
                    * F.col("nb").cast("double")
                    / (F.col("nn").cast("double") * F.col("nn").cast("double"))
                ),
                F.lit(0.0),
            ).alias("pe")
        )
    )
    return (
        po.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(pe))
        .select(
            F.lit(col_a).alias("col_a"),
            F.lit(col_b).alias("col_b"),
            F.col("nn").cast("bigint").alias("n_rows"),
            F.round(F.col("agree").cast("double") / F.col("nn"), 6).alias("po"),
            F.round(F.col("pe"), 6).alias("pe"),
            F.when(
                F.col("pe") < 1.0,
                F.round(
                    (F.col("agree") / F.col("nn") - F.col("pe"))
                    / (F.lit(1.0) - F.col("pe")),
                    6,
                ),
            ).alias("kappa"),
        )
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    *,
    l: int = 2,
) -> DataFrame:
    """Privacy screening, step two: distinct l-diversity over a sensitive
    attribute — the k-anonymity upgrade that catches the HOMOGENEITY
    attack (a quasi-identifier group can be k-large yet leak perfectly if
    all k rows share the sensitive value; Machanavajjhala et al. 2007).

    One row per distinct quasi-identifier combination:
    ``(*quasi_cols, n, n_sensitive, at_risk)`` — group size, distinct
    sensitive values within the group (NULL is a value: an attacker
    learns "missing" too), and ``at_risk = 1`` when the group carries
    fewer than ``l`` distinct sensitive values. Read alongside
    :func:`k_anonymity_report`: a release gate wants BOTH group size ≥ k
    and diversity ≥ l.

    Scale: ONE exact count-distinct aggregation on the quasi columns —
    Spark plans it as the two-phase partial distinct (expand on the
    (quasi, sensitive) key, then merge), so the shuffle carries at most
    one row per distinct (quasi, sensitive) pair; output is
    #combinations, not #rows.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    sens = F.coalesce(F.col(sensitive_col).cast("string"), F.lit("∅"))
    return (
        df.select(*quasi_cols, sens.alias("__s"))
        .groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("__s").alias("n_sensitive"),
        )
        .select(
            *quasi_cols,
            "n",
            "n_sensitive",
            (F.col("n_sensitive") < l).cast("int").alias("at_risk"),
        )
    )


def dataset_datasheet(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """One-row dataset datasheet — the governance artifact (public "Data
    Cards" / "Datasheets for Datasets", Gebru et al. 2021) a mixture
    owner attaches to a release, produced as ONE Catalyst plan over
    verified building blocks: corpus size (docs/tokens/chars), vocabulary
    size, exact-duplicate rate (md5 text fingerprints), language count
    and distribution entropy, PII-bearing document rate (the redact()
    regexes as detectors), and the lower-median document length (exact,
    via the distinct-length histogram — no global sort).

    Output (all scalar, rounded 6 dp where fractional):
    ``(n_docs, n_tokens, n_chars, vocab_size, dup_doc_rate, n_langs,
    lang_entropy, pii_doc_rate, median_len)``.

    Scale: four aggregation branches (corpus stats incl. the distinct-
    fingerprint count; vocabulary distinct; language distribution;
    length histogram), each partial-agg'd, each reducing to ≤ a
    bounded-cardinality table before anything joins — the crossJoins
    combine 1-row results. The branches stay lazy over the narrow
    (fp, nt, nc, lang, pii) projection so Catalyst column-prunes each
    replay (the language branch touches only ``lang_col``, the histogram
    only ``length(text)``); only the main aggregate pays the full
    md5/redact/tokenize pass — see the r12 note at the projection below.
    """
    from database2ogr_spark.functions.hashing import words
    from database2ogr_spark.functions.text import redact

    # NOT persisted (r12, reverting the r11 persist on driver evidence —
    # dataset_datasheet regressed ×1.56 on the driver machine, and the
    # local interleaved A/B is at best neutral): materializing the proxy
    # forces md5/redact/tokenize for EVERY branch's read, while the lazy
    # plan lets Catalyst column-prune each replay — the language branch
    # reads only ``lang_col``, the length histogram only ``length(text)``;
    # only the main aggregate pays the full md5+redact+tokenize pass. At
    # 100 TB the deployment shape for reusing the proxy across passes is a
    # checkpoint-to-parquet between jobs, not an in-query cache barrier.
    base = df.select(
        F.md5(F.col(text_col)).alias("fp"),
        F.size(words(text_col)).alias("nt"),
        F.length(F.col(text_col)).alias("nc"),
        F.col(lang_col).alias("lg"),
        (redact(F.col(text_col)) != F.col(text_col)).cast("int").alias("pii"),
    )
    main = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nt").cast("bigint").alias("n_tokens"),
        F.sum("nc").cast("bigint").alias("n_chars"),
        F.countDistinct("fp").cast("bigint").alias("n_distinct_texts"),
        F.sum("pii").cast("bigint").alias("n_pii"),
    )
    vocab = (
        df.select(F.explode(words(text_col)).alias("w"))
        .agg(F.countDistinct("w").cast("bigint").alias("vocab_size"))
    )
    # language distribution off the persisted proxy (base carries lg for
    # every input row — value-identical to grouping the raw table)
    lang_counts = base.groupBy("lg").agg(
        F.count(F.lit(1)).alias("n")
    )
    lang = lang_counts.crossJoin(
        F.broadcast(lang_counts.agg(F.sum("n").alias("tt")))
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        F.round(
            -F.sum(
                (F.col("n") / F.col("tt"))
                * F.log(F.col("n") / F.col("tt"))
            ),
            6,
        ).alias("lang_entropy"),
    )
    # median length is over docs that HAVE text: a NULL length is not a
    # length, and engines disagree on where NULLs sort in the cumulative
    # histogram walk (NULL-probe catch) — excluded on both sides
    hist = (
        base.filter(F.col("nc").isNotNull())
        .groupBy("nc")
        .agg(F.count(F.lit(1)).alias("hn"))
    )
    from pyspark.sql.window import Window

    cum = hist.withColumn(
        "cf",
        F.sum("hn").over(
            Window.orderBy("nc").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    med = (
        cum.crossJoin(F.broadcast(hist.agg(F.sum("hn").alias("nn"))))
        .filter(F.col("cf") >= (F.col("nn") + 1).cast("bigint") / 2)
        .agg(F.min("nc").cast("bigint").alias("median_len"))
    )
    return (
        main.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(lang))
        .crossJoin(F.broadcast(med))
        .select(
            "n_docs",
            "n_tokens",
            "n_chars",
            "vocab_size",
            # try_divide: identical to / when n_docs > 0; NULL (not an ANSI
            # DIVIDE_BY_ZERO crash) on an empty corpus — a filter-to-zero
            # intermediate must degrade to NULL rates, not kill the job
            F.round(
                F.lit(1.0)
                - F.try_divide(
                    F.col("n_distinct_texts"), F.col("n_docs").cast("double")
                ),
                6,
            ).alias("dup_doc_rate"),
            "n_langs",
            "lang_entropy",
            F.round(
                F.try_divide(F.col("n_pii"), F.col("n_docs").cast("double")), 6
            ).alias("pii_doc_rate"),
            "median_len",
        )
    )


def fd_violations(
    df: DataFrame,
    pairs: list[tuple[str, str]],
) -> DataFrame:
    """Functional-dependency discovery report — for each candidate
    ``A → B`` pair, how badly the dependency is violated: the number of
    A-values mapping to more than one distinct B-value, and the minimum
    number of row CHANGES needed to repair (the g₃-style error: rows
    outside each A-group's majority B) — the data-profiling companion to
    mutual_information (MI says the columns are related; this says
    whether one DETERMINES the other, which is what schema designers and
    join-key pickers need).

    NULLs are values (coalesced to a sentinel). Output: one row per
    pair — ``(det, dep, n_det_values, n_violating, repair_rows,
    violation_rate)``, rate = repair rows / total rows, rounded 6 dp.

    Scale: per pair, one (A, B) partial-agg'd count, then per-A
    aggregates over the bounded (A, B) table (max via the max(struct)
    champion trick — no window over the pair table). Pairs are
    independent plan branches unioned — N pairs cost N aggregations,
    never a cartesian.
    """
    if not pairs:
        raise ValueError("pairs must be non-empty")
    outs = []
    total = df.agg(F.count(F.lit(1)).alias("__t"))
    for det, dep in pairs:
        ab = (
            df.select(
                F.coalesce(F.col(det).cast("string"), F.lit("∅")).alias("a"),
                F.coalesce(F.col(dep).cast("string"), F.lit("∅")).alias("b"),
            )
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        per_a = ab.groupBy("a").agg(
            F.count(F.lit(1)).alias("n_b"),
            F.sum("n").alias("n_rows"),
            F.max(F.col("n")).alias("n_major"),
        )
        agg = per_a.agg(
            F.lit(det).alias("det"),
            F.lit(dep).alias("dep"),
            F.count(F.lit(1)).cast("bigint").alias("n_det_values"),
            F.sum(F.when(F.col("n_b") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating"),
            F.sum(F.col("n_rows") - F.col("n_major"))
            .cast("bigint")
            .alias("repair_rows"),
        )
        outs.append(
            agg.crossJoin(F.broadcast(total)).select(
                "det", "dep", "n_det_values", "n_violating", "repair_rows",
                F.round(
                    F.col("repair_rows") / F.col("__t").cast("double"), 6
                ).alias("violation_rate"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def benford_test(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Benford's-law first-digit test (public Newcomb 1881 / Benford 1938
    / Nigrini's MAD conformity statistic) over a positive integer-valued
    column — the fabricated-data / truncation-artifact audit: naturally
    occurring multi-order-of-magnitude counts follow
    ``P(d) = log₁₀(1 + 1/d)``; uniform synthetics, capped fields, and
    invented numbers don't.

    Digit extraction is STRING-based on the bigint cast (first character)
    — exact in every engine, no ``log10`` boundary hazards. Values < 1
    or NULL are excluded. Output: 9 rows
    ``(digit, n, obs_freq, exp_freq, dev)`` plus the shared ``mad``
    column (mean absolute deviation over the 9 digits — Nigrini's
    conformity number; < 0.006 is "close conformity", > 0.015 is
    nonconformity for first digits).

    Scale: one partial-agg'd count on a 9-value key; everything after is
    9-row arithmetic.
    """
    d = F.substring(
        F.col(value_col).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = (
        df.filter(F.col(value_col).isNotNull() & (F.col(value_col) >= 1))
        .select(d.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    tot = counts.agg(F.sum("n").alias("nn"))
    per = (
        spine.join(counts, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
            F.round(
                F.coalesce(F.col("n"), F.lit(0)) / F.col("nn").cast("double"),
                6,
            ).alias("obs_freq"),
            F.round(
                F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
                / F.log(F.lit(10.0)),
                6,
            ).alias("exp_freq"),
        )
        .withColumn(
            "dev", F.round(F.abs(F.col("obs_freq") - F.col("exp_freq")), 6)
        )
    )
    mad = per.agg(F.round(F.avg("dev"), 6).alias("mad"))
    return per.crossJoin(F.broadcast(mad)).select(
        "digit", "n", "obs_freq", "exp_freq", "dev", "mad"
    )


def concentration_report(
    df: DataFrame,
    *,
    mass_col: str = "n_chars",
    group_col: str = "source",
) -> DataFrame:
    """Corpus-concentration audit over ``group_col`` — how unequally the
    training mass is distributed across sources/domains, the governance
    question behind "one crawl dominates the mixture". Per group: mass,
    share, and ascending-cumulative share (the Lorenz curve's y values);
    replicated on every row, the two standard scalars: the Gini
    coefficient over group masses (G = Σ_g (2·r_g − n − 1)·m_g / (n·Σm),
    ranks ascending with (mass, group) tie-break so G is deterministic)
    and the Herfindahl–Hirschman index (Σ share², the antitrust
    concentration measure).

    NULL group values form their own bucket (rendered as NULL — mass
    without provenance is exactly what this audit should surface, not
    drop). Integer masses make every sum exact in any engine; shares and
    G are single divisions of exact integers, so the 6-dp rounding is
    cosmetic rather than load-bearing.

    Output: (group_col, n_rows, mass, share, cum_share, gini, hhi), one
    row per group, ordered by nothing (caller sorts).

    Scale: ONE group-keyed partial-agg'd sum is the only corpus-sized
    work; the rank window and both scalars run on #groups rows.
    """
    from pyspark.sql.window import Window

    per = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(mass_col)).cast("bigint").alias("mass"),
    )
    w = Window.orderBy(F.col("mass").asc(), F.col("g").asc_nulls_first())
    ranked = per.withColumn("r", F.row_number().over(w))
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("mass").alias("m"),
        F.sum((2 * F.col("r") - 1) * F.col("mass")).alias("gnum"),
        F.sum(F.col("mass") * F.col("mass")).alias("ssq"),
    )
    cum = Window.orderBy(F.col("mass").asc(), F.col("g").asc_nulls_first()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ranked.withColumn("cmass", F.sum("mass").over(cum))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("g").alias(group_col),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            "mass",
            F.round(F.col("mass") / F.col("m"), 6).alias("share"),
            F.round(F.col("cmass") / F.col("m"), 6).alias("cum_share"),
            F.round(
                (F.col("gnum") - F.col("n") * F.col("m"))
                / (F.col("n") * F.col("m")),
                6,
            ).alias("gini"),
            F.round(F.col("ssq") / (F.col("m") * F.col("m")), 6).alias("hhi"),
        )
    )


def fanout_profile(
    parent: DataFrame,
    child: DataFrame,
    *,
    parent_key: str,
    child_key: str,
) -> DataFrame:
    """1:N relationship shape audit — the data-modeling question FK
    integrity (orphan detection) doesn't answer: HOW is the fan-out
    distributed? A parent with 10⁶ children is tomorrow's skewed join;
    a majority of childless parents means the join should be re-planned
    or the table pruned. Children per parent over the FULL parent set
    (childless parents count as 0 via a left join), summarized with
    exact interpolated percentiles (the quantile_cont contract).

    Output: ONE row (n_parents, n_children, childless_parents,
    mean_fanout, p50, p95, max_fanout) — mean rounded 6.

    Scale: one child-keyed partial-agg'd count + one broadcast-able
    left join on the parent key + a 1-row reduce (the percentile sees
    #parents values).
    """
    pc = child.groupBy(F.col(child_key).alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    full = parent.select(F.col(parent_key).alias("k")).join(
        pc, "k", "left"
    ).select(F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"))
    return full.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parents"),
        F.sum("n").cast("bigint").alias("n_children"),
        F.sum(F.when(F.col("n") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("childless_parents"),
        F.round(F.avg(F.col("n").cast("double")), 6).alias("mean_fanout"),
        F.round(F.percentile(F.col("n").cast("double"), 0.5), 6).alias("p50"),
        F.round(F.percentile(F.col("n").cast("double"), 0.95), 6).alias("p95"),
        F.max("n").cast("bigint").alias("max_fanout"),
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    *,
    t: float = 0.3,
) -> DataFrame:
    """Privacy screening, step three — t-closeness (Li, Li &
    Venkatasubramanian 2007), completing the k-anonymity / l-diversity
    triad: a group can be k-large AND l-diverse yet still leak by
    SKEW (99% of one sensitive value where the corpus has 50%). For the
    categorical case the distance is the variational / total-variation
    distance ``½ Σ_v |p_group(v) − p_corpus(v)|``; ``at_risk`` flags
    groups with distance > ``t``. NULL sensitive values are a category
    (the l-diversity convention).

    Output: (*quasi_cols, n, distance, at_risk) — one row per
    quasi-identifier group, distance rounded 6.

    Scale: ONE (quasi, sensitive) count aggregation is the corpus-sized
    work; global marginals reduce from it (#values rows, broadcast),
    and the per-group distance sum runs on the joint table. The
    |p_g − p| sum needs every corpus value per group — absent
    (group, value) cells contribute p(v) each, folded in algebraically
    as ``Σ_v p(v) − Σ_{v∈group} p(v)`` so no group×value spine is ever
    materialized (the term_dispersion trick).
    """
    if not quasi_cols:
        raise ValueError("need at least one quasi column")
    q = [F.col(c) for c in quasi_cols]
    joint = df.groupBy(*q, F.col(sensitive_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("n")
    )
    glob = joint.groupBy("__v").agg(F.sum("n").alias("gn"))
    tot = glob.agg(F.sum("gn").alias("tot"))
    gm = glob.crossJoin(F.broadcast(tot)).select(
        "__v", (F.col("gn").cast("double") / F.col("tot")).alias("p")
    )
    gsize = joint.groupBy(*quasi_cols).agg(F.sum("n").alias("gn_tot"))
    j = (
        joint.join(gsize, quasi_cols)
        .join(gm, "__v")
        .select(
            *quasi_cols,
            "gn_tot",
            "p",
            (F.col("n").cast("double") / F.col("gn_tot")).alias("pg"),
        )
    )
    per = j.groupBy(*quasi_cols).agg(
        F.max("gn_tot").alias("n"),
        F.sum(F.abs(F.col("pg") - F.col("p"))).alias("present_sum"),
        F.sum("p").alias("present_mass"),
    )
    # absent corpus values contribute |0 - p(v)| = p(v) each:
    # total = present_sum + (1 - present_mass)
    dist = F.round(
        (F.col("present_sum") + (F.lit(1.0) - F.col("present_mass")))
        / F.lit(2.0),
        6,
    )
    return per.select(
        *quasi_cols,
        F.col("n").cast("bigint").alias("n"),
        dist.alias("distance"),
        (dist > F.lit(float(t))).alias("at_risk"),
    )
