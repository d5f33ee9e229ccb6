"""The local oracle harness must be at least as strict as the driver's
correctness gate.  The driver's canonicalizer pandas-sorts cell values, so
any ArrayType/MapType/StructType output column errs the whole entry — a
class of bug that shipped twice (rounds 2 and 4, `multimodal_decode` /
`project_embeddings`) precisely because the local str()-sort tolerated
list cells.  These tests pin the harness-side rejection and that no
registry entry emits a complex-typed column again.
"""

from __future__ import annotations

import importlib.util
import sys

from pyspark.sql import functions as F


def _check_oracle_mod():
    spec = importlib.util.spec_from_file_location(
        "check_oracle", "/root/repo/scripts/check_oracle.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_complex_typed_cols_flags_array_map_struct(spark):
    mod = _check_oracle_mod()
    df = spark.range(3).select(
        F.col("id"),
        F.array(F.lit(1), F.lit(2)).alias("arr"),
        F.create_map(F.lit("k"), F.lit(1)).alias("mp"),
        F.struct(F.lit(1).alias("a")).alias("st"),
        F.lit("ok").alias("s"),
    )
    assert mod.complex_typed_cols(df.schema) == ["arr", "mp", "st"]


def test_complex_typed_cols_passes_scalars(spark):
    mod = _check_oracle_mod()
    df = spark.range(2).select(
        F.col("id"),
        F.lit(1.5).alias("d"),
        F.lit("x").alias("s"),
        F.lit(True).alias("b"),
    )
    assert mod.complex_typed_cols(df.schema) == []


def test_dtype_gate_catches_uncast_hugeint_sum(spark):
    """The r5 failure class end-to-end: DuckDB types integer ``sum()`` as
    HUGEINT, which ``.df()`` (the driver's fetch path) renders float64
    while Spark emits bigint — values equal, hashes differ.  The hardened
    harness must flag the dtype-kind mismatch that ``fetchall()``-based
    value comparison tolerates (``2 == 2.0``)."""
    import duckdb

    mod = _check_oracle_mod()
    sdf = spark.range(3).select(F.col("id"), (F.col("id") * 2).alias("s"))
    srows = sdf.collect()
    odf = duckdb.sql(
        "SELECT id, sum(id * 2) AS s FROM range(3) t(id) GROUP BY id"
    ).df()
    bad = mod.dtype_mismatches(sdf.columns, srows, odf)
    assert bad == ["dtype[s] spark=int oracle=float"]
    # and the cast repairs it
    odf_cast = duckdb.sql(
        "SELECT id, CAST(sum(id * 2) AS BIGINT) AS s FROM range(3) t(id) GROUP BY id"
    ).df()
    assert mod.dtype_mismatches(sdf.columns, srows, odf_cast) == []


def test_dtype_gate_catches_int_vs_float_literal(spark):
    """A plainer instance of the same class: oracle emits DOUBLE where
    Spark emits bigint (e.g. ``n / 1`` vs ``n``)."""
    import duckdb

    mod = _check_oracle_mod()
    sdf = spark.range(4).select(F.col("id"))
    odf = duckdb.sql("SELECT id / 1.0 AS id FROM range(4) t(id)").df()
    assert mod.dtype_mismatches(sdf.columns, sdf.collect(), odf) == [
        "dtype[id] spark=int oracle=float"
    ]


def test_dtype_gate_skips_empty_results(spark):
    """Dtypes of an empty frame are inference artifacts — no false FAILs
    on legitimately-empty query results."""
    import duckdb

    mod = _check_oracle_mod()
    sdf = spark.range(1).filter(F.lit(False)).select("id")
    odf = duckdb.sql("SELECT id FROM range(1) t(id) WHERE false").df()
    assert mod.dtype_mismatches(sdf.columns, sdf.collect(), odf) == []


def test_no_registry_entry_declares_complex_output(spark, tmp_path):
    """Every queries() entry must emit scalar columns only.  Checked via
    the declared schema at sf0.001 (schema resolution only — no job runs
    for most entries; a handful materialize fixture side-inputs)."""
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    mod = _check_oracle_mod()
    offenders = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        bad = mod.complex_typed_cols(df.schema)
        if bad:
            offenders[name] = bad
    assert not offenders, f"complex-typed outputs would err the driver gate: {offenders}"


def test_dtype_gate_schema_faithful_for_all_null_bigint(spark):
    """An all-NULL bigint column is float64 under BOTH toPandas (the
    driver's Spark-side path) and DuckDB .df() — the driver passes it.
    Value inference alone calls it object → false FAIL (the r6
    frequent_itemsets i3 case). With the declared schema the gate must
    agree with the driver."""
    import duckdb

    mod = _check_oracle_mod()
    sdf = spark.range(2).select(
        F.col("id"), F.lit(None).cast("bigint").alias("i3")
    )
    odf = duckdb.sql(
        "SELECT id, CAST(NULL AS BIGINT) AS i3 FROM range(2) t(id)"
    ).df()
    srows = sdf.collect()
    # schema-faithful: no mismatch (both sides float64 at the driver)
    assert mod.dtype_mismatches(sdf.columns, srows, odf, schema=sdf.schema) == []
    # and the schemaless fallback is the stricter artifact this guards
    assert mod.dtype_mismatches(sdf.columns, srows, odf) == [
        "dtype[i3] spark=object oracle=float"
    ]


def test_dtype_gate_timestamp_ntz_is_datetime(spark):
    """Spark timestamp_ntz columns render datetime64 under toPandas, same
    as DuckDB TIMESTAMP under .df() — the gate must not flag them
    (rolling_features false positive: typeName() is 'timestamp_ntz',
    not 'timestamp')."""
    import duckdb

    mod = _check_oracle_mod()
    sdf = spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-01-01 00:00:00' AS ts, 1L AS n"
    )
    odf = duckdb.sql("SELECT TIMESTAMP '2024-01-01' AS ts, 1::BIGINT AS n").df()
    assert mod.dtype_mismatches(
        sdf.columns, sdf.collect(), odf, schema=sdf.schema
    ) == []


def test_every_registry_entry_has_an_oracle_twin():
    """278/278 as of round 6: no ROWS-ONLY entries remain — every
    queries() entry is hash-gradeable against DuckDB. New entries must
    ship with a twin (or consciously delete this invariant, which is the
    point of the test)."""
    import __spark_entry__ as entrymod

    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert qs <= oracles, sorted(qs - oracles)


def test_round7_graded_prefix_is_the_documented_rotation():
    """The driver grades only the FIRST 50 queries() entries (dict
    order), so the prefix IS the round's verification plan — an
    accidental dict reshuffle would silently spend the round re-grading
    the wrong entries. Pin the shipped round-7 prefix: corpus_divergence,
    the ten r2-vintage SURVEY-§2 rows, then the next 39 of the
    never-graded queue (winnow_pairs … embedding_density). Update this
    list ONLY together with the rotation docstring in queries()."""
    import __spark_entry__ as entrymod

    want = [
        "corpus_divergence",
        # the ten r2-vintage reference-surface rows
        "a1_distinct", "s2_full_scan", "u1_union", "p3_envelope",
        "j2_dim_lookup", "x1_slugify", "x2_reverse_stem", "x4_coords_key",
        "x11_unescape", "f5_nonblank_tokens",
        # next 39 never-graded, queue order unchanged since round 5
        "winnow_pairs", "kneser_ney", "ks_test", "intrinsic_dimension",
        "skipgram_negatives", "dataset_datasheet", "temporal_split",
        "rolling_active_users", "frequent_itemsets", "basket_rules",
        "classifier_ece", "randomization_test", "ams_f2", "hybrid_rrf",
        "auc_by_lang", "best_threshold", "term_dispersion", "entropy_rate",
        "burrows_delta", "phrase_merge", "davies_bouldin", "fd_violations",
        "benford", "changepoint", "mi_value_type", "geometric_median",
        "bootstrap_ci", "funnel_windowed", "trend_slope", "ewma_volume",
        "concentration", "textrank", "acf", "mann_kendall", "hll_distinct",
        "mmr_select", "kfold", "iqr_anomaly_days", "embedding_density",
    ]
    got = list(entrymod.queries())[:50]
    assert got == want, [
        (i, g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w
    ]


def test_registry_is_frozen_at_278():
    """Freeze invariant (VERDICT r5 #4 / r6 #1): no new queries() entries
    until the never-graded backlog drains (round 8). When the freeze
    lifts, update this count together with the rotation docstring —
    khop_reach_sketched is first in line."""
    import __spark_entry__ as entrymod

    assert len(entrymod.queries()) == 278
