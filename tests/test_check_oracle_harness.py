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
