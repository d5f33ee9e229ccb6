"""Local stand-in for the driver's t2 correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin at sf0.01, compare
row-count, column names, order-insensitive values, AND pandas dtype
*kind* per column (the driver canonicalizes both sides through pandas,
so an oracle column that pandas renders float64 while Spark emits int64
hash-FAILs at the driver even when the values are numerically equal —
the r5 HUGEINT class: DuckDB types integer ``sum()`` as HUGEINT, which
``.df()`` renders as float64 while ``fetchall()`` yields Python ints).

Usage: python scripts/check_oracle.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd
from pyspark.sql.types import ArrayType, MapType, StructType

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
import bench as benchmod
from database2ogr_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def complex_typed_cols(schema) -> list[str]:
    """Column names whose type the driver canonicalizer cannot sort
    (list/dict cells are unhashable under pandas sort_values)."""
    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def dtype_kind(dt) -> str:
    """Collapse a pandas dtype to the kind class the driver's value-hash
    is sensitive to: int vs float vs bool vs datetime vs object. ``2``
    (int64) and ``2.0`` (float64) hash differently at the driver even
    though ``2 == 2.0`` — this is the class that shipped in r5."""
    k = getattr(dt, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k in ("M", "m"):
        return "datetime"
    return "object"


def _spark_col_kind(values, spark_type) -> str:
    """The pandas dtype *kind* ``toPandas`` (the driver's Spark-side
    canonicalization) would give this column. Plain value inference
    (``from_records``) is unfaithful for all-None columns — it yields
    ``object`` where ``toPandas`` uses the declared Spark type (an
    all-NULL bigint column is float64 under toPandas AND under DuckDB
    ``.df()``, so the driver passes it — the frequent_itemsets ``i3``
    false-positive)."""
    name = spark_type.typeName()
    has_null = any(v is None for v in values)
    if name in ("byte", "short", "integer", "long"):
        return "float" if has_null else "int"
    if name in ("float", "double"):
        return "float"
    if name == "boolean":
        return "object" if has_null else "bool"
    if name in ("timestamp", "timestamp_ntz"):
        return "datetime"
    # string/date/decimal/binary → object under toPandas
    return "object"


def dtype_mismatches(scols, srows, odf: pd.DataFrame, schema=None) -> list[str]:
    """Compare pandas dtype kinds between the Spark result (canonicalized
    the driver's way — ``toPandas`` semantics, derived from the declared
    Spark schema when given, else inferred from values) and the oracle
    fetched via ``.df()`` (the driver's path, where HUGEINT → float64).
    Returns human-readable per-column mismatch strings."""
    if not srows or len(odf) == 0:
        return []  # dtypes of an empty frame are inference artifacts
    if schema is not None:
        skinds = {
            f.name: _spark_col_kind([r[f.name] for r in srows], f.dataType)
            for f in schema.fields
        }
    else:
        spdf = pd.DataFrame.from_records(
            [tuple(r) for r in srows], columns=list(scols)
        )
        skinds = {c: dtype_kind(spdf[c].dtype) for c in scols}
    out = []
    for c in scols:
        if c not in odf.columns:
            continue  # column-name mismatch is reported separately
        sk, ok = skinds[c], dtype_kind(odf[c].dtype)
        if sk != ok:
            out.append(f"dtype[{c}] spark={sk} oracle={ok}")
    return out


#: --exact: compare floats bit-for-bit instead of at 9 dp. The driver's
#: value-hash sees exact values, so a 9-dp-tolerant local pass can hide a
#: sub-9dp engine drift in any UN-rounded double column (operators that
#: follow the repo's round-to-6dp convention are immune: 6-dp-rounded
#: doubles that agree at 9 dp are identical bits). Run with --exact to
#: enumerate the residual-risk entries.
EXACT = False


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v if EXACT else round(v, 9)
    return v


def df_to_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    # None-safe deterministic sort: rows are compared as multisets, the order
    # itself doesn't matter as long as both sides use the same key
    return sorted(
        (tuple(norm_cell(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


def main() -> int:
    global EXACT
    args = [a for a in sys.argv[1:] if a != "--exact"]
    EXACT = "--exact" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        finally:
            # same hygiene as bench.py: leftover persisted/localCheckpoint
            # blocks from one entry must not shape the next entry's run.
            # INVARIANT (ADVICE r10): this release drops the localCheckpoint
            # blocks backing sdf, and a checkpoint TRUNCATES lineage — sdf's
            # DATA is permanently unrecomputable past this point. Everything
            # below may touch only driver-side state captured above (srows,
            # scols) and plan metadata (sdf.schema); any future edit that
            # re-reads sdf rows must move the read inside the try block.
            spark.catalog.clearCache()
            benchmod._release_all_blocks(spark)
        # The driver's canonicalizer pandas-sorts cell values; list/dict
        # cells are unhashable and err the whole entry (this shipped twice
        # — rounds 2 and 4 — because the str()-sort below tolerates them).
        # Reject complex-typed outputs HERE so the looser local harness can
        # never pass what the driver gate will reject.
        complex_cols = complex_typed_cols(sdf.schema)
        if complex_cols:
            print(
                f"FAIL {name}: complex-typed output columns {complex_cols} "
                "(ArrayType/MapType/StructType) — the driver canonicalizer "
                "cannot sort list cells; emit long form (posexplode) or a "
                "string encoding instead"
            )
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = res.columns
            orows = res.fetchall()
            # re-run through .df(): the DRIVER's fetch path. fetchall()
            # yields HUGEINT as Python int (2 == 2.0 passes below); .df()
            # yields float64 and the driver hash-FAILs. Both fetches are
            # needed: fetchall for the value compare, .df for dtypes.
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = dtype_mismatches(scols, srows, odf, schema=sdf.schema)
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            a = df_to_rows(scols, [[row[c] for c in scols] for row in srows])
            b = df_to_rows(ocols, orows)
            if a != b:
                diff_i = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y) if a and b else 0
                problems.append(
                    f"values differ; first diff at sorted idx {diff_i}:\n"
                    f"    spark : {a[diff_i] if diff_i < len(a) else '<none>'}\n"
                    f"    oracle: {b[diff_i] if diff_i < len(b) else '<none>'}"
                )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"OK   {name}: {len(srows)} rows")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
