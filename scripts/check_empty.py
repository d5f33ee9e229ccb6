"""Empty-input robustness sweep: every registry query must DEGRADE, not
die, on zero-row tables.

At 100 TB, zero-row intermediates are routine — a selective filter, an
empty split cell, a partition with no late events — and an operator that
throws ANSI DIVIDE_BY_ZERO (or indexes ``first()``'s None) on them kills
the whole job. The contract this sweep enforces, registry-wide:

  - empty output, or an aggregate row with NULL for undefined ratios, is
    a PASS (graceful degradation);
  - an explicit ``ValueError`` guard is a PASS (a designed refusal, e.g.
    "cannot build an IVF index over an empty corpus");
  - anything else (DIVIDE_BY_ZERO, TypeError on None, PATH_NOT_FOUND on
    a zero-shard read-back, UNABLE_TO_INFER_SCHEMA) is a FAIL.

The round-7 probe found 9 FAILs out of 278 (six ANSI divide-by-zeros on
corpus totals, one None-subscript on a missing query vector, two shard
round-trips whose read side died when the write side produced no files);
all fixed with try_divide / explicit guards / explicit-schema readers,
proven result-identical on non-empty data at sf0.01 and sf0.1 --exact.

Usage: python scripts/check_empty.py [empty_dir] [only ...]
       (builds the zero-row fixture from sf0.001 when empty_dir absent)
"""

from __future__ import annotations

import os
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from database2ogr_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def build_empty_fixture(spark, out: str, src: str = "/root/testdata/sf0.001") -> str:
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        (
            spark.read.parquet(f"{src}/{t}.parquet")
            .limit(0)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{out}/{t}.parquet")
        )
    return out


def main() -> int:
    args = sys.argv[1:]
    empty_dir = args[0] if args and "/" in args[0] else None
    only = set(a for a in args if "/" not in a)

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if empty_dir is None:
        empty_dir = build_empty_fixture(
            spark, os.path.join(tempfile.gettempdir(), "sf_empty")
        )

    qs = entrymod.queries()
    names = [n for n in qs if not only or n in only]
    failures = 0
    for name in names:
        try:
            rows = qs[name](spark, empty_dir).collect()
            print(f"OK    {name}: {len(rows)} rows")
        except ValueError as e:
            print(f"GUARD {name}: ValueError: {str(e)[:100]}")
        except Exception as e:  # noqa: BLE001 — the sweep's whole point
            failures += 1
            tb = traceback.format_exc().splitlines()
            origin = next(
                (
                    ln.strip()
                    for ln in reversed(tb)
                    if "database2ogr_spark" in ln or "__spark_entry__" in ln
                ),
                "?",
            )
            print(
                f"FAIL  {name}: {type(e).__name__}: {str(e)[:110]} | {origin[:110]}"
            )
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
