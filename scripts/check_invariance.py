"""Partitioning-invariance sweep: every registry query must return
BIT-IDENTICAL rows when the physical execution layout is perturbed.

This is the 100 TB determinism property the registry docstrings claim
("engine-stable", "repartition-proof", "deterministic cut"): a result
that depends on shuffle partition count, scan split size, or AQE's
runtime re-planning would be non-reproducible on a real cluster, where
those vary run to run (executor loss, dynamic allocation, input growth).
Per-operator pytest pins cover the known-risky cuts; this sweep proves
the property registry-wide instead of operator-by-operator.

Perturbation (config B vs the session defaults A):
  - spark.sql.shuffle.partitions 32 -> 7 (different shuffle layout and
    reduce-side arrival order),
  - spark.sql.files.maxPartitionBytes 128m -> 1m (different scan splits,
    so map-side partial aggregation sees different row groupings),
  - spark.sql.adaptive.enabled true -> false (no runtime coalescing /
    skew splitting — materially different physical plans).

Rows are compared as sorted repr strings — exact, including float bits
(the engine's determinism discipline rounds every order-sensitive float
BEFORE comparison points, so results must be bit-stable, not just
close).

Usage: python scripts/check_invariance.py [sf_dir] [--prefix N] [only ...]
"""

from __future__ import annotations

import sys

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from database2ogr_spark.session import get_spark

PERTURBED = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": str(1024 * 1024),
    "spark.sql.adaptive.enabled": "false",
}


def canon(df) -> list[str]:
    cols = sorted(df.columns)
    return sorted(repr([row[c] for c in cols]) for row in df.collect())


def main() -> int:
    # '--prefix=N', '--prefix N' (the following token is CONSUMED, not
    # leaked into the name filter — ADVICE r7), or bare '--prefix' = 50
    argv = sys.argv[1:]
    args: list[str] = []
    prefix = None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--prefix"):
            if "=" in a:
                prefix = int(a.split("=", 1)[1])
            elif a != "--prefix":
                prefix = int(a.removeprefix("--prefix"))
            elif i + 1 < len(argv) and argv[i + 1].isdigit():
                prefix = int(argv[i + 1])
                i += 1
            else:
                prefix = 50
        else:
            args.append(a)
        i += 1
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = set(a for a in args if "/" not in a)

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = list(qs)[:prefix] if prefix else list(qs)
    if only:
        names = [n for n in names if n in only] or [n for n in qs if n in only]
    if not names:
        # a filter that matches nothing must never read as a green sweep
        print(f"FAIL: no queries match filter {sorted(only)}")
        return 1

    defaults = {k: spark.conf.get(k) for k in PERTURBED}
    failures = 0
    for name in names:
        try:
            for k, v in defaults.items():
                spark.conf.set(k, v)
            a = canon(qs[name](spark, sf_dir))
            for k, v in PERTURBED.items():
                spark.conf.set(k, v)
            b = canon(qs[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"FAIL {name}: error: {e}")
            failures += 1
            continue
        finally:
            for k, v in defaults.items():
                spark.conf.set(k, v)
        if a != b:
            i = next(
                (j for j, (x, y) in enumerate(zip(a, b)) if x != y),
                min(len(a), len(b)),
            )
            print(
                f"FAIL {name}: {len(a)} vs {len(b)} rows; first diff at "
                f"sorted idx {i}:\n    default  : "
                f"{a[i] if i < len(a) else '<none>'}\n    perturbed: "
                f"{b[i] if i < len(b) else '<none>'}"
            )
            failures += 1
        else:
            print(f"OK   {name}: {len(a)} rows bit-identical under perturbation")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
