"""Second-decade measurement for decontaminate_semantic (VERDICT r10 #4).

The registry entry splits ONE table into corpus and benchmark
(vec_id % 20), so in a scaling probe BOTH sides of the exact
|corpus| x |benchmark| probe grow with the data and the product grows
~100x per decade — the operator's cost model, not a plan bug. In
production the benchmark side is a FIXED eval suite (eval sets don't
grow with the training corpus), so the operative scaling is linear in
the corpus. This experiment measures both regimes across the
sf0.1 → sf1-equivalent decade:

  A. entry-shaped (both sides scale): ~100x pair growth. MEASURED
     2.98 s -> 284.62 s (95x on 10x data) — the product model confirmed;
     not re-run by default (a big-side pass costs ~285 s);
  B. fixed benchmark (the sf0.1 benchmark rows at both scales): expect
     ~10x — linear in corpus, the production regime (eval suites do not
     grow with the training corpus);
  C. the banded-LSH scale tier (decontaminate_semantic_lsh), entry
     shaped: candidate generation is bands*(|c|+|b|) rows, so even with
     both sides scaling the decade step should stay near-linear.

Run: python scripts/exp_semantic_decon_decade.py [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
import bench as benchmod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from database2ogr_spark.operators.similarity import (  # noqa: E402
    decontaminate_semantic,
    decontaminate_semantic_lsh,
)
from database2ogr_spark.session import get_spark  # noqa: E402

SMALL = "/root/testdata/sf0.1"
BIG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale_probe", "sf1eq",
)
#: the sf0.1 vec_id domain (2000 rows) — benchmark rows below this exist
#: at BOTH scales, so the fixed-bench regime holds |benchmark| = 100
FIXED_BENCH_MAX = 2_000


def _run(spark, sf_dir, fixed_bench: bool, lsh: bool = False) -> float:
    emb = entrymod._emb(spark, sf_dir)
    bench = emb.filter(F.col("vec_id") % 20 == 0)
    if fixed_bench:
        bench = bench.filter(F.col("vec_id") < FIXED_BENCH_MAX)
    corpus = emb.filter(F.col("vec_id") % 20 != 0)
    t0 = time.perf_counter()
    op = decontaminate_semantic_lsh if lsh else decontaminate_semantic
    kw = {"bands": 4, "bits": 4, "dim": 64} if lsh else {}
    op(corpus, bench, threshold=0.45, **kw).select(
        "vec_id"
    ).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    benchmod._release_all_blocks(spark)
    return dt


def main() -> None:
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = int(pos[0]) if pos else 2
    spark = get_spark("semdecon-decade")
    spark.sparkContext.setLogLevel("ERROR")
    # warm both dirs + python workers
    _run(spark, SMALL, True, False)

    out: dict[str, dict[str, float]] = {}
    regimes = [("fixed_bench", True, False), ("lsh_entry_shaped", False, True)]
    if "--exact-entry-shaped" in sys.argv:
        regimes.append(("entry_shaped", False, False))
    for label, fixed, lsh in regimes:
        ts, tb = [], []
        for _ in range(passes):
            ts.append(_run(spark, SMALL, fixed, lsh))
            tb.append(_run(spark, BIG, fixed, lsh))
            print(
                f"{label}: small {ts[-1]:.2f}s big {tb[-1]:.2f}s "
                f"(loadavg {os.getloadavg()[0]:.1f})",
                flush=True,
            )
        out[label] = {
            "t_small_s": round(min(ts), 2),
            "t_big_s": round(min(tb), 2),
            "ratio": round(min(tb) / max(min(ts), 1e-9), 2),
        }
    print(out)


if __name__ == "__main__":
    main()
