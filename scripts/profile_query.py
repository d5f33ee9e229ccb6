"""Round-11 optimization profiler: time individual headline queries with the
noop sink (guide §1.4) and capture their ``explain("formatted")`` plans.

Usage:
    python scripts/profile_query.py [--passes N] [--plans-dir plans/r11] \
        [--tag before|after] query [query ...]

Per query: builds the DataFrame, writes the formatted plan to
``<plans-dir>/<query>_<tag>.txt`` (only when --tag given), then times
``--passes`` noop-sink executions with blocking cache/block release between
passes (the bench protocol), printing each pass and the min. Jobs are
labelled via ``setJobDescription`` so the timeline is attributable.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import _release_all_blocks
from database2ogr_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--tag", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("d2o-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # same warmup as bench.py: JVM, codegen, parquet footers, Python workers
    qs["s2_full_scan"](spark, args.sf_dir).write.format("noop").mode(
        "overwrite").save()
    from pyspark.sql import functions as F

    (spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k"))
     .agg(F.sum("id").alias("s")).write.format("noop").mode("overwrite").save())

    def _noop_pd(batches):
        for b in batches:
            yield b

    spark.range(64).repartition(32).mapInPandas(
        _noop_pd, schema="id long").write.format("noop").mode("overwrite").save()

    results = {}
    for name in args.queries:
        if name not in qs:
            print(f"!! unknown query {name}")
            continue
        if args.plans_dir and args.tag:
            os.makedirs(args.plans_dir, exist_ok=True)
            # capture the plan with lineage kept (persist-lifecycle
            # operators otherwise checkpoint eagerly and explain() shows
            # only Scan ExistingRDD); timings below run the real path
            os.environ["D2O_KEEP_LINEAGE"] = "1"
            try:
                df = qs[name](spark, args.sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            finally:
                os.environ.pop("D2O_KEEP_LINEAGE", None)
            with open(os.path.join(
                    args.plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
            _release_all_blocks(spark)
        times = []
        for p in range(args.passes):
            spark.sparkContext.setJobDescription(f"profile:{name}:pass{p}")
            t0 = time.perf_counter()
            qs[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
            times.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            _release_all_blocks(spark)
            spark.sparkContext.setJobDescription(None)
        results[name] = times
        print(f"{name}: " + " ".join(f"{t:.3f}" for t in times)
              + f"  min={min(times):.3f}")
    print("TOTAL(min):", round(sum(min(t) for t in results.values()), 3))


if __name__ == "__main__":
    main()
