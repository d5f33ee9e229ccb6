"""A/B experiment (VERDICT r10 #6): packed-HyperANF merge stage — Arrow
``mapInPandas`` elementwise-max (shipped) vs an all-JVM variant that
aggregates 2^p per-register ``max`` columns over the packed array
(p=8 → 256 agg expressions, map-side combinable, zero Python workers).

Protocol per the repo bench notes: interleaved passes within ONE process
(ambient load on this sandbox is bursty, so back-to-back pairs share the
burst), blocking release of all persisted/localCheckpoint blocks between
runs, min-of-N reported, loadavg recorded. Result goes to SCALE.md; the
JVM variant ships only if it wins.

Run: python scripts/exp_khop_jvm_merge.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
import bench as benchmod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from database2ogr_spark.operators.graph import khop_reach_approx, stable_hash64  # noqa: E402
from database2ogr_spark.session import get_spark  # noqa: E402

P = 8
M = 1 << P


def _edges(spark, sf_dir):
    li = (
        entrymod._t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    return (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )


def khop_jvm_merge(edges, *, hops=2, p=P, seed=7):
    """Variant B: identical seed/pack/estimate stages, but the per-hop
    elementwise-max merge is 2^p JVM ``max`` aggregate columns over the
    packed array (re-assembled with F.array) instead of Arrow numpy."""
    m = 1 << p
    w = 60 - p
    e = (
        edges.select(F.col("src").alias("v"), F.col("dst").alias("u"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    h = stable_hash64(F.col("node"), seed=seed)
    node_sketch = (
        e.select(F.col("u").alias("node"))
        .distinct()
        .select(
            "node",
            (h % m).alias("reg"),
            (
                F.lit(w + 1)
                - F.when(
                    F.shiftright(h, p) > 0,
                    F.length(F.bin(F.shiftright(h, p))),
                ).otherwise(F.lit(0))
            ).cast("int").alias("rho"),
        )
    )
    sketch = (
        e.join(node_sketch, e["u"] == node_sketch["node"])
        .groupBy("v", "reg")
        .agg(F.max("rho").alias("mj"))
    )
    # pack stage: same 2^p-column JVM pivot (max of mj where reg == i) so
    # the whole iteration is JVM-side in this variant
    packed = (
        sketch.groupBy("v")
        .agg(
            *[
                F.max(F.when(F.col("reg") == i, F.col("mj")).otherwise(F.lit(0)))
                .cast("tinyint")
                .alias(f"r{i}")
                for i in range(m)
            ]
        )
        .select("v", F.array(*[F.col(f"r{i}") for i in range(m)]).alias("regs"))
        .localCheckpoint(eager=True)
    )
    for _ in range(hops - 1):
        propagated = (
            e.alias("e")
            .join(packed.alias("s"), F.col("e.u") == F.col("s.v"))
            .select(F.col("e.v").alias("v"), F.col("s.regs").alias("regs"))
        )
        packed = (
            propagated.union(packed)
            .groupBy("v")
            .agg(
                *[
                    F.max(F.col("regs").getItem(i)).cast("tinyint").alias(f"r{i}")
                    for i in range(m)
                ]
            )
            .select("v", F.array(*[F.col(f"r{i}") for i in range(m)]).alias("regs"))
            .localCheckpoint(eager=True)
        )
    sketch = packed.select("v", F.posexplode("regs").alias("reg", "mj")).filter(
        F.col("mj") > 0
    )
    per_node = sketch.groupBy("v").agg(
        F.sum(
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 61 - mj) AS DECIMAL(38,0))")
        ).alias("num_present"),
        F.count(F.lit(1)).cast("bigint").alias("n_present"),
    )
    v0 = (F.lit(m) - F.col("n_present")).cast("bigint")
    num = F.col("num_present") + (
        (F.lit(m) - F.col("n_present")).cast("decimal(38,0)")
        * F.lit(1 << 61).cast("decimal(38,0)")
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    e_raw = (
        alpha * F.lit(float(m)) * F.lit(float(m)) * F.lit(float(1 << 61))
        / num.cast("double")
    )
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v0 > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v0.cast("double")),
    ).otherwise(e_raw)
    out = per_node.select(
        F.col("v").alias("node"), F.round(est, 6).alias("estimate")
    ).localCheckpoint(eager=True)
    e.unpersist()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("khop-merge-ab")
    spark.sparkContext.setLogLevel("ERROR")

    # warm: JVM, parquet footers, python workers
    _edges(spark, sf_dir).write.format("noop").mode("overwrite").save()
    benchmod._release_all_blocks(spark)

    # equivalence check first (cheap sf): estimates must be bit-identical
    small = "/root/testdata/sf0.001"
    a = {
        r.node: r.estimate
        for r in khop_reach_approx(_edges(spark, small), hops=2, p=P, seed=7).collect()
    }
    benchmod._release_all_blocks(spark)
    b = {
        r.node: r.estimate
        for r in khop_jvm_merge(_edges(spark, small), hops=2, p=P, seed=7).collect()
    }
    benchmod._release_all_blocks(spark)
    assert a == b, (
        f"variants disagree: {len(a)} vs {len(b)} nodes, "
        f"first diff {next(((k, a.get(k), b.get(k)) for k in a if a.get(k) != b.get(k)), None)}"
    )
    print(f"EQUIVALENCE OK: {len(a)} nodes bit-identical at sf0.001", flush=True)

    times = {"arrow": [], "jvm": []}
    for i in range(passes):
        for name, fn in (("arrow", khop_reach_approx), ("jvm", khop_jvm_merge)):
            la = os.getloadavg()[0]
            t0 = time.perf_counter()
            fn(_edges(spark, sf_dir), hops=2, p=P, seed=7).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            benchmod._release_all_blocks(spark)
            times[name].append(round(dt, 2))
            print(f"pass {i + 1} {name}: {dt:.2f}s (loadavg {la:.1f})", flush=True)
    print(
        {
            "sf_dir": sf_dir,
            "per_pass": times,
            "min": {k: min(v) for k, v in times.items()},
        }
    )


if __name__ == "__main__":
    main()
