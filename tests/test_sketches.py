"""Count-min sketch: one-sided estimates, exact-merge property, bounded
cell count, and query cost independent of corpus size (sketch broadcast)."""

from __future__ import annotations

from pyspark.sql import functions as F

from database2ogr_spark.operators.sketches import (
    countmin_build,
    countmin_merge,
    countmin_query,
)


def _tokens(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")


def test_countmin_one_sided_and_mostly_exact(spark):
    toks = _tokens(spark)
    sk = countmin_build(toks, "token")
    items = toks.select("token").distinct()
    est = {r.token: r.est for r in countmin_query(sk, items, "token").collect()}
    exact = {
        r.token: r.n
        for r in toks.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)  # NEVER underestimates
    # with |vocab| << width*depth, collisions are rare: most answers exact
    exact_frac = sum(est[t] == exact[t] for t in exact) / len(exact)
    assert exact_frac > 0.9


def test_countmin_merge_equals_direct(spark):
    toks = _tokens(spark)
    direct = countmin_build(toks, "token")
    merged = countmin_merge(
        countmin_build(toks.filter("doc_id % 2 = 0"), "token"),
        countmin_build(toks.filter("doc_id % 2 = 1"), "token"),
    )
    a = {(r.row, r.col): r.cnt for r in direct.collect()}
    b = {(r.row, r.col): r.cnt for r in merged.collect()}
    assert a == b  # cell-wise integer sums are associative: lossless merge


def test_countmin_cells_bounded_by_sketch_size(spark):
    toks = _tokens(spark)
    sk = countmin_build(toks, "token", width=64, depth=4)
    assert sk.count() <= 64 * 4
    # total mass per depth row equals the stream length
    per_row = {r.row: r.s for r in sk.groupBy("row").agg(F.sum("cnt").alias("s")).collect()}
    n = toks.count()
    assert per_row == {0: n, 1: n, 2: n, 3: n}


def test_countmin_unseen_item_estimates_from_cells(spark):
    toks = _tokens(spark)
    sk = countmin_build(toks, "token", width=1 << 20)  # huge width: no collisions
    unseen = spark.createDataFrame([("zz-never-seen-zz",)], "token string")
    est = countmin_query(sk, unseen, "token", width=1 << 20).collect()[0].est
    assert est == 0


def test_countmin_query_broadcasts_sketch(spark):
    toks = _tokens(spark)
    sk = countmin_build(toks, "token")
    plan = (
        countmin_query(sk, toks.select("token").distinct(), "token")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # raw data never rescanned at query time
