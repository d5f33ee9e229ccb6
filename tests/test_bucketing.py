"""Bucketed tables must deliver the plan they exist for: equi-joins and
aggregations on the bucket key with NO Exchange
(operators/partitioning.py write_bucketed / bucketed_join)."""

from __future__ import annotations

import pytest

from database2ogr_spark.operators.partitioning import (
    bucketed_join,
    suggest_buckets,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = docs.selectExpr("doc_id", "n_chars", "length(text) AS true_len")
    write_bucketed(docs, "b_docs", "doc_id", buckets=8)
    write_bucketed(stats, "b_stats", "doc_id", buckets=8)
    yield "b_docs", "b_stats"
    for t in ("b_docs", "b_stats"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, left, right, "doc_id")
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # both scans must actually use the bucket metadata
        assert plan.count("Bucketed: true") == 2, plan
        # NB: a per-bucket Sort remains — since Spark 3.0 bucketed scans
        # don't expose sortBy ordering unless
        # spark.sql.legacy.bucketedTableScan.outputOrdering is set; the
        # shuffle (the scale cost) is what bucketing removes
        assert j.count() == spark.table(left).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("doc_id").count()
    plan = _plan(agg)
    assert "Exchange" not in plan, plan


def test_unbucketed_join_does_exchange(spark, bucketed_tables):
    # control: the same join through plain parquet shuffles both sides
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = docs.join(
            docs.selectExpr("doc_id", "n_chars AS n2"), on="doc_id"
        )
        assert "Exchange" in _plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_one_file_per_bucket(spark, bucketed_tables):
    # the pre-write repartition keeps file count == bucket count, not
    # tasks x buckets (the small-file guard write_bucketed documents)
    left, _ = bucketed_tables
    import glob
    import os

    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {left}")
        .filter("col_name = 'Location'")
        .collect()[0]["data_type"]
    )
    parts = glob.glob(os.path.join(loc.replace("file:", ""), "part-*"))
    assert len(parts) == 8, parts


def test_suggest_buckets_power_of_two():
    assert suggest_buckets(100 << 20) == 1
    assert suggest_buckets(10 << 30) == 128  # 10 GiB / 128 MiB = 80 → 128
    assert suggest_buckets(0) == 1


def test_skew_report_top_keys_and_null_bucket(spark):
    from database2ogr_spark.operators.partitioning import skew_report

    rows = [(1, "a")] * 6 + [(2, "b")] * 3 + [(3, None)] * 1
    df = spark.createDataFrame(
        [(i, k) for i, (_, k) in enumerate(rows)], "id long, k string"
    )
    out = skew_report(df, "k", k=2).collect()
    assert [(r.key_value, r.n, r.rank) for r in out] == [("a", 6, 1), ("b", 3, 2)]
    assert out[0].frac == 0.6


def test_skew_report_uses_take_ordered_not_global_sort_window(spark):
    from database2ogr_spark.operators.partitioning import skew_report

    df = spark.createDataFrame([(i, i % 7) for i in range(100)], "id long, k int")
    plan = skew_report(df, "k", k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
