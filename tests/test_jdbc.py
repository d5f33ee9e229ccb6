"""S4 — live JDBC round-trip + pushdown plan audit against embedded Derby.

The sandbox has no Postgres, but Spark ships Apache Derby (for the Hive
metastore), which runs in-process over a file-backed database — a real JDBC
source, so the S1-over-JDBC shape (reference ``src/from-ground-up.js:149-171``:
``SELECT cols FROM t WHERE area_id = $1`` as a prepared statement) can be
exercised end-to-end: write a table through ``df.write.jdbc``, read it back
through :func:`database2ogr_spark.sources.catalog.jdbc_reader`, and assert the
equality predicate reaches the database scan (``PushedFilters`` in the
physical plan) instead of being applied post-transfer.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from database2ogr_spark.sources.catalog import jdbc_reader

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DERBY_DRIVER)
        return True
    except Exception:
        return False


@pytest.fixture(scope="module")
def derby_url(spark):
    if not _derby_available(spark):
        pytest.skip("Derby JDBC driver not on the Spark classpath")
    path = os.path.join(tempfile.mkdtemp(prefix="d2o_derby_"), "db")
    url = f"jdbc:derby:{path};create=true"
    src = spark.createDataFrame(
        [(i, i % 5, f"poi_{i}") for i in range(100)],
        "poi_id int, area_id int, name string",
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "points_of_interest")
        .option("driver", DERBY_DRIVER)
        .mode("overwrite")
        .save()
    )
    return url


def test_jdbc_param_scan_values(spark, derby_url):
    # S1 shape over a live JDBC source: equality bind param + projection
    df = (
        jdbc_reader(spark, "points_of_interest", url=derby_url, driver=DERBY_DRIVER)
        .filter(F.col("area_id") == 3)
        .select("poi_id", "name")
    )
    rows = sorted((r.poi_id, r.name) for r in df.collect())
    assert rows == [(i, f"poi_{i}") for i in range(3, 100, 5)]


def test_jdbc_filter_pushdown_reaches_scan(spark, derby_url):
    df = jdbc_reader(
        spark, "points_of_interest", url=derby_url, driver=DERBY_DRIVER
    ).filter(F.col("area_id") == 3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "area_id" in plan, plan
    # the filter must be INSIDE the scan's pushed list, not a residual-only
    # Filter node above an unfiltered scan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("area_id" in ln for ln in pushed), plan


def test_jdbc_partitioned_read_splits_scan(spark, derby_url):
    # partitionColumn turns the single-task JDBC scan into parallel range
    # reads — the 100 TB knob; results must be identical to the plain read
    df = jdbc_reader(
        spark,
        "points_of_interest",
        url=derby_url,
        driver=DERBY_DRIVER,
        partition_column="poi_id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=100,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
