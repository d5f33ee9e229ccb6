"""Bucketed-table plumbing — the co-located join path for repeated big joins.

At 100 TB the dominant cost of a repeated equi-join (documents ⋈ chunk
metadata, events ⋈ sessions, corpus ⋈ dedup-survivor ids) is re-shuffling
both sides on every run. Spark's bucketing amortizes that shuffle into the
WRITE: ``bucketBy(n, key)`` hash-partitions files once, and every later join
or aggregation on the bucket key reads co-located buckets with NO Exchange
in the plan (asserted in tests/test_bucketing.py). ``sortBy`` additionally
pre-sorts within buckets; note Spark >= 3.0 still plans a (cheap,
per-bucket, spill-free) Sort under SortMergeJoin unless
``spark.sql.legacy.bucketedTableScan.outputOrdering`` is enabled — the
Exchange is the cost bucketing removes.

Rules of thumb encoded here:
- bucket COUNTS must match on both sides for a shuffle-free join; pick a
  power of two sized so one bucket of the bigger table is ~100-200 MB
  (``suggest_buckets``).
- bucketed tables must go through the session catalog (``saveAsTable``) —
  path-based ``parquet(path)`` writes do not persist bucket metadata.
- one task writes one file per bucket it touches: ``repartition`` on the
  bucket key before writing to avoid small-file explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def suggest_buckets(total_bytes: int, target_bucket_bytes: int = 128 << 20) -> int:
    """Power-of-two bucket count putting ~``target_bucket_bytes`` in each."""
    n = max(1, total_bytes // target_bucket_bytes)
    p = 1
    while p < n:
        p <<= 1
    return p


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    *,
    num_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and by default sorted) catalog table.

    The ``repartition`` on the bucket key keeps file count = bucket count
    (each write task owns whole buckets) instead of tasks × buckets.
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = (
        df.repartition(num_buckets, *cols)
        .write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *cols)
    )
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str]
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    Pure convenience — the plan benefit comes from the table metadata, not
    this function: with matching bucket counts Catalyst plans a
    SortMergeJoin with zero Exchange operators (and zero Sorts when the
    tables were written ``sortBy`` the key).
    """
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on=keys)
