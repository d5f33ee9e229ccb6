"""Partition-shaping helpers.

At 100 TB the scan produces thousands of input splits and these helpers are
no-ops; on small inputs (one tiny parquet file → one partition) CPU-heavy
expression work would otherwise serialize on a single core. ``spread`` is the
cheap insurance both cases tolerate: a round-robin shuffle of the *narrow*
input rows (documents, not their exploded shingles) up to the cluster's
default parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: the session's
    ``defaultParallelism``) if it currently has fewer partitions; otherwise
    return it unchanged. Use before explode/hash-heavy projections whose cost
    is per-row CPU, not I/O."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
