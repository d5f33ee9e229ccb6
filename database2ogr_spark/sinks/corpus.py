"""Sharded corpus writer — the output side of a training-data pipeline.

Training loaders want a stable directory layout (``split=train/lang=en/``)
with a bounded number of similarly-sized files per partition, and shard
membership that does not churn between runs: re-exporting after appending
docs must not move old docs between shards (loaders checkpoint by file).

``write_corpus_shards`` delivers that with hash-assigned shards: a doc's
shard is ``stable_hash64(id) % shards`` — a function of the doc alone. The
pre-write ``repartition`` on (partition columns, shard) makes one write
task own each (partition, shard) cell, so file count = cells, not
tasks × cells (same small-file guard as partitioning.write_bucketed).

Format note: ``parquet`` for training pipelines (column pruning: a loader
reading only ``text`` skips everything else); ``json`` emits JSON-lines for
interchange with non-Spark consumers (sources/jsonl.py reads it back,
quarantine-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from database2ogr_spark.functions.hashing import stable_hash64


def write_corpus_shards(
    df: DataFrame,
    out_dir: str,
    *,
    partition_by: tuple[str, ...] = ("split",),
    shards: int = 4,
    id_col: str = "doc_id",
    fmt: str = "parquet",
    seed: int = 7,
) -> str:
    """Write ``df`` partitioned by ``partition_by`` directories with
    ``shards`` hash-assigned files per partition. Returns ``out_dir``.

    Rows are sorted by ``id_col`` within each shard so re-exports of the
    same data produce identical file contents (byte-stable modulo parquet
    footer metadata) — diffable exports.
    """
    shard_col = (
        stable_hash64(F.col(id_col).cast("string"), seed=seed) % shards
    ).cast("int")
    staged = (
        df.withColumn("__shard", shard_col)
        .repartition(*[F.col(c) for c in partition_by], F.col("__shard"))
        .sortWithinPartitions(*partition_by, "__shard", id_col)
    )
    (
        staged.drop("__shard")
        .write.mode("overwrite")
        .partitionBy(*partition_by)
        .format(fmt)
        .save(out_dir)
    )
    return out_dir
