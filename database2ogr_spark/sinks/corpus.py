"""Sharded corpus writer — the output side of a training-data pipeline.

Training loaders want a stable directory layout (``split=train/lang=en/``)
with a bounded number of similarly-sized files per partition, and shard
membership that does not churn between runs: re-exporting after appending
docs must not move old docs between shards (loaders checkpoint by file).

``write_corpus_shards`` delivers that with hash-assigned shards: a doc's
shard is ``stable_hash64(id) % shards`` — a function of the doc alone —
written as a ``__shard=N`` directory level UNDER the partition dirs. File
identity therefore derives from the shard value itself, never from shuffle
task placement: two cells hash-colliding into one write task still land in
their own directories, so every (partition, shard) cell is exactly one
file under any ``spark.sql.shuffle.partitions`` setting. The pre-write
``repartition`` on (partition columns, shard) only guarantees a cell is
never SPLIT across tasks (the small-file guard, as in
partitioning.write_bucketed); its task count is pure write parallelism.

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
    num_write_tasks: int | None = None,
) -> str:
    """Write ``df`` partitioned by ``partition_by``/``__shard=N`` directories
    — exactly one file per (partition values, shard) cell. Returns
    ``out_dir``.

    Shard membership is in the PATH (``__shard`` is a partition directory),
    so it cannot depend on shuffle-partition configuration; readers get
    ``__shard`` back as an int partition column (drop it or select around
    it). Rows are sorted by ``id_col`` within each shard so re-exports of
    the same data produce identical file contents (byte-stable modulo
    parquet footer metadata) — diffable exports. ``num_write_tasks``
    (default: the context's parallelism) is write parallelism only; it
    never affects membership or file count.
    """
    shard_col = (
        stable_hash64(F.col(id_col).cast("string"), seed=seed) % shards
    ).cast("int")
    n_tasks = num_write_tasks or max(
        shards, df.sparkSession.sparkContext.defaultParallelism
    )
    staged = (
        df.withColumn("__shard", shard_col)
        .repartition(n_tasks, *[F.col(c) for c in partition_by], F.col("__shard"))
        .sortWithinPartitions(*partition_by, "__shard", id_col)
    )
    (
        staged.write.mode("overwrite")
        .partitionBy(*partition_by, "__shard")
        .format(fmt)
        .save(out_dir)
    )
    return out_dir


def read_corpus_shards(spark, out_dir: str, schema) -> DataFrame:
    """Read a sharded corpus back with an EXPLICIT schema (pass the
    writer-side ``df.schema``). A partitioned write of an empty frame
    leaves no part files, and a bare ``spark.read.parquet`` then dies
    with UNABLE_TO_INFER_SCHEMA — at scale an empty split cell is
    routine, so the reader must degrade to an empty frame instead.
    Production readers should pass explicit schemas anyway (schema drift
    surfaces as a typed error, not a silently different inference)."""
    return spark.read.schema(schema).parquet(out_dir)


def compact_dataset(
    spark,
    in_dir: str,
    out_dir: str,
    *,
    target_bytes: int = 1 << 30,
    fmt: str = "parquet",
    sort_within: tuple[str, ...] = (),
) -> int:
    """Small-file compaction: rewrite a (possibly fragmented) dataset into
    ``ceil(input_bytes / target_bytes)`` similarly-sized files. Returns the
    output file count.

    The small-files problem is a first-order cost at 100 TB: a dataset
    accreted by many incremental jobs ends up as millions of KB-scale files,
    and every downstream scan pays a task + open + footer read per file.
    Compaction is the standard maintenance pass (the OPTIMIZE of table
    formats, expressed on plain directories).

    Mechanics: input size comes from the driver-side file listing (metadata
    only, no data read); the rewrite is ONE distributed pass —
    ``repartition(n)`` round-robins rows into n even output tasks.
    ``sort_within`` optionally re-sorts rows inside each output file
    (sortWithinPartitions — no global sort) to restore min/max row-group
    pruning locality that round-robin would otherwise destroy for the named
    columns. Uncompacted-size estimation note: n is computed from the
    INPUT's on-disk bytes, so recompression ratio drift can land files
    modestly over/under target — fine for the scan-cost purpose.
    """
    import math

    from pyspark.sql import SparkSession  # noqa: F401

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(in_dir)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jvm_path).getLength()
    n = max(1, math.ceil(total / target_bytes))
    df = spark.read.format(fmt).load(in_dir)
    staged = df.repartition(n)
    if sort_within:
        staged = staged.sortWithinPartitions(*sort_within)
    staged.write.mode("overwrite").format(fmt).save(out_dir)
    out_path = spark._jvm.org.apache.hadoop.fs.Path(out_dir)
    listing = fs.listStatus(out_path)
    return sum(
        1
        for i in range(len(listing))
        if listing[i].getPath().getName().startswith("part-")
    )
