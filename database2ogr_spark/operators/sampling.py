"""Deterministic sampling and sequence-packing operators for training-data
pipelines. Both are pure DataFrame transforms with reproducible semantics (no
RNG state — sampling keys off a content hash, packing off a total order), so
the same inputs give the same sample/bins on any cluster size or retry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from database2ogr_spark.functions.hashing import stable_hash64


def deterministic_sample(
    df: DataFrame,
    *,
    pct: int,
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Keep ~pct% of rows, chosen by hash of the id — deterministic,
    resumable, and stable under repartitioning (unlike ``df.sample``, whose
    output depends on partition layout). ``pct`` is integer percent.

    Narrow (no shuffle): the hash-mod predicate evaluates per row and can even
    be pushed into a scan over a hash-partitioned layout.
    """
    bucket = stable_hash64(F.col(id_col).cast("string"), seed=seed) % 100
    return df.filter(bucket < pct)


def pack_sequences(
    df: DataFrame,
    *,
    budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Greedy sequence packing: within each ``group_col`` partition, walk
    docs in ``id_col`` order accumulating token counts; a doc whose running
    total crosses the ``budget`` boundary starts a new bin. Output adds
    ``bin_id`` (0-based per group).

    Bin id = floor((cumsum - n_tokens) / budget) — the running total *before*
    this doc. Docs never straddle bins; a bin may overflow ``budget`` by less
    than one document (boundary-based packing — strict ≤budget packing is a
    sequential fold, not expressible as a fixed window; trim or split
    oversized docs upstream if hard caps are required).

    Scale: the window partitions by ``group_col`` — parallelism = number of
    groups, the determinism/scale trade documented here on purpose. For
    unordered max-throughput packing, pre-repartition by a salt column and
    pack per partition instead.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    return df.withColumn(
        "bin_id", F.floor((cum - F.col(token_col)) / F.lit(budget)).cast("bigint")
    )
