"""Count-min sketch as a first-class DataFrame structure — the mergeable
fixed-memory frequency summary (public Cormode & Muthukrishnan 2005).

Spark ships HLL (distinct counts) and approx_top_k (heavy hitters) as
opaque binary aggregates; count-min fills the remaining sketch niche —
POINT frequency queries over unbounded key domains in O(width·depth)
memory — and this implementation keeps the sketch as an ordinary
DataFrame of ``(row, col, cnt)`` cells, which buys three things at scale:

- **mergeable by construction**: union sketches of shards/days and sum
  cells — exact integer arithmetic, so merge-then-query equals
  build-once-then-query bit-for-bit (property-graded);
- **storable/queryable anywhere**: the sketch is a ≤ width·depth-row
  table, writable as parquet, joinable by any engine;
- **oracle-replayable**: cell positions come from ``stable_hash64`` with
  a per-row seed, so DuckDB reproduces every cell and every query answer
  exactly — no opaque binary blobs.

Estimates are ONE-SIDED: est ≥ true count always; overestimation happens
only via hash collisions (ε ≈ e/width with probability 1-δ, δ ≈ e^-depth).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from database2ogr_spark.functions.hashing import stable_hash64

DEFAULT_WIDTH = 1024
DEFAULT_DEPTH = 3
#: seed base: depth row d hashes with seed CM_SEED + d
CM_SEED = 41


def countmin_build(
    df: DataFrame,
    item_col: str,
    *,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch over ``item_col`` occurrences (or ``weight_col``
    increments): returns the populated ``(row, col, cnt)`` cells.

    Plan: each occurrence fans out to ``depth`` cells (an inline array
    explode — no join), then ONE aggregation on (row, col): map-side
    combine collapses each partition to ≤ width·depth cells before the
    shuffle, so bytes shuffled are bounded by the sketch size per
    partition, independent of data volume — the sketch property.
    """
    inc = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        (
                            stable_hash64(
                                F.col(item_col).cast("string"), seed=CM_SEED + d
                            )
                            % width
                        ).alias("col"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
        inc.alias("_inc"),
    )
    return (
        cells.groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.sum("_inc").alias("cnt"))
    )


def countmin_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (width, depth): cell-wise sum.
    Exact integer arithmetic — merging is lossless relative to building
    one sketch over the concatenated data (pinned in tests)."""
    all_cells = reduce(lambda a, b: a.unionByName(b), sketches)
    return all_cells.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def countmin_query(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    *,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
) -> DataFrame:
    """Point-frequency estimates for ``items``: est = min over the item's
    ``depth`` cells (absent cell ⇒ the estimate is that cell's 0 — item
    never seen).  The items side fans out to depth probe rows and joins
    the sketch on (row, col) — with the sketch's ≤ width·depth rows this
    broadcasts; the raw data is never rescanned (query cost is independent
    of corpus size).  Returns (item_col, est)."""
    probes = items.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        (
                            stable_hash64(
                                F.col(item_col).cast("string"), seed=CM_SEED + d
                            )
                            % width
                        ).alias("col"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(item_col, F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    joined = probes.join(F.broadcast(sketch), ["row", "col"], "left").select(
        item_col, F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("_cell")
    )
    return joined.groupBy(item_col).agg(F.min("_cell").alias("est"))
