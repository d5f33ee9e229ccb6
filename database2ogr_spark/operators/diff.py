"""Snapshot reconciliation: classify rows between two dataset versions.

Incremental 100 TB pipelines re-export corpora continuously; before
promoting a new snapshot you want to know WHAT moved — rows added, removed,
changed, unchanged — without shipping either snapshot anywhere. This is the
FULL OUTER JOIN surface: both sides reduce to (id, fingerprint) projections
before the join, so the shuffle carries two 8-byte-ish columns per row
regardless of row width, and the classification is a narrow CASE.

Fingerprints are md5 over the compared columns joined with a unit separator
(0x1f) and a NULL sentinel — hex md5 is identical in Spark and DuckDB, so
the operator is exactly oracle-reproducible. Compare columns should be
strings/integers; floats cast to string are engine-formatting-sensitive and
belong behind an explicit round/format first (documented contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: field / null sentinels for the fingerprint concat — ASCII control chars
#: that cannot appear in the data columns of a sane corpus
_SEP = "\x1f"
_NULL = "\x00"


def row_fingerprint(cols: list[str]) -> F.Column:
    """Hex md5 over the named columns, NULL-safe and order-pinned."""
    return F.md5(
        F.concat_ws(
            _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
        )
    )


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    *,
    compare_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Return one row per id present in either snapshot:
    (id_col, status ∈ {added, removed, changed, unchanged}).

    Both sides project to (id, fp) BEFORE the full outer join — at scale
    the wide row bodies never shuffle, only ids and 32-char fingerprints.
    """
    cols = list(compare_cols) if compare_cols else [
        c for c in new.columns if c != id_col
    ]
    o = old.select(F.col(id_col).alias("_id"), row_fingerprint(cols).alias("old_fp"))
    n = new.select(F.col(id_col).alias("_id"), row_fingerprint(cols).alias("new_fp"))
    return (
        o.join(n, "_id", "full_outer")
        .select(
            F.col("_id").alias(id_col),
            F.when(F.col("old_fp").isNull(), F.lit("added"))
            .when(F.col("new_fp").isNull(), F.lit("removed"))
            .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
            .otherwise(F.lit("changed"))
            .alias("status"),
        )
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    id_col: str = "doc_id",
    *,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC batch to a snapshot — the MERGE half of the
    reconciliation surface (:func:`dataset_diff` tells you what moved;
    this produces the next snapshot): ``changes`` carries the base schema
    plus ``op_col`` ∈ {'upsert', 'delete'}; the result is

    - base rows whose key is untouched by the batch, plus
    - the batch's upsert rows (inserts AND updates — last-write-wins by
      key within the batch is the CALLER's contract: feed one row per
      key, e.g. via ``dedup`` or a max-timestamp reduction upstream).

    Scale shape: ONE left-anti equi-join of base against the batch's key
    projection (a CDC batch is ≪ the snapshot, so AQE broadcasts the key
    side — the base never shuffles) + a union. No full outer join, no
    window. Unknown ops raise rather than silently drop.
    """
    ops = [r[0] for r in changes.select(op_col).distinct().collect()]  # ≤ #op kinds
    unknown = set(ops) - {"upsert", "delete"}
    if unknown:
        raise ValueError(f"unknown {op_col!r} values: {sorted(unknown)}")
    touched = changes.select(F.col(id_col)).distinct()
    kept = base.join(touched, id_col, "left_anti")
    upserts = changes.filter(F.col(op_col) == "upsert").drop(op_col)
    return kept.unionByName(upserts)
