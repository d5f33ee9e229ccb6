"""Fuzzy record linkage: blocked edit-distance joins.

The textbook fuzzy join is all-pairs Levenshtein — quadratic and dead at
any scale. The standard industrial shape [Christen, "Data Matching",
Springer 2012, ch. 4] is block-then-verify: a cheap deterministic BLOCKING
key (first token, phonetic code, length bucket, …) gates candidate
generation down to within-block pairs, then the exact distance verifies
survivors. Recall is bounded by the blocking choice (a typo in the first
token escapes a first-token block) — callers needing higher recall union
candidates from several independent blocking keys, which composes here as
a union of calls with different ``block_fn``.

Scale design:

- The candidate join shuffles on the block key only; within-block work is
  bounded by the largest block. A hot block (everyone named "john") is the
  skew risk — same mitigation as every key join in this repo: pick keys
  with bounded selectivity, or salt the hot keys upstream.
- The length-band prune ``|len(a) - len(b)| <= max_distance`` is LOSSLESS
  (edit distance is at least the length difference) and runs inside the
  join condition, pre-verification.
- Verification uses Spark's built-in ``levenshtein(l, r, threshold)``
  (JVM codegen, early-exit above the threshold — the banded O(n·d)
  algorithm, not the full O(n·m) table).

Reference parity: no fuzzy surface in the reference (geospatial exporter);
part of the beyond-reference training/cleaning operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _first_token(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")[0]


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    max_distance: int = 2,
    block_fn=_first_token,
) -> DataFrame:
    """Typo-tolerant lookup join: for every left row, the right rows whose
    text is within ``max_distance`` edits, candidates gated by
    ``block_fn`` equality (default: first whitespace token).

    Output: (left_id, right_id, left_text, right_text, distance), self
    matches (same id value) excluded so a table can probe itself.
    """
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    l = left.select(
        F.col(left_id).alias("_lid"),
        F.col(left_text).alias("_ltxt"),
        block_fn(F.col(left_text)).alias("_blk"),
        F.length(left_text).alias("_llen"),
    )
    r = right.select(
        F.col(right_id).alias("_rid"),
        F.col(right_text).alias("_rtxt"),
        block_fn(F.col(right_text)).alias("_blk"),
        F.length(right_text).alias("_rlen"),
    )
    dist = F.levenshtein(F.col("_ltxt"), F.col("_rtxt"), max_distance)
    return (
        l.join(r, "_blk")
        .filter(
            (F.col("_lid") != F.col("_rid"))
            & (F.abs(F.col("_llen") - F.col("_rlen")) <= max_distance)
        )
        .withColumn("distance", dist)
        .filter(F.col("distance") >= 0)  # threshold form returns -1 above it
        .select(
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            F.col("_ltxt").alias(left_text),
            F.col("_rtxt").alias(right_text),
            "distance",
        )
    )


def fuzzy_dedup_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    max_distance: int = 2,
    block_fn=_first_token,
) -> DataFrame:
    """Within-table near-identical pairs (``id_a < id_b``) under the same
    block-then-verify scheme — the record-linkage sibling of the text
    near-dup operators (``operators/dedup.py``), for short strings (names,
    titles) where edit distance is the right metric and shingles are not.

    Output: (id_a, id_b, text_a, text_b, distance).
    """
    out = fuzzy_join(
        df.select(F.col(id_col).alias("ida"), F.col(text_col).alias("ta")),
        df.select(F.col(id_col).alias("idb"), F.col(text_col).alias("tb")),
        left_id="ida",
        right_id="idb",
        left_text="ta",
        right_text="tb",
        max_distance=max_distance,
        block_fn=block_fn,
    )
    return out.filter(F.col("ida") < F.col("idb")).select(
        F.col("ida").alias("id_a"),
        F.col("idb").alias("id_b"),
        F.col("ta").alias("text_a"),
        F.col("tb").alias("text_b"),
        "distance",
    )
