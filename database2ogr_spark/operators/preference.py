"""Preference-pair construction — the RLHF/DPO data-prep step: turn a
scored pool of candidate responses into (chosen, rejected) training pairs.

Beyond-reference surface. Given rows grouped by a prompt/context key and a
quality score, emit pairs of the group's best row against each sufficiently
worse sibling. The two standard knobs: a minimum score MARGIN (pairs whose
scores are near-ties teach the reward model nothing and add label noise —
public DPO/RLHF practice filters them) and a per-group pair CAP (one
over-annotated prompt must not dominate the pair distribution).

Scale design: the per-group champion comes from ``max(struct(score, id))``
— a partial-aggregable groupBy (map-side combined, no per-group sort), not
a window over the full pool. Pair expansion is a group-keyed equi-join of
the 1-row-per-group champion table back onto the pool (AQE broadcasts it
when #groups is small); the only window runs AFTER the margin filter, over
each group's surviving candidates, for the cap. Nothing corpus-sized sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def preference_pairs(
    df: DataFrame,
    *,
    group_col: str,
    score_col: str,
    id_col: str = "doc_id",
    min_margin: float = 0.0,
    max_pairs_per_group: int | None = None,
) -> DataFrame:
    """(chosen, rejected) pairs per group: the group's top-scored row
    (ties broken toward the LARGER id — the ``max(struct)`` order, pinned
    and replayed by the oracle) against every other row whose score
    trails by at least ``min_margin``; optionally capped to the
    ``max_pairs_per_group`` closest-scored rejects (score desc, id asc —
    hardest negatives first, the pairs with the most training signal).

    Output: (group_col, chosen_id, rejected_id, chosen_score,
    rejected_score, margin). NULL scores never win the champion slot and
    never form pairs (a NULL margin fails the filter). Groups of one row
    produce nothing.
    """
    if min_margin < 0:
        raise ValueError(f"min_margin must be >= 0, got {min_margin}")
    if max_pairs_per_group is not None and max_pairs_per_group <= 0:
        raise ValueError(
            f"max_pairs_per_group must be positive, got {max_pairs_per_group}"
        )
    pool = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("rejected_id"),
        F.col(score_col).cast("double").alias("rejected_score"),
    )
    champ = (
        pool.filter(F.col("rejected_score").isNotNull())
        .groupBy("grp")
        .agg(
            F.max(
                F.struct(
                    F.col("rejected_score").alias("s"),
                    F.col("rejected_id").alias("i"),
                )
            ).alias("b")
        )
        .select(
            "grp",
            F.col("b.i").alias("chosen_id"),
            F.col("b.s").alias("chosen_score"),
        )
    )
    pairs = (
        champ.join(pool, "grp")
        .filter(F.col("rejected_id") != F.col("chosen_id"))
        .filter(
            F.col("chosen_score") - F.col("rejected_score")
            >= F.lit(float(min_margin))
        )
    )
    if max_pairs_per_group is not None:
        w = Window.partitionBy("grp").orderBy(
            F.col("rejected_score").desc(), F.col("rejected_id").asc()
        )
        pairs = pairs.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") <= max_pairs_per_group
        )
    return pairs.select(
        F.col("grp").alias(group_col),
        "chosen_id",
        "rejected_id",
        "chosen_score",
        "rejected_score",
        (F.col("chosen_score") - F.col("rejected_score")).alias("margin"),
    )
