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

    Scale: level 1 is one distinct + one count; the L1 support prune
    shrinks every basket, then ONE groupBy builds the per-transaction
    sorted frequent-item array and the pair/triple candidates are narrow
    in-task array combinations (each itemset generated exactly once in
    canonical ascending order), each followed by one partial-agg'd
    count. Combinatorics are bounded by C(frequent items per basket, k)
    — cap or pre-split pathological hot baskets upstream (r12 note in
    the body: the between-level prune the old join chain applied cannot
    change the output, only that bound). ``max_size`` ≤ 3 keeps the
    column layout fixed; extend by widening the schema, not by nesting
    arrays.
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

    # transactions restricted to frequent single items — the A-priori
    # L1 prune (the dominant one: it shrinks every basket before any
    # combinatorics). r12 (guide §2.4, the co-purchase-edge lesson):
    # candidates are generated per basket from the SORTED frequent-item
    # array via narrow combination transforms — ONE groupBy shuffle
    # builds the baskets, and the pair/triple expansions are in-task
    # array work bounded by basket size — where the old shape ran a
    # txn-keyed self-join per level (tx1 exchanged twice for pairs, the
    # surviving-pair table re-exchanged for triples). Canonical ascending
    # order (i1 < i2 < i3) falls out of the sorted array, so each
    # candidate is generated exactly once per transaction, identically
    # to the join form. The L2→L3 support prune survives as a
    # leading-pair semi-join on the candidate stream (below) — only its
    # txn-keyed join-chain FORM is gone. In-task combinatorics are
    # bounded by C(|frequent items per basket|, k): fine for
    # order-bounded baskets (TPC-H tops out at 7 lineitems); for domains
    # with unbounded hot baskets, cap or pre-split baskets upstream, the
    # same guidance cap_per_group documents.
    tx1 = tx.join(f1.select("i"), "i")
    baskets = tx1.groupBy("t").agg(F.array_sort(F.collect_set("i")).alias("bs"))
    bs = F.col("bs")
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    bs,
                    lambda x, ix: F.transform(
                        F.slice(bs, ix + F.lit(2), F.size(bs)),
                        lambda y: F.struct(x.alias("i1"), y.alias("i2")),
                    ),
                )
            )
        ).alias("p")
    ).select(F.col("p.i1").alias("i1"), F.col("p.i2").alias("i2"))
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

    # L3: all ascending triples per basket (see the equivalence note
    # above — the final support filter reproduces the pruned chain's
    # output exactly)
    triples = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    bs,
                    lambda x, ix: F.flatten(
                        F.transform(
                            F.slice(bs, ix + F.lit(2), F.size(bs)),
                            lambda y, jx: F.transform(
                                F.slice(
                                    bs, ix + jx + F.lit(3), F.size(bs)
                                ),
                                lambda z: F.struct(
                                    x.alias("i1"),
                                    y.alias("i2"),
                                    z.alias("i3"),
                                ),
                            ),
                        )
                    ),
                )
            )
        ).alias("p")
    ).select(
        F.col("p.i1").alias("i1"),
        F.col("p.i2").alias("i2"),
        F.col("p.i3").alias("i3"),
    )
    # the A-priori L2→L3 prune, applied as a leading-pair semi-join on
    # the narrow candidate stream BEFORE the count shuffle (measured: on
    # sparse baskets f2 is tiny and the surviving-triple stream is a
    # small fraction of C(k,3), so counting unpruned candidates shuffled
    # strictly more — the prune is load-bearing, only its JOIN-CHAIN form
    # was not); AQE picks broadcast while f2 fits and degrades to a
    # shuffled semi-join when it does not
    triples = triples.join(f2.select("i1", "i2"), ["i1", "i2"], "left_semi")
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
