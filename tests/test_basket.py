from __future__ import annotations

import pytest

from database2ogr_spark.operators.basket import (
    association_rules,
    frequent_itemsets,
)


def _tx(spark):
    # classic toy: {a,b,c}, {a,b}, {a,c}, {b,c}, {a,b,c}
    rows = []
    for t, items in enumerate(
        [["a", "b", "c"], ["a", "b"], ["a", "c"], ["b", "c"], ["a", "b", "c"]]
    ):
        rows += [(t, i) for i in items]
    return spark.createDataFrame(rows, "txn_id long, item string")


def test_frequent_itemsets_apriori_counts(spark):
    out = frequent_itemsets(_tx(spark), min_support=3)
    got = {
        (r.size, r.i1, r.i2, r.i3): r.support for r in out.collect()
    }
    assert got[(1, "a", None, None)] == 4
    assert got[(1, "b", None, None)] == 4
    assert got[(1, "c", None, None)] == 4
    assert got[(2, "a", "b", None)] == 3
    assert got[(2, "a", "c", None)] == 3
    assert got[(2, "b", "c", None)] == 3
    # {a,b,c} appears in 2 transactions < 3 -> pruned
    assert not any(k[0] == 3 for k in got)
    # with support 2, the triple appears
    got2 = {
        (r.size, r.i1, r.i2, r.i3): r.support
        for r in frequent_itemsets(_tx(spark), min_support=2).collect()
    }
    assert got2[(3, "a", "b", "c")] == 2


def test_frequent_itemsets_dedups_within_transaction(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "x")], "txn_id long, item string"
    )
    out = frequent_itemsets(df, min_support=2).collect()
    assert len(out) == 1 and out[0].support == 2


def test_association_rules_confidence(spark):
    sets = frequent_itemsets(_tx(spark), min_support=3)
    rules = {
        (r.antecedent, r.consequent): r.confidence
        for r in association_rules(sets, min_confidence=0.7).collect()
    }
    # conf(a->b) = 3/4 = 0.75; all six directed pair rules tie at 0.75
    assert rules[("a", "b")] == 0.75
    assert len(rules) == 6


def test_frequent_itemsets_validation(spark):
    with pytest.raises(ValueError):
        frequent_itemsets(_tx(spark), min_support=0)
    with pytest.raises(ValueError):
        frequent_itemsets(_tx(spark), max_size=4)
