from __future__ import annotations

import pytest


def test_fuzzy_join_probe_lookup(spark):
    from database2ogr_spark.operators.linkage import fuzzy_join

    names = spark.createDataFrame(
        [
            (1, "small ring"),
            (2, "small rong"),   # 1 edit from "small ring"
            (3, "small thing"),  # 2 edits from "small ring"
            (4, "smalls ring"),  # first token differs -> escapes the block
            (5, "big ring"),     # different block
        ],
        "pid long, name string",
    )
    probes = names.filter("pid = 1").selectExpr("pid as qid", "name as qname")
    out = fuzzy_join(
        probes,
        names,
        left_id="qid",
        right_id="pid",
        left_text="qname",
        right_text="name",
        max_distance=2,
    ).collect()
    got = {(r.pid, r.distance) for r in out}
    # 2 is 1 edit, 3 is 2 edits; 4 is excluded by blocking (documented
    # recall bound), 5 by blocking, self by id
    assert got == {(2, 1), (3, 2)}


def test_fuzzy_dedup_pairs_canonical_and_symmetric(spark):
    from database2ogr_spark.operators.linkage import fuzzy_dedup_pairs

    df = spark.createDataFrame(
        [(1, "red widget"), (2, "red widgets"), (3, "red gadget"), (4, "blue bolt")],
        "pid long, name string",
    )
    out = fuzzy_dedup_pairs(df, id_col="pid", text_col="name", max_distance=2).collect()
    pairs = {(r.id_a, r.id_b): r.distance for r in out}
    # widget->widgets is 1 insert; widget->gadget is 2 substitutions;
    # widgets->gadget is 3 edits (pruned); blue bolt blocks separately
    assert pairs == {(1, 2): 1, (1, 3): 2}
    assert all(a < b for a, b in pairs)  # canonical orientation


def test_fuzzy_join_rejects_negative_distance(spark):
    from database2ogr_spark.operators.linkage import fuzzy_join

    df = spark.createDataFrame([(1, "x")], "pid long, name string")
    with pytest.raises(ValueError):
        fuzzy_join(
            df, df, left_id="pid", right_id="pid",
            left_text="name", right_text="name", max_distance=-1,
        )
