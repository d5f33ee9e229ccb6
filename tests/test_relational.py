"""Plan audits for the classic relational pack (plans/relational.py).

Correctness is pinned by the DuckDB oracle harness (scripts/check_oracle.py);
these tests pin the *physical* properties the 100 TB story depends on — the
join strategy, semi/anti shapes, and pushdown — so a refactor that silently
degrades the plan fails here, not in production.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as m

    return m


def test_q7_broadcasts_nation_onto_both_ends(spark, entrymod):
    plan = _plan(entrymod.queries()["tpch_q7_nation_volume"](spark, SF))
    # both fact ends must get the 2-row nation dim via broadcast, never a
    # shuffle of lineitem/orders keyed on nationkey
    assert plan.count("BroadcastHashJoin") >= 2


def test_q14_single_pass_conditional_agg(spark, entrymod):
    plan = _plan(entrymod.queries()["tpch_q14_promo_revenue"](spark, SF))
    # one broadcast join of part, one scan of lineitem: the promo/total split
    # must be a CASE inside one aggregate, not two joins or a union
    assert plan.count("Scan parquet") == 2
    assert "BroadcastHashJoin" in plan


def test_q15_keeps_ties(spark, entrymod):
    from database2ogr_spark.plans.relational import top_supplier
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    sup = spark.read.parquet(f"{SF}/supplier.parquet")
    out = top_supplier(li, sup).collect()
    assert len(out) >= 1
    assert len({r.total_revenue_c4 for r in out}) == 1  # all rows at the max


def test_q18_having_filter_broadcasts_back(spark, entrymod):
    plan = _plan(entrymod.queries()["tpch_q18_large_orders"](spark, SF))
    # the post-HAVING orderkey set is tiny and must re-enter via broadcast
    assert "BroadcastHashJoin" in plan


def test_q19_is_one_join_not_a_union(spark, entrymod):
    plan = _plan(entrymod.queries()["tpch_q19_band_revenue"](spark, SF))
    assert plan.count("Scan parquet") == 2  # lineitem once, part once
    assert "Union" not in plan


def test_q21_composes_semi_and_anti_on_reduced_fact(spark, entrymod):
    plan = _plan(entrymod.queries()["tpch_q21_sole_late_supplier"](spark, SF))
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort


def test_q22_anti_join_with_pruned_probe(spark, entrymod):
    plan = _plan(entrymod.queries()["tpch_q22_idle_rich_customers"](spark, SF))
    assert "LeftAnti" in plan
    assert "o_orderdate" in plan  # date filter reaches the orders scan
