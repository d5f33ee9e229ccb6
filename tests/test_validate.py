"""Data-quality constraints (operators/validate.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _report(df, **kw):
    from database2ogr_spark.operators.validate import validate_constraints

    return {
        r.rule: r.violations for r in validate_constraints(df, **kw).collect()
    }


def test_each_rule_counts_its_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 10.0, 5),
            (1, "a", -3.0, 6),      # dup id, below range
            (None, "zz", 10.0, 7),  # null id, bad value
            (3, "b", 500.0, None),  # above range, null fk
            (4, "a", 50.0, 99),     # orphan fk
        ],
        "id long, cat string, x double, fk long",
    )
    keys = spark.createDataFrame([(5,), (6,), (7,)], "k long").select("k")
    rep = _report(
        df,
        not_null=("id",),
        unique=("id",),
        in_range={"x": (0.0, 100.0)},
        accepted_values={"cat": ("a", "b")},
        foreign_keys={"fk": keys},
    )
    assert rep == {
        "not_null:id": 1,
        "unique:id": 1,           # second row with id=1
        "in_range:x": 2,          # -3 and 500
        "accepted_values:cat": 1, # zz
        "foreign_key:fk": 1,      # 99 (NULL fk passes FK, fails nothing)
    }


def test_clean_table_is_all_zero_and_single_scan_for_row_rules(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    rep = _report(
        df,
        not_null=("o_orderkey", "o_custkey"),
        in_range={"o_totalprice": (0.0, 10_000_000.0)},
    )
    assert set(rep.values()) == {0}
    # all three row rules fold into ONE aggregate over ONE scan
    from database2ogr_spark.operators.validate import validate_constraints

    plan = (
        validate_constraints(
            df,
            not_null=("o_orderkey", "o_custkey"),
            in_range={"o_totalprice": (0.0, 10_000_000.0)},
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert sum(1 for l in plan.splitlines() if "Scan" in l and "orders" in l) == 1


def test_empty_rules_yield_empty_report(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    assert _report(df) == {}


def test_profile_columns_exact(spark):
    from database2ogr_spark.operators.validate import profile_columns

    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, None, 1.0), (3, "b", None), (4, "a", 4.0)],
        ["id", "s", "x"],
    )
    rows = {
        r.column: (r.n_rows, r.n_nulls, r.n_distinct, r.min_value, r.max_value)
        for r in profile_columns(df, exact_distinct=True).collect()
    }
    assert rows["id"] == (4, 0, 4, "1", "4")
    assert rows["s"] == (4, 1, 2, "a", "b")
    assert rows["x"] == (4, 1, 3, "1.0", "4.0")
    # output ordered by column name
    got = [r.column for r in profile_columns(df, exact_distinct=True).collect()]
    assert got == sorted(got)


def test_profile_columns_approx_tier_plan_has_no_expand(spark):
    """The default approx tier must stay a plain partial-agg single pass —
    no expand node (exact multi-distinct pays rows × #columns)."""
    from database2ogr_spark.operators.validate import profile_columns

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan, plan
    exact_plan = (
        profile_columns(df, exact_distinct=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in exact_plan  # the documented cost of exactness


def test_fk_orphans_counts_and_null_separation(spark):
    from database2ogr_spark.operators.validate import fk_orphans

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    out = fk_orphans(
        child, parent, child_key="fk", parent_key="pk", relation="c->p"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.relation == "c->p"
    assert r.n_child == 4 and r.n_null_fk == 1 and r.n_orphans == 1
    assert r.orphan_frac == 0.25


def test_k_anonymity_report(spark):
    from database2ogr_spark.operators.validate import k_anonymity_report

    df = spark.createDataFrame(
        [("en", "web")] * 5 + [("en", "book")] * 2 + [(None, "web")] * 1,
        "lang string, source string",
    )
    out = {
        (r.lang, r.source): (r.n, r.at_risk)
        for r in k_anonymity_report(df, ["lang", "source"], k=5).collect()
    }
    assert out[("en", "web")] == (5, 0)       # exactly k -> safe
    assert out[("en", "book")] == (2, 1)      # below k -> at risk
    assert out[(None, "web")] == (1, 1)       # NULLs group together

    import pytest

    with pytest.raises(ValueError):
        k_anonymity_report(df, [], k=5)


def test_mutual_information_hand_computed(spark):
    import math

    from database2ogr_spark.operators.validate import mutual_information

    # perfectly dependent columns: MI == H(X) == H(Y), NMI == 1
    df = spark.createDataFrame(
        [("a", "p")] * 2 + [("b", "q")] * 2,
        "x string, y string",
    )
    r = mutual_information(df, "x", "y").collect()[0]
    h = math.log(2)
    assert abs(r.h_x - round(h, 6)) < 1e-9
    assert abs(r.mi - round(h, 6)) < 1e-9
    assert r.nmi == 1.0

    # independent columns: MI == 0
    df2 = spark.createDataFrame(
        [("a", "p"), ("a", "q"), ("b", "p"), ("b", "q")],
        "x string, y string",
    )
    r2 = mutual_information(df2, "x", "y").collect()[0]
    assert r2.mi == 0.0 and r2.nmi == 0.0

    # constant column: zero entropy -> NULL nmi
    df3 = spark.createDataFrame(
        [("a", "p"), ("a", "q")], "x string, y string"
    )
    r3 = mutual_information(df3, "x", "y").collect()[0]
    assert r3.h_x == 0.0 and r3.mi == 0.0 and r3.nmi is None


def test_cohens_kappa_hand_computed(spark):
    from database2ogr_spark.operators.validate import cohens_kappa

    # classic 2x2: a=(y,y,y,n,n,n,y,n,y,y), b=(y,n,y,n,n,y,y,n,y,n)
    pairs = [("y","y"),("y","n"),("y","y"),("n","n"),("n","n"),
             ("n","y"),("y","y"),("n","n"),("y","y"),("y","n")]
    df = spark.createDataFrame(pairs, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    # po = 7/10; pa(y)=.6 pb(y)=.5, pa(n)=.4 pb(n)=.5 -> pe=.5
    assert r.n_rows == 10 and abs(r.po - 0.7) < 1e-9
    assert abs(r.pe - 0.5) < 1e-9
    assert abs(r.kappa - 0.4) < 1e-9
    assert (r.col_a, r.col_b) == ("a", "b")


def test_cohens_kappa_nulls_and_degenerate(spark):
    from database2ogr_spark.operators.validate import cohens_kappa

    # NULL is a category: (NULL, NULL) agrees
    df = spark.createDataFrame(
        [("x", "x"), (None, None), ("x", None)], "a string, b string"
    )
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert abs(r.po - 2 / 3) < 1e-6
    # both raters constant -> pe = 1 -> kappa undefined (NULL)
    dfc = spark.createDataFrame([("k", "k"), ("k", "k")], "a string, b string")
    rc = cohens_kappa(dfc, "a", "b").collect()[0]
    assert rc.po == 1.0 and rc.pe == 1.0 and rc.kappa is None


def test_l_diversity_homogeneity_attack(spark):
    import pytest as _pytest

    from database2ogr_spark.operators.validate import l_diversity_report

    # group A: 3 rows, all sensitive='x' -> k-anonymous at k=3 but
    # l-homogeneous; group B: 2 rows, 2 values -> diverse; NULL counts
    df = spark.createDataFrame(
        [("A", "x"), ("A", "x"), ("A", "x"), ("B", "y"), ("B", None)],
        "qi string, diag string",
    )
    out = {r.qi: r for r in l_diversity_report(df, ["qi"], "diag", l=2).collect()}
    assert (out["A"].n, out["A"].n_sensitive, out["A"].at_risk) == (3, 1, 1)
    assert (out["B"].n, out["B"].n_sensitive, out["B"].at_risk) == (2, 2, 0)
    with _pytest.raises(ValueError):
        l_diversity_report(df, [], "diag")
    with _pytest.raises(ValueError):
        l_diversity_report(df, ["qi"], "diag", l=0)


def test_dataset_datasheet_hand_computed(spark):
    import math

    from database2ogr_spark.operators.validate import dataset_datasheet

    df = spark.createDataFrame(
        [
            (1, "hello world", "en"),
            (2, "hello world", "en"),            # exact duplicate
            (3, "contact me a.b@x.org now", "en"),  # PII
            (4, "bonjour", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    r = dataset_datasheet(df).collect()[0]
    assert r.n_docs == 4 and r.n_tokens == 2 + 2 + 4 + 1
    assert r.vocab_size == 7  # hello world contact me a.b@x.org now bonjour
    assert abs(r.dup_doc_rate - 0.25) < 1e-9  # 3 distinct texts of 4
    assert r.n_langs == 2
    ent = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert abs(r.lang_entropy - ent) < 1e-5
    assert abs(r.pii_doc_rate - 0.25) < 1e-9
    # lengths: 11, 11, 24, 7 sorted -> 7,11,11,24; lower median (2nd) = 11
    assert r.median_len == 11


def test_fd_violations_exact_and_violated(spark):
    import pytest as _pytest

    from database2ogr_spark.operators.validate import fd_violations

    df = spark.createDataFrame(
        [
            ("x", "1", "p"), ("x", "1", "q"),   # x->1 holds; x->{p,q} violated
            ("y", "2", "p"), ("y", "2", "p"),
            ("z", None, "r"),
        ],
        "a string, b string, c string",
    )
    out = {(r.det, r.dep): r for r in fd_violations(df, [("a", "b"), ("a", "c")]).collect()}
    ab = out[("a", "b")]
    assert (ab.n_det_values, ab.n_violating, ab.repair_rows) == (3, 0, 0)
    assert ab.violation_rate == 0.0
    ac = out[("a", "c")]
    # 'x' maps to {p,q}: 1 violating value, repair = 2 rows - majority 1 = 1
    assert (ac.n_violating, ac.repair_rows) == (1, 1)
    assert abs(ac.violation_rate - 0.2) < 1e-9
    with _pytest.raises(ValueError):
        fd_violations(df, [])


def test_benford_test_conforming_vs_uniform(spark):
    from database2ogr_spark.operators.validate import benford_test

    # Benford-ish sample: powers of 2 are the classic conforming sequence
    pows = [(1 << i) for i in range(60)]
    conf = spark.createDataFrame([(v,) for v in pows], "v long")
    r_conf = benford_test(conf, "v").collect()
    # uniform 100..999: every first digit equally likely -> nonconforming
    unif = spark.createDataFrame([(v,) for v in range(100, 1000)], "v long")
    r_unif = benford_test(unif, "v").collect()
    mad_conf = r_conf[0].mad
    mad_unif = r_unif[0].mad
    assert mad_conf < 0.02  # powers of 2 conform closely
    assert mad_unif > 0.04  # uniform is flagrantly non-Benford
    assert len(r_conf) == 9 and {r.digit for r in r_conf} == set(range(1, 10))
    # digit extraction exactness: obs of digit 1 for uniform = 111/900
    got = {r.digit: r for r in r_unif}
    assert abs(got[1].obs_freq - 100 / 900) < 1e-5


def test_concentration_report_hand_values(spark):
    from database2ogr_spark.operators.validate import concentration_report

    # masses: a=10, b=30, c=60 -> shares .1/.3/.6; HHI = .01+.09+.36 = .46
    # Gini (asc ranks 1,2,3): sum((2r-n-1)m) = (-2*10 + 0*30 + 2*60)/...
    #   = 100; /(3*100) = 0.333333
    rows = [(1, "a", 4), (2, "a", 6), (3, "b", 30), (4, "c", 60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {r.source: r for r in concentration_report(df).collect()}
    assert out["c"].n_rows == 1 and out["a"].n_rows == 2
    assert abs(out["a"].share - 0.1) < 1e-9
    assert abs(out["c"].cum_share - 1.0) < 1e-9
    assert abs(out["a"].cum_share - 0.1) < 1e-9   # 'a' is the smallest mass
    assert abs(out["b"].cum_share - 0.4) < 1e-9
    for r in out.values():
        assert abs(r.gini - 0.333333) < 1e-6
        assert abs(r.hhi - 0.46) < 1e-9


def test_concentration_report_equal_and_null_groups(spark):
    from database2ogr_spark.operators.validate import concentration_report

    # perfectly equal masses -> Gini 0, HHI = 1/n
    eq = spark.createDataFrame(
        [(i, f"s{i}", 50) for i in range(4)], "doc_id long, source string, n_chars long"
    )
    r0 = concentration_report(eq).collect()[0]
    assert abs(r0.gini - 0.0) < 1e-9 and abs(r0.hhi - 0.25) < 1e-9
    # NULL group forms its own audited bucket
    withnull = spark.createDataFrame(
        [(1, "a", 70), (2, None, 30)], "doc_id long, source string, n_chars long"
    )
    got = {r.source: r for r in concentration_report(withnull).collect()}
    assert None in got and abs(got[None].share - 0.3) < 1e-9


def test_fanout_profile_hand_values(spark):
    from database2ogr_spark.operators.validate import fanout_profile

    parent = spark.createDataFrame([(1,), (2,), (3,), (4,)], "pk long")
    child = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 1), (13, 2)], "ck long, fk long"
    )
    r = fanout_profile(parent, child, parent_key="pk", child_key="fk").collect()[0]
    assert r.n_parents == 4 and r.n_children == 4
    assert r.childless_parents == 2
    assert abs(r.mean_fanout - 1.0) < 1e-9
    # fanouts {3,1,0,0}: p50 interpolated = 0.5, max 3
    assert abs(r.p50 - 0.5) < 1e-9
    assert r.max_fanout == 3


def test_t_closeness_hand_values(spark):
    import pytest as _p

    from database2ogr_spark.operators.validate import t_closeness_report

    # corpus: 8 rows, sensitive 50/50 a/b. group g1 all 'a' (skewed),
    # group g2 balanced.
    rows = (
        [(i, "g1", "a") for i in range(4)]
        + [(10 + i, "g2", "a" if i < 2 else "b") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "id long, src string, lang string")
    out = {r.src: r for r in t_closeness_report(df, ["src"], "lang", t=0.3).collect()}
    # corpus p: a=.75, b=.25. g1: pg(a)=1 -> dist = (|1-.75| + .25)/2 = .25
    assert abs(out["g1"].distance - 0.25) < 1e-6
    # g2: pg(a)=.5, pg(b)=.5 -> (|.5-.75|+|.5-.25|)/2 = .25
    assert abs(out["g2"].distance - 0.25) < 1e-6
    # tighter threshold flags both
    flagged = {r.src: r.at_risk for r in t_closeness_report(df, ["src"], "lang", t=0.2).collect()}
    assert flagged == {"g1": True, "g2": True}
    with _p.raises(ValueError):
        t_closeness_report(df, [], "lang")


def test_t_closeness_identical_group_zero_distance(spark):
    from database2ogr_spark.operators.validate import t_closeness_report

    # one group == whole corpus -> distance 0, never at risk
    df = spark.createDataFrame(
        [(i, "g", "a" if i % 3 else "b") for i in range(9)],
        "id long, src string, lang string",
    )
    r = t_closeness_report(df, ["src"], "lang").collect()[0]
    assert r.distance == 0.0 and not r.at_risk
