"""Snapshot reconciliation (operators/diff.py)."""

from __future__ import annotations


def test_dataset_diff_classifies_all_four_states(spark):
    from database2ogr_spark.operators.diff import dataset_diff

    old = spark.createDataFrame(
        [(1, "same", "en"), (2, "will change", "en"), (3, "will vanish", "fr")],
        "doc_id long, text string, lang string",
    )
    new = spark.createDataFrame(
        [(1, "same", "en"), (2, "changed!", "en"), (4, "brand new", "de")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r.status for r in dataset_diff(old, new).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_dataset_diff_null_vs_empty_and_sentinel_safety(spark):
    """NULL and '' must fingerprint differently, and a value equal to the
    field separator must not cause false 'unchanged' collisions."""
    from database2ogr_spark.operators.diff import dataset_diff

    old = spark.createDataFrame(
        [(1, None, "x"), (2, "a", "b")], "doc_id long, text string, lang string"
    )
    new = spark.createDataFrame(
        [(1, "", "x"), (2, "a\x1fb", "")], "doc_id long, text string, lang string"
    )
    out = {r.doc_id: r.status for r in dataset_diff(old, new).collect()}
    assert out[1] == "changed"  # NULL -> '' is a change
    # ('a','b') vs ('a\x1fb','') is detected (trailing separator differs)...
    assert out[2] == "changed"
    # ...but shifting the separator BETWEEN fields collides — the documented
    # boundary of separator-concat fingerprints: 0x1f must not appear in
    # data. Pinned so the contract stays explicit.
    o3 = spark.createDataFrame(
        [(3, "a\x1fb", "c")], "doc_id long, text string, lang string"
    )
    n3 = spark.createDataFrame(
        [(3, "a", "b\x1fc")], "doc_id long, text string, lang string"
    )
    assert {r.status for r in dataset_diff(o3, n3).collect()} == {"unchanged"}


def test_dataset_diff_only_narrow_columns_shuffle(spark):
    """Both sides must project to (id, fp) BEFORE the full-outer exchange:
    no Exchange in the plan may carry the raw text column."""
    from database2ogr_spark.operators.diff import dataset_diff

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        dataset_diff(docs, docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, line
    assert "FullOuter" in plan.replace(" ", "")


def test_apply_changes_upsert_delete_insert(spark):
    from database2ogr_spark.operators.diff import apply_changes

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["doc_id", "text"]
    )
    ch = spark.createDataFrame(
        [(2, "B", "upsert"), (3, None, "delete"), (4, "d", "upsert")],
        ["doc_id", "text", "op"],
    )
    got = {r.doc_id: r.text for r in apply_changes(base, ch).collect()}
    assert got == {1: "a", 2: "B", 4: "d"}


def test_apply_changes_rejects_unknown_ops(spark):
    import pytest as _pytest

    from database2ogr_spark.operators.diff import apply_changes

    base = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    ch = spark.createDataFrame([(1, "x", "replace")], ["doc_id", "text", "op"])
    with _pytest.raises(ValueError, match="unknown 'op' values"):
        apply_changes(base, ch)


def test_apply_changes_is_idempotent_for_replayed_batch(spark):
    """Replaying the same CDC batch onto its own output is a no-op — the
    exactly-once property an ingestion retry relies on."""
    from database2ogr_spark.operators.diff import apply_changes

    base = spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "text"])
    ch = spark.createDataFrame(
        [(1, "A", "upsert"), (2, None, "delete")], ["doc_id", "text", "op"]
    )
    once = apply_changes(base, ch)
    twice = apply_changes(once, ch)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_drift_report_psi_known_shift(spark):
    import math

    from database2ogr_spark.operators.diff import drift_report

    base = spark.createDataFrame([(float(v),) for v in range(100)], "x double")
    # shifted +50 and clipped: mass piles into the upper bins
    cur = spark.createDataFrame([(float(v) + 50.0,) for v in range(100)], "x double")
    out = {r.bin: r for r in drift_report(base, cur, value_col="x", n_bins=4).collect()}
    assert set(out) == {0, 1, 2, 3}
    # base: 25 per bin. current: values 50..149 over base range [0,99]
    # width 24.75: bins floor((x-0)/24.75) clamped -> bin2: 50..74 (25),
    # bin3: >=74.25 clamped from above too -> 75 values
    assert [out[b].base_n for b in range(4)] == [25, 25, 25, 25]
    assert out[0].cur_n == 0 and out[3].cur_n == 75
    # PSI terms: empty bins eps-smoothed, exact arithmetic replayed
    pb, pc = 0.25, 1e-6
    assert abs(out[0].psi_term - round((pc - pb) * math.log(pc / pb), 6)) < 1e-9
    total_psi = sum(r.psi_term for r in out.values())
    assert total_psi > 0.25  # a half-range shift is a "shifted" verdict


def test_drift_report_identical_distributions_zero_psi(spark):
    from database2ogr_spark.operators.diff import drift_report

    base = spark.createDataFrame([(float(v),) for v in range(50)], "x double")
    out = drift_report(base, base, value_col="x", n_bins=5).collect()
    assert all(r.psi_term == 0.0 for r in out)
    assert sum(r.base_n for r in out) == 50


def test_ks_test_hand_computed_and_identity(spark):
    from database2ogr_spark.operators.diff import ks_test

    # a = {1,2,3,4}, b = {3,4,5,6}: D peaks at x=2: F_a=0.5, F_b=0 -> 0.5
    rows = [("a", float(v)) for v in (1, 2, 3, 4)] + [
        ("b", float(v)) for v in (3, 4, 5, 6)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_test(df, "v", "g", "a", "b").collect()[0]
    assert (r.n_a, r.n_b) == (4, 4)
    assert abs(r.d_stat - 0.5) < 1e-9
    # identical samples -> D = 0, no rejection
    same = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3)]
        + [("b", float(v)) for v in (1, 2, 3)],
        "g string, v double",
    )
    r2 = ks_test(same, "v", "g", "a", "b").collect()[0]
    assert r2.d_stat == 0.0 and r2.reject_95 is False


def test_ks_test_detects_shift_and_ignores_nulls(spark):
    from database2ogr_spark.operators.diff import ks_test

    rows = (
        [("a", float(i)) for i in range(100)]
        + [("b", float(i) + 50) for i in range(100)]
        + [("a", None), ("c", 1.0)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_test(df, "v", "g", "a", "b").collect()[0]
    assert (r.n_a, r.n_b) == (100, 100)  # NULL and group c excluded
    assert abs(r.d_stat - 0.5) < 1e-9 and r.reject_95 is True


def test_randomization_test_detects_shift(spark):
    import pytest as _pytest

    from database2ogr_spark.operators.diff import randomization_test

    rows = [(i, "a", 100.0 + (i % 7)) for i in range(60)] + [
        (1000 + i, "b", 200.0 + (i % 7)) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, g string, v double")
    r = randomization_test(df, "v", "g", "a", "b", n_perm=100).collect()[0]
    assert (r.n_a, r.n_b) == (60, 60)
    assert abs(r.obs_diff + 100.0) < 1e-6
    assert r.p_value <= 0.009902  # the floor (1+0)/(n_perm+1), rounded
    with _pytest.raises(ValueError):
        randomization_test(df, "v", "g", "a", "b", n_perm=0)


def test_randomization_test_null_is_uniformish(spark):
    from database2ogr_spark.operators.diff import randomization_test

    # identical distributions -> p should be large (not significant)
    rows = [(i, "a" if i % 2 else "b", float((i // 2) % 10)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, g string, v double")
    r = randomization_test(df, "v", "g", "a", "b", n_perm=100).collect()[0]
    assert r.p_value > 0.1
    # deterministic
    r2 = randomization_test(df, "v", "g", "a", "b", n_perm=100).collect()[0]
    assert r.p_value == r2.p_value


def test_bootstrap_ci_covers_and_shrinks(spark):
    import pytest as _pytest

    from database2ogr_spark.operators.diff import bootstrap_ci

    rows = [(i, 100.0 + (i % 21) - 10) for i in range(420)]  # mean 100 (20 full cycles)
    df = spark.createDataFrame(rows, "doc_id long, v double")
    r = bootstrap_ci(df, "v", n_boot=100).collect()[0]
    assert r.n_rows == 420
    assert r.ci_lo < r.mean < r.ci_hi
    assert abs(r.mean - 100.0) < 1e-6
    # interval width is sane for sd~6, n=420: se ~0.3 -> CI ~ +/-0.6
    assert 0.2 < (r.ci_hi - r.ci_lo) < 3.0
    # deterministic
    r2 = bootstrap_ci(df, "v", n_boot=100).collect()[0]
    assert (r.ci_lo, r.ci_hi) == (r2.ci_lo, r2.ci_hi)
    # larger sample -> narrower CI
    big = spark.createDataFrame(
        [(i, 100.0 + (i % 21) - 10) for i in range(4200)], "doc_id long, v double"
    )
    rb = bootstrap_ci(big, "v", n_boot=100).collect()[0]
    assert (rb.ci_hi - rb.ci_lo) < (r.ci_hi - r.ci_lo)
    with _pytest.raises(ValueError):
        bootstrap_ci(df, "v", n_boot=1)
    with _pytest.raises(ValueError):
        bootstrap_ci(df, "v", alpha=0)
