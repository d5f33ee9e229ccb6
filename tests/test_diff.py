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
