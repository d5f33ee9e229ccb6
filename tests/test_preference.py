from __future__ import annotations

import pytest

from database2ogr_spark.operators.preference import preference_pairs


def test_preference_pairs_margin_and_champion(spark):
    df = spark.createDataFrame(
        [
            ("p1", 1, 0.9),
            ("p1", 2, 0.7),
            ("p1", 3, 0.85),   # within margin 0.1 of champion -> dropped
            ("p2", 4, 0.5),    # singleton group -> nothing
            ("p3", 5, 0.6),
            ("p3", 6, None),   # NULL score: never champion, never paired
        ],
        "prompt string, doc_id long, score double",
    )
    out = preference_pairs(
        df, group_col="prompt", score_col="score", min_margin=0.1
    ).collect()
    rows = {(r.prompt, r.chosen_id, r.rejected_id) for r in out}
    assert rows == {("p1", 1, 2)}
    r = out[0]
    assert r.chosen_score == 0.9 and r.rejected_score == 0.7
    assert abs(r.margin - 0.2) < 1e-9


def test_preference_pairs_tiebreak_and_cap(spark):
    # tie at the top: max(struct) picks the LARGER id as champion
    df = spark.createDataFrame(
        [("p", i, 1.0 if i in (7, 9) else 0.1 * i) for i in range(1, 10)],
        "prompt string, doc_id long, score double",
    )
    out = preference_pairs(
        df, group_col="prompt", score_col="score", max_pairs_per_group=3
    ).collect()
    assert all(r.chosen_id == 9 for r in out)
    # cap keeps the 3 highest-scored rejects (score desc, id asc): the
    # tied 7 (score 1.0) then 8 (0.8) then 6 (0.6)
    assert [r.rejected_id for r in sorted(out, key=lambda r: -r.rejected_score)] == [7, 8, 6]


def test_preference_pairs_validation(spark):
    df = spark.createDataFrame([("p", 1, 1.0)], "prompt string, doc_id long, score double")
    with pytest.raises(ValueError):
        preference_pairs(df, group_col="prompt", score_col="score", min_margin=-1)
    with pytest.raises(ValueError):
        preference_pairs(
            df, group_col="prompt", score_col="score", max_pairs_per_group=0
        )
