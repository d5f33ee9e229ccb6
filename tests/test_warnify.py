"""warnify operator semantics (SURVEY.md §2.5, pinned in §7 M3)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from database2ogr_spark.operators.warnify import warnify, warnify_html


def _joined_df(spark):
    """decision_points ⋈ warnings rows, one per warning (plus a no-warning
    point that survives the join in left-ish scenarios is exercised in the
    plan tests; inner-join semantics here)."""
    rows = [
        # dp 1 at (-117.5, 49.5): 2 concerns + 1 managing risk
        (1, "DP alpha", 1, "c1", "cornice overhead", "Concern"),
        (1, "DP alpha", 1, "c1", "wind slab", "Concern"),
        (1, "DP alpha", 1, "c1", "go one at a time", "Managing risk"),
        # dp 2 at (-117.25, 49.75): only managing risk
        (2, "DP beta", 1, None, "regroup at treeline", "Managing risk"),
    ]
    df = spark.createDataFrame(
        rows, "id int, name string, area_id int, comments string, warning string, type string"
    )
    geom = F.when(
        F.col("id") == 1, F.lit('{"type":"Point","coordinates":[-117.5,49.5]}')
    ).otherwise(F.lit('{"type":"Point","coordinates":[-117.25,49.75]}'))
    return df.withColumn("geometry", geom).withColumn("table", F.lit("decision_points"))


def test_warnify_groups_and_pivots(spark):
    out = warnify(_joined_df(spark)).collect()
    assert len(out) == 2
    by_id = {r.id: r for r in out}
    w1 = json.loads(by_id[1].warnings)
    # both keys always present; lists sorted
    assert w1 == {
        "managing-risk": ["go one at a time"],
        "concern": ["cornice overhead", "wind slab"],
    }
    w2 = json.loads(by_id[2].warnings)
    assert w2 == {"managing-risk": ["regroup at treeline"], "concern": []}


def test_warnify_rebuilds_point_from_key(spark):
    out = {r.id: r for r in warnify(_joined_df(spark)).collect()}
    g = json.loads(out[1].geometry)
    assert g == {"type": "Point", "coordinates": [-117.5, 49.5]}


def test_warnify_carryover_is_deterministic_min(spark):
    out = {r.id: r for r in warnify(_joined_df(spark)).collect()}
    assert out[1].name == "DP alpha" and out[1].comments == "c1"
    assert out[2].comments is None


def test_warnify_html_reference_popup_shape(spark):
    out = {r.id: r for r in warnify_html(_joined_df(spark), geometry_format="kml").collect()}
    html = out[1].warnings
    assert html.startswith('<meta http-equiv="Content-Type"')
    assert '<table class="orange-table">' in html
    # Concern section first, then Managing risk (reference order)
    assert html.index('<th class="first">Concern</th>') < html.index("<th>Managing risk</th>")
    assert html.count('<span class="red-x">') == 2
    assert html.count('<span class="green-check">') == 1
    # KML-mode geometry rebuilt as KML point
    assert out[1].geometry == "<Point><coordinates>-117.5,49.5</coordinates></Point>"
