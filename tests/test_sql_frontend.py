"""S3 — the spark.sql front-end over registered catalog views, plus a
hypothesis property test for GeoJSON feature validity (the reference's
geojsonhint strategy, SURVEY.md §5)."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from database2ogr_spark.sinks.geojson import feature_json
from database2ogr_spark.sources.catalog import Catalog

SF = "/root/testdata/sf0.001"


def test_register_views_and_sql(spark):
    cat = Catalog(spark, SF)
    names = cat.register_views(["region", "nation"], prefix="t_")
    assert names == ["t_nation", "t_region"] or set(names) == {"t_region", "t_nation"}
    out = cat.sql(
        "SELECT r_name, count(*) AS n FROM t_nation n "
        "JOIN t_region r ON n.n_regionkey = r.r_regionkey GROUP BY r_name"
    ).collect()
    assert sum(r.n for r in out) == 25


def test_register_views_discovers_tables(spark):
    cat = Catalog(spark, SF)
    names = cat.register_views()
    assert {"region", "nation", "lineitem", "documents", "embeddings"} <= set(names)


# property: any row of printable properties + a valid point serializes to a
# parseable GeoJSON Feature with intact values (reference test strategy #1)
_texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")), min_size=0, max_size=40
)


@settings(max_examples=20, deadline=None)
@given(name=_texts, lon=st.floats(-180, 180, allow_nan=False), lat=st.floats(-90, 90, allow_nan=False))
def test_feature_json_always_valid(spark, name, lon, lat):
    df = spark.createDataFrame(
        [("t", 1, name, json.dumps({"type": "Point", "coordinates": [lon, lat]}))],
        "table string, id long, name string, geometry string",
    )
    feat = json.loads(df.select(feature_json(df).alias("f")).first().f)
    assert feat["type"] == "Feature"
    assert feat["geometry"]["type"] == "Point"
    assert feat["properties"]["name"] == name
    assert feat["properties"]["table"] == "t"
