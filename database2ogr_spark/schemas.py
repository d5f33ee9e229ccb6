"""Explicit schemas for the ATES source tables and the driver's test tables.

The reference declares projections per query and treats whatever comes back as
the property bag (reference ``src/from-ground-up.js:60``, ``:183``); here each
table gets a static ``StructType`` (SURVEY.md §1.4-1.5) so Catalyst can prune
columns at the parquet/JDBC scan. Geometry is carried as a GeoJSON *string*
column ``geom_json`` — the same transport the reference uses
(``ST_AsGeoJSON``/``ST_AsKML``, reference ``src/from-ground-up.js:73-90``) —
which keeps the engine runnable without any spatial jar; see
``functions/geometry.py`` for the expression-level geometry ops.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- ATES schema (reference src/from-ground-up.js:303-357; FIXTURES.md) -----

AREAS_VW = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("geom_json", T.StringType(), True),  # Polygon
    ]
)

POINTS_OF_INTEREST = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("area_id", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("comments", T.StringType(), True),
        T.StructField("geom_json", T.StringType(), True),  # Point
    ]
)

ACCESS_ROADS = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("area_id", T.IntegerType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("geom_json", T.StringType(), True),  # LineString
    ]
)

AVALANCHE_PATHS = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("area_id", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("geom_json", T.StringType(), True),  # LineString
    ]
)

DECISION_POINTS = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("area_id", T.IntegerType(), True),
        T.StructField("comments", T.StringType(), True),
        T.StructField("geom_json", T.StringType(), True),  # Point
    ]
)

DECISION_POINTS_WARNINGS = T.StructType(
    [
        T.StructField("decision_point_id", T.IntegerType(), False),
        T.StructField("warning", T.StringType(), True),
        T.StructField("type", T.StringType(), True),  # 'Managing risk' | 'Concern'
    ]
)

ZONES = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("area_id", T.IntegerType(), True),
        T.StructField("class_code", T.IntegerType(), True),  # 1..3
        T.StructField("comments", T.StringType(), True),
        T.StructField("geom_json", T.StringType(), True),  # Polygon | MultiPolygon
    ]
)

ATES_SCHEMAS: dict[str, T.StructType] = {
    "areas_vw": AREAS_VW,
    "points_of_interest": POINTS_OF_INTEREST,
    "access_roads": ACCESS_ROADS,
    "avalanche_paths": AVALANCHE_PATHS,
    "decision_points": DECISION_POINTS,
    "decision_points_warnings": DECISION_POINTS_WARNINGS,
    "zones": ZONES,
}

# Geometry-bearing tables all store geometry under one conventional column
# (reference hard-codes 'geom', src/from-ground-up.js:64).
GEOMETRY_COLUMN = "geom_json"

# Tables that also get a computed bounding_box column in the GeoJSON pipeline
# (reference src/from-ground-up.js:304-311, :349-356).
BBOX_TABLES = frozenset({"areas_vw", "zones"})

# --- driver test-data tables (TESTDATA.md) ----------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
