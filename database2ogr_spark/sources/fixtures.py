"""Deterministic ATES-shaped fixtures (FIXTURES.md) for golden tests of the
GeoJSON/KML serialization path — the part the DuckDB oracle can't express
(SURVEY.md §5). Coverage requirements encoded here:

- 2 areas, every child table references both;
- decision points with 0 / 1 / many warnings of both types;
- all 7 POI types incl. 'Rescue Cache' (slugify) and a null comment;
- zones with class_code 1..3, one MultiPolygon, one Polygon with a hole;
- coordinates in the reference's range (lon −118..−114, lat 49..51).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from database2ogr_spark.schemas import ATES_SCHEMAS


def _pt(lon: float, lat: float) -> str:
    return f'{{"type":"Point","coordinates":[{lon},{lat}]}}'


def _line(coords: list[tuple[float, float]]) -> str:
    pts = ",".join(f"[{x},{y}]" for x, y in coords)
    return f'{{"type":"LineString","coordinates":[{pts}]}}'


def _poly(rings: list[list[tuple[float, float]]]) -> str:
    r = ",".join("[" + ",".join(f"[{x},{y}]" for x, y in ring) + "]" for ring in rings)
    return f'{{"type":"Polygon","coordinates":[{r}]}}'


def _mpoly(polys: list[list[list[tuple[float, float]]]]) -> str:
    p = ",".join(
        "[" + ",".join("[" + ",".join(f"[{x},{y}]" for x, y in ring) + "]" for ring in rings) + "]"
        for rings in polys
    )
    return f'{{"type":"MultiPolygon","coordinates":[{p}]}}'


AREAS = [
    (1, "Kootenay Pass", _poly([[(-118, 49), (-117, 49), (-117, 50), (-118, 50), (-118, 49)]])),
    (2, "Rogers Pass", _poly([[(-116, 50), (-115, 50), (-115, 51), (-116, 51), (-116, 50)]])),
]

POI_TYPES = ["Other", "Parking", "Rescue Cache", "Cabin", "Destination", "Lake", "Mountain"]

POINTS_OF_INTEREST = [
    (i + 1, 1 + i % 2, f"POI {i + 1}", t, None if i == 0 else f"comment {i + 1}",
     _pt(-117.9 + 0.1 * i, 49.1 + 0.05 * i))
    for i, t in enumerate(POI_TYPES)
]

ACCESS_ROADS = [
    (1, 1, "Highway 3 pullout", _line([(-117.9, 49.2), (-117.7, 49.3)])),
    (2, 2, None, _line([(-115.9, 50.2), (-115.7, 50.3), (-115.5, 50.45)])),
]

AVALANCHE_PATHS = [
    (1, 1, "Path 23.0", _line([(-117.8, 49.4), (-117.6, 49.5)])),
    (2, 1, "Untitled Path", _line([(-117.5, 49.6), (-117.4, 49.7), (-117.3, 49.8)])),
    (3, 2, "Path 7.5", _line([(-115.8, 50.6), (-115.6, 50.7)])),
]

DECISION_POINTS = [
    (1, "DP alpha", 1, "watch for cornices", _pt(-117.5, 49.5)),
    (2, "DP beta", 1, None, _pt(-117.25, 49.75)),
    (3, "DP gamma", 2, "exit left", _pt(-115.5, 50.5)),
    (4, "DP delta (no warnings)", 2, None, _pt(-115.25, 50.75)),
]

DECISION_POINTS_WARNINGS = [
    (1, "cornice overhead", "Concern"),
    (1, "wind slab on lee slopes", "Concern"),
    (1, "travel one at a time", "Managing risk"),
    (2, "terrain trap below", "Concern"),
    (3, "it\\'s steep up there", "Managing risk"),
    (3, "regroup at treeline", "Managing risk"),
]

ZONES = [
    (1, 1, 1, "simple green zone",
     _poly([[(-117.95, 49.05), (-117.5, 49.05), (-117.5, 49.4), (-117.95, 49.4), (-117.95, 49.05)]])),
    (2, 1, 2, None,
     _poly([
         [(-117.4, 49.05), (-117.05, 49.05), (-117.05, 49.4), (-117.4, 49.4), (-117.4, 49.05)],
         [(-117.3, 49.1), (-117.15, 49.1), (-117.15, 49.3), (-117.3, 49.1)],
     ])),
    (3, 2, 3, "gnarly",
     _mpoly([
         [[(-115.95, 50.05), (-115.5, 50.05), (-115.5, 50.4), (-115.95, 50.05)]],
         [[(-115.4, 50.05), (-115.05, 50.05), (-115.05, 50.4), (-115.4, 50.05)]],
     ])),
]

_DATA = {
    "areas_vw": AREAS,
    "points_of_interest": POINTS_OF_INTEREST,
    "access_roads": ACCESS_ROADS,
    "avalanche_paths": AVALANCHE_PATHS,
    "decision_points": DECISION_POINTS,
    "decision_points_warnings": DECISION_POINTS_WARNINGS,
    "zones": ZONES,
}


def write_ates_fixtures(spark: SparkSession, out_dir: str) -> str:
    """Materialize the fixture tables as ``<out_dir>/<table>.parquet``;
    returns ``out_dir`` for use as a ``Catalog`` sf_dir."""
    os.makedirs(out_dir, exist_ok=True)
    for table, rows in _DATA.items():
        df = spark.createDataFrame(rows, ATES_SCHEMAS[table])
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(out_dir, f"{table}.parquet"))
    return out_dir
