from database2ogr_spark.sinks.geojson import (
    feature_collection_json,
    feature_json,
    write_ndjson,
)
from database2ogr_spark.sinks.kml import kml_document, write_kmz
from database2ogr_spark.sinks.recipe import make_recipe

__all__ = [
    "feature_json",
    "feature_collection_json",
    "write_ndjson",
    "kml_document",
    "write_kmz",
    "make_recipe",
]
