from database2ogr_spark.plans.area_export import (
    ates_queries,
    export_geojson_document,
    export_kmz,
    export_ndjson,
)

__all__ = [
    "ates_queries",
    "export_geojson_document",
    "export_kmz",
    "export_ndjson",
]
