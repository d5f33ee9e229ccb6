from database2ogr_spark.sources.catalog import Catalog, jdbc_reader

__all__ = ["Catalog", "jdbc_reader"]
