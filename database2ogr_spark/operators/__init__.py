from database2ogr_spark.operators.query import JoinQuery, Query
from database2ogr_spark.operators.warnify import warnify

__all__ = ["Query", "JoinQuery", "warnify"]
