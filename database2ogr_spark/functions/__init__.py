from database2ogr_spark.functions import geometry, hashing, text, textstats

__all__ = ["geometry", "hashing", "text", "textstats"]
