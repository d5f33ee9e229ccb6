from database2ogr_spark.multimodal.binaryops import (
    MEDIA_SCHEMA,
    decode_features,
    frame_sample,
    with_media_metadata,
)

__all__ = ["MEDIA_SCHEMA", "with_media_metadata", "decode_features", "frame_sample"]
