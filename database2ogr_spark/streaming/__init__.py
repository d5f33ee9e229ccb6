from database2ogr_spark.streaming.events import (
    read_events_stream,
    sessionize,
    windowed_event_counts,
)

__all__ = ["read_events_stream", "windowed_event_counts", "sessionize"]
