from data_pipeline_platform_spark.streaming.windows import (
    read_events_stream,
    sliding_window_counts,
    stream_sessionize,
    tumbling_window_agg,
)

__all__ = [
    "read_events_stream",
    "tumbling_window_agg",
    "sliding_window_counts",
    "stream_sessionize",
]
