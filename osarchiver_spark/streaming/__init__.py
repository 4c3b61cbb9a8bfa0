from osarchiver_spark.streaming.pipeline import (
    events_stream,
    stream_archive,
    streaming_tumbling_agg,
)

__all__ = ["events_stream", "stream_archive", "streaming_tumbling_agg"]
