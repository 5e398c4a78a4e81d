from sparkstreamingtwitter_presidential_spark.sources.replay import (
    read_events_stream,
    stage_events_files,
    stage_stream_dir,
)

__all__ = ["read_events_stream", "stage_events_files", "stage_stream_dir"]
