from sparkstreamingtwitter_presidential_spark.streaming.collector import run_bounded_collector
from sparkstreamingtwitter_presidential_spark.streaming.windows import (
    session_aggregate,
    sliding_aggregate,
    tumbling_aggregate,
)

__all__ = [
    "run_bounded_collector",
    "session_aggregate",
    "sliding_aggregate",
    "tumbling_aggregate",
]
