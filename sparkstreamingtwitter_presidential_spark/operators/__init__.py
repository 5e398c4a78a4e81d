from sparkstreamingtwitter_presidential_spark.operators.collector import (
    KEYWORD_FILTERS,
    collect_tweets,
    keyword_filter,
    to_pipe_rows,
)

__all__ = ["KEYWORD_FILTERS", "collect_tweets", "keyword_filter", "to_pipe_rows"]
