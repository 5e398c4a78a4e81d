from sparkstreamingtwitter_presidential_spark.queries.registry import QUERIES, Query, load_all, query

__all__ = ["QUERIES", "Query", "load_all", "query"]
