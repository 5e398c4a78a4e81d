from sparkstreamingtwitter_presidential_spark.functions.text_clean import (
    clean_text,
    null_to_empty,
    pipe_row,
    scrub_chars,
    strip_control,
    hive_timestamp,
)

__all__ = [
    "clean_text",
    "null_to_empty",
    "pipe_row",
    "scrub_chars",
    "strip_control",
    "hive_timestamp",
]
