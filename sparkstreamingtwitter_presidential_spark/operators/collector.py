"""The reference's collector pipeline as one reusable batch transform.

Reference behavior (Collector.scala): subscribe to a keyword-filtered
tweet stream (line 33,71), keep French-language users (73-77), project to
``(text, latitude, longitude, created_at)`` with per-field sanitization
(47-69), and serialize pipe-delimited rows (66-68). Here that is a pure
DataFrame -> DataFrame function over RAW_TWEETS-shaped input
(schemas.RAW_TWEETS), so the exact same logical plan serves batch
backfill AND Structured Streaming (streaming/collector.py wraps it) —
write the transform once, let Catalyst run it incrementally.

All builtin expressions: the filter prunes before the projection, so at
scale the scan only materializes matching rows' columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.functions.text_clean import (
    clean_text,
    hive_timestamp,
    null_to_empty,
    pipe_row,
)

#: The reference's hard-coded server-side track list (Collector.scala:33).
KEYWORD_FILTERS = (
    "#LePen",
    "#Macron",
    "#Fillon",
    "#JLM2017",
    "#Hamon",
    "#Mélenchon",
    "#Sarkozy",
)


def keyword_filter(hashtags_col: Column | str,
                   keywords: tuple[str, ...] = KEYWORD_FILTERS) -> Column:
    """SRC1 — the Twitter server-side track filter re-expressed as a
    predicate: keep rows whose hashtag array overlaps the keyword list
    (Collector.scala:33,71). ``arrays_overlap`` is a codegen'd builtin, so
    the predicate pushes into the scan stage."""
    c = F.col(hashtags_col) if isinstance(hashtags_col, str) else hashtags_col
    return F.arrays_overlap(c, F.array(*[F.lit(k) for k in keywords]))


def collect_tweets(raw: DataFrame, apply_keyword_filter: bool = True) -> DataFrame:
    """F1 + P1 + S1-S4: RAW_TWEETS -> twitter_presi-shaped DataFrame.

    * F1: keep rows whose ``user.lang`` starts with 'fr' — startswith, not
      equality, so 'fr-CA' passes (Collector.scala:73-77); NULL-safe (the
      reference's nested Option chain yields false for missing user/lang).
    * P1: project the 4 fields the reference extracts (Collector.scala:47-54).
    * S1-S4: sanitize text, keep geo nullable (NULL when absent,
      Collector.scala:50-51), format created_at per S4 on the serialization
      path only — the typed column stays TimestampType here.
    """
    out = raw
    if apply_keyword_filter:
        out = out.filter(keyword_filter("hashtags"))
    return (
        out.filter(F.col("user").isNotNull()
                   & F.col("user.lang").isNotNull()
                   & F.col("user.lang").startswith("fr"))
        .select(
            clean_text("text").alias("text"),
            F.col("geo.lat").cast("float").alias("latitude"),
            F.col("geo.lon").cast("float").alias("longitude"),
            F.col("created_at"),
        )
    )


def to_pipe_rows(presi: DataFrame) -> DataFrame:
    """S1+S4+S5 — serialize a twitter_presi-shaped DataFrame to the
    reference's on-disk format: one pipe-delimited string per row with
    NULLs as empty cells (Collector.scala:57-68)."""
    return presi.select(
        pipe_row(
            null_to_empty("text"),
            null_to_empty(F.col("latitude").cast("string")),
            null_to_empty(F.col("longitude").cast("string")),
            hive_timestamp("created_at"),
        ).alias("value")
    )
