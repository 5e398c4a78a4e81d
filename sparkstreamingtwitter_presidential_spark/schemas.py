"""Explicit StructType schemas.

The reference declares its one schema twice — an ordered extractor list in
the writer (Collector.scala:47-54) and Hive DDL on the read side
(README.md:98-101) — with nothing inferred. We keep that property: every
non-parquet read path (csv/json/stream replay) takes one of these schemas
explicitly; parquet carries its own.
"""

from __future__ import annotations

from pyspark.sql import types as T

# A1. The reference's one table: CREATE EXTERNAL TABLE twitter_presi(
#   text STRING, latitude FLOAT, longitude FLOAT, created_at TIMESTAMP)
# (reference README.md:98-101; writer fields Collector.scala:47-54).
TWITTER_PRESI = T.StructType([
    T.StructField("text", T.StringType(), True),
    T.StructField("latitude", T.FloatType(), True),
    T.StructField("longitude", T.FloatType(), True),
    T.StructField("created_at", T.TimestampType(), True),
])

# A2. Pre-projection stream input modeling the twitter4j.Status fields the
# reference reads (Collector.scala:49-53,73-76): raw text, nullable geo
# struct, nullable user.lang, event time, hashtags for the keyword filter.
RAW_TWEETS = T.StructType([
    T.StructField("text", T.StringType(), True),
    T.StructField("geo", T.StructType([
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
    ]), True),
    T.StructField("user", T.StructType([
        T.StructField("lang", T.StringType(), True),
    ]), True),
    T.StructField("created_at", T.TimestampType(), True),
    T.StructField("hashtags", T.ArrayType(T.StringType()), True),
])

# Driver fixture tables (FIXTURES.md §B) — used by the streaming replay
# source (readStream needs an explicit schema) and by csv/json parity paths.
EVENTS = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("user_id", T.LongType(), False),
    T.StructField("event_type", T.StringType(), False),
    T.StructField("value", T.DoubleType(), False),
    T.StructField("props", T.StringType(), True),
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType(), False),
    T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    T.StructField("label", T.IntegerType(), True),
])

# Multimodal: opaque binary payload + typed metadata (media decode is
# stubbed in this container; the schema and plumbing are real).
MEDIA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])
