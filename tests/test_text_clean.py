"""Golden + property tests for the S1-S5 text-sanitization library
(SURVEY.md §5.2) and the collector transform (F1+P1+S1-S5)."""

from __future__ import annotations

import datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark import schemas
from sparkstreamingtwitter_presidential_spark.functions.text_clean import (
    clean_text,
    hive_timestamp,
    pipe_row,
    null_to_empty,
)
from sparkstreamingtwitter_presidential_spark.operators.collector import (
    collect_tweets,
    to_pipe_rows,
)


def _clean_one(spark, s):
    df = spark.createDataFrame([(s,)], "text string")
    return df.select(clean_text("text").alias("c")).head()[0]


GOLDEN = [
    ("hello world", "hello world"),              # passthrough
    ("tab\there", "tabhere"),                    # S2: \t removed
    ('say "hi"', "say hi"),                      # S2: quotes removed
    ("a,b,c", "a'b'c"),                          # S2: comma -> apostrophe
    ("line1\r\nline2", "line1line2"),            # S2: intended regex semantics
    ("[\\r\\n]", "[\\r\\n]"),                    # literal 4-char string SURVIVES
    ("zero\x00width\x1fctl", "zerowidthctl"),    # S3: \p{C} stripped
    ("emoji‍zwj", "emojizwj"),              # S3: format chars (Cf)
    (None, ""),                                  # S1: NULL -> ""
    ("", ""),
]


@pytest.mark.parametrize("raw,want", GOLDEN)
def test_clean_text_golden(spark, raw, want):
    assert _clean_one(spark, raw) == want


def test_hive_timestamp_format(spark):
    ts = datetime.datetime(2017, 4, 23, 18, 5, 9)
    df = spark.createDataFrame([(ts,)], "t timestamp")
    got = df.select(hive_timestamp("t").alias("s")).head()[0]
    # Collector.scala:45 — hard-coded ".0" fractional part
    assert got == "2017-04-23 18:05:09.0"


def test_pipe_row_null_cells(spark):
    df = spark.createDataFrame(
        [("bonjour", None, None)], "text string, lat float, lon float"
    )
    got = df.select(
        pipe_row(
            null_to_empty("text"),
            null_to_empty(F.col("lat").cast("string")),
            null_to_empty(F.col("lon").cast("string")),
        ).alias("v")
    ).head()[0]
    assert got == "bonjour||"  # NULL -> empty cell, not skipped


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=60))
def test_clean_text_idempotent(spark, s):
    once = _clean_one(spark, s)
    twice = _clean_one(spark, once)
    assert once == twice


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=40))
def test_cleaned_roundtrips_through_pipe_format(spark, s):
    """A scrubbed string can never contain the separator-breaking chars,
    so split(concat) is lossless (SURVEY.md §5.5)."""
    cleaned = _clean_one(spark, s)
    assert "|" not in cleaned or "|" in s  # scrub doesn't introduce pipes
    for bad in ("\t", '"', "\r", "\n", ","):
        assert bad not in cleaned


RAW_ROWS = [
    # (text, geo, user, created_at, hashtags)
    ("J'aime #Macron, vraiment", (48.85, 2.35), ("fr",),
     datetime.datetime(2017, 4, 23, 10, 0, 0), ["#Macron"]),
    ("fr-CA passes the prefix \t filter", None, ("fr-CA",),
     datetime.datetime(2017, 4, 23, 11, 0, 0), ["#LePen"]),
    ("english user, dropped", (40.7, -74.0), ("en",),
     datetime.datetime(2017, 4, 23, 12, 0, 0), ["#Macron"]),
    ("no user struct, dropped", None, None,
     datetime.datetime(2017, 4, 23, 13, 0, 0), ["#Fillon"]),
    ("no tracked hashtag, dropped", None, ("fr",),
     datetime.datetime(2017, 4, 23, 14, 0, 0), ["#unrelated"]),
]


def _raw_df(spark):
    return spark.createDataFrame(RAW_ROWS, schemas.RAW_TWEETS)


def test_collect_tweets_filters_and_projects(spark):
    out = collect_tweets(_raw_df(spark)).collect()
    texts = sorted(r.text for r in out)
    assert texts == [
        "J'aime #Macron' vraiment",          # comma -> apostrophe
        "fr-CA passes the prefix  filter",   # tab removed, fr-CA kept
    ]
    by_text = {r.text: r for r in out}
    geo = by_text["J'aime #Macron' vraiment"]
    assert abs(geo.latitude - 48.85) < 1e-5 and abs(geo.longitude - 2.35) < 1e-5
    assert by_text["fr-CA passes the prefix  filter"].latitude is None


def test_to_pipe_rows_format(spark):
    out = to_pipe_rows(collect_tweets(_raw_df(spark))).collect()
    vals = sorted(r.value for r in out)
    assert vals[1] == "fr-CA passes the prefix  filter|||2017-04-23 11:00:00.0"
    assert vals[0].startswith("J'aime #Macron' vraiment|48.85|2.35|2017-04-23 10:00:00.0")
