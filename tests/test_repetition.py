"""Semantic contracts of the Gopher-style repetition signals on
hand-built documents (the oracle proves cross-engine equality; these
pin that the numbers mean what the rule names say)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.functions import text_stats as ts


def _signals(spark, text):
    df = spark.createDataFrame([(1, text)], "id int, text string")
    arrs = df.select(
        "id",
        "text",
        ts.clean_lines("text").alias("lines"),
        ts.clean_words("text").alias("words"),
    ).select("*", ts.word_bigrams("words").alias("bigrams"))
    return arrs.select(
        ts.dup_line_fraction("lines").alias("dlf"),
        ts.dup_line_char_fraction("lines").alias("dlcf"),
        ts.dup_bigram_fraction("bigrams").alias("dbf"),
        ts.bullet_line_fraction("lines").alias("blf"),
        ts.ellipsis_line_fraction("lines").alias("elf"),
        ts.mean_word_length("words").alias("mwl"),
        ts.symbol_word_ratio("text", "words").alias("swr"),
        ts.gopher_pass("text", "lines", "words", "bigrams").alias("ok"),
    ).collect()[0]


def test_repeated_lines_detected(spark):
    # 4 lines, "spam spam" (9 chars) x3 + "unique line" (11 chars):
    # dup line count 2/4; dup chars (27+11 - (9+11)) / 38 = 18/38
    r = _signals(spark, "spam spam\nspam spam\nspam spam\nunique line")
    assert r["dlf"] == 0.5
    assert abs(r["dlcf"] - 18 / 38) < 1e-12
    assert not r["ok"]


def test_clean_prose_passes(spark):
    text = (
        "The quick brown fox jumps over the lazy dog near the river bank. "
        "A second sentence keeps the word count above the minimum twenty "
        "words easily and reads like ordinary prose."
    )
    r = _signals(spark, text)
    assert r["dlf"] == 0.0 and r["dbf"] == 0.0
    assert r["ok"]


def test_repeated_bigrams_detected(spark):
    r = _signals(spark, "go go go go go go")
    # bigrams: 5x "go go" -> 4/5 repeated
    assert abs(r["dbf"] - 0.8) < 1e-12


def test_bullets_and_ellipses_counted(spark):
    r = _signals(spark, "- item one\n* item two\nplain line\nto be continued...")
    assert abs(r["blf"] - 0.5) < 1e-12
    assert abs(r["elf"] - 0.25) < 1e-12


def test_symbol_ratio_and_mean_word_length(spark):
    r = _signals(spark, "tag # more … words here")
    # 6 words ('#' and '…' count as words after whitespace split), 2 hits
    assert abs(r["swr"] - 2 / 6) < 1e-12
    assert abs(r["mwl"] - (3 + 1 + 4 + 1 + 5 + 4) / 6) < 1e-12


def test_empty_and_blank_are_zero_not_null(spark):
    r = _signals(spark, "   \n  \n ")
    assert (r["dlf"], r["dlcf"], r["dbf"], r["blf"], r["elf"], r["mwl"],
            r["swr"]) == (0.0,) * 7
    assert not r["ok"]  # fails min_words, never NULL
