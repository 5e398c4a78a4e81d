"""Reference-parity queries (SURVEY.md §2.1-2.4) as registry entries.

Each query re-expresses one operator of the reference's surface over the
driver fixture tables, with a DuckDB oracle whose output column names
match exactly (the driver hash-compares by sorted column name).

Determinism rules used throughout:
  * LIMIT always rides on a total ORDER BY with a unique tiebreak column.
  * Aggregates over doubles are rounded in BOTH engines so summation-order
    float noise can't flip the value hash.
  * Timestamps that reach the output are formatted to strings in both
    engines (Spark session TZ pinned to UTC; DuckDB is UTC-naive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.functions.text_clean import (
    clean_text,
    hive_timestamp,
    null_to_empty,
    pipe_row,
)
from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.queries.registry import query


# ---------------------------------------------------------------------------
# Flagship: the reference's analytical core composed — filter NOT NULL ->
# project -> group-by count -> order desc -> limit (A4+F2+P2+L1; reference
# README.md:149,156,126) — over the events fixture.
# ---------------------------------------------------------------------------
@query(
    "flagship_event_type_counts",
    oracle="""
        SELECT event_type, count(*) AS n
        FROM events
        WHERE event_type IS NOT NULL
        GROUP BY event_type
        ORDER BY n DESC, event_type
        LIMIT 10
    """,
    doc="A4+F2+P2+L1 composed: top event types by count (README.md:149,156,126)",
)
def flagship_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events
        .filter(F.col("event_type").isNotNull())          # F2
        .select("event_type")                              # P2 (column pruning)
        .groupBy("event_type")                             # A4
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("event_type"))   # deterministic ties
        .limit(10)                                         # L1
    )


# ---------------------------------------------------------------------------
# SCN2 / A2 — full-table scan + global count (README.md:106-107).
# ---------------------------------------------------------------------------
@query(
    "a2_global_count",
    oracle="SELECT count(*) AS n FROM lineitem",
    doc="A2: select count(*) (README.md:107)",
)
def a2_global_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# P2 — column projection; Catalyst prunes the parquet scan to one column
# (README.md:126).
# ---------------------------------------------------------------------------
@query(
    "p2_projection",
    oracle="SELECT doc_id, text FROM documents",
    doc="P2: select text (README.md:126); doc_id kept as row identity",
)
def p2_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


# ---------------------------------------------------------------------------
# F2 — NULL-predicate filter (README.md:156,160).
# ---------------------------------------------------------------------------
@query(
    "f2_not_null_filter",
    oracle="SELECT doc_id, text FROM documents WHERE text IS NOT NULL",
    doc="F2: WHERE text IS NOT NULL (README.md:156)",
)
def f2_not_null_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    return df.filter(F.col("text").isNotNull()).select("doc_id", "text")


# ---------------------------------------------------------------------------
# F1 — language-prefix filter: the reference keeps users whose lang starts
# with "fr" (Collector.scala:73-77; startswith, not equality). Mirrored on
# documents.lang per FIXTURES.md §C.
# ---------------------------------------------------------------------------
@query(
    "f1_lang_prefix_filter",
    oracle="""
        SELECT doc_id, lang FROM documents
        WHERE lang IS NOT NULL AND lang LIKE 'fr%'
    """,
    doc="F1: user.lang startswith 'fr' (Collector.scala:73-77)",
)
def f1_lang_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    return (
        df.filter(F.col("lang").isNotNull() & F.col("lang").startswith("fr"))
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# L1/L2 — LIMIT with a total order for determinism (README.md:122,126).
# ---------------------------------------------------------------------------
@query(
    "l1_limit",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_orderkey LIMIT 2
    """,
    doc="L1: .limit(2) (README.md:122); ordered for determinism",
)
def l1_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(2)
    )


# ---------------------------------------------------------------------------
# A4 — group-by count over text: the reference's
# wordCounts.groupBy("text").count() (README.md:149).
# ---------------------------------------------------------------------------
@query(
    "a4_groupby_count",
    oracle="""
        SELECT text, count(*) AS count FROM documents
        WHERE text IS NOT NULL
        GROUP BY text
    """,
    doc="A4: groupBy('text').count() (README.md:149)",
)
def a4_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    return (
        df.filter(F.col("text").isNotNull())
        .groupBy("text")
        .agg(F.count("*").alias("count"))
    )


# ---------------------------------------------------------------------------
# S1-S3 — the reference's safeValue scrub as a batch transform
# (Collector.scala:57-64).
# ---------------------------------------------------------------------------
@query(
    "s2_clean_text",
    oracle="""
        SELECT doc_id,
               regexp_replace(
                   translate(coalesce(text, ''), ',\t"' || chr(13) || chr(10), ''''),
                   '\\p{C}', '', 'g') AS clean
        FROM documents
    """,
    doc="S1+S2+S3: safeValue scrub (Collector.scala:57-64), intended-regex semantics",
)
def s2_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    return df.select("doc_id", clean_text("text").alias("clean"))


# ---------------------------------------------------------------------------
# S4 — Hive-format timestamp string (Collector.scala:45,53).
# ---------------------------------------------------------------------------
@query(
    "s4_timestamp_format",
    oracle="""
        SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') || '.0' AS created_at
        FROM events
    """,
    doc="S4: yyyy-MM-dd HH:mm:ss.0 (Collector.scala:45,53)",
)
def s4_timestamp_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "events")
    return df.select("event_id", hive_timestamp("ts").alias("created_at"))


# ---------------------------------------------------------------------------
# P1+S1-S5 composed — the full collector row transform as one batch query:
# project 4 fields, sanitize, pipe-join (Collector.scala:47-68). The events
# fixture stands in for the tweet stream: event_type~text, value~geo,
# ts~created_at.
# ---------------------------------------------------------------------------
@query(
    "s5_collector_rows",
    oracle="""
        SELECT event_id,
               concat_ws('|',
                   regexp_replace(
                       translate(coalesce(event_type, ''), ',\t"' || chr(13) || chr(10), ''''),
                       '\\p{C}', '', 'g'),
                   coalesce(printf('%.4f', value), ''),
                   strftime(ts, '%Y-%m-%d %H:%M:%S') || '.0') AS row_str
        FROM events
    """,
    doc="P1+S1-S5: Status -> sanitized pipe-delimited row (Collector.scala:47-68)",
)
def s5_collector_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "events")
    return df.select(
        "event_id",
        pipe_row(
            clean_text("event_type"),
            null_to_empty(F.format_string("%.4f", F.col("value"))),
            hive_timestamp("ts"),
        ).alias("row_str"),
    )
