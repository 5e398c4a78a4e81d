"""SCN1/SNK1 parity: the reference's pipe-delimited text table format.

Write path (SNK1, Collector.scala:89-90): sanitized fields joined with
'|' and appended as text files. Read path (SCN1, README.md:98-101): Hive
external table over the directory, schema declared in DDL. Here:
``write_pipe_table`` serializes a twitter_presi-shaped DataFrame to text
and ``read_pipe_table`` scans such a directory with the explicit schema
— schema-on-read, nothing inferred, like the reference.

Divergence (documented): the reference's empty cell reads as NULL for
FLOAT/TIMESTAMP columns but as '' for STRING under Hive's lazy SerDe;
we map empty -> NULL uniformly (``nullValue ''``), which is what the
reference's own queries assume (WHERE text IS NOT NULL,
README.md:156). Canonical storage for the new engine remains parquet;
this format exists for capability parity and interchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparkstreamingtwitter_presidential_spark.operators.collector import to_pipe_rows
from sparkstreamingtwitter_presidential_spark.schemas import TWITTER_PRESI

#: The ".0"-suffixed Hive format the collector writes (Collector.scala:45).
_TS_FORMAT = "yyyy-MM-dd HH:mm:ss.S"


def write_pipe_table(presi: DataFrame, path: str, partitions: int = 1) -> None:
    """Serialize (text, latitude, longitude, created_at) rows to the
    reference's on-disk text format. ``partitions`` mirrors the
    reference's repartition-before-write CLI knob (X1)."""
    to_pipe_rows(presi).repartition(partitions).write.mode("append").text(path)


def read_pipe_table(spark: SparkSession, path: str) -> DataFrame:
    """Scan a pipe-delimited twitter_presi directory with the declared
    schema (SCN1). Empty cells -> NULL; timestamps parse the collector's
    ``yyyy-MM-dd HH:mm:ss.0`` format."""
    return (
        spark.read.schema(TWITTER_PRESI)
        .option("sep", "|")
        .option("nullValue", "")
        .option("timestampFormat", _TS_FORMAT)
        .csv(path)
    )
