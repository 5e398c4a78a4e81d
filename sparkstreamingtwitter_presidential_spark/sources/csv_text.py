"""CSV source/sink with the same safety contract as ``sources/jsonl.py``
(the two are the interchange formats annotation vendors and spreadsheet
exports actually ship; parquet stays the engine's canonical storage,
and the reference's pipe format lives in ``sources/pipe_text.py``).

Same rules: explicit schema (no inference pre-scan), PERMISSIVE
corrupt-line quarantine (a malformed line lands whole in
``_corrupt_record`` — never a silent drop), ``multiLine`` quoting so
embedded newlines/commas/quotes survive the roundtrip, gzip-transparent
reads. ``multiLine`` files are NON-SPLITTABLE (a quoted field can span
any byte offset, so Spark cannot chop the file safely) — like gzip
JSONL, part-file size at WRITE time is the parallelism knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from sparkstreamingtwitter_presidential_spark.sources.jsonl import CORRUPT_COL


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    quarantine: bool = False,
) -> DataFrame:
    """Schema-enforced CSV scan (header expected, RFC-4180 quoting with
    escaped inner quotes, multiLine on so quoted newlines parse)."""
    read_schema = schema
    if quarantine:
        if CORRUPT_COL in {f.name for f in schema.fields}:
            raise ValueError(f"schema already contains {CORRUPT_COL}")
        read_schema = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
        )
    return (
        spark.read.schema(read_schema)
        .option("header", "true")
        .option("multiLine", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def write_csv(
    df: DataFrame,
    path: str,
    compression: str | None = None,
    n_files: int | None = None,
) -> str:
    """Write as quoted CSV with header. Default UNCOMPRESSED (unlike
    JSONL): multiLine CSV is already non-splittable, and uncompressed
    is what spreadsheet/annotation tools round-trip."""
    if n_files is not None:
        df = df.repartition(n_files)
    w = (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
    )
    if compression:
        w = w.option("compression", compression)
    w.csv(path)
    return path
