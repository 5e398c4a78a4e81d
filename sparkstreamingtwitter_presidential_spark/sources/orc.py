"""Native ORC source/sink — the third interchange format alongside
``sources/jsonl.py`` and ``sources/csv_text.py`` (Hive/Trino shops ship
ORC the way Spark shops ship parquet; the reference's own workflow is
Hive external tables, README.md:88-135, so ORC is the interchange its
users would actually bring).

Unlike the line formats, ORC needs no quarantine contract: it is a
real columnar format — schema'd (no inference pre-scan), NULL vs empty
string unambiguous, embedded newlines/quotes are just bytes, splittable
even when compressed (stripe-level compression), and Spark reads and
writes it natively with predicate pushdown and column pruning (no extra
jars). ``n_files`` remains the write-time parallelism knob for
downstream readers that list files rather than stripes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
) -> DataFrame:
    """ORC scan; pass ``schema`` to pin reader types (recommended for
    interchange — same explicit-schema rule as the line formats),
    otherwise the file footer's schema is used."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    compression: str = "zlib",
    n_files: int | None = None,
) -> str:
    """Write as ORC (zlib by default — the format's interchange
    convention; snappy/zstd/none also valid). Compression is per
    stripe, so files stay splittable regardless."""
    if n_files is not None:
        df = df.repartition(n_files)
    return_path = path
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.orc(path)
    return return_path
