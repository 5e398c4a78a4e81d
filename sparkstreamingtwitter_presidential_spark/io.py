"""Table loading and temp-view registration for the fixture tables.

The driver materializes a TPC-H-ish star schema plus stream/LLM tables as
parquet under ``/root/testdata/sf{0.001,0.01,0.1}/`` (TESTDATA.md). This
module is the one place that knows those names, so queries never hardcode
paths.

Scan-path policy (the 100 TB part): always ``spark.read.parquet`` with no
schema inference — Catalyst then gets vectorized columnar reads, column
pruning into ``ReadSchema`` and predicate pushdown into ``PushedFilters``
for free. Views are plain temp views over the scans (no materialization),
so every SQL query still prunes/pushes down through them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at ANY scale factor (their
# cardinality is fixed or near-fixed in TPC-H-like schemas).
BROADCASTABLE = {"region", "nation", "supplier"}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan of one fixture table.

    The ``events`` fixture's ``ts`` has shipped in two physical shapes,
    and this is the ONE place that normalizes both to a session-tz
    TIMESTAMP so every downstream ``unix_micros``/``cast``/watermark
    works unchanged:

    * parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it
      (PARQUET_TYPE_ILLEGAL), so we flip the legacy nanos-as-long switch
      and rebuild with integer ns->us division (``div``, not ``/`` —
      double math loses precision above 2^53 ns). Lossless: the fixture
      carries no sub-microsecond precision.
    * parquet ``timestamp[us]`` with no timezone flag: Spark 4.x infers
      TIMESTAMP_NTZ, which event-time watermarks and ``unix_micros``
      reject. Session tz is pinned UTC engine-wide (session.py), so
      NTZ -> TIMESTAMP is an instant-preserving relabel, and
      ``spark.sql.parquet.inferTimestampNTZ.enabled=false`` (set in
      session.get_spark and __spark_entry__._utc) prevents the inference
      at the scan; the cast branch below is defense for sessions built
      outside our factory.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Register each fixture table as a temp view named after itself.

    Returns the name->DataFrame map so callers can keep using the
    DataFrame API on the same scans.
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
