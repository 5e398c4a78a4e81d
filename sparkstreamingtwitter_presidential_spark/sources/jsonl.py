"""JSONL (newline-delimited JSON) source/sink — the lingua franca of
training-data interchange (every public corpus release and annotation
pipeline speaks it), complementing the engine's parquet-canonical
storage.

Reference parity note: the reference's only text format is the
pipe-delimited Hive external table (README.md:96-108), covered by
``sources/pipe_text.py``; JSONL is the LLM-pipeline extension of the
same idea with a real escape story (newlines/pipes/unicode inside
fields survive, which the pipe format cannot promise).

Scale rules baked in:

* **Explicit schema always** — ``spark.read.json`` without one runs a
  full inference pre-scan (double read of 100 TB) and infers unstable
  types across samples. Callers pass the StructType; missing fields
  read NULL, unknown fields are ignored (forward-compatible).
* **Quarantine, don't drop** — PERMISSIVE mode with a named corrupt
  column: a malformed line lands whole in ``_corrupt_record`` instead
  of silently vanishing (curation pipelines must account for every
  input line; FAILFAST would kill a 100 TB job on one bad line).
* **Compression transparent** — ``.gz``/``.zst`` part files decompress
  on read automatically; writes default to gzip (the interchange
  convention). Gzip is non-splittable, so a 100 TB deployment sizes
  files at write time (``n_files``) rather than relying on the reader
  to split.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    quarantine: bool = False,
) -> DataFrame:
    """Schema-enforced JSONL scan.

    ``quarantine=False`` (default): malformed lines surface as all-NULL
    data columns only if Spark cannot parse them — pass
    ``quarantine=True`` to get the raw offending line in a
    ``_corrupt_record`` column instead (PERMISSIVE capture), letting a
    pipeline route bad lines to a dead-letter table while good lines
    flow on."""
    read_schema = schema
    if quarantine:
        if CORRUPT_COL in {f.name for f in schema.fields}:
            raise ValueError(f"schema already contains {CORRUPT_COL}")
        read_schema = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
        )
    return (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_corrupt_col, bad_rows_with_raw_line) — the
    dead-letter fork of a quarantined read.

    The parsed frame is cached first: Spark refuses queries that
    reference ONLY the internal corrupt-record column of a raw JSON
    scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the fork reads the
    scan twice anyway — caching makes both sides one parse, exactly
    the workaround the error message prescribes.

    The cache is NOT released by this function (both returned frames
    read through it lazily); a long-lived pipeline calling this per
    batch should use ``quarantine_fork`` (context manager — releases
    the batch's storage deterministically on exit) or call
    ``df.unpersist()`` on the frame it passed in once both sides are
    consumed."""
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"DataFrame has no {CORRUPT_COL}; read with quarantine=True")
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


@contextmanager
def quarantine_fork(df: DataFrame):
    """Context-managed ``split_quarantine``: yields (good, bad) and
    UNPERSISTS the shared parse cache on exit — the deterministic
    release a per-batch dead-letter pipeline needs (LRU eviction is
    not a contract). Consume both sides inside the block; after exit
    they recompute from the raw scan."""
    good, bad = split_quarantine(df)
    try:
        yield good, bad
    finally:
        df.unpersist()


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    n_files: int | None = None,
) -> str:
    """Write as JSONL part files (gzip by default — the interchange
    convention). ``n_files`` controls part-file count at write time
    because gzip is non-splittable: pick ~128-512 MB compressed per
    file so downstream readers get balanced tasks."""
    if n_files is not None:
        df = df.repartition(n_files)
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
    return path
