"""File-replay streaming sources.

The reference's source is the Twitter firehose (dead API); SURVEY.md §2.1
SRC1 makes the source pluggable, with file-based replay as the in-repo
implementation: a directory of parquet files read with
``spark.readStream`` + an explicit schema, paced by ``maxFilesPerTrigger``
so N staged files replay as N micro-batches. On a real deployment the
same downstream plan attaches to a Kafka/socket source unchanged —
Structured Streaming decouples source from plan.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from sparkstreamingtwitter_presidential_spark.io import load_table, scan_cache_key


def schema_keyed_dir(prefix: str, sf_dir: str, schema: StructType) -> str:
    """Deterministic /tmp staging path keyed on BOTH the source dir and
    the staged schema. Round-3 lesson: caches keyed on sf_dir alone kept
    serving files written under an older type mapping (TIMESTAMP_NTZ)
    after the reader was fixed — keying on the schema makes environment
    or fixture drift produce a fresh cache instead of a poisoned read."""
    digest = hashlib.md5(
        f"{sf_dir}|{schema.simpleString()}".encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"{prefix}_{digest}")


def stage_events_files(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 4
) -> str:
    """Stage the events fixture as ``n_files`` parquet files for replay.

    ``load_table`` normalizes whatever physical ``ts`` shape the fixture
    ships (legacy nanos bigint, TIMESTAMP_NTZ) to a session-tz TIMESTAMP
    before staging, so the staged files always carry a watermarkable
    type. Files are RANGE-partitioned on ``ts`` so replay delivers data
    in event-time order, the way a real stream (or a date-partitioned
    backfill) would: each file is one contiguous time slice, and the
    watermark trails correctly across micro-batches instead of
    classifying whole batches as late.
    """
    ev = load_table(spark, sf_dir, "events")
    return stage_ts_ordered(ev, out_dir, n_files)


def stage_ts_ordered(
    df: DataFrame, out_dir: str, n_files: int = 4, ts_col: str = "ts"
) -> str:
    """Stage any timestamped DataFrame as an event-time-ordered replay
    directory (range-partitioned on ``ts_col``, mtimes stamped in part
    order — see stage_events_files). Range partitioning also guarantees
    rows with EQUAL timestamps land in the same file, which is what
    makes duplicated-delivery replays deterministic for
    dropDuplicatesWithinWatermark (copies share a micro-batch)."""
    (
        df.repartitionByRange(n_files, F.col(ts_col))
        .sortWithinPartitions(ts_col)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    _stamp_mtimes_in_part_order(out_dir)
    return out_dir


def _stamp_mtimes_in_part_order(out_dir: str) -> None:
    """Give part files strictly increasing mtimes in part-number order.
    FileStreamSource orders files by modification time when batching;
    a single write job stamps every part with the same second, leaving
    the replay order arbitrary — which breaks event-time ordering for
    watermarks and order-sensitive stateful operators."""
    import glob
    import time

    parts = sorted(glob.glob(os.path.join(out_dir, "part-*")))
    base = time.time() - len(parts) - 10
    for i, p in enumerate(parts):
        os.utime(p, (base + i, base + i))


def stage_stream_dir(df: DataFrame, out_dir: str, n_files: int = 4) -> str:
    """Stage any DataFrame as a replayable parquet directory."""
    df.repartition(n_files).write.mode("overwrite").parquet(out_dir)
    return out_dir


def read_events_stream(
    spark: SparkSession, staged_dir: str, files_per_trigger: int = 1
) -> DataFrame:
    """Unbounded events DataFrame replaying a staged directory, one batch
    per ``files_per_trigger`` files (ST1's micro-batch pacing; the 10 s
    wall-clock trigger of the reference maps to ``trigger(processingTime)``
    at the sink, orthogonal to the source).

    The schema probe (a batch read of the staged dir) is memoized per
    session under the same freshness key as io.load_table's scan-plan
    memo (r15; io.scan_cache_key — path/mtime/size plus, for
    directories, entry count and newest child mtime): staged replay dirs
    are write-once, every drain re-reads the footer otherwise, and a
    re-staged dir changes the key and misses."""
    key = scan_cache_key(staged_dir)
    cache: dict = spark.__dict__.setdefault("_ssp_stream_schema_cache", {})
    schema = cache.get(key) if key is not None else None
    if schema is None:
        schema = spark.read.parquet(staged_dir).schema
        if key is not None:
            cache[key] = schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(staged_dir)
    )
