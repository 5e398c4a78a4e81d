"""Lakehouse query: stage the events table as a NATIVE Delta table
(`sources/delta.py` — real transaction log, partitioned by event_type),
read the snapshot back, and aggregate. The DuckDB oracle runs the same
aggregate on the ORIGINAL events parquet, so a driver-graded pass proves
end-to-end write->log->snapshot-read fidelity, including timestamp
microseconds (min/max unix_micros) and partition-value recovery (the
group key IS the partition column, injected from the log).

The staged table is cached per sf_dir under /tmp (content is
deterministic); staging uses write-to-unique-dir + atomic rename so
concurrent first calls cannot interleave."""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.queries.registry import query
from sparkstreamingtwitter_presidential_spark.sources.delta import (
    read_delta,
    write_delta,
)


def _events_cache_key(spark: SparkSession, sf_dir: str) -> str:
    """Cache key covering both the source dir and the NORMALIZED events
    schema, so a reader-side type fix (e.g. the r3 TIMESTAMP_NTZ
    regression) invalidates stale staged tables instead of serving them."""
    schema = load_table(spark, sf_dir, "events").schema.simpleString()
    return hashlib.md5(f"{sf_dir}|{schema}".encode()).hexdigest()[:12]


def _staged_events_delta(spark: SparkSession, sf_dir: str) -> str:
    key = _events_cache_key(spark, sf_dir)
    table = f"/tmp/ssp_delta_events_{key}"
    if not os.path.isdir(os.path.join(table, "_delta_log")):
        staging = f"{table}.staging-{uuid.uuid4().hex}"
        ev = load_table(spark, sf_dir, "events")
        write_delta(ev, staging, mode="append", partition_by=["event_type"])
        try:
            os.rename(staging, table)
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)  # lost the race
    return table


def _streamed_events_delta(spark: SparkSession, sf_dir: str) -> str:
    """Drain the events file-replay stream through the exactly-once
    Delta sink (streaming/delta_sink.py) once per sf_dir; the resulting
    table is deterministic (full drain, append-only), so it is cached
    under /tmp with the same unique-staging + atomic-rename pattern as
    the batch staging above."""
    from sparkstreamingtwitter_presidential_spark.queries.streaming import _staged
    from sparkstreamingtwitter_presidential_spark.sources.replay import (
        read_events_stream,
    )
    from sparkstreamingtwitter_presidential_spark.streaming import (
        write_stream_to_delta,
    )

    key = _events_cache_key(spark, sf_dir)
    table = f"/tmp/ssp_delta_stream_{key}"
    if not os.path.isdir(os.path.join(table, "_delta_log")):
        scratch = f"{table}.staging-{uuid.uuid4().hex}"
        stream = read_events_stream(spark, _staged(spark, sf_dir))
        q = write_stream_to_delta(
            stream,
            os.path.join(scratch, "table"),
            os.path.join(scratch, "ckpt"),
            app_id=f"ssp_stream_ingest_{key}",
            partition_by=["event_type"],
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)
        try:
            os.rename(os.path.join(scratch, "table"), table)
        except OSError:
            pass  # lost the race; winner's table is equivalent
        shutil.rmtree(scratch, ignore_errors=True)
    return table


@query(
    "streaming_delta_sink_agg",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               COUNT(DISTINCT user_id) AS users,
               FLOOR(SUM(value) * 100 + 0.5) / 100 AS total_value
        FROM events
        GROUP BY event_type
    """,
    doc="NEW: events replayed as a bounded stream through the exactly-"
    "once Delta sink (foreachBatch + txn markers), snapshot read back "
    "and aggregated — equals the batch aggregate over the source "
    "parquet iff every micro-batch landed exactly once",
)
def streaming_delta_sink_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    table = _streamed_events_delta(spark, sf_dir)
    ev = read_delta(spark, table)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count_distinct("user_id").alias("users"),
        (F.floor(F.sum("value") * 100 + F.lit(0.5)) / 100).alias("total_value"),
    )


@query(
    "lakehouse_delta_events_agg",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               FLOOR(SUM(value) * 100 + 0.5) / 100 AS total_value,
               MIN(epoch_us(ts)) AS ts_min_us,
               MAX(epoch_us(ts)) AS ts_max_us
        FROM events
        GROUP BY event_type
    """,
    doc="events staged through the native Delta connector, read back "
    "from the log snapshot and aggregated (== aggregate over the source "
    "parquet iff the roundtrip is faithful)",
)
def lakehouse_delta_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    table = _staged_events_delta(spark, sf_dir)
    ev = read_delta(spark, table)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (F.floor(F.sum("value") * 100 + F.lit(0.5)) / 100).alias("total_value"),
        F.min(F.unix_micros("ts")).alias("ts_min_us"),
        F.max(F.unix_micros("ts")).alias("ts_max_us"),
    )
