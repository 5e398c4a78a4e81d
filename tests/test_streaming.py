"""Streaming harness tests (SURVEY.md §5.3): bounded collector
(stop-after-N, append-only, checkpointed), streaming-vs-batch window
equivalence, and the watermarked append-mode session path."""

from __future__ import annotations

import datetime
import glob
import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

import sparkstreamingtwitter_presidential_spark.queries.streaming as qs
from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.sources.replay import read_events_stream
from sparkstreamingtwitter_presidential_spark.streaming import (
    run_bounded_collector,
    session_aggregate,
    tumbling_aggregate,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def staged(spark):
    return qs._staged(spark, SF_DIR)


def _tmp(name):
    d = f"/tmp/spark_graft_test_{name}_{uuid.uuid4().hex[:8]}"
    yield_dir = d
    return yield_dir


def test_bounded_collector_stop_after_n(spark, staged):
    run = f"/tmp/collector_{uuid.uuid4().hex[:8]}"
    out, ckpt = f"{run}/out", f"{run}/ckpt"
    try:
        stream = read_events_stream(spark, staged, files_per_trigger=1)
        res = run_bounded_collector(stream, out, ckpt, stop_after=100)
        # ST3: graceful stop -> collected >= N, overshoot bounded by one batch
        assert res.rows_collected >= 100
        assert res.batches >= 1
        assert res.rows_collected == sum(res.batch_counts)
        written = spark.read.parquet(out).count()
        assert written == res.rows_collected  # append-only, exactly once
        assert os.path.isdir(ckpt) and glob.glob(ckpt + "/*")  # ST4: checkpoint real
    finally:
        shutil.rmtree(run, ignore_errors=True)


def test_streaming_tumbling_equals_batch(spark, staged):
    stream = read_events_stream(spark, staged)
    got = qs._run_to_memory(tumbling_aggregate(stream))
    want = tumbling_aggregate(load_table(spark, SF_DIR, "events"))
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(g) > 0


def test_streaming_session_complete_equals_batch(spark, staged):
    stream = read_events_stream(spark, staged)
    got = qs._run_to_memory(session_aggregate(stream, watermark=None), mode="complete")
    want = session_aggregate(load_table(spark, SF_DIR, "events"))
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(g) > 0


def test_watermarked_append_sessions_flush_subset(spark):
    """Append mode + watermark: sessions emit once the watermark passes
    their end. Watermark advancement lags batch boundaries, so we assert
    the flushed-prefix property (emitted == batch sessions that ended
    before the final watermark could pass) rather than full equality."""
    base = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    # user 7: two sessions one hour apart; user 8: one session
    for i, offs in enumerate([0, 5, 10, 120, 125]):
        rows.append((i, base + datetime.timedelta(minutes=offs), 7, "e", 1.0, "{}"))
    rows.append((9, base, 8, "e", 1.0, "{}"))
    # flush driver: late lone event far in the future, separate batch
    flush_ts = base + datetime.timedelta(days=2)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    d = f"/tmp/wm_sessions_{uuid.uuid4().hex[:8]}"
    try:
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
        spark.createDataFrame(
            [(99, flush_ts, -1, "__flush__", 0.0, "{}")], schema
        ).coalesce(1).write.mode("append").parquet(d)
        stream = (
            spark.readStream.schema(spark.read.parquet(d).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        agg = session_aggregate(stream, gap="30 minutes", watermark="10 minutes")
        got = qs._run_to_memory(agg, mode="append").filter(F.col("user_id") >= 0)
        emitted = {(r.user_id, r.window_start, r.n_events) for r in got.collect()}
        batch_df = session_aggregate(
            spark.createDataFrame(rows, schema), gap="30 minutes"
        )
        full = {(r.user_id, r.window_start, r.n_events) for r in batch_df.collect()}
        assert emitted <= full
        # at minimum the first sessions (ended long before the flush) emit
        assert (7, "2024-03-01 00:00:00", 3) in emitted
        assert (8, "2024-03-01 00:00:00", 1) in emitted
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_dedup_equals_batch_distinct(spark):
    """At-least-once replay (every event delivered twice, copies inside
    one time-sliced file) -> dropDuplicatesWithinWatermark drains to
    EXACTLY the original table: same multiset of rows, first arrival
    kept. The staged-dir path is the same one streaming_dedup_exact's
    driver oracle exercises."""
    from sparkstreamingtwitter_presidential_spark.streaming import streaming_exact_dedup

    staged_dup = qs._staged_dup(spark, SF_DIR)
    stream = read_events_stream(spark, staged_dup)
    got = qs._run_to_memory(
        streaming_exact_dedup(stream, ["event_id"]), mode="append"
    ).select("event_id", "user_id", "event_type", "value")
    want = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert len(g) == len(w) and g == w


def test_streaming_dedup_batch_degradation(spark):
    """The same operator on a batch DataFrame is plain dropDuplicates."""
    from sparkstreamingtwitter_presidential_spark.streaming import streaming_exact_dedup

    ev = load_table(spark, SF_DIR, "events")
    doubled = ev.unionByName(ev)
    assert streaming_exact_dedup(doubled, ["event_id"]).count() == ev.count()


def test_update_mode_multi_column_grouping_key(spark):
    """drain_update_mode keyed on BOTH grouping columns must equal the
    batch aggregate; keying on a one-column prefix of a two-column
    grouping is detected (keys sharing the prefix would overwrite each
    other and silently lose rows) and raises instead."""
    from sparkstreamingtwitter_presidential_spark.sources.synthdocs_ds import (
        register_synthdocs,
    )
    from sparkstreamingtwitter_presidential_spark.streaming.update_mode import (
        drain_update_mode,
    )

    register_synthdocs(spark)

    def stream():
        return (
            spark.readStream.format("synthdocs")
            .option("rows_per_batch", "100")
            .option("max_rows", "300")
            .load()
        )

    agg = stream().groupBy("lang", "source").agg(F.count("*").alias("n"))
    got = sorted(tuple(r) for r in drain_update_mode(agg, key_cols=["lang", "source"]).collect())
    want = sorted(
        tuple(r)
        for r in spark.read.format("synthdocs")
        .option("n_rows", "300")
        .load()
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert got == want and len(got) > 5

    # default key = first column only: a proper subset of the grouping
    # columns -> repeated store key within one batch -> loud failure
    agg2 = stream().groupBy("lang", "source").agg(F.count("*").alias("n"))
    with pytest.raises(Exception) as ei:
        drain_update_mode(agg2)
    assert "does not cover" in str(ei.value)

    # and a key column that isn't in the output fails fast
    with pytest.raises(ValueError, match="not in aggregate output"):
        drain_update_mode(agg2, key_cols=["nope"])
