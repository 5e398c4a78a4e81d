"""transformWithStateInPandas operators (r12 late — the Spark 4
state-v2 API; behavioral since r13 via the vendored minimal protobuf
runtime in vendor/protobuf_mini). The suite is the differential test
OF that runtime: every request here round-trips through the JVM state
server's REAL protobuf parser. TTL dedup keeps exactly the first
event per key and re-admits after expiry; the running-totals twin
must match the applyInPandasWithState original and the batch rule.
The up-front-refusal test only runs where protobuf is genuinely
unavailable (neither installed nor vendored)."""

from __future__ import annotations

import time
import uuid

import pytest
from pyspark.sql import functions as F

import sparkstreamingtwitter_presidential_spark.queries.streaming as qs
from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.sources.replay import (
    read_events_stream,
)
from sparkstreamingtwitter_presidential_spark.streaming.stateful import (
    milestone_counter,
)
from sparkstreamingtwitter_presidential_spark.streaming.stateful2 import (
    dedup_stream_ttl,
    running_totals_v2,
    state_v2_available,
)

SF_DIR = "/root/testdata/sf0.001"
EMIT_EVERY = 10

_has_v2 = state_v2_available()

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


@pytest.fixture(autouse=True)
def _rocksdb_provider(spark):
    """transformWithState needs per-variable column families — RocksDB
    provider only (the builders refuse by name otherwise). Scoped to
    this module; restored afterwards so the rest of the streaming
    suite keeps the default provider."""
    if not _has_v2:
        yield
        return
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, _ROCKSDB)
    yield
    if old:
        spark.conf.set(key, old)
    else:
        spark.conf.unset(key)


@pytest.mark.skipif(
    _has_v2, reason="protobuf present: the refusal path cannot trigger"
)
def test_refuses_up_front_without_protobuf(spark):
    staged = qs._staged(spark, SF_DIR)
    stream = read_events_stream(spark, staged).select(
        "user_id", "ts", "value"
    )
    # refusal fires at OPERATOR BUILD time — before any query starts,
    # never as a mid-stream crash
    with pytest.raises(NotImplementedError, match="google.protobuf"):
        dedup_stream_ttl(stream, ["user_id"])
    with pytest.raises(NotImplementedError, match="google.protobuf"):
        running_totals_v2(stream, EMIT_EVERY)


@pytest.mark.skipif(not _has_v2, reason="state-v2 needs protobuf")
def test_running_totals_v2_matches_v1_and_batch(spark):
    staged = qs._staged(spark, SF_DIR)
    cols = ["user_id", "ts", "value"]

    got_v2 = qs._run_to_memory(
        running_totals_v2(
            read_events_stream(spark, staged, files_per_trigger=1).select(
                *cols
            ),
            EMIT_EVERY,
        ),
        mode="append",
    )
    rows_v2 = {
        (r.user_id, r.milestone, r.total_value) for r in got_v2.collect()
    }

    got_v1 = qs._run_to_memory(
        milestone_counter(
            read_events_stream(spark, staged, files_per_trigger=1).select(
                *cols
            ),
            EMIT_EVERY,
        ),
        mode="append",
    )
    rows_v1 = {
        (r.user_id, r.milestone, r.total_value) for r in got_v1.collect()
    }
    assert rows_v2 == rows_v1 and len(rows_v2) > 0

    ev = load_table(spark, SF_DIR, "events")
    counts = {
        r.user_id: r.n
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    want = {
        (uid, m * EMIT_EVERY)
        for uid, n in counts.items()
        for m in range(1, n // EMIT_EVERY + 1)
    }
    assert {(u, m) for u, m, _t in rows_v2} == want


@pytest.mark.skipif(not _has_v2, reason="state-v2 needs protobuf")
def test_dedup_ttl_first_event_per_key(spark):
    staged = qs._staged(spark, SF_DIR)
    stream = read_events_stream(spark, staged, files_per_trigger=1).select(
        "user_id", "ts", "event_type", "value"
    )
    got = qs._run_to_memory(
        dedup_stream_ttl(stream, ["user_id"], ttl_ms=None), mode="append"
    )
    rows = {(r.user_id, r.ts) for r in got.collect()}

    ev = load_table(spark, SF_DIR, "events")
    first = {
        (r.user_id, r.ts)
        for r in ev.groupBy("user_id")
        .agg(F.min("ts").alias("ts"))
        .collect()
    }
    assert rows == first and len(first) > 0


@pytest.mark.skipif(not _has_v2, reason="state-v2 needs protobuf")
def test_dedup_ttl_readmits_after_expiry(spark, tmp_path):
    """Two drains on ONE checkpoint with a pause longer than the TTL:
    the same key emits in both runs (state expired between them); a
    third immediate drain emits nothing new (state live again)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    schema = "k long, ts long"

    def drain(rows, want):
        """TTL queries run in ProcessingTime time mode, where the
        engine keeps scheduling batches forever (TTL eviction needs
        the clock) — there is no self-terminating drain. Start, poll
        until the new input is consumed, settle one extra tick, stop,
        and compare the sink to ``want``."""
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
        q = (
            dedup_stream_ttl(
                spark.readStream.schema(schema).parquet(src),
                ["k"],
                order_col="ts",
                ttl_ms=8000,
            )
            .writeStream.outputMode("append")
            .format("parquet")  # memory sink can't restart a checkpoint
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

        def read_sink():
            try:
                return sorted(
                    (r.k, r.ts)
                    for r in spark.read.parquet(sink).collect()
                )
            except Exception:
                return []  # sink dir not created yet

        try:
            # progress entries are emitted AFTER a batch fully commits
            # (sink + state + commit log), so once the new input shows
            # up in recentProgress the sink is consistent — and the
            # query stops BETWEEN batches, never leaving an uncommitted
            # replay for the next drain
            deadline = time.time() + 120
            consumed = 0
            while time.time() < deadline and consumed < len(rows):
                consumed = sum(
                    int(p["numInputRows"]) for p in q.recentProgress
                )
                time.sleep(0.2)
            assert consumed >= len(rows), "input never consumed"
            got = read_sink()
        finally:
            q.stop()
        if want is not None:
            assert got == want, (got, want)
        return got

    # TTL must outlive a query STARTUP (~4s of RocksDB + python-worker
    # init) so the third drain's batch still sees live state; the
    # sleep between the first two drains must exceed it
    drain([(1, 10), (1, 11)], [(1, 10)])
    time.sleep(10)  # TTL lapses between runs (processing-time clock)
    t_before_write = time.time()  # state for (1, 20) is written after this
    drain([(1, 20)], [(1, 10), (1, 20)])  # re-admitted
    t_after_commit = time.time()  # ... and committed before this

    # Third drain: normally the key is still live (dropped), but a
    # query restart is unbounded on a loaded machine — if the restart
    # alone outlives the 8 s TTL, re-admission is the CORRECT answer
    # under the TTL contract, not a failure. Decide from measured
    # wall-clock which outcomes the contract allows.
    ttl_s = 8.0
    t_start3 = time.time()
    got = drain([(1, 30)], None)
    t_end3 = time.time()
    suppressed = [(1, 10), (1, 20)]
    readmitted = [(1, 10), (1, 20), (1, 30)]
    if t_end3 - t_before_write < ttl_s:
        # the whole third drain finished inside the TTL window, so the
        # state cannot have expired at any evaluation point: dropped
        assert got == suppressed, got
    elif t_start3 - t_after_commit > ttl_s:
        # the TTL had lapsed before the third drain even started:
        # expiry is mandatory and the key must re-admit
        assert got == readmitted, got
    else:
        # expiry straddles the third batch: either outcome honors TTL
        assert got in (suppressed, readmitted), got
