"""transformWithStateInPandas operators (r12 late — the Spark 4
state-v2 API). The state protocol needs google.protobuf, which this
container lacks — so here the entry points must refuse UP FRONT by
name (a mid-stream crash is the failure mode being prevented), and the
full behavioral suite runs wherever protobuf exists: TTL dedup keeps
exactly the first event per key and re-admits after expiry; the
running-totals twin must match the applyInPandasWithState original
and the batch rule."""

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
    name = f"mem_{uuid.uuid4().hex[:8]}"
    schema = "k long, ts long"

    def drain(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
        q = (
            dedup_stream_ttl(
                spark.readStream.schema(schema).parquet(src),
                ["k"],
                order_col="ts",
                ttl_ms=1500,
            )
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return sorted((r.k, r.ts) for r in spark.table(name).collect())

    assert drain([(1, 10), (1, 11)]) == [(1, 10)]
    time.sleep(2.5)  # TTL lapses between runs (processing-time clock)
    assert drain([(1, 20)]) == [(1, 10), (1, 20)]  # re-admitted
    assert drain([(1, 30)]) == [(1, 10), (1, 20)]  # still live: dropped
