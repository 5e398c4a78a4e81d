"""Stream-stream join tests: the inner path is pinned by the registry
oracle differential (test_queries_oracle); here we pin the LEFT-OUTER
emission semantics, which need the watermark to advance past the match
horizon before NULL-padded rows flush — a bounded replay only crosses
that horizon if a later sentinel row arrives on both streams (see
streaming/joins.py docstring)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.sources.replay import (
    read_events_stream,
    stage_ts_ordered,
)
from sparkstreamingtwitter_presidential_spark.streaming import stream_stream_join

SF_DIR = "/root/testdata/sf0.001"
SENTINEL_ID = 10**9


def _enrichment(ev):
    return ev.where("event_id % 3 <> 0").selectExpr(
        "event_id",
        "timestampadd(SECOND, CAST(event_id % 240 AS INT), ts) AS enr_ts",
        "concat('enr:', event_type) AS label",
    )


def test_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # Sentinel far beyond max(ts) + within + watermark on BOTH streams:
    # the global watermark is the min across inputs, so both must advance
    # for eviction (and therefore outer-NULL emission) to trigger.
    sentinel_ts = "timestampadd(HOUR, 48, max_ts)"
    max_ts_row = ev.agg(F.max("ts").alias("max_ts"))
    left_sent = max_ts_row.selectExpr(
        f"CAST({SENTINEL_ID} AS BIGINT) AS event_id",
        f"{sentinel_ts} AS ts",
        "CAST(0 AS BIGINT) AS user_id",
        "'sentinel' AS event_type",
        "CAST(0.0 AS DOUBLE) AS value",
    )
    right_sent = max_ts_row.selectExpr(
        f"CAST({SENTINEL_ID} AS BIGINT) AS event_id",
        f"{sentinel_ts} AS enr_ts",
        "'sentinel' AS label",
    )
    left_dir = str(tmp_path / "left")
    right_dir = str(tmp_path / "right")
    stage_ts_ordered(ev.unionByName(left_sent), left_dir, n_files=5)
    stage_ts_ordered(
        _enrichment(ev).unionByName(right_sent), right_dir, n_files=5, ts_col="enr_ts"
    )

    joined = stream_stream_join(
        read_events_stream(spark, left_dir),
        read_events_stream(spark, right_dir),
        on="event_id",
        left_ts="ts",
        right_ts="enr_ts",
        within="30 minutes",
        watermark="1 hour",
        how="left_outer",
    ).select("event_id", "event_type", "label")

    name = "stream_join_outer_test"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        # Batch expectation (sentinel excluded: its own NULL row can
        # never flush — nothing ever advances the watermark past it).
        want = {
            (r.event_id, r.label)
            for r in ev.alias("l")
            .join(
                _enrichment(ev).alias("r"),
                on=F.expr(
                    "l.event_id = r.event_id AND r.enr_ts >= l.ts "
                    "AND r.enr_ts <= l.ts + INTERVAL 30 minutes"
                ),
                how="left_outer",
            )
            .select("l.event_id", "r.label")
            .collect()
        }
        # The no-data flush batch after the watermark update is not
        # reliably triggered by processAllAvailable — poll briefly.
        deadline = time.time() + 60
        got: set = set()
        while time.time() < deadline:
            got = {
                (r.event_id, r.label)
                for r in spark.table(name).collect()
                if r.event_id != SENTINEL_ID
            }
            if got == want:
                break
            q.processAllAvailable()
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination(30)

    unmatched = {g for g in got if g[1] is None}
    assert got == want
    assert len(unmatched) > 0, "expected NULL-padded unmatched left rows"


def test_batch_degradation_matches_streaming_semantics(spark):
    """stream_stream_join on batch inputs is the plain bounded join —
    the drained-replay equivalence the registry oracle pins."""
    ev = load_table(spark, SF_DIR, "events").select("event_id", "ts", "event_type")
    out = stream_stream_join(
        ev, _enrichment(ev), on="event_id", left_ts="ts", right_ts="enr_ts",
        within="30 minutes", how="inner",
    )
    n = out.count()
    assert n == ev.where("event_id % 3 <> 0").count() == 666
