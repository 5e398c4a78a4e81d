"""applyInPandasWithState operator test: milestones accumulate across
micro-batches (state persists between triggers) and match a batch
recomputation of the same rule."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import sparkstreamingtwitter_presidential_spark.queries.streaming as qs
from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.sources.replay import read_events_stream
from sparkstreamingtwitter_presidential_spark.streaming.stateful import milestone_counter

SF_DIR = "/root/testdata/sf0.001"
EMIT_EVERY = 10


def test_milestones_match_batch_rule(spark):
    staged = qs._staged(spark, SF_DIR)
    stream = read_events_stream(spark, staged, files_per_trigger=1)
    got = qs._run_to_memory(
        milestone_counter(stream.select("user_id", "ts", "value"), EMIT_EVERY),
        mode="append",
    )
    rows = {(r.user_id, r.milestone) for r in got.collect()}

    # batch recomputation: user's event count // EMIT_EVERY milestones.
    # (replay is time-ordered so milestone totals are prefix sums in ts
    # order — we check the milestone set here and one exact total below)
    ev = load_table(spark, SF_DIR, "events")
    counts = {r.user_id: r.n for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    want = {
        (uid, m * EMIT_EVERY)
        for uid, n in counts.items()
        for m in range(1, n // EMIT_EVERY + 1)
    }
    assert rows == want and len(want) > 0

    # exact value check for one milestone: first EMIT_EVERY events by ts,
    # rounded with the repo's cross-engine floor rule (DESIGN.md), which
    # the operator uses instead of HALF_UP round().
    uid = next(iter(counts))
    first = (
        ev.filter(F.col("user_id") == uid)
        .orderBy("ts")
        .limit(EMIT_EVERY)
        .agg(F.floor(F.sum("value") * 100.0 + 0.5) / 100.0)
        .collect()[0][0]
    )
    got_first = {
        r.total_value
        for r in got.filter(
            (F.col("user_id") == uid) & (F.col("milestone") == EMIT_EVERY)
        ).collect()
    }
    assert got_first == {first}
