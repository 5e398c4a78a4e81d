"""Exactly-once streaming Delta sink: txn markers, redelivery
idempotence, and end-to-end stream -> delta == batch equivalence."""

from __future__ import annotations

import shutil
import uuid

import pytest

import sparkstreamingtwitter_presidential_spark.queries.streaming as qs
from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.sources.delta import (
    last_txn_version,
    read_delta,
    table_version,
    write_delta,
)
from sparkstreamingtwitter_presidential_spark.sources.replay import read_events_stream
from sparkstreamingtwitter_presidential_spark.streaming import (
    delta_batch_committer,
    write_stream_to_delta,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def staged(spark):
    return qs._staged(spark, SF_DIR)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v double")


def test_txn_action_roundtrip(spark, tmp_path):
    t = str(tmp_path / "t")
    assert last_txn_version(t, "job") is None  # table doesn't exist yet
    write_delta(_df(spark, [(1, 1.0)]), t, txn=("job", 0))
    write_delta(_df(spark, [(2, 2.0)]), t, txn=("job", 1))
    write_delta(_df(spark, [(3, 3.0)]), t, txn=("other", 7))
    assert last_txn_version(t, "job") == 1
    assert last_txn_version(t, "other") == 7
    assert last_txn_version(t, "nobody") is None


def test_committer_skips_redelivered_batches(spark, tmp_path):
    t = str(tmp_path / "t")
    commit = delta_batch_committer(t, "job")
    commit(_df(spark, [(1, 1.0)]), 0)
    commit(_df(spark, [(2, 2.0)]), 1)
    v_before = table_version(t)
    # crash-replay: batches 0 and 1 are re-delivered (same data)
    commit(_df(spark, [(1, 1.0)]), 0)
    commit(_df(spark, [(2, 2.0)]), 1)
    assert table_version(t) == v_before  # no new commits
    assert sorted(tuple(r) for r in read_delta(spark, t).collect()) == [
        (1, 1.0),
        (2, 2.0),
    ]
    # the next fresh batch still lands
    commit(_df(spark, [(3, 3.0)]), 2)
    assert last_txn_version(t, "job") == 2
    assert read_delta(spark, t).count() == 3


def test_different_app_ids_do_not_interfere(spark, tmp_path):
    t = str(tmp_path / "t")
    delta_batch_committer(t, "job_a")(_df(spark, [(1, 1.0)]), 0)
    # same batch_id, different logical job: must NOT be skipped
    delta_batch_committer(t, "job_b")(_df(spark, [(2, 2.0)]), 0)
    assert read_delta(spark, t).count() == 2


def test_stream_to_delta_equals_batch(spark, staged):
    run = f"/tmp/delta_sink_{uuid.uuid4().hex[:8]}"
    table, ckpt = f"{run}/table", f"{run}/ckpt"
    try:
        stream = read_events_stream(spark, staged, files_per_trigger=1)
        q = write_stream_to_delta(
            stream, table, ckpt, app_id="test_ingest",
            partition_by=["event_type"],
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)
        got = read_delta(spark, table).select(
            "event_id", "user_id", "event_type", "value"
        )
        want = load_table(spark, SF_DIR, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        g = sorted(tuple(r) for r in got.collect())
        w = sorted(tuple(r) for r in want.collect())
        assert g == w and len(g) > 0
        # one txn-marked commit per micro-batch, monotonically versioned
        assert last_txn_version(table, "test_ingest") >= 0
    finally:
        shutil.rmtree(run, ignore_errors=True)
