"""Exactly-once streaming upsert into Delta: within-batch collapse,
redelivery idempotence (marker and merge share one commit), and an
end-to-end stream whose result equals last-change-wins over the feed."""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.sources.delta import (
    last_txn_version,
    read_delta,
    table_version,
    write_delta,
)
from sparkstreamingtwitter_presidential_spark.streaming.delta_upsert import (
    collapse_latest,
    delta_upsert_committer,
    upsert_stream_to_delta,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v double, seq long")


def test_collapse_latest_picks_max_order(spark):
    b = _df(spark, [(1, 10.0, 1), (1, 11.0, 3), (1, 12.0, 2), (2, 5.0, 1)])
    got = sorted(tuple(r) for r in collapse_latest(b, ["id"], "seq").collect())
    assert got == [(1, 11.0, 3), (2, 5.0, 1)]


def test_committer_upserts_and_skips_redelivery(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, 1.0, 0), (2, 2.0, 0)]), t)
    commit = delta_upsert_committer(spark, t, ["id"], "job", order_col="seq")

    commit(_df(spark, [(2, 20.0, 1), (3, 30.0, 1)]), 0)
    assert sorted(tuple(r) for r in read_delta(spark, t).collect()) == [
        (1, 1.0, 0),
        (2, 20.0, 1),
        (3, 30.0, 1),
    ]
    v = table_version(t)
    # crash-replay of batch 0 with (adversarially) different data: the
    # txn marker was committed atomically with the merge, so no rewrite
    commit(_df(spark, [(2, 999.0, 9)]), 0)
    assert table_version(t) == v
    assert read_delta(spark, t).filter("id = 2").collect()[0]["v"] == 20.0
    # next batch collapses two changes for one key, then merges
    commit(_df(spark, [(1, 7.0, 2), (1, 8.0, 3)]), 1)
    assert read_delta(spark, t).filter("id = 1").collect()[0]["v"] == 8.0
    assert last_txn_version(t, "job") == 1


def test_empty_batch_still_advances_marker(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, 1.0, 0)]), t)
    commit = delta_upsert_committer(spark, t, ["id"], "job")
    commit(_df(spark, []).limit(0), 0)
    assert last_txn_version(t, "job") == 0  # marker-only commit
    assert read_delta(spark, t).count() == 1


def test_stream_upsert_equals_last_change_wins(spark, tmp_path):
    run = f"/tmp/delta_upsert_{uuid.uuid4().hex[:8]}"
    feed, table, ckpt = f"{run}/feed", f"{run}/table", f"{run}/ckpt"
    try:
        # change feed across two files; keys overlap between files
        f1 = _df(spark, [(1, 1.0, 1), (2, 2.0, 1), (1, 1.5, 2)])
        f2 = _df(spark, [(2, 2.5, 3), (3, 3.0, 1)])
        f1.coalesce(1).write.parquet(f"{feed}/b0")
        f2.coalesce(1).write.parquet(f"{feed}/b1")
        write_delta(_df(spark, [(9, 9.0, 0)]), table)  # pre-existing row

        stream = (
            spark.readStream.schema("id long, v double, seq long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{feed}/*")
        )
        q = upsert_stream_to_delta(
            stream, table, ckpt, keys=["id"], app_id="cdc", order_col="seq"
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)

        got = sorted(tuple(r) for r in read_delta(spark, table).collect())
        # last change per key across the whole feed, plus untouched row
        assert got == [(1, 1.5, 2), (2, 2.5, 3), (3, 3.0, 1), (9, 9.0, 0)]
        assert last_txn_version(table, "cdc") >= 0
    finally:
        shutil.rmtree(run, ignore_errors=True)


def test_committer_dv_mode_marks_instead_of_rewriting(spark, tmp_path):
    """use_dvs=True (r9 late): each micro-batch MERGEs merge-on-read —
    matched keys DV out, batch rows stage as new files, the txn marker
    rides the same commit, redelivery skips; no seeded file is ever
    rewritten and the final state equals the CoW committer's."""
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        _replay_log,
    )

    t = str(tmp_path / "t")
    write_delta(
        _df(spark, [(1, 1.0, 0), (2, 2.0, 0), (3, 3.0, 0)]).repartition(1),
        t,
    )
    files0 = sorted(_replay_log(t, None).files)
    commit = delta_upsert_committer(
        spark, t, ["id"], "job", order_col="seq", use_dvs=True
    )
    commit(_df(spark, [(2, 20.0, 1), (4, 40.0, 1)]), 0)
    assert sorted(tuple(r) for r in read_delta(spark, t).collect()) == [
        (1, 1.0, 0), (2, 20.0, 1), (3, 3.0, 0), (4, 40.0, 1),
    ]
    snap = _replay_log(t, None)
    assert set(files0) <= set(snap.files)  # seeded files only DV'd
    assert any(a.get("deletionVector") for a in snap.files.values())
    v = table_version(t)
    commit(_df(spark, [(2, 999.0, 9)]), 0)  # crash replay: skipped
    assert table_version(t) == v
    assert last_txn_version(t, "job") == 0
    # second batch collapses then DV-merges on top of the first's DVs
    commit(_df(spark, [(2, 21.0, 2), (2, 22.0, 3)]), 1)
    assert read_delta(spark, t).filter("id = 2").collect()[0]["v"] == 22.0
