"""Native Hudi streaming source (format('hudi_native')): instant
offsets, change/upsert-feed semantics over the r9 latest-slice
incremental plan, restarts, and the overwrite/archival refusals."""

from __future__ import annotations

import pytest

from sparkstreamingtwitter_presidential_spark.sources.hudi import (
    read_hudi,
    upsert_hudi,
    write_hudi,
)
from sparkstreamingtwitter_presidential_spark.sources.hudi_stream_ds import (
    register_hudi_stream,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, s string, v double")


def _run(spark, table, ckpt, sink, batches=None, **opts):
    reader = spark.readStream.format("hudi_native")
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load(table)
        .writeStream.outputMode("append")
        .foreachBatch(
            lambda df, bid: (
                sink.extend(tuple(r) for r in df.collect()),
                batches is not None and batches.append(df.count()),
            )
        )
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)


def test_hudi_stream_upsert_feed_exactly_once_across_restart(
    spark, tmp_path
):
    """Inserts AND upserts stream as a change feed — updated records
    re-deliver with their new values, copied-over rows never do — and
    a fresh reader on the same checkpoint picks up only post-restart
    commits."""
    register_hudi_stream(spark)
    t = str(tmp_path / "t")
    write_hudi(
        _df(spark, [(i, "x", float(i)) for i in range(5)]).repartition(1),
        t,
        record_key="id",
    )
    upsert_hudi(
        spark, t, _df(spark, [(1, "x", 100.0)]), record_key="id"
    )
    ckpt = str(tmp_path / "ckpt")
    first: list = []
    # one commit per batch, so the insert batch delivers original
    # values and the upsert batch re-delivers id=1 with its new value
    # (change-feed semantics); an uncapped cold drain would collapse
    # them — see test_hudi_stream_single_batch_collapses_rewrites
    _run(
        spark, t, ckpt, first,
        maxCommitsPerTrigger="1", progress_dir=ckpt,
    )
    got = sorted((r[0], r[2]) for r in first)
    assert got == [
        (0, 0.0), (1, 1.0), (1, 100.0), (2, 2.0), (3, 3.0), (4, 4.0),
    ]
    upsert_hudi(
        spark, t, _df(spark, [(2, "x", 200.0)]), record_key="id"
    )
    second: list = []
    _run(
        spark, t, ckpt, second,
        maxCommitsPerTrigger="1", progress_dir=ckpt,
    )
    assert sorted((r[0], r[2]) for r in second) == [(2, 200.0)]


def test_hudi_stream_single_batch_collapses_rewrites(spark, tmp_path):
    """A cold drain whose ONE batch spans insert + two upserts of the
    same group delivers each changed record once with its final value
    (the latest-slice plan; per-commit planning would duplicate)."""
    register_hudi_stream(spark)
    t = str(tmp_path / "t")
    write_hudi(
        _df(spark, [(i, "x", float(i)) for i in range(5)]).repartition(1),
        t,
        record_key="id",
    )
    upsert_hudi(spark, t, _df(spark, [(1, "x", 100.0)]), record_key="id")
    upsert_hudi(spark, t, _df(spark, [(1, "x", 111.0)]), record_key="id")
    sink: list = []
    _run(spark, t, str(tmp_path / "ckpt"), sink)
    got = sorted((r[0], r[2]) for r in sink)
    assert got == [(0, 0.0), (1, 111.0), (2, 2.0), (3, 3.0), (4, 4.0)]


def test_hudi_stream_caps_and_partitioned_columns(spark, tmp_path):
    """maxCommitsPerTrigger + progress_dir drains one commit per
    batch; partition columns come back from the data files (Hudi
    stores full rows)."""
    register_hudi_stream(spark)
    t = str(tmp_path / "t")
    for i in range(3):
        write_hudi(
            _df(spark, [(i, f"p{i % 2}", float(i))]).repartition(1),
            t,
            record_key="id",
            partition_by="s",
            mode="append",
        )
    ckpt = str(tmp_path / "ckpt")
    sink: list = []
    counts: list = []
    _run(
        spark, t, ckpt, sink, batches=counts,
        maxCommitsPerTrigger="1", progress_dir=ckpt,
    )
    assert sorted(sink) == [
        (0, "p0", 0.0), (1, "p1", 1.0), (2, "p0", 2.0),
    ]
    assert max(counts) <= 1 and len(counts) >= 3


def test_hudi_stream_refuses_overwrite_in_range(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    register_hudi_stream(spark)
    t = str(tmp_path / "t")
    write_hudi(
        _df(spark, [(1, "x", 1.0)]).repartition(1), t, record_key="id"
    )
    write_hudi(
        _df(spark, [(2, "x", 2.0)]).repartition(1),
        t,
        record_key="id",
        mode="overwrite",
    )
    with pytest.raises(StreamingQueryException, match="overwrite"):
        _run(spark, t, str(tmp_path / "ckpt"), [])


def test_hudi_stream_caps_backlog_by_bytes(spark, tmp_path):
    """maxBytesPerTrigger (r10): a 1-byte budget admits one commit per
    micro-batch from the commit metadata's fileSizeInBytes (soft max);
    the backlog still drains completely."""
    register_hudi_stream(spark)
    t = str(tmp_path / "t")
    for i in range(4):
        write_hudi(
            _df(spark, [(i, "x", float(i))]).repartition(1),
            t,
            record_key="id",
            mode="append",
        )
    ckpt = str(tmp_path / "ckpt")
    sink: list = []
    counts: list = []
    _run(
        spark, t, ckpt, sink, batches=counts,
        maxBytesPerTrigger="1", progress_dir=ckpt,
    )
    assert sorted(r[0] for r in sink) == [0, 1, 2, 3]
    assert [c for c in counts if c] == [1, 1, 1, 1]


def test_hudi_stream_mor_log_upserts_across_restart(spark, tmp_path):
    """r13: MOR tables stream — a log-writing deltacommit's batch
    delivers exactly its post-images (merged per slice: updated rows
    carry new values, untouched base rows fall out via the commit-time
    filter, delete blocks deliver nothing), and a restart on the same
    checkpoint replays nothing."""
    from sparkstreamingtwitter_presidential_spark.sources.hudi_mor import (
        compact_hudi,
        upsert_hudi_mor,
    )

    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    write_hudi(
        _df(spark, [(i, f"s{i}", float(i)) for i in range(10)]),
        t,
        record_key="id",
        n_file_groups=2,
        table_type="MERGE_ON_READ",
    )
    sink: list = []
    batches: list = []
    _run(spark, t, ckpt, sink, batches=batches, maxCommitsPerTrigger=1)
    assert sorted(r[0] for r in sink) == list(range(10))

    # log-writing upsert: update 2 keys, delete 1, insert 1 new key
    upsert_hudi_mor(
        spark,
        t,
        _df(spark, [(3, "u3", 33.0), (7, "u7", 77.0), (50, "new", 5.0)]),
        deletes=spark.createDataFrame([(4,)], "id long"),
    )
    sink.clear()
    _run(spark, t, ckpt, sink, maxCommitsPerTrigger=1)
    assert sorted(sink) == [
        (3, "u3", 33.0),
        (7, "u7", 77.0),
        (50, "new", 5.0),
    ]

    # a second deltacommit superseding one of the logs: latest wins
    upsert_hudi_mor(spark, t, _df(spark, [(3, "u3b", 34.0)]))
    sink.clear()
    _run(spark, t, ckpt, sink, maxCommitsPerTrigger=1)
    assert sorted(sink) == [(3, "u3b", 34.0)]

    # compaction in range delivers NOTHING (rows keep original stamps)
    assert compact_hudi(spark, t) is not None
    sink.clear()
    _run(spark, t, ckpt, sink, maxCommitsPerTrigger=1)
    assert sink == []

    # restart idempotence: nothing re-delivers
    sink.clear()
    _run(spark, t, ckpt, sink)
    assert sink == []


def test_hudi_stream_ordering_keyed_mor(spark, tmp_path):
    """r15: ordering-keyed MOR tables stream (lifts the r14 planning
    refusal) — the per-batch merge runs under precombine semantics:
    a STALE write in the range delivers NOTHING (merged state
    unchanged — change-feed semantics), a winning record delivers
    with its own stamp, ordering-valued deletes deliver nothing
    (documented no-retraction contract), and a stale delete leaves
    the base row out of the feed (unchanged)."""
    from sparkstreamingtwitter_presidential_spark.sources.hudi_mor import (
        upsert_hudi_mor,
    )

    register_hudi_stream(spark)
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    write_hudi(
        _df(spark, [(i, f"s{i}", float(i) + 10) for i in range(8)]),
        t,
        record_key="id",
        n_file_groups=2,
        table_type="MERGE_ON_READ",
        precombine="v",
    )
    sink: list = []
    _run(spark, t, ckpt, sink, maxCommitsPerTrigger=1)
    assert sorted(r[0] for r in sink) == list(range(8))

    # fresh update wins and delivers; the range also covers nothing else
    upsert_hudi_mor(spark, t, _df(spark, [(3, "hi3", 99.0)]))
    sink.clear()
    _run(spark, t, ckpt, sink, maxCommitsPerTrigger=1)
    assert sorted(sink) == [(3, "hi3", 99.0)]

    # STALE update (ordering below the winning log record AND below
    # another key's base) delivers NOTHING for either key
    upsert_hudi_mor(
        spark, t, _df(spark, [(3, "lo3", 1.0), (5, "lo5", 1.0)])
    )
    sink.clear()
    _run(spark, t, ckpt, sink, maxCommitsPerTrigger=1)
    assert sink == []

    # ordering-valued deletes: a fresh delete tombstones (delivers
    # nothing - no retraction rows), a stale delete changes nothing
    upsert_hudi_mor(
        spark,
        t,
        deletes=spark.createDataFrame(
            [(6, 999.0), (7, 0.5)], "id long, v double"
        ),
    )
    sink.clear()
    _run(spark, t, ckpt, sink, maxCommitsPerTrigger=1)
    assert sink == []
    # ...and the batch reader agrees with the stream's final state
    snap = {r.id: (r.s, r.v) for r in read_hudi(spark, t).collect()}
    assert snap[3] == ("hi3", 99.0)
    assert snap[5] == ("s5", 15.0), "stale update must not land"
    assert 6 not in snap and snap[7] == ("s7", 17.0)

    # restart idempotence
    sink.clear()
    _run(spark, t, ckpt, sink)
    assert sink == []


def test_hudi_stream_cluster_in_range_delivers_nothing(spark, tmp_path):
    """r15: a CLUSTER commit in the stream's range delivers NOTHING
    (layout-only, rows keep their stamps — same contract as
    compaction), and the stream keeps working across it."""
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        cluster_hudi,
    )

    register_hudi_stream(spark)
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    write_hudi(
        _df(spark, [(i, f"s{i}", float(i)) for i in range(6)]),
        t, record_key="id", n_file_groups=3,
    )
    sink: list = []
    _run(spark, t, ckpt, sink)
    assert sorted(r[0] for r in sink) == list(range(6))
    assert cluster_hudi(spark, t, sort_by=["id"]) is not None
    sink.clear()
    _run(spark, t, ckpt, sink)
    assert sink == []
    # post-cluster upserts still stream their post-images
    upsert_hudi(spark, t, _df(spark, [(2, "u2", 22.0)]))
    sink.clear()
    _run(spark, t, ckpt, sink)
    assert sink == [(2, "u2", 22.0)]
