"""Native Hudi CoW (sources/hudi.py): timeline + file-slice layout
roundtrip, record-key upserts (file-group targeting), time travel,
incremental pull, rollback, clean, and the honest refusal boundary
(mislabeled log files, missing record key, bad file names; MOR has
its own suite in test_hudi_mor.py since r13)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.sources.hudi import (
    HudiCommitConflict,
    clean_hudi,
    hudi_row_changes,
    hudi_timeline,
    read_hudi,
    read_hudi_incremental,
    rollback_hudi,
    upsert_hudi,
    write_hudi,
)

SCHEMA = "id long, s string, v double"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_roundtrip_and_layout_is_spec_shaped(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _df(spark, [(1, "a", 1.5), (2, "b", None), (3, None, 3.0)])
    write_hudi(df, t, record_key="id")
    back = read_hudi(spark, t)
    assert sorted(back.columns) == sorted(df.columns)
    assert sorted(tuple(r) for r in back.select(*df.columns).collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    # spec layout: .hoodie with properties + three timeline states,
    # base files named <fileId>_<token>_<instant>.parquet
    hd = os.path.join(t, ".hoodie")
    names = os.listdir(hd)
    assert "hoodie.properties" in names
    assert any(n.endswith(".commit") for n in names)
    assert any(n.endswith(".inflight") for n in names)
    assert any(n.endswith(".commit.requested") for n in names)
    props = open(os.path.join(hd, "hoodie.properties")).read()
    assert "hoodie.table.type=COPY_ON_WRITE" in props
    assert "hoodie.table.recordkey.fields=id" in props
    base = [n for n in os.listdir(t) if n.endswith(".parquet")]
    assert base and all(len(n.split("_")) == 3 for n in base)
    # meta columns are physically stored, surfaced with keep_meta
    meta = read_hudi(spark, t, keep_meta=True)
    for c in [
        "_hoodie_commit_time",
        "_hoodie_record_key",
        "_hoodie_file_name",
    ]:
        assert c in meta.columns
    keys = {r._hoodie_record_key for r in meta.collect()}
    assert keys == {"1", "2", "3"}


def test_append_accumulates_overwrite_replaces(spark, tmp_path):
    t = str(tmp_path / "t")
    write_hudi(_df(spark, [(1, "a", 1.0)]), t, record_key="id")
    write_hudi(_df(spark, [(2, "b", 2.0)]), t, record_key="id")
    assert read_hudi(spark, t).count() == 2
    write_hudi(_df(spark, [(9, "z", 9.0)]), t, record_key="id", mode="overwrite")
    got = [(r.id, r.s) for r in read_hudi(spark, t).collect()]
    assert got == [(9, "z")]


def test_upsert_targets_matched_file_groups_only(spark, tmp_path):
    t = str(tmp_path / "t")
    # two file groups: keys split by hash buckets
    write_hudi(
        _df(spark, [(i, f"s{i}", float(i)) for i in range(10)]),
        t,
        record_key="id",
        n_file_groups=2,
    )
    from sparkstreamingtwitter_presidential_spark.sources.hudi import _latest_slices

    before = {(fid, inst) for _p, fid, inst, _ in _latest_slices(t)}
    assert len(before) == 2
    up = upsert_hudi(
        spark, t, _df(spark, [(3, "UP", 33.0), (100, "new", 100.0)])
    )
    got = {r.id: (r.s, r.v) for r in read_hudi(spark, t).collect()}
    assert got[3] == ("UP", 33.0) and got[100] == ("new", 100.0)
    assert got[4] == ("s4", 4.0)  # untouched rows intact
    assert len(got) == 11
    # only the matched group gained a new slice; the other's latest
    # slice is unchanged
    after = {(fid, inst) for _p, fid, inst, _ in _latest_slices(t)}
    carried = before & after
    assert len(carried) == 1  # one group untouched, one rewritten (+1 insert group)
    snaps = {r.instant: r for r in hudi_timeline(spark, t).collect()}
    assert snaps[up].operation == "UPSERT"
    # duplicate source keys refuse
    with pytest.raises(ValueError, match="duplicate record keys"):
        upsert_hudi(spark, t, _df(spark, [(1, "x", 0.0), (1, "y", 0.0)]))


def test_time_travel_and_incremental(spark, tmp_path):
    t = str(tmp_path / "t")
    i1 = write_hudi(_df(spark, [(1, "a", 1.0)]), t, record_key="id")
    i2 = write_hudi(_df(spark, [(2, "b", 2.0)]), t, record_key="id")
    i3 = upsert_hudi(spark, t, _df(spark, [(1, "A2", 11.0), (3, "c", 3.0)]))

    assert sorted(r.id for r in read_hudi(spark, t, as_of=i1).collect()) == [1]
    assert sorted(r.id for r in read_hudi(spark, t, as_of=i2).collect()) == [1, 2]
    # pre-upsert value visible at i2, post-upsert at head
    assert read_hudi(spark, t, as_of=i2).filter("id=1").collect()[0].s == "a"
    assert read_hudi(spark, t).filter("id=1").collect()[0].s == "A2"
    with pytest.raises(ValueError, match="not a completed commit"):
        read_hudi(spark, t, as_of="19700101000000000")

    # incremental pull: exactly the records WRITTEN in the range —
    # the upsert slice's copied-over rows must not leak in
    inc = read_hudi_incremental(spark, t, from_instant=i1)
    got = sorted((r.id, r.s) for r in inc.collect())
    assert got == [(1, "A2"), (2, "b"), (3, "c")]
    inc23 = read_hudi_incremental(spark, t, from_instant=i2, to_instant=i3)
    assert sorted((r.id, r.s) for r in inc23.collect()) == [(1, "A2"), (3, "c")]
    assert read_hudi_incremental(spark, t, from_instant=i3).count() == 0
    # overwrite inside the range refuses
    write_hudi(_df(spark, [(9, "z", 9.0)]), t, record_key="id", mode="overwrite")
    with pytest.raises(ValueError, match="overwrite"):
        read_hudi_incremental(spark, t, from_instant=i1).collect()


def test_rollback_latest_commit(spark, tmp_path):
    t = str(tmp_path / "t")
    i1 = write_hudi(_df(spark, [(1, "a", 1.0)]), t, record_key="id")
    i2 = upsert_hudi(spark, t, _df(spark, [(1, "A2", 11.0)]))
    assert read_hudi(spark, t).collect()[0].s == "A2"
    with pytest.raises(ValueError, match="latest"):
        rollback_hudi(t, i1)
    removed = rollback_hudi(t, i2)
    assert removed
    assert read_hudi(spark, t).collect()[0].s == "a"  # pre-upsert restored
    assert [r.instant for r in hudi_timeline(spark, t).collect()] == [i1]


def test_clean_retires_superseded_slices(spark, tmp_path):
    t = str(tmp_path / "t")
    i1 = write_hudi(_df(spark, [(1, "a", 1.0)]), t, record_key="id")
    upsert_hudi(spark, t, _df(spark, [(1, "v2", 2.0)]))
    upsert_hudi(spark, t, _df(spark, [(1, "v3", 3.0)]))
    n_before = len([n for n in os.listdir(t) if n.endswith(".parquet")])
    deleted = clean_hudi(t, keep_last=1)
    assert deleted
    n_after = len([n for n in os.listdir(t) if n.endswith(".parquet")])
    assert n_after < n_before
    # head still exact; cleaned instants no longer time travel
    assert read_hudi(spark, t).collect()[0].s == "v3"
    with pytest.raises(Exception):
        read_hudi(spark, t, as_of=i1).collect()
    with pytest.raises(ValueError, match="keep_last"):
        clean_hudi(t, keep_last=0)


def test_refusals(spark, tmp_path):
    t = str(tmp_path / "t")
    write_hudi(_df(spark, [(1, "a", 1.0)]), t, record_key="id")
    # record-key mismatch on later writes
    with pytest.raises(ValueError, match="record_key"):
        write_hudi(_df(spark, [(2, "b", 2.0)]), t, record_key="s")
    # an UNKNOWN table type refuses (CoW and MOR both dispatch since r13)
    props = os.path.join(t, ".hoodie", "hoodie.properties")
    body = open(props).read()
    open(props, "w").write(body.replace("COPY_ON_WRITE", "SOME_NEW_TYPE"))
    with pytest.raises(NotImplementedError, match="SOME_NEW_TYPE"):
        read_hudi(spark, t)
    open(props, "w").write(body)
    # a non-spec-shaped .log name refuses on any scan
    log = os.path.join(t, "stray.log")
    open(log, "w").close()
    with pytest.raises(NotImplementedError, match="log file name"):
        read_hudi(spark, t)
    os.remove(log)
    # a spec-shaped log file inside a COPY_ON_WRITE table still refuses
    # (defense in depth for mislabeled tables)
    log2 = os.path.join(t, ".abc123_20260101000000000.log.1_0-0-0")
    open(log2, "w").close()
    with pytest.raises(NotImplementedError, match="COPY_ON_WRITE scan"):
        read_hudi(spark, t)
    os.remove(log2)
    # inflight (never completed) commits are invisible
    hd = os.path.join(t, ".hoodie")
    open(os.path.join(hd, "99999999999999999.inflight"), "w").close()
    assert read_hudi(spark, t).count() == 1
    # conflict: completing an already-completed instant raises
    from sparkstreamingtwitter_presidential_spark.sources.hudi import _complete_instant

    done = [n[:-7] for n in os.listdir(hd) if n.endswith(".commit")][0]
    with pytest.raises(HudiCommitConflict):
        _complete_instant(t, done, {})


def test_lakehouse_facade_routes_to_native_hudi(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.lakehouse import (
        read_lakehouse,
        write_lakehouse,
    )

    t = str(tmp_path / "t")
    df = _df(spark, [(1, "a", 1.0)])
    with pytest.raises(ValueError, match="record_key"):
        write_lakehouse(df, "hudi", t)
    write_lakehouse(df, "hudi", t, record_key="id")
    assert read_lakehouse(spark, "hudi", t).count() == 1


# ------------------------------------------------------ partitioned tables


def test_partitioned_roundtrip_pruning_and_layout(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _df(
        spark,
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0), (4, "c", 4.0)],
    )
    write_hudi(df, t, record_key="id", partition_by="s")
    # hive-style dirs with partition metadata markers; the partition
    # column stays IN the data files (Hudi stores full rows)
    assert os.path.isdir(os.path.join(t, "s=a"))
    assert os.path.isfile(
        os.path.join(t, "s=a", ".hoodie_partition_metadata")
    )
    import pyarrow.parquet as pq

    base = [
        os.path.join(t, "s=a", n)
        for n in os.listdir(os.path.join(t, "s=a"))
        if n.endswith(".parquet")
    ]
    assert "s" in pq.ParquetFile(base[0]).schema_arrow.names
    back = read_hudi(spark, t)
    assert sorted(tuple(r) for r in back.select("id", "s", "v").collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    # meta column records the partition path
    meta = read_hudi(spark, t, keep_meta=True)
    assert {r._hoodie_partition_path for r in meta.collect()} == {
        "s=a",
        "s=b",
        "s=c",
    }
    # exact dir-level pruning
    pruned = read_hudi(spark, t, partition_filter=("a", "a"))
    assert len(pruned.inputFiles()) < len(back.inputFiles())
    assert sorted(r.id for r in pruned.collect()) == [1, 2]
    none = read_hudi(spark, t, partition_filter=("zz", None))
    assert none.count() == 0 and sorted(none.columns) == sorted(df.columns)


def test_partitioned_upsert_targets_partition_groups(spark, tmp_path):
    t = str(tmp_path / "t")
    write_hudi(
        _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "b", 3.0)]),
        t,
        record_key="id",
        partition_by="s",
    )
    from sparkstreamingtwitter_presidential_spark.sources.hudi import _latest_slices

    before = {(p, fid, inst) for p, fid, inst, _ in _latest_slices(t)}
    # update one key in partition b, insert a new key into partition c
    upsert_hudi(spark, t, _df(spark, [(3, "b", 33.0), (9, "c", 9.0)]))
    got = {r.id: (r.s, r.v) for r in read_hudi(spark, t).collect()}
    assert got == {
        1: ("a", 1.0),
        2: ("b", 2.0),
        3: ("b", 33.0),
        9: ("c", 9.0),
    }
    after = {(p, fid, inst) for p, fid, inst, _ in _latest_slices(t)}
    # partition a's slice untouched; b rewritten; c new
    assert {s for s in before if s[0] == "s=a"} <= after
    assert not ({s for s in before if s[0] == "s=b"} & after)
    assert any(s[0] == "s=c" for s in after)
    # incremental after a partitioned upsert pulls exactly the writes
    i0 = hudi_timeline(spark, t).collect()[0].instant
    inc = sorted(
        (r.id, r.v)
        for r in read_hudi_incremental(spark, t, from_instant=i0).collect()
    )
    assert inc == [(3, 33.0), (9, 9.0)]


def test_partitioned_refusals(spark, tmp_path):
    # non-string partition column refuses
    with pytest.raises(NotImplementedError, match="STRING"):
        write_hudi(
            _df(spark, [(1, "a", 1.0)]),
            str(tmp_path / "t1"),
            record_key="id",
            partition_by="v",
        )
    # null partition value refuses
    with pytest.raises(ValueError, match="null partition"):
        write_hudi(
            _df(spark, [(1, None, 1.0)]),
            str(tmp_path / "t2"),
            record_key="id",
            partition_by="s",
        )
    # value needing escaping refuses
    with pytest.raises(NotImplementedError, match="escap"):
        write_hudi(
            _df(spark, [(1, "a/b", 1.0)]),
            str(tmp_path / "t3"),
            record_key="id",
            partition_by="s",
        )
    # partition field fixed at creation
    t4 = str(tmp_path / "t4")
    write_hudi(_df(spark, [(1, "a", 1.0)]), t4, record_key="id", partition_by="s")
    with pytest.raises(ValueError, match="fixed at table creation"):
        write_hudi(
            _df(spark, [(2, "b", 2.0)]), t4, record_key="id", partition_by="id"
        )
    # appends without partition_by inherit the table's spec
    write_hudi(_df(spark, [(2, "b", 2.0)]), t4, record_key="id")
    assert os.path.isdir(os.path.join(t4, "s=b"))
    assert read_hudi(spark, t4).count() == 2


def test_race_loser_stray_slices_invisible(spark, tmp_path):
    """A writer that staged slices but LOST the instant-completion race
    leaves files named with an instant another writer completed; slice
    visibility keys off the completed commit's own file list, so the
    strays never surface (and clean_hudi may later reclaim them)."""
    t = str(tmp_path / "t")
    write_hudi(_df(spark, [(1, "a", 1.0)]), t, record_key="id")
    inst = hudi_timeline(spark, t).collect()[0].instant
    # the loser's stray slice: same completed instant, unknown file id
    import shutil

    real = [n for n in os.listdir(t) if n.endswith(".parquet")][0]
    stray = os.path.join(t, f"deadbeef_0-0-0_{inst}.parquet")
    shutil.copy(os.path.join(t, real), stray)
    got = [tuple(r) for r in read_hudi(spark, t).select("id", "s", "v").collect()]
    assert got == [(1, "a", 1.0)]  # the duplicate row never appears
    # foreign commits WITHOUT write stats fall back to listing
    hd = os.path.join(t, ".hoodie")
    cf = os.path.join(hd, f"{inst}.commit")
    meta = json.load(open(cf))
    del meta["partitionToWriteStats"]
    json.dump(meta, open(cf, "w"))
    assert read_hudi(spark, t).count() == 2  # listing-trust boundary


# ------------------------------------------------ round-8 bulk committer


def test_upsert_job_count_is_constant_in_matched_groups(spark, tmp_path):
    """The bulk committer stages every slice of an upsert in ONE write
    job, so the upsert's TOTAL job count (dup-key check + matched-group
    probe + bulk write, with AQE materializing each shuffle stage as
    its own job) is a constant — invariant in the matched-group count.
    The pre-round-8 per-group staging loop ran one extra job per
    matched group and per insert partition (VERDICT r7 'What's wrong
    #1'): 16 matched groups would add ≥16 jobs over the 2-group run."""

    def run(tag: str, n_file_groups: int, nparts: int) -> int:
        t = str(tmp_path / f"t-{tag}")
        letters = "abcdefgh"[:nparts]
        rows = [(i, letters[i % nparts], float(i)) for i in range(128)]
        write_hudi(
            _df(spark, rows), t, record_key="id", partition_by="s",
            n_file_groups=n_file_groups,
        )
        src = _df(
            spark,
            # touch every group + insert one new key per partition
            [(i, letters[i % nparts], float(i) + 0.5)
             for i in range(0, 128, 2)]
            + [(200 + j, letters[j % nparts], -1.0) for j in range(nparts)],
        )
        sc = spark.sparkContext
        sc.setJobGroup(tag, "bulk committer job bound")
        try:
            upsert_hudi(spark, t, src)
        finally:
            sc.setJobGroup(None, None)
        got = {r.id: (r.s, r.v) for r in read_hudi(spark, t).collect()}
        assert len(got) == 128 + nparts
        for i in range(0, 128, 2):
            assert got[i] == (letters[i % nparts], float(i) + 0.5)
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        _latest_slices,
    )

    small = run("hudi-upsert-jc-small", 1, 2)  # 2 matched groups
    big = run("hudi-upsert-jc-big", 4, 4)  # 16 matched groups
    assert len(_latest_slices(str(tmp_path / "t-hudi-upsert-jc-big"))) >= 16
    assert small <= 16, f"expected a small constant, got {small}"
    # the old loop would add >= 14 jobs going 2 -> 16 matched groups;
    # allow AQE plan-shape slack of a couple of jobs, no more
    assert big <= small + 2, f"jobs grew with group count: {small}->{big}"


def test_upsert_partition_change_routes_delete_plus_insert(spark, tmp_path):
    """A matched source row whose partition column changed must NOT be
    rewritten in place under the old col=val dir (that silently breaks
    read_hudi's exact partition pruning — every row in a dir shares the
    value). It routes as delete-from-old-group + insert-into-new-
    partition, the global-index update-partition-path semantic."""
    t = str(tmp_path / "t")
    write_hudi(
        _df(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)]),
        t,
        record_key="id",
        partition_by="s",
    )
    upsert_hudi(spark, t, _df(spark, [(2, "b", 22.0)]))  # 2 moves a→b
    got = {r.id: (r.s, r.v) for r in read_hudi(spark, t).collect()}
    assert got == {1: ("a", 1.0), 2: ("b", 22.0), 3: ("b", 3.0)}
    # the pruning contract holds for BOTH partitions after the move
    in_a = read_hudi(spark, t, partition_filter=("a", "a"))
    assert sorted(r.id for r in in_a.collect()) == [1]
    in_b = read_hudi(spark, t, partition_filter=("b", "b"))
    assert sorted(r.id for r in in_b.collect()) == [2, 3]
    # meta column agrees with the physical dir
    meta = read_hudi(spark, t, keep_meta=True)
    paths = {r.id: r._hoodie_partition_path for r in meta.collect()}
    assert paths == {1: "s=a", 2: "s=b", 3: "s=b"}


def test_upsert_partition_change_emptying_a_group_replaces_it(
    spark, tmp_path
):
    """If EVERY row of a matched group moves away, the group has no new
    slice; the commit records it in partitionToReplaceFileIds so its
    stale slice stops being selected (no resurrected rows)."""
    t = str(tmp_path / "t")
    write_hudi(
        _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]),
        t,
        record_key="id",
        partition_by="s",
    )
    up = upsert_hudi(spark, t, _df(spark, [(1, "b", 11.0)]))  # empties s=a
    got = {r.id: (r.s, r.v) for r in read_hudi(spark, t).collect()}
    assert got == {1: ("b", 11.0), 2: ("b", 2.0)}
    assert read_hudi(spark, t, partition_filter=("a", "a")).count() == 0
    meta = json.load(open(os.path.join(t, ".hoodie", f"{up}.commit")))
    assert "s=a" in meta.get("partitionToReplaceFileIds", {})
    # time travel BEFORE the move still sees the original placement
    i1 = hudi_timeline(spark, t).collect()[0].instant
    at1 = {r.id: r.s for r in read_hudi(spark, t, as_of=i1).collect()}
    assert at1 == {1: "a", 2: "b"}


def test_write_hudi_runs_one_staging_job(spark, tmp_path):
    """write_hudi with P partitions × G file groups stages all P×G
    slices in ONE job (the bulk-insert committer), not one per slice."""
    t = str(tmp_path / "t")
    rows = [(i, "wxyz"[i % 4], float(i)) for i in range(64)]
    sc = spark.sparkContext
    sc.setJobGroup("hudi-write-jobcount", "bulk insert job bound")
    try:
        write_hudi(
            _df(spark, rows), t, record_key="id", partition_by="s",
            n_file_groups=3,
        )
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("hudi-write-jobcount")
    assert 0 < len(jobs) <= 3, f"expected one staging job, got {len(jobs)}"
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        _latest_slices,
    )

    assert len(_latest_slices(t)) >= 8  # 4 partitions x up-to-3 groups
    back = read_hudi(spark, t)
    assert sorted(tuple(r) for r in back.select("id", "s", "v").collect()) == sorted(
        (i, "wxyz"[i % 4], float(i)) for i in range(64)
    )


# ------------------------------------------------ r8: streaming sink


def test_hudi_sink_markers_and_idempotence(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        last_committed_batch,
    )
    from sparkstreamingtwitter_presidential_spark.streaming import (
        hudi_batch_committer,
    )

    t = str(tmp_path / "t")
    assert last_committed_batch(t, "job") is None  # table doesn't exist
    commit = hudi_batch_committer(t, record_key="id", app_id="job")
    commit(_df(spark, [(1, "a", 1.0)]), 0)
    commit(_df(spark, [(2, "b", 2.0)]), 1)
    n_commits = hudi_timeline(spark, t).count()
    # crash-replay: batches 0 and 1 re-delivered -> skipped, no commit
    commit(_df(spark, [(1, "a", 1.0)]), 0)
    commit(_df(spark, [(2, "b", 2.0)]), 1)
    assert hudi_timeline(spark, t).count() == n_commits
    assert sorted(r.id for r in read_hudi(spark, t).collect()) == [1, 2]
    # fresh batch still lands; markers are per-app
    commit(_df(spark, [(3, "c", 3.0)]), 2)
    assert last_committed_batch(t, "job") == 2
    hudi_batch_committer(t, record_key="id", app_id="job_b")(
        _df(spark, [(9, "z", 9.0)]), 0
    )
    assert read_hudi(spark, t).count() == 4
    assert last_committed_batch(t, "job") == 2  # job_b didn't touch it


def test_hudi_upsert_committer_idempotence_and_collapse(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        last_committed_batch,
    )
    from sparkstreamingtwitter_presidential_spark.streaming import (
        hudi_upsert_committer,
    )

    t = str(tmp_path / "t")
    write_hudi(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t, record_key="id")
    commit = hudi_upsert_committer(spark, t, app_id="up")
    commit(_df(spark, [(1, "A", 11.0), (3, "c", 3.0)]), 0)
    got = {r.id: (r.s, r.v) for r in read_hudi(spark, t).collect()}
    assert got == {1: ("A", 11.0), 2: ("b", 2.0), 3: ("c", 3.0)}
    assert last_committed_batch(t, "up") == 0
    # redelivery is a no-op
    n = hudi_timeline(spark, t).count()
    commit(_df(spark, [(1, "A", 11.0), (3, "c", 3.0)]), 0)
    assert hudi_timeline(spark, t).count() == n
    # order_col collapses to last-change-wins before the upsert
    commit2 = hudi_upsert_committer(spark, t, app_id="up", order_col="v")
    commit2(_df(spark, [(2, "old", 1.0), (2, "new", 99.0)]), 1)
    assert {
        r.s for r in read_hudi(spark, t).filter("id = 2").collect()
    } == {"new"}
    # an EMPTY batch commits nothing and records no marker (a replayed
    # no-op is a no-op; same contract as merge_iceberg)
    commit(_df(spark, []), 2)
    assert last_committed_batch(t, "up") == 1


def test_hudi_sink_stream_equals_batch(spark, tmp_path):
    import shutil
    import uuid as _uuid

    from sparkstreamingtwitter_presidential_spark.io import load_table
    from sparkstreamingtwitter_presidential_spark.queries import streaming as qs
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        last_committed_batch,
    )
    from sparkstreamingtwitter_presidential_spark.sources.replay import (
        read_events_stream,
    )
    from sparkstreamingtwitter_presidential_spark.streaming import (
        write_stream_to_hudi,
    )

    SF_DIR = "/root/testdata/sf0.001"
    staged = qs._staged(spark, SF_DIR)
    run = f"/tmp/hudi_sink_{_uuid.uuid4().hex[:8]}"
    table, ckpt = f"{run}/table", f"{run}/ckpt"
    try:
        stream = read_events_stream(spark, staged, files_per_trigger=1)
        q = write_stream_to_hudi(
            stream, table, ckpt, record_key="event_id", app_id="test_ingest"
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)
        got = read_hudi(spark, table).select(
            "event_id", "user_id", "event_type", "value"
        )
        want = load_table(spark, SF_DIR, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        g = sorted(tuple(r) for r in got.collect())
        w = sorted(tuple(r) for r in want.collect())
        assert g == w and len(g) > 0
        assert last_committed_batch(table, "test_ingest") >= 0
    finally:
        shutil.rmtree(run, ignore_errors=True)


# ------------------------------------------------ r8: timeline archival


def test_archive_timeline_bounds_active_and_guards_reads(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        _archived_instants,
        archive_hudi_timeline,
    )

    t = str(tmp_path / "t")
    i1 = write_hudi(_df(spark, [(1, "a", 1.0)]), t, record_key="id")
    upsert_hudi(spark, t, _df(spark, [(1, "v2", 2.0)]))
    i3 = upsert_hudi(spark, t, _df(spark, [(1, "v3", 3.0)]))
    # nothing archivable while old slices are still selected/uncleaned
    # is fine — i1/i2's slices are superseded (unreachable), so they
    # CAN archive once outside keep_last
    clean_hudi(t, keep_last=1)
    archived = archive_hudi_timeline(t, keep_last=1)
    assert archived and i3 not in archived
    assert _archived_instants(t) == archived
    # active timeline shrank; snapshot read still exact
    assert [r.instant for r in hudi_timeline(spark, t).collect()] == [i3]
    assert read_hudi(spark, t).collect()[0].s == "v3"
    # time travel to the archived instant: its slices were CLEANED, so
    # the completeness guard refuses by name (r14 — archived commits
    # with surviving slices reconstruct instead; see the
    # depends-on-archived test below)
    with pytest.raises(ValueError, match="clean"):
        read_hudi(spark, t, as_of=i1)
    # incremental pulls reaching into the archived prefix work (r14):
    # the archive supplies the touched-group attribution, and the
    # changed key's LATEST state delivers once
    inc_arch = read_hudi_incremental(spark, t, from_instant=i1)
    assert [(r.id, r.s) for r in inc_arch.collect()] == [(1, "v3")]
    # ...but ranges wholly in the active timeline still work
    i4 = upsert_hudi(spark, t, _df(spark, [(1, "v4", 4.0)]))
    inc = read_hudi_incremental(spark, t, from_instant=i3, to_instant=i4)
    assert [(r.id, r.s) for r in inc.collect()] == [(1, "v4")]
    # new commits stay above the archived prefix (monotonic instants)
    assert i4 > max(archived)


def test_archive_refuses_live_slices_and_keeps_contiguity(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        archive_hudi_timeline,
    )

    t = str(tmp_path / "t")
    i1 = write_hudi(_df(spark, [(1, "a", 1.0)]), t, record_key="id")
    write_hudi(_df(spark, [(2, "b", 2.0)]), t, record_key="id")
    write_hudi(_df(spark, [(3, "c", 3.0)]), t, record_key="id")
    # every commit's slice is still SELECTED -> nothing archives, even
    # though keep_last=1 would otherwise allow two
    assert archive_hudi_timeline(t, keep_last=1) == []
    assert read_hudi(spark, t).count() == 3
    # contiguity: i1 live blocks newer candidates too
    upsert_hudi(spark, t, _df(spark, [(2, "B2", 22.0)]))
    clean_hudi(t, keep_last=1)  # retires 2's superseded slice only
    assert archive_hudi_timeline(t, keep_last=1) == []  # i1 still live
    assert sorted(r.s for r in read_hudi(spark, t).collect()) == [
        "B2",
        "a",
        "c",
    ]
    with pytest.raises(ValueError, match="keep_last"):
        archive_hudi_timeline(t, keep_last=0)
    assert i1  # silence lints


def test_archive_protects_newest_streaming_marker(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        archive_hudi_timeline,
        last_committed_batch,
    )
    from sparkstreamingtwitter_presidential_spark.streaming import (
        hudi_batch_committer,
    )

    t = str(tmp_path / "t")
    commit = hudi_batch_committer(t, record_key="id", app_id="job")
    commit(_df(spark, [(1, "a", 1.0)]), 0)
    # marker commit's slice is still live -> protected twice over; make
    # it superseded so ONLY the marker rule protects it
    upsert_hudi(spark, t, _df(spark, [(1, "v2", 2.0)]))
    upsert_hudi(spark, t, _df(spark, [(1, "v3", 3.0)]))
    clean_hudi(t, keep_last=1)
    archived = archive_hudi_timeline(t, keep_last=1)
    # batch 0's commit is the newest marker for app "job": kept, and
    # contiguity means nothing archived at all
    assert archived == []
    assert last_committed_batch(t, "job") == 0  # idempotence intact


def test_archival_guards_as_of_reads_that_depend_on_archived_commits(
    spark, tmp_path
):
    """Time travel to an instant whose snapshot depends on an ARCHIVED
    commit reconstructs EXACTLY (r14 — the archive carries the
    commit's full metadata, folded into selection; pre-r14 this
    refused): a file group whose as-of-latest slice was written by an
    archived commit reads its surviving slice, never silently drops.
    Once clean removes those slices, the completeness guard refuses."""
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        archive_hudi_timeline,
    )

    t = str(tmp_path / "t")
    i1 = write_hudi(_df(spark, [(1, "a", 1.0)]), t, record_key="id")
    i2 = write_hudi(_df(spark, [(2, "b", 2.0)]), t, record_key="id")
    i3 = upsert_hudi(spark, t, _df(spark, [(1, "A3", 3.0)]))
    archived = archive_hudi_timeline(t, keep_last=2)
    assert archived == [i1]  # i1's slice is superseded -> archivable
    # as_of i2's snapshot NEEDS i1 (group 1's latest slice then) —
    # reconstructed from the archive + the surviving slice
    got = sorted(
        (r.id, r.s) for r in read_hudi(spark, t, as_of=i2).collect()
    )
    assert got == [(1, "a"), (2, "b")]
    # time travel TO the archived instant works too
    assert [
        (r.id, r.s) for r in read_hudi(spark, t, as_of=i1).collect()
    ] == [(1, "a")]
    # as_of i3 and HEAD are independent of the archive
    assert sorted(r.id for r in read_hudi(spark, t, as_of=i3).collect()) == [
        1,
        2,
    ]
    # row-level changes of the ARCHIVED commit resolve from the
    # archive's metadata (a pure insert: one 'insert' row)
    ch = hudi_row_changes(spark, t, i1)
    assert [(r.id, r._change_type) for r in ch.collect()] == [(1, "insert")]
    # clean retires i1's superseded slice -> the archived snapshots
    # are now incomplete and refuse via the clean guard
    clean_hudi(t, keep_last=1)
    with pytest.raises(ValueError, match="clean"):
        read_hudi(spark, t, as_of=i2)
    got = {r.id: r.s for r in read_hudi(spark, t).collect()}
    assert got == {1: "A3", 2: "b"}


def test_timeline_include_archived(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        archive_hudi_timeline,
        hudi_timeline,
    )

    t = str(tmp_path / "t")
    i1 = write_hudi(_df(spark, [(1, "a", 1.0)]), t, record_key="id")
    upsert_hudi(spark, t, _df(spark, [(1, "v2", 2.0)]))
    i3 = upsert_hudi(spark, t, _df(spark, [(1, "v3", 3.0)]))
    clean_hudi(t, keep_last=1)
    archived = archive_hudi_timeline(t, keep_last=1)
    assert archived
    active = hudi_timeline(spark, t)
    assert "archived" in active.columns
    assert [r.instant for r in active.collect()] == [i3]
    full = hudi_timeline(spark, t, include_archived=True)
    got = {r.instant: r.archived for r in full.collect()}
    assert got[i3] is False and got[i1] is True
    assert len(got) == 3


# ------------------------------------------ multi-level partitions (r9)


def test_multilevel_partitioned_roundtrip_layout_and_pruning(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        read_hudi,
        write_hudi,
    )

    t = str(tmp_path / "t")
    rows = [(i, f"y{2020 + i % 2}", f"m{i % 3}", float(i)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, y string, m string, v double")
    write_hudi(df, t, record_key="id", partition_by=["y", "m"])
    back = read_hudi(spark, t)
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    # nested a=1/b=2 layout with a depth-2 marker in each leaf
    leaf = os.path.join(t, "y=y2020", "m=m1")
    assert os.path.isdir(leaf)
    marker = open(
        os.path.join(leaf, ".hoodie_partition_metadata")
    ).read()
    assert "partitionDepth=2" in marker
    # dict filter prunes by the INNER field
    pr = read_hudi(spark, t, partition_filter={"m": ("m1", "m1")})
    assert set(r.m for r in pr.collect()) == {"m1"}
    assert len(pr.inputFiles()) < len(back.inputFiles())
    # tuple filter bounds the OUTERMOST field
    pr2 = read_hudi(spark, t, partition_filter=("y2021", "y2021"))
    assert set(r.y for r in pr2.collect()) == {"y2021"}
    # both fields at once
    pr3 = read_hudi(
        spark, t, partition_filter={"y": ("y2020", "y2020"), "m": ("m2", None)}
    )
    assert set((r.y, r.m) for r in pr3.collect()) == {("y2020", "m2")}


def test_multilevel_upsert_moves_and_incremental_exactness(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        _completed_commits,
        read_hudi,
        read_hudi_incremental,
        upsert_hudi,
        write_hudi,
    )

    t = str(tmp_path / "t")
    rows = [(i, f"y{2020 + i % 2}", f"m{i % 3}", float(i)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, y string, m string, v double")
    write_hudi(df, t, record_key="id", partition_by=["y", "m"])
    # id=5 moves from (y2021, m2) stays y2021 but value updated; also
    # move id=4 across BOTH fields; and a fresh insert
    src = spark.createDataFrame(
        [
            (5, "y2021", "m2", 555.0),
            (4, "y2021", "m0", 444.0),  # was (y2020, m1)
            (1000, "y2020", "m0", 1.0),
        ],
        df.schema,
    )
    upsert_hudi(spark, t, src, record_key="id")
    got = {r.id: (r.y, r.m, r.v) for r in read_hudi(spark, t).collect()}
    assert got[5] == ("y2021", "m2", 555.0)
    assert got[4] == ("y2021", "m0", 444.0)
    assert got[1000] == ("y2020", "m0", 1.0)
    assert len(got) == 61
    # incremental pull sees ONLY the changed rows (copied-over rows
    # keep their original commit time)
    commits = _completed_commits(t)
    inc = read_hudi_incremental(spark, t, from_instant=commits[0])
    assert sorted(r.id for r in inc.collect()) == [4, 5, 1000]


def test_multilevel_refusals_and_spec_pinning(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        read_hudi,
        write_hudi,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", "x", 1.0)], "id long, a string, b string, v double"
    )
    write_hudi(df, t, record_key="id", partition_by=["a", "b"])
    # spec pinned at creation
    with pytest.raises(ValueError, match="fixed at table creation"):
        write_hudi(df, t, record_key="id", partition_by=["a"])
    # null in ANY level refuses loudly
    t2 = str(tmp_path / "t2")
    df_null = spark.createDataFrame(
        [(1, "a", None, 1.0)], "id long, a string, b string, v double"
    )
    with pytest.raises(ValueError, match="null partition"):
        write_hudi(df_null, t2, record_key="id", partition_by=["a", "b"])
    # non-string inner level refuses
    df_int = spark.createDataFrame(
        [(1, "a", 2, 1.0)], "id long, a string, b int, v double"
    )
    with pytest.raises(NotImplementedError, match="STRING"):
        write_hudi(df_int, str(tmp_path / "t3"), record_key="id",
                   partition_by=["a", "b"])
    # a foreign non-hive dir under a partition level refuses by name
    os.makedirs(os.path.join(t, "a=a", "junk"), exist_ok=True)
    with pytest.raises(NotImplementedError, match="unrecognized subdirectory"):
        read_hudi(spark, t).collect()


def test_incremental_no_duplicates_on_double_rewrite(spark, tmp_path):
    """r9 fix: a row updated at c1 whose file group is rewritten AGAIN
    at c2 (copied over with its preserved c1 stamp) must deliver ONCE
    — the pull plans from the latest slice per touched group, not
    from every range commit's files. A row updated twice in range
    delivers once with its FINAL value (Hudi incremental semantics)."""
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        _completed_commits,
        read_hudi_incremental,
        upsert_hudi,
        write_hudi,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "x", float(i)) for i in range(10)],
        "id long, s string, v double",
    ).repartition(1)
    write_hudi(df, t, record_key="id")
    c0 = _completed_commits(t)[-1]
    upsert_hudi(
        spark,
        t,
        spark.createDataFrame([(1, "x", 100.0)], "id long, s string, v double"),
        record_key="id",
    )
    c1 = _completed_commits(t)[-1]
    upsert_hudi(
        spark,
        t,
        spark.createDataFrame(
            [(2, "x", 200.0), (1, "x", 111.0)], "id long, s string, v double"
        ),
        record_key="id",
    )
    got = sorted(
        (r.id, r.v)
        for r in read_hudi_incremental(spark, t, from_instant=c0).collect()
    )
    # id=1 once with its FINAL value; id=2 once
    assert got == [(1, 111.0), (2, 200.0)]
    # sub-range ending at c1: only the first update, original value
    got1 = sorted(
        (r.id, r.v)
        for r in read_hudi_incremental(
            spark, t, from_instant=c0, to_instant=c1
        ).collect()
    )
    assert got1 == [(1, 100.0)]


def test_hudi_row_changes_trilogy(spark, tmp_path):
    """The Hudi row_changes member: insert commits need no keys,
    upserts emit pre/post pairs with copy-over silence, a key ABSENT
    from the rewrite emits 'delete' (deletes-by-absence — invisible
    to the commit-time incremental filter), overwrites and unknown
    instants refuse."""
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        _completed_commits,
        hudi_row_changes,
        upsert_hudi,
        write_hudi,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "x", float(i)) for i in range(6)],
        "id long, s string, v double",
    ).repartition(1)
    write_hudi(df, t, record_key="id")
    c0 = _completed_commits(t)[-1]
    ch0 = hudi_row_changes(spark, t, c0)  # pure insert: no keys
    assert sorted((r.id, r._change_type) for r in ch0.collect()) == [
        (i, "insert") for i in range(6)
    ]
    upsert_hudi(
        spark, t,
        spark.createDataFrame(
            [(1, "x", 100.0), (9, "x", 9.0)], "id long, s string, v double"
        ),
        record_key="id",
    )
    c1 = _completed_commits(t)[-1]
    ch1 = hudi_row_changes(spark, t, c1, keys=["id"]).collect()
    assert sorted((r.id, r.v, r._change_type) for r in ch1) == [
        (1, 1.0, "update_preimage"),
        (1, 100.0, "update_postimage"),
        (9, 9.0, "insert"),
    ]
    # cross-partition key move: the old partition's rewrite omits the
    # key (delete-by-absence in that group) while the new partition's
    # slice carries it — the full-outer diff across BOTH touched
    # groups resolves it to one update pre/post pair, not a
    # delete+insert
    tp = str(tmp_path / "tp")
    write_hudi(
        spark.createDataFrame(
            [(1, "p0", 1.0), (2, "p0", 2.0), (3, "p1", 3.0)],
            "id long, s string, v double",
        ).repartition(1),
        tp,
        record_key="id",
        partition_by="s",
    )
    upsert_hudi(
        spark, tp,
        spark.createDataFrame([(2, "p1", 22.0)], "id long, s string, v double"),
        record_key="id",
    )
    cm = _completed_commits(tp)[-1]
    chm = hudi_row_changes(spark, tp, cm, keys=["id"]).collect()
    assert sorted((r.id, r.s, r.v, r._change_type) for r in chm) == [
        (2, "p0", 2.0, "update_preimage"),
        (2, "p1", 22.0, "update_postimage"),
    ]
    with pytest.raises(ValueError, match="not a completed commit"):
        hudi_row_changes(spark, t, "19990101000000000", keys=["id"])
    t2 = str(tmp_path / "t2")
    write_hudi(df, t2, record_key="id")
    write_hudi(
        spark.createDataFrame([(7, "x", 7.0)], "id long, s string, v double"),
        t2,
        record_key="id",
        mode="overwrite",
    )
    c2 = _completed_commits(t2)[-1]
    with pytest.raises(ValueError, match="overwrite"):
        hudi_row_changes(spark, t2, c2, keys=["id"])


def test_hudi_table_changes_range(spark, tmp_path):
    """The Hudi range TVF emits per-commit pre/post chronology (no
    final-state collapse) with per-commit stamps."""
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        _completed_commits,
        hudi_table_changes,
        upsert_hudi,
        write_hudi,
    )

    t = str(tmp_path / "t")
    write_hudi(
        spark.createDataFrame(
            [(1, "x", 1.0), (2, "x", 2.0)], "id long, s string, v double"
        ).repartition(1),
        t,
        record_key="id",
    )
    c0 = _completed_commits(t)[-1]
    upsert_hudi(
        spark, t,
        spark.createDataFrame([(1, "x", 10.0)], "id long, s string, v double"),
        record_key="id",
    )
    upsert_hudi(
        spark, t,
        spark.createDataFrame([(1, "x", 11.0)], "id long, s string, v double"),
        record_key="id",
    )
    ch = hudi_table_changes(spark, t, c0, keys=["id"]).collect()
    pairs = sorted(
        (r._commit_instant, r.v, r._change_type) for r in ch
    )
    vals = [(v, c) for _i, v, c in pairs]
    # per-commit chronology: 1->10 then 10->11 (4 rows, both pairs)
    assert vals == [
        (1.0, "update_preimage"), (10.0, "update_postimage"),
        (10.0, "update_preimage"), (11.0, "update_postimage"),
    ]
    assert hudi_table_changes(spark, t, "99999999999999999").count() == 0


def test_foreign_archived_cow_head_read_folds_archive(spark, tmp_path):
    """A FOREIGN archive can hold the commit that wrote a group's
    latest LIVE slice (our own archiver floors live slices to the
    active timeline; real Hudi archives regardless of liveness). The
    HEAD read must fold the archive in — without it, _latest_slices
    drops the base via `instant not in commits` and the read silently
    returns fewer rows (r15, the round-14 advice's medium finding)."""
    import glob

    t = str(tmp_path / "t")
    i1 = write_hudi(
        _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]),
        t, record_key="id", n_file_groups=2,
    )
    upsert_hudi(spark, t, _df(spark, [(1, "a2", 1.5)]))
    want = sorted((r.id, r.s) for r in read_hudi(spark, t).collect())
    assert want == [(1, "a2"), (2, "b")]
    # forge: move i1 — which wrote row 2's still-live slice — into an
    # archive, exactly what a foreign archiver may do
    hd = os.path.join(t, ".hoodie")
    with open(os.path.join(hd, f"{i1}.commit")) as fh:
        meta = json.load(fh)
    ad = os.path.join(hd, "archived")
    os.makedirs(ad)
    with open(os.path.join(ad, "commits_0.archive"), "w") as fh:
        fh.write(json.dumps({"instant": i1, "metadata": meta}) + "\n")
    for p in glob.glob(os.path.join(hd, f"{i1}.*")):
        os.remove(p)
    got = sorted((r.id, r.s) for r in read_hudi(spark, t).collect())
    assert got == want  # pre-fix: [(1, 'a2')] — row 2 silently gone


def test_archive_parse_is_demand_driven_and_cached(
    spark, tmp_path, monkeypatch
):
    """r15 (verdict items 2-3): reads whose plan never needs archived
    metadata must not parse the archive (a long-lived foreign table's
    archive is GBs of JSON), and when a parse IS needed it happens
    once per archive signature, cached for the session."""
    from sparkstreamingtwitter_presidential_spark.sources import hudi as H
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        archive_hudi_timeline,
    )

    t = str(tmp_path / "t")
    write_hudi(_df(spark, [(1, "a", 1.0)]), t, record_key="id")
    upsert_hudi(spark, t, _df(spark, [(1, "v2", 2.0)]))
    i3 = upsert_hudi(spark, t, _df(spark, [(1, "v3", 3.0)]))
    clean_hudi(t, keep_last=1)
    archived = archive_hudi_timeline(t, keep_last=1)
    assert archived

    # 1. demand gate: HEAD reads, actively-bounded incremental pulls,
    # and new writes never parse the archive (the boundary check reads
    # only the newest file's last line)
    def _boom(path):
        raise AssertionError("archive parsed on a demand-free path")

    monkeypatch.setattr(H, "_archived_commit_metas", _boom)
    assert read_hudi(spark, t).collect()[0].s == "v3"
    i4 = upsert_hudi(spark, t, _df(spark, [(1, "v4", 4.0)]))
    inc = read_hudi_incremental(spark, t, from_instant=max(archived))
    assert [(r.id, r.s) for r in inc.collect()] == [(1, "v4")]
    # row changes of an active instant with clean attribution: no parse
    assert hudi_row_changes(spark, t, i4, keys=["id"]).count() == 2
    monkeypatch.undo()

    # 2. ...while a range reaching BELOW the boundary still folds
    inc_arch = read_hudi_incremental(spark, t, from_instant=archived[0])
    assert [(r.id, r.s) for r in inc_arch.collect()] == [(1, "v4")]

    # 3. caching: the second parse of an unchanged archive is a cache
    # hit (zero json.loads calls), and growing the archive invalidates
    class _CountingJson:
        def __init__(self, real):
            self._real, self.loads_calls = real, 0

        def loads(self, s):
            self.loads_calls += 1
            return self._real.loads(s)

        def __getattr__(self, a):
            return getattr(self._real, a)

    H._ARCHIVE_CACHE.clear()
    wrapper = _CountingJson(json)
    monkeypatch.setattr(H, "json", wrapper)
    first = H._archived_commit_metas(t)
    n_parse = wrapper.loads_calls
    assert n_parse >= len(archived)
    again = H._archived_commit_metas(t)
    assert again is first and wrapper.loads_calls == n_parse
    # instants derive from the same cache — still zero new parses
    assert H._archived_instants(t) == sorted(first)
    assert wrapper.loads_calls == n_parse
    # growing the archive (new signature) re-parses exactly once
    ad = os.path.join(t, ".hoodie", "archived")
    with open(os.path.join(ad, "commits_1.archive"), "w") as fh:
        fh.write(
            json.dumps({"instant": "00000000000000000", "metadata": {}})
            + "\n"
        )
    grown = H._archived_commit_metas(t)
    assert "00000000000000000" in grown
    assert wrapper.loads_calls > n_parse


def test_clean_removes_replaced_groups(spark, tmp_path):
    """r15: clean retires REPLACED groups once their instants age out
    of keep_last — before this, every overwrite leaked its replaced
    files on disk forever. Time travel to the replaced state then
    refuses by name (the documented clean trade), never partial rows."""
    t = str(tmp_path / "t")
    i1 = write_hudi(
        _df(spark, [(i, f"s{i}", float(i)) for i in range(8)]),
        t, record_key="id", n_file_groups=2,
    )
    newbase = _df(spark, [(100, "fresh", 1.0)])
    write_hudi(newbase, t, record_key="id", mode="overwrite")
    # replaced files still on disk (time travel works pre-clean)
    assert sorted(r.id for r in read_hudi(spark, t, as_of=i1).collect()) == list(range(8))
    deleted = clean_hudi(t, keep_last=1)
    walked = [
        n
        for _d, _s, files in os.walk(t)
        for n in files
        if n.endswith(".parquet") and f"_{i1}." in n
    ]
    assert not walked, f"replaced slices leaked past clean: {walked}"
    assert len(deleted) == 2  # both replaced groups' bases
    assert sorted(tuple(r) for r in read_hudi(spark, t).collect()) == [
        (100, "fresh", 1.0)
    ]
    with pytest.raises(ValueError, match="clean|no file slices|time-travel"):
        read_hudi(spark, t, as_of=i1).collect()


def test_cluster_hudi_small_file_compaction(spark, tmp_path):
    """r15: CLUSTERING — partitions with >= min_groups live groups
    rewrite into ONE sorted group under a replace-style CLUSTER
    commit; rows keep their original stamps, so incremental pulls and
    row changes see NOTHING, time travel below the instant selects the
    old layout, and clean retires the replaced groups."""
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        cluster_hudi,
        hudi_row_changes,
        hudi_timeline,
        read_hudi_incremental,
    )

    t = str(tmp_path / "t")
    i1 = write_hudi(
        _df(spark, [(i, f"s{i}", float(i)) for i in range(12)]),
        t, record_key="id", n_file_groups=4,
    )
    before = sorted(tuple(r) for r in read_hudi(spark, t).collect())
    ci = cluster_hudi(spark, t, sort_by=["id"])
    assert ci is not None and ci > i1
    # data identical, one live group, file physically sorted by id
    assert sorted(tuple(r) for r in read_hudi(spark, t).collect()) == before
    live = read_hudi(spark, t).inputFiles()
    assert len(live) == 1
    import pyarrow.parquet as pq

    ids = pq.read_table(live[0].replace("file://", "")).column("id").to_pylist()
    assert ids == sorted(ids), "clustered file must be sorted by sort_by"
    # original stamps preserved -> the feed surfaces are silent
    assert read_hudi_incremental(spark, t, from_instant=i1).count() == 0
    assert hudi_row_changes(spark, t, ci, keys=["id"]).count() == 0
    ops = [r.operation for r in hudi_timeline(spark, t).collect()]
    assert ops == ["INSERT", "CLUSTER"]
    # time travel below the cluster instant selects the OLD layout
    assert len(read_hudi(spark, t, as_of=i1).inputFiles()) == 4
    # clean retires the replaced groups; reads stay exact
    deleted = clean_hudi(t, keep_last=1)
    assert len([n for n in deleted if n.endswith(".parquet")]) == 4
    assert sorted(tuple(r) for r in read_hudi(spark, t).collect()) == before
    # a single-group table has nothing to cluster
    assert cluster_hudi(spark, t) is None


def test_cluster_hudi_partitioned_and_mor(spark, tmp_path):
    """Partitioned clustering folds each partition independently; MOR
    tables cluster only when fully compacted (dirty slices refuse by
    name), and the compacted cluster reads exactly."""
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        cluster_hudi,
    )
    from sparkstreamingtwitter_presidential_spark.sources.hudi_mor import (
        compact_hudi,
        upsert_hudi_mor,
    )

    t = str(tmp_path / "tp")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(12)],
        "id long, p string, v double",
    )
    write_hudi(df, t, record_key="id", n_file_groups=3, partition_by="p")
    before = sorted(tuple(r) for r in read_hudi(spark, t).collect())
    ci = cluster_hudi(spark, t, sort_by="v")
    assert ci is not None
    assert sorted(tuple(r) for r in read_hudi(spark, t).collect()) == before
    files = read_hudi(spark, t).inputFiles()
    assert len(files) == 2, "one clustered group per partition"

    # MOR: dirty slices refuse with the compact steer
    tm = str(tmp_path / "tm")
    write_hudi(
        _df(spark, [(i, f"s{i}", float(i)) for i in range(8)]),
        tm, record_key="id", n_file_groups=3,
        table_type="MERGE_ON_READ",
    )
    upsert_hudi_mor(spark, tm, _df(spark, [(3, "u3", 33.0)]))
    with pytest.raises(NotImplementedError, match="compact"):
        cluster_hudi(spark, tm)
    compact_hudi(spark, tm)
    want = sorted(tuple(r) for r in read_hudi(spark, tm).collect())
    assert cluster_hudi(spark, tm) is not None
    assert sorted(tuple(r) for r in read_hudi(spark, tm).collect()) == want
    assert len(read_hudi(spark, tm).inputFiles()) == 1


def test_cow_precombine_ordering_upsert(spark, tmp_path):
    """r15: ordering-keyed CoW upserts — DefaultHoodieRecordPayload at
    write time: a stale source row loses (copied over unchanged, no
    new stamp — the change surfaces stay silent), a fresh one wins,
    ties go to the later write, and a stale partition move stays put."""
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        hudi_row_changes,
        read_hudi_incremental,
    )

    t = str(tmp_path / "t")
    i1 = write_hudi(
        _df(spark, [(i, f"s{i}", float(i) + 10) for i in range(8)]),
        t, record_key="id", n_file_groups=2, precombine="v",
    )
    # fresh wins
    upsert_hudi(spark, t, _df(spark, [(3, "hi3", 99.0)]))
    # stale loses (vs the fresh log... vs the winning row AND a base row)
    i3 = upsert_hudi(
        spark, t, _df(spark, [(3, "lo3", 1.0), (5, "lo5", 1.0)])
    )
    # tie goes to the later write
    upsert_hudi(spark, t, _df(spark, [(6, "tie6", 16.0)]))
    snap = {r.id: (r.s, r.v) for r in read_hudi(spark, t).collect()}
    assert snap[3] == ("hi3", 99.0), "stale upsert must lose"
    assert snap[5] == ("s5", 15.0), "stale upsert must lose to the base"
    assert snap[6] == ("tie6", 16.0), "ordering tie goes to the later write"
    # the losing commit is silent on every change surface
    assert hudi_row_changes(spark, t, i3, keys=["id"]).count() == 0
    inc = sorted(
        tuple(r)
        for r in read_hudi_incremental(spark, t, from_instant=i1)
        .select("id", "s", "v")
        .collect()
    )
    assert inc == [(3, "hi3", 99.0), (6, "tie6", 16.0)]
    # a mixed commit applies per-row: one row wins, one loses
    upsert_hudi(spark, t, _df(spark, [(0, "w0", 50.0), (1, "l1", 0.5)]))
    snap = {r.id: (r.s, r.v) for r in read_hudi(spark, t).collect()}
    assert snap[0] == ("w0", 50.0) and snap[1] == ("s1", 11.0)


def test_cow_precombine_stale_partition_move_stays(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        write_hudi as _wh,
    )

    t = str(tmp_path / "tp")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", float(i) + 10) for i in range(8)],
        "id long, p string, v double",
    )
    _wh(df, t, record_key="id", partition_by="p", precombine="v")
    ups = spark.createDataFrame(
        [(2, "b", 1.0), (4, "b", 99.0)], "id long, p string, v double"
    )
    upsert_hudi(spark, t, ups)
    got = {r.id: (r.p, r.v) for r in read_hudi(spark, t).collect()}
    assert got[2] == ("a", 12.0), "stale moved row must stay put"
    assert got[4] == ("b", 99.0), "fresh moved row must land in p=b"
    assert len(got) == 8, "no duplicated keys across partitions"


def test_delete_hudi_cow(spark, tmp_path):
    """r15: explicit CoW DELETE — matched groups rewrite without the
    deleted rows (survivors keep their stamps, so incremental pulls
    stay silent), hudi_row_changes derives exact 'delete' rows from
    the absence, absent keys no-op, and MOR dispatch appends delete
    blocks."""
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        delete_hudi,
        hudi_row_changes,
        hudi_timeline,
        read_hudi_incremental,
    )

    t = str(tmp_path / "t")
    i1 = write_hudi(
        _df(spark, [(i, f"s{i}", float(i)) for i in range(8)]),
        t, record_key="id", n_file_groups=2,
    )
    d = delete_hudi(spark, t, spark.createDataFrame([(3,), (5,)], "id long"))
    assert d is not None
    assert sorted(r.id for r in read_hudi(spark, t).collect()) == [
        0, 1, 2, 4, 6, 7,
    ]
    ops = [r.operation for r in hudi_timeline(spark, t).collect()]
    assert ops == ["INSERT", "DELETE"]
    # survivors copied with ORIGINAL stamps: the pull sees nothing
    assert read_hudi_incremental(spark, t, from_instant=i1).count() == 0
    ch = {
        (r.id, r._change_type): r.s
        for r in hudi_row_changes(spark, t, d, keys=["id"]).collect()
    }
    assert ch == {(3, "delete"): "s3", (5, "delete"): "s5"}
    # keys already absent: no commit at all
    n = len(hudi_timeline(spark, t).collect())
    assert delete_hudi(spark, t, spark.createDataFrame([(99,)], "id long")) is None
    assert len(hudi_timeline(spark, t).collect()) == n
    # MOR dispatch
    tm = str(tmp_path / "tm")
    write_hudi(
        _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), tm,
        record_key="id", table_type="MERGE_ON_READ",
    )
    assert delete_hudi(spark, tm, spark.createDataFrame([(1,)], "id long"))
    assert [r.id for r in read_hudi(spark, tm).collect()] == [2]


def test_delete_hudi_empties_group(spark, tmp_path):
    """Deleting a group's every row records the group in
    partitionToReplaceFileIds (no write stat), the change feed still
    emits its 'delete' rows (the r15 emptied-group fix in
    hudi_row_changes), and clean retires the dead base."""
    from sparkstreamingtwitter_presidential_spark.sources.hudi import (
        delete_hudi,
        hudi_row_changes,
    )

    t = str(tmp_path / "t")
    write_hudi(
        _df(spark, [(i, f"s{i}", float(i)) for i in range(8)]),
        t, record_key="id", n_file_groups=2,
    )
    snap = read_hudi(spark, t, keep_meta=True)
    by_fid = {}
    for r in snap.collect():
        by_fid.setdefault(r._hoodie_file_name.split("_")[0], []).append(r.id)
    victim_fid, victim_ids = sorted(by_fid.items())[0]
    d = delete_hudi(
        spark, t,
        spark.createDataFrame([(i,) for i in victim_ids], "id long"),
    )
    meta = json.load(
        open(os.path.join(t, ".hoodie", f"{d}.commit"))
    )
    assert meta["partitionToReplaceFileIds"] == {"": [victim_fid]}
    assert meta["partitionToWriteStats"] == {}
    survivors = sorted(r.id for r in read_hudi(spark, t).collect())
    assert survivors == sorted(set(range(8)) - set(victim_ids))
    ch = {
        (r.id, r._change_type)
        for r in hudi_row_changes(spark, t, d, keys=["id"]).collect()
    }
    assert ch == {(i, "delete") for i in victim_ids}
    deleted = clean_hudi(t, keep_last=1)
    assert len(deleted) == 1, "the emptied group's base must retire"
    assert sorted(r.id for r in read_hudi(spark, t).collect()) == survivors
