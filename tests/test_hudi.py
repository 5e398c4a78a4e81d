"""Native Hudi CoW (sources/hudi.py): timeline + file-slice layout
roundtrip, record-key upserts (file-group targeting), time travel,
incremental pull, rollback, clean, and the honest refusal boundary
(MOR tables/log files, missing record key, bad file names)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.sources.hudi import (
    HudiCommitConflict,
    clean_hudi,
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
    # MOR table type refuses
    props = os.path.join(t, ".hoodie", "hoodie.properties")
    body = open(props).read()
    open(props, "w").write(body.replace("COPY_ON_WRITE", "MERGE_ON_READ"))
    with pytest.raises(NotImplementedError, match="MERGE_ON_READ"):
        read_hudi(spark, t)
    open(props, "w").write(body)
    # a stray .log file (MOR remnant) refuses
    log = os.path.join(t, "stray.log")
    open(log, "w").close()
    with pytest.raises(NotImplementedError, match="log files"):
        read_hudi(spark, t)
    os.remove(log)
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
