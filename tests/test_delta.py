"""Native Delta Lake connector tests: log replay, snapshot reads, time
travel, partition recovery, overwrite tombstones, checkpoint handling,
commit-race behavior, and protocol-version refusal."""

from __future__ import annotations

import json
import os

import pytest

from sparkstreamingtwitter_presidential_spark.sources.delta import (
    delta_history,
    read_delta,
    table_version,
    write_delta,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, v double")


def _rows(df):
    return sorted((r["id"], r["grp"], r["v"]) for r in df.collect())


def test_roundtrip_and_append(spark, tmp_path):
    t = str(tmp_path / "t")
    assert write_delta(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t) == 0
    assert _rows(read_delta(spark, t)) == [(1, "a", 1.0), (2, "b", 2.0)]
    assert write_delta(_df(spark, [(3, "a", 3.0)]), t) == 1
    assert _rows(read_delta(spark, t)) == [
        (1, "a", 1.0),
        (2, "b", 2.0),
        (3, "a", 3.0),
    ]
    assert table_version(t) == 1


def test_overwrite_tombstones_previous_files(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a", 1.0)]), t)
    write_delta(_df(spark, [(9, "z", 9.0)]), t, mode="overwrite")
    assert _rows(read_delta(spark, t)) == [(9, "z", 9.0)]
    # the old parquet is tombstoned in the log, not deleted from disk
    log = os.path.join(t, "_delta_log", f"{1:020d}.json")
    actions = [json.loads(x) for x in open(log) if x.strip()]
    assert any("remove" in a for a in actions)


def test_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a", 1.0)]), t)
    write_delta(_df(spark, [(2, "b", 2.0)]), t)
    write_delta(_df(spark, [(9, "z", 9.0)]), t, mode="overwrite")
    assert _rows(read_delta(spark, t, version=0)) == [(1, "a", 1.0)]
    assert _rows(read_delta(spark, t, version=1)) == [(1, "a", 1.0), (2, "b", 2.0)]
    assert _rows(read_delta(spark, t)) == [(9, "z", 9.0)]
    with pytest.raises(ValueError, match="version 7"):
        read_delta(spark, t, version=7)


def test_partitioned_write_recovers_values_and_types(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, None, 3.0)])
    write_delta(df, t, partition_by=["grp"])
    got = read_delta(spark, t)
    assert dict(got.dtypes)["grp"] == "string"
    assert _rows(got) == [(1, "a", 1.0), (2, "b", 2.0), (3, None, 3.0)]
    # appends inherit the table's partitioning; mismatch is rejected
    with pytest.raises(ValueError, match="partition_by"):
        write_delta(_df(spark, [(4, "c", 4.0)]), t, partition_by=["id"])
    write_delta(_df(spark, [(4, "c", 4.0)]), t)
    assert (4, "c", 4.0) in _rows(read_delta(spark, t))


def test_history_records_operations(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a", 1.0)]), t)
    write_delta(_df(spark, [(2, "b", 2.0)]), t, mode="overwrite")
    hist = delta_history(t)
    assert [h["version"] for h in hist] == [1, 0]
    assert all(h["operation"] == "WRITE" for h in hist)
    assert hist[0]["operationParameters"]["mode"] == "overwrite"


def test_commit_race_bumps_version(spark, tmp_path):
    """put-if-absent: if someone claims version N first, the writer
    retries at N+1 instead of clobbering."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a", 1.0)]), t)
    blocker = os.path.join(t, "_delta_log", f"{1:020d}.json")
    with open(blocker, "w") as f:
        f.write(json.dumps({"commitInfo": {"operation": "SQUATTER"}}) + "\n")
    v = write_delta(_df(spark, [(2, "b", 2.0)]), t)
    assert v == 2
    assert (2, "b", 2.0) in _rows(read_delta(spark, t))


def _race(monkeypatch, t, version, actions=None):
    """Make the NEXT write_delta lose the commit race: squat the target
    version file after the writer has replayed the log and staged its
    data (the only window where a real race can happen), by hooking
    _stage_files. One-shot — subsequent writes run unraced."""
    import sparkstreamingtwitter_presidential_spark.sources.delta as dmod

    real_stage = dmod._stage_files
    lines = actions or [{"commitInfo": {"operation": "RACER"}}]

    def racing_stage(df, path, partition_by):
        adds = real_stage(df, path, partition_by)
        fpath = os.path.join(t, "_delta_log", f"{version:020d}.json")
        if not os.path.exists(fpath):
            with open(fpath, "w") as f:
                f.writelines(json.dumps(a) + "\n" for a in lines)
        monkeypatch.setattr(dmod, "_stage_files", real_stage)
        return adds

    monkeypatch.setattr(dmod, "_stage_files", racing_stage)


def test_commit_race_append_retries_next_version(spark, monkeypatch, tmp_path):
    """Appends commute: a lost race re-validates against the fresh log
    and lands at the next version."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a", 1.0)]), t)
    _race(monkeypatch, t, 1)
    v = write_delta(_df(spark, [(2, "b", 2.0)]), t)
    assert v == 2
    assert (2, "b", 2.0) in _rows(read_delta(spark, t))


def test_commit_race_overwrite_conflicts(spark, monkeypatch, tmp_path):
    """An overwrite's remove set is derived from the pre-race snapshot;
    replaying it blindly after losing the race could tombstone files it
    never saw — must raise instead of retrying."""
    from sparkstreamingtwitter_presidential_spark.sources.delta import DeltaCommitConflict

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a", 1.0)]), t)
    _race(monkeypatch, t, 1)
    with pytest.raises(DeltaCommitConflict, match="overwrite"):
        write_delta(_df(spark, [(9, "z", 9.0)]), t, mode="overwrite")


def test_commit_race_create_conflicts(spark, monkeypatch, tmp_path):
    """Two writers both creating the table would land two
    protocol/metaData pairs with possibly divergent schemas — the loser
    must raise, not append a second table definition."""
    from sparkstreamingtwitter_presidential_spark.sources.delta import DeltaCommitConflict

    t = str(tmp_path / "t")
    os.makedirs(os.path.join(t, "_delta_log"))
    # the "other writer" wins version 0 with a full table definition
    _race(
        monkeypatch,
        t,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "other",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": _df(spark, [(1, "a", 1.0)]).schema.json(),
                    "partitionColumns": [],
                    "configuration": {},
                }
            },
        ],
    )
    with pytest.raises(DeltaCommitConflict, match="created concurrently"):
        write_delta(_df(spark, [(1, "a", 1.0)]), t)


def test_commit_race_same_appid_txn_conflicts(spark, monkeypatch, tmp_path):
    """Two at-least-once writers sharing an app_id can both pass the
    last_txn_version pre-check; the race loser must detect the already
    durable batch and refuse to double-append."""
    from sparkstreamingtwitter_presidential_spark.sources.delta import DeltaCommitConflict

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a", 1.0)]), t)
    # racing writer commits batch 5 for app "etl" at version 1 first
    racer = [
        {"txn": {"appId": "etl", "version": 5}},
        {"commitInfo": {"operation": "WRITE"}},
    ]
    _race(monkeypatch, t, 1, racer)
    with pytest.raises(DeltaCommitConflict, match="already durable"):
        write_delta(_df(spark, [(2, "b", 2.0)]), t, txn=("etl", 5))
    # a LATER batch for the same app retries cleanly (appends commute)
    _race(monkeypatch, t, 2, [{"commitInfo": {"operation": "RACER"}}])
    assert write_delta(_df(spark, [(3, "c", 3.0)]), t, txn=("etl", 6)) == 3


def test_checkpoint_replaces_prior_commits(spark, tmp_path):
    """Reader must bootstrap from a parquet checkpoint and only replay
    JSON commits after it (the real protocol's log-compaction path)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a", 1.0)]), t)
    write_delta(_df(spark, [(2, "b", 2.0)]), t)
    log = os.path.join(t, "_delta_log")
    # build the checkpoint from the live v1 state
    actions = []
    for n in sorted(os.listdir(log)):
        if n.endswith(".json"):
            actions += [json.loads(x) for x in open(os.path.join(log, n)) if x.strip()]
    cols: dict[str, list] = {"protocol": [], "metaData": [], "add": [], "remove": []}
    recs = [a for a in actions if any(k in a for k in cols)]
    for a in recs:
        # pyarrow cannot write empty-struct columns; these metaData
        # fields are not consulted by the reader
        if "metaData" in a:
            a["metaData"].pop("configuration", None)
            a["metaData"].pop("format", None)
        if "add" in a and not a["add"].get("partitionValues"):
            a["add"].pop("partitionValues", None)
        for k in cols:
            cols[k].append(a.get(k))
    pq.write_table(
        pa.table(cols), os.path.join(log, f"{1:020d}.checkpoint.parquet")
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        f.write(json.dumps({"version": 1, "size": len(recs)}))
    # delete the JSON commits the checkpoint subsumes
    os.unlink(os.path.join(log, f"{0:020d}.json"))
    os.unlink(os.path.join(log, f"{1:020d}.json"))
    assert _rows(read_delta(spark, t)) == [(1, "a", 1.0), (2, "b", 2.0)]
    # and commits after the checkpoint still apply on top
    write_delta(_df(spark, [(3, "c", 3.0)]), t)
    assert (3, "c", 3.0) in _rows(read_delta(spark, t))


def test_unsupported_reader_protocol_refused(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a", 1.0)]), t)
    log = os.path.join(t, "_delta_log", f"{1:020d}.json")
    with open(log, "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "readerFeatures": ["typeWidening"],
                    }
                }
            )
            + "\n"
        )
    # deletionVectors, columnMapping and v2Checkpoint read (r8/r9);
    # anything else still refuses by version+features
    with pytest.raises(NotImplementedError, match="typeWidening"):
        read_delta(spark, t)


def test_not_a_delta_table(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_delta(spark, str(tmp_path / "nope"))


def test_lakehouse_facade_falls_back_to_native_delta(spark, tmp_path):
    """Without the delta jar on the classpath, the generic facade must
    route to the native implementation instead of raising."""
    from sparkstreamingtwitter_presidential_spark.sources.lakehouse import (
        read_lakehouse,
        write_lakehouse,
    )

    t = str(tmp_path / "t")
    write_lakehouse(_df(spark, [(1, "a", 1.0)]), "delta", t)
    assert _rows(read_lakehouse(spark, "delta", t)) == [(1, "a", 1.0)]
    # iceberg ALSO routes native since r6 — on a delta path it reports
    # a missing iceberg layout, not a missing jar
    with pytest.raises(FileNotFoundError, match="not an Iceberg table"):
        read_lakehouse(spark, "iceberg", t)
    # hudi routes native since r7 — a delta path reports a missing
    # Hudi layout, not a missing jar
    with pytest.raises(FileNotFoundError, match="not a Hudi table"):
        read_lakehouse(spark, "hudi", t)


def test_column_mapped_table_reads_by_physical_name(spark, tmp_path):
    """Reader v2/v3 column mapping (name mode — the Databricks
    default): data files store PHYSICAL column names; the log's
    schemaString carries logical names with
    delta.columnMapping.physicalName metadata. Reads scan under the
    physical names and alias to logical; writes and DML (r10) stage
    under physical names; vacuum (path-only) still works."""
    import json as _json

    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        read_delta,
        write_delta,
    )
    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        delete_delta,
    )

    t = str(tmp_path / "t")
    # stage a table whose FILES carry physical names
    phys = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)],
        "`col-abc123` long, `col-def456` string, `col-ghi789` double",
    )
    write_delta(phys, t)
    # forge the mapped metadata: logical names + physicalName metadata
    log = os.path.join(t, "_delta_log", "00000000000000000000.json")
    out = []
    logical = [("id", "col-abc123"), ("s", "col-def456"), ("v", "col-ghi789")]
    for ln in open(log).read().splitlines():
        act = _json.loads(ln)
        if "protocol" in act:
            act["protocol"]["minReaderVersion"] = 2
        if "metaData" in act:
            sch = _json.loads(act["metaData"]["schemaString"])
            for f, (lname, pname) in zip(sch["fields"], logical):
                assert f["name"] == pname
                f["name"] = lname
                f["metadata"] = {
                    "delta.columnMapping.id": logical.index((lname, pname)) + 1,
                    "delta.columnMapping.physicalName": pname,
                }
            act["metaData"]["schemaString"] = _json.dumps(sch)
            act["metaData"]["configuration"] = {
                "delta.columnMapping.mode": "name"
            }
        out.append(_json.dumps(act))
    open(log, "w").write("\n".join(out) + "\n")

    back = read_delta(spark, t)
    assert back.columns == ["id", "s", "v"]
    assert sorted((r.id, r.s, r.v) for r in back.collect()) == [
        (1, "a", 1.0),
        (2, "b", 2.0),
    ]
    # appends stage under PHYSICAL names since r9; DML still refuses;
    # vacuum is path-only and allowed
    write_delta(
        spark.createDataFrame([(3, "c", 3.0)], "id long, s string, v double"),
        t,
    )
    assert sorted((r.id, r.s, r.v) for r in read_delta(spark, t).collect()) == [
        (1, "a", 1.0),
        (2, "b", 2.0),
        (3, "c", 3.0),
    ]
    import pyarrow.parquet as _pq

    newest = max(
        (
            os.path.join(t, n)
            for n in os.listdir(t)
            if n.endswith(".parquet")
        ),
        key=os.path.getmtime,
    )
    assert set(_pq.ParquetFile(newest).schema_arrow.names) == {
        "col-abc123",
        "col-def456",
        "col-ghi789",
    }
    # DML works through the mapping since r10 (see test_delta_mapped_dml)
    delete_delta(spark, t, "id = 1")
    assert sorted(r.id for r in read_delta(spark, t).collect()) == [2, 3]
    # schema evolution mints a fresh physical name + next id (r10)
    write_delta(
        spark.createDataFrame(
            [(4, "d", 4.0, 7)], "id long, s string, v double, extra int"
        ),
        t,
        merge_schema=True,
    )
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        _column_mapping as _cm,
        _mapping_field_ids as _mfi,
        _replay_log as _rl2,
    )

    snap2 = _rl2(t, None)
    m2 = _cm(snap2)
    assert m2 is not None and m2["extra"].startswith("col-")
    assert _mfi(snap2)["extra"] == 4
    cfg2 = (snap2.metadata_action or {}).get("configuration") or {}
    assert cfg2.get("delta.columnMapping.maxColumnId") == "4"
    got = sorted(
        (r.id, r.extra) for r in read_delta(spark, t).collect()
    )
    assert got == [(2, None), (3, None), (4, 7)]
    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        vacuum_delta,
    )

    assert vacuum_delta(t) == []
    # reader v3 with columnMapping + deletionVectors both reads (r9);
    # any feature beyond that pair still refuses
    out2 = []
    for ln in open(log).read().splitlines():
        act = _json.loads(ln)
        if "protocol" in act:
            act["protocol"] = {
                "minReaderVersion": 3,
                "readerFeatures": ["columnMapping", "deletionVectors"],
            }
        out2.append(_json.dumps(act))
    open(log, "w").write("\n".join(out2) + "\n")
    # incl. the r9 append + the r10 evolved append, minus the DELETE
    assert read_delta(spark, t).count() == 3
    out3 = []
    for ln in open(log).read().splitlines():
        act = _json.loads(ln)
        if "protocol" in act:
            act["protocol"] = {
                "minReaderVersion": 3,
                "readerFeatures": ["columnMapping", "typeWidening"],
            }
        out3.append(_json.dumps(act))
    open(log, "w").write("\n".join(out3) + "\n")
    with pytest.raises(NotImplementedError, match="reader protocol"):
        read_delta(spark, t).collect()


def test_column_mapped_stats_skipping(spark, tmp_path):
    """Mapped tables get file skipping too (r9 — r8 verdict stretch):
    stats JSON keys are PHYSICAL names, so logical-keyed skip_ranges
    translate through the mapping before comparing; the pruned read
    still returns exactly the filtered rows."""
    import json as _json

    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        read_delta,
        write_delta,
    )

    t = str(tmp_path / "t")
    # two appends -> two files with disjoint id ranges in their stats
    write_delta(
        spark.createDataFrame(
            [(i, f"r{i:03d}") for i in range(100)],
            "`col-abc123` long, `col-def456` string",
        ).coalesce(1),
        t,
    )
    write_delta(
        spark.createDataFrame(
            [(i, f"r{i:03d}") for i in range(100, 200)],
            "`col-abc123` long, `col-def456` string",
        ).coalesce(1),
        t,
        mode="append",
    )
    log = os.path.join(t, "_delta_log", "00000000000000000000.json")
    logical = [("id", "col-abc123"), ("s", "col-def456")]
    out = []
    for ln in open(log).read().splitlines():
        act = _json.loads(ln)
        if "protocol" in act:
            act["protocol"]["minReaderVersion"] = 2
        if "metaData" in act:
            sch = _json.loads(act["metaData"]["schemaString"])
            for f, (lname, pname) in zip(sch["fields"], logical):
                f["name"] = lname
                f["metadata"] = {
                    "delta.columnMapping.id": logical.index((lname, pname))
                    + 1,
                    "delta.columnMapping.physicalName": pname,
                }
            act["metaData"]["schemaString"] = _json.dumps(sch)
            act["metaData"]["configuration"] = {
                "delta.columnMapping.mode": "name"
            }
        out.append(_json.dumps(act))
    open(log, "w").write("\n".join(out) + "\n")

    full = read_delta(spark, t)
    assert len(full.inputFiles()) == 2
    pruned = read_delta(spark, t, skip_ranges={"id": (120, 150)})
    assert len(pruned.inputFiles()) == 1
    got = sorted(
        r.id for r in pruned.filter("id BETWEEN 120 AND 150").collect()
    )
    assert got == list(range(120, 151))
    # unknown logical names prove nothing and keep every file
    assert len(
        read_delta(spark, t, skip_ranges={"nope": (1, 2)}).inputFiles()
    ) == 2


def test_create_column_mapped_table_native(spark, tmp_path):
    """r9: write_delta(column_mapping='name') creates a mapped table
    natively — physical col-<uuid> names in the data files, logical
    schema + mapping metadata in schemaString, reader v2 protocol —
    and the full write/append/overwrite/read/skip surface works."""
    import pyarrow.parquet as pq

    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        _column_mapping,
        _replay_log,
    )

    t = str(tmp_path / "t")
    df = _df(spark, [(1, "a", 1.0), (2, "b", 2.0)])
    assert write_delta(df, t, column_mapping="name") == 0
    snap = _replay_log(t, None)
    mapping = _column_mapping(snap)
    assert mapping is not None and set(mapping) == {"id", "grp", "v"}
    assert all(p.startswith("col-") for p in mapping.values())
    assert snap.protocol_action["minReaderVersion"] == 2
    # data files carry ONLY physical names
    for p in snap.files:
        names = set(pq.ParquetFile(os.path.join(t, p)).schema_arrow.names)
        assert names == set(mapping.values())
    assert _rows(read_delta(spark, t)) == [(1, "a", 1.0), (2, "b", 2.0)]
    # append + overwrite + stats skipping through the mapping
    write_delta(_df(spark, [(100, "c", 3.0)]), t)
    assert _rows(read_delta(spark, t)) == [
        (1, "a", 1.0),
        (2, "b", 2.0),
        (100, "c", 3.0),
    ]
    pruned = read_delta(spark, t, skip_ranges={"id": (100, 100)})
    assert len(pruned.inputFiles()) == 1
    write_delta(_df(spark, [(9, "z", 9.0)]), t, mode="overwrite")
    assert _rows(read_delta(spark, t)) == [(9, "z", 9.0)]
    # column_mapping is a creation-time property
    with pytest.raises(ValueError, match="table creation"):
        write_delta(df, t, column_mapping="name")
    with pytest.raises(NotImplementedError, match="name mode only"):
        write_delta(df, str(tmp_path / "t2"), column_mapping="id")


def test_create_column_mapped_partitioned_table(spark, tmp_path):
    """Partition dirs and add.partitionValues use PHYSICAL names on a
    mapped table; metaData.partitionColumns stay logical."""
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        _column_mapping,
        _replay_log,
    )

    t = str(tmp_path / "t")
    df = _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)])
    write_delta(df, t, partition_by=["grp"], column_mapping="name")
    snap = _replay_log(t, None)
    mapping = _column_mapping(snap)
    assert snap.partition_columns == ["grp"]  # logical in metaData
    phys_grp = mapping["grp"]
    for a in snap.files.values():
        assert set(a["partitionValues"]) == {phys_grp}
    got = read_delta(spark, t)
    assert _rows(got) == [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)]
    # appends inherit partitioning and stage physically
    write_delta(_df(spark, [(4, "c", 4.0)]), t)
    assert (4, "c", 4.0) in _rows(read_delta(spark, t))


def test_id_mode_mapped_table_write_stages_field_ids(spark, tmp_path):
    """ID-mode readers resolve columns by parquet field id — staged
    appends carry them from delta.columnMapping.id (r10; a refusal
    through r9), so both name- and id-based readers resolve the new
    files; name-based reads keep working."""
    import json as _json

    t = str(tmp_path / "t")
    phys = spark.createDataFrame(
        [(1, "a", 1.0)],
        "`col-abc123` long, `col-def456` string, `col-ghi789` double",
    )
    write_delta(phys, t)
    log = os.path.join(t, "_delta_log", "00000000000000000000.json")
    logical = [("id", "col-abc123"), ("s", "col-def456"), ("v", "col-ghi789")]
    out = []
    for ln in open(log).read().splitlines():
        act = _json.loads(ln)
        if "protocol" in act:
            act["protocol"]["minReaderVersion"] = 2
        if "metaData" in act:
            sch = _json.loads(act["metaData"]["schemaString"])
            for f, (lname, pname) in zip(sch["fields"], logical):
                f["name"] = lname
                f["metadata"] = {
                    "delta.columnMapping.id": logical.index((lname, pname))
                    + 1,
                    "delta.columnMapping.physicalName": pname,
                }
            act["metaData"]["schemaString"] = _json.dumps(sch)
            act["metaData"]["configuration"] = {
                "delta.columnMapping.mode": "id"
            }
        out.append(_json.dumps(act))
    open(log, "w").write("\n".join(out) + "\n")
    assert read_delta(spark, t).count() == 1
    write_delta(
        spark.createDataFrame(
            [(2, "b", 2.0)], "id long, s string, v double"
        ),
        t,
    )
    back = read_delta(spark, t)
    assert sorted((r.id, r.s, r.v) for r in back.collect()) == [
        (1, "a", 1.0),
        (2, "b", 2.0),
    ]
    # the staged file carries PHYSICAL names AND parquet field ids
    import pyarrow.parquet as _pq

    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        _replay_log as _rl,
    )

    snap = _rl(t, None)
    newest = max(snap.files, key=lambda p: snap.files[p]["modificationTime"])
    psch = _pq.ParquetFile(os.path.join(t, newest)).schema
    by_name = {
        psch.column(i).name: psch.column(i)
        for i in range(len(psch.names))
    }
    assert set(by_name) == {"col-abc123", "col-def456", "col-ghi789"}
    sch_arrow = _pq.ParquetFile(os.path.join(t, newest)).schema_arrow
    fids = {
        f.name: (f.metadata or {}).get(b"PARQUET:field_id")
        for f in sch_arrow
    }
    assert fids == {
        "col-abc123": b"1",
        "col-def456": b"2",
        "col-ghi789": b"3",
    }


def test_unenforced_writer_contracts_refuse(spark, tmp_path):
    """Foreign writer contracts: CHECK constraints and column
    invariants are EVALUATED since r10 (valid rows commit, violating
    rows raise naming the constraint); generated columns and
    append-only removes still refuse BY NAME. Plain appends remain
    allowed on append-only tables."""
    import json as _json

    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        delete_delta,
    )

    def _forge(t, configuration=None, field_meta=None):
        write_delta(_df(spark, [(1, "a", 1.0)]), t)
        log = os.path.join(t, "_delta_log", f"{0:020d}.json")
        out = []
        for ln in open(log).read().splitlines():
            act = _json.loads(ln)
            if "metaData" in act and configuration is not None:
                act["metaData"]["configuration"] = configuration
            if "metaData" in act and field_meta is not None:
                sch = _json.loads(act["metaData"]["schemaString"])
                sch["fields"][0]["metadata"] = field_meta
                act["metaData"]["schemaString"] = _json.dumps(sch)
            out.append(_json.dumps(act))
        open(log, "w").write("\n".join(out) + "\n")

    # append-only: appends fine, overwrite/DML refuse
    t = str(tmp_path / "ao")
    _forge(t, configuration={"delta.appendOnly": "true"})
    write_delta(_df(spark, [(2, "b", 2.0)]), t)
    assert read_delta(spark, t).count() == 2
    with pytest.raises(NotImplementedError, match="appendOnly"):
        write_delta(_df(spark, [(9, "z", 9.0)]), t, mode="overwrite")
    with pytest.raises(NotImplementedError, match="appendOnly"):
        delete_delta(spark, t, "id = 1")

    # CHECK constraint: valid rows commit; violating rows raise with
    # the constraint's name; NULL passes (SQL CHECK semantics)
    t = str(tmp_path / "ck")
    _forge(t, configuration={"delta.constraints.positive": "v > 0"})
    write_delta(_df(spark, [(2, "b", 2.0)]), t)
    write_delta(_df(spark, [(3, "c", None)]), t)  # NULL satisfies CHECK
    assert read_delta(spark, t).count() == 3
    with pytest.raises(ValueError, match="positive"):
        write_delta(_df(spark, [(4, "d", -1.0)]), t)
    assert read_delta(spark, t).count() == 3  # nothing staged

    # column invariant: same enforcement through the legacy JSON shape
    t = str(tmp_path / "inv")
    _forge(t, field_meta={"delta.invariants": '{"expression":{"expression":"id > 0"}}'})
    write_delta(_df(spark, [(2, "b", 2.0)]), t)
    with pytest.raises(ValueError, match="invariant"):
        write_delta(_df(spark, [(-5, "x", 1.0)]), t)

    # DML revalidates rewritten rows: an UPDATE driving v negative
    # violates the CHECK even though the pre-image was valid
    t = str(tmp_path / "ck2")
    _forge(t, configuration={"delta.constraints.positive": "v > 0"})
    write_delta(_df(spark, [(2, "b", 2.0)]), t)
    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        update_delta,
    )

    with pytest.raises(ValueError, match="positive"):
        update_delta(spark, t, {"v": "v - 100"}, "id = 2")
    update_delta(spark, t, {"v": "v + 1"}, "id = 2")  # valid update OK
    assert read_delta(spark, t).filter("id = 2").collect()[0].v == 3.0

    # generated column (EVALUATED since r11 — previously a blanket
    # refusal): a provided value must null-safe-equal the expression,
    # an absent column derives, and out-of-subset expressions refuse
    t = str(tmp_path / "gen")
    _forge(t, field_meta={"delta.generationExpression": "v * 2"})
    write_delta(_df(spark, [(4, "d", 2.0)]), t)  # 4 == 2.0 * 2: valid
    assert read_delta(spark, t).count() == 2
    with pytest.raises(ValueError, match="generated"):
        write_delta(_df(spark, [(5, "e", 2.0)]), t)  # 5 != 4
    assert read_delta(spark, t).count() == 2  # nothing staged
    # absent generated column DERIVES from the expression
    write_delta(
        spark.createDataFrame([("z", 3.0)], "grp string, v double"), t
    )
    got = read_delta(spark, t).filter("grp = 'z'").collect()
    assert [(r.id, r.v) for r in got] == [(6, 3.0)]

    # out-of-subset generation expressions keep the NAMED refusal
    t = str(tmp_path / "gen2")
    _forge(
        t,
        field_meta={
            "delta.generationExpression": "year(current_date())"
        },
    )
    with pytest.raises(NotImplementedError, match="time"):
        write_delta(_df(spark, [(2024, "b", 2.0)]), t)
    t = str(tmp_path / "gen3")
    _forge(
        t,
        field_meta={"delta.generationExpression": "cast(rand() * 10 as long)"},
    )
    with pytest.raises(NotImplementedError, match="non-deterministic"):
        write_delta(_df(spark, [(1, "b", 2.0)]), t)
    # reads stay fine on all of them
    assert read_delta(spark, t).count() == 1


def test_generated_columns_recompute_on_dml(spark, tmp_path):
    """r11 review fix: UPDATE/MERGE that changes a generated column's
    SOURCE recompute the generated value (the real writer's behavior)
    instead of misdiagnosing the stale value as a violation; SET
    targeting the generated column itself refuses by name; a column
    merely NAMED like a time function does not trip the subset gate."""
    import json as _json

    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        merge_delta,
        update_delta,
    )

    t = str(tmp_path / "gen")
    write_delta(_df(spark, [(2, "a", 1.0), (4, "b", 2.0)]), t)
    log = os.path.join(t, "_delta_log", f"{0:020d}.json")
    out = []
    for ln in open(log).read().splitlines():
        act = _json.loads(ln)
        if "metaData" in act:
            sch = _json.loads(act["metaData"]["schemaString"])
            sch["fields"][0]["metadata"] = {
                "delta.generationExpression": "cast(v * 2 as long)"
            }
            act["metaData"]["schemaString"] = _json.dumps(sch)
        out.append(_json.dumps(act))
    open(log, "w").write("\n".join(out) + "\n")

    update_delta(spark, t, {"v": "v + 10"}, "grp = 'a'")
    got = {r.grp: (r.id, r.v) for r in read_delta(spark, t).collect()}
    assert got["a"] == (22, 11.0)  # id recomputed from the new v
    assert got["b"] == (4, 2.0)
    with pytest.raises(ValueError, match="generated"):
        update_delta(spark, t, {"id": "99"}, "grp = 'a'")
    # MERGE full-row upsert: a MATCHED row's stale source generated
    # value normalizes (update branch recomputes), but an INSERTED
    # row's wrong provided value is REJECTED, not silently corrected
    # (r12 advice fix — the real writer validates on insert, matching
    # this engine's own append path)
    src_bad = spark.createDataFrame(
        [(0, "b", 5.0), (0, "c", 3.0)], "id long, grp string, v double"
    )
    with pytest.raises(ValueError, match="generated"):
        merge_delta(spark, t, src_bad, ["grp"])
    src = spark.createDataFrame(
        [(0, "b", 5.0), (6, "c", 3.0)], "id long, grp string, v double"
    )
    merge_delta(spark, t, src, ["grp"])
    got = {r.grp: (r.id, r.v) for r in read_delta(spark, t).collect()}
    assert got["b"] == (10, 5.0) and got["c"] == (6, 3.0)

    # a column NAMED like a time function is fine (word-boundary fix)
    t2 = str(tmp_path / "gen2")
    df = spark.createDataFrame([(10, 5.0)], "now_ts long, v double")
    write_delta(df, t2)
    log2 = os.path.join(t2, "_delta_log", f"{0:020d}.json")
    out2 = []
    for ln in open(log2).read().splitlines():
        act = _json.loads(ln)
        if "metaData" in act:
            sch = _json.loads(act["metaData"]["schemaString"])
            sch["fields"][0]["metadata"] = {
                "delta.generationExpression": "cast(v * 2 as long)"
            }
            act["metaData"]["schemaString"] = _json.dumps(sch)
        out2.append(_json.dumps(act))
    open(log2, "w").write("\n".join(out2) + "\n")
    write_delta(spark.createDataFrame([(12, 6.0)], "now_ts long, v double"), t2)
    assert read_delta(spark, t2).count() == 2


def test_generated_columns_cdf_postimages_recompute(spark, tmp_path):
    """CDF postimages show the RECOMPUTED generated value (not the
    stale source value) for UPDATE and MERGE on CDF-enabled tables."""
    import json as _json

    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        delta_row_changes,
    )
    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        merge_delta,
        update_delta,
    )

    t = str(tmp_path / "gen")
    write_delta(
        _df(spark, [(2, "a", 1.0), (4, "b", 2.0)]),
        t,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    log = os.path.join(t, "_delta_log", f"{0:020d}.json")
    out = []
    for ln in open(log).read().splitlines():
        act = _json.loads(ln)
        if "metaData" in act:
            sch = _json.loads(act["metaData"]["schemaString"])
            sch["fields"][0]["metadata"] = {
                "delta.generationExpression": "cast(v * 2 as long)"
            }
            act["metaData"]["schemaString"] = _json.dumps(sch)
        out.append(_json.dumps(act))
    open(log, "w").write("\n".join(out) + "\n")

    update_delta(spark, t, {"v": "v + 10"}, "grp = 'a'")
    ch = delta_row_changes(spark, t, 1, keys=["grp"]).collect()
    got = {(r._change_type): (r.id, r.v) for r in ch}
    assert got["update_preimage"] == (2, 1.0)
    assert got["update_postimage"] == (22, 11.0)  # id recomputed
    src = spark.createDataFrame(
        [(0, "b", 5.0)], "id long, grp string, v double"
    )
    merge_delta(spark, t, src, ["grp"])
    ch2 = delta_row_changes(spark, t, 2, keys=["grp"]).collect()
    got2 = {(r._change_type): (r.id, r.v) for r in ch2}
    assert got2["update_postimage"] == (10, 5.0)  # recomputed, not 0
