"""Delta V2 checkpoint reads (PROTOCOL.md §V2 Spec Checkpoints): a
uuid-named manifest (json or parquet) carrying protocol/metaData plus
``sidecar`` actions whose parquet files hold the add/remove file
actions — the modern Databricks checkpoint layout. The fixture
hand-authors the foreign layout and deletes the collapsed JSON
commits, so the read MUST bootstrap from the v2 checkpoint."""

from __future__ import annotations

import json
import os
import uuid

import pytest

from sparkstreamingtwitter_presidential_spark.sources.delta import (
    _replay_log,
    read_delta,
    write_delta,
)


def _build_v2_table(spark, t, manifest_format):
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, s string, v double"
    )
    write_delta(df.coalesce(1), t)
    write_delta(
        spark.createDataFrame([(3, "c", 3.0)], "id long, s string, v double"),
        t,
    )
    snap = _replay_log(t, None)
    log_dir = os.path.join(t, "_delta_log")
    # collapse versions 0..1 into a v2 checkpoint: manifest + sidecar
    sc_dir = os.path.join(log_dir, "_sidecars")
    os.makedirs(sc_dir, exist_ok=True)
    sc_name = f"{uuid.uuid4()}.parquet"
    # real writers store partitionValues as a parquet MAP — replicate
    # that shape so the reader's pair-list normalization is exercised
    add_type = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
        ]
    )
    adds = [
        {
            "path": a["path"],
            "partitionValues": list(a.get("partitionValues", {}).items()),
            "size": a["size"],
            "modificationTime": a["modificationTime"],
            "dataChange": a.get("dataChange", True),
            "stats": a.get("stats"),
        }
        for _p, a in sorted(snap.files.items())
    ]
    pq.write_table(
        pa.table({"add": pa.array(adds, type=add_type)}),
        os.path.join(sc_dir, sc_name),
    )
    proto = {"minReaderVersion": 3, "minWriterVersion": 7,
             "readerFeatures": ["v2Checkpoint"],
             "writerFeatures": ["v2Checkpoint"]}
    md = dict(snap.metadata_action)
    manifest_rows = [
        {"checkpointMetadata": {"version": 1}},
        {"protocol": proto},
        {"metaData": md},
        {"sidecar": {"path": sc_name, "sizeInBytes": 1}},
    ]
    u = uuid.uuid4()
    if manifest_format == "json":
        name = f"{1:020d}.checkpoint.{u}.json"
        with open(os.path.join(log_dir, name), "w") as fh:
            for row in manifest_rows:
                fh.write(json.dumps(row) + "\n")
    else:
        name = f"{1:020d}.checkpoint.{u}.parquet"
        # explicit arrow types mirroring the real checkpoint schema's
        # map-typed fields (empty structs are unwritable in parquet)
        md_type = pa.struct(
            [
                ("id", pa.string()),
                (
                    "format",
                    pa.struct(
                        [
                            ("provider", pa.string()),
                            ("options", pa.map_(pa.string(), pa.string())),
                        ]
                    ),
                ),
                ("schemaString", pa.string()),
                ("partitionColumns", pa.list_(pa.string())),
                ("configuration", pa.map_(pa.string(), pa.string())),
                ("createdTime", pa.int64()),
            ]
        )
        proto_type = pa.struct(
            [
                ("minReaderVersion", pa.int32()),
                ("minWriterVersion", pa.int32()),
                ("readerFeatures", pa.list_(pa.string())),
                ("writerFeatures", pa.list_(pa.string())),
            ]
        )
        md_pa = {
            **md,
            "format": {
                "provider": md["format"]["provider"],
                "options": list(md["format"].get("options", {}).items()),
            },
            "configuration": list(md.get("configuration", {}).items()),
        }
        cols = {
            "checkpointMetadata": pa.array(
                [{"version": 1}, None, None, None],
                type=pa.struct([("version", pa.int64())]),
            ),
            "protocol": pa.array([None, proto, None, None], type=proto_type),
            "metaData": pa.array([None, None, md_pa, None], type=md_type),
            "sidecar": pa.array(
                [None, None, None, {"path": sc_name, "sizeInBytes": 1}],
                type=pa.struct(
                    [("path", pa.string()), ("sizeInBytes", pa.int64())]
                ),
            ),
        }
        pq.write_table(pa.table(cols), os.path.join(log_dir, name))
    # the collapsed JSON commits disappear (expired log) — the v2
    # checkpoint is now the only bootstrap
    os.remove(os.path.join(log_dir, f"{0:020d}.json"))
    os.remove(os.path.join(log_dir, f"{1:020d}.json"))
    return t


@pytest.mark.parametrize("fmt", ["json", "parquet"])
def test_v2_checkpoint_bootstrap(spark, tmp_path, fmt):
    t = _build_v2_table(spark, str(tmp_path / "t"), fmt)
    got = sorted((r.id, r.s, r.v) for r in read_delta(spark, t).collect())
    assert got == [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]
    snap = _replay_log(t, None)
    assert snap.version == 1
    assert snap.protocol_action["readerFeatures"] == ["v2Checkpoint"]


def test_v2_checkpoint_plus_later_commits(spark, tmp_path):
    t = _build_v2_table(spark, str(tmp_path / "t"), "json")
    write_delta(
        spark.createDataFrame([(4, "d", 4.0)], "id long, s string, v double"),
        t,
    )
    got = sorted(r.id for r in read_delta(spark, t).collect())
    assert got == [1, 2, 3, 4]
    # time travel to the checkpoint version itself still works
    assert read_delta(spark, t, version=1).count() == 3


def test_classic_checkpoint_preferred_at_same_version(spark, tmp_path):
    """When classic and v2 checkpoints coexist at one version, the
    single-file classic read wins (no sidecar round trips); the v2
    manifest at a HIGHER version wins over an older classic one."""
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        write_checkpoint,
    )

    t = _build_v2_table(spark, str(tmp_path / "t"), "json")
    write_delta(
        spark.createDataFrame([(4, "d", 4.0)], "id long, s string, v double"),
        t,
    )
    write_checkpoint(t)  # classic at version 2
    assert sorted(r.id for r in read_delta(spark, t).collect()) == [1, 2, 3, 4]


def test_unknown_reader_feature_still_refuses(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([(1, "a", 1.0)], "id long, s string, v double"),
        t,
    )
    log = os.path.join(t, "_delta_log", f"{0:020d}.json")
    out = []
    for ln in open(log).read().splitlines():
        act = json.loads(ln)
        if "protocol" in act:
            act["protocol"] = {
                "minReaderVersion": 3,
                "readerFeatures": ["v2Checkpoint", "typeWidening"],
            }
        out.append(json.dumps(act))
    open(log, "w").write("\n".join(out) + "\n")
    with pytest.raises(NotImplementedError, match="typeWidening"):
        read_delta(spark, t)


def test_v2_checkpoint_write_bootstrap_roundtrip(spark, tmp_path):
    """r10 (r9 verdict stretch #9): write_checkpoint(v2=True) emits the
    uuid-manifest + _sidecars/ parquet form; a reader bootstraps from
    it after the JSON commits expire, including later commits, txn
    markers, and DV descriptors carried through the sidecar."""
    import glob

    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        _replay_log,
        expire_log,
        write_checkpoint,
    )
    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        delete_delta_dv,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"r{i}", float(i)) for i in range(20)],
        "id long, s string, v double",
    )
    write_delta(df.repartition(2), t, txn=("app", 7))
    delete_delta_dv(spark, t, "id % 5 = 0")  # v1: DV commit
    v = write_checkpoint(t, v2=True)
    assert v == 1
    manifests = glob.glob(
        os.path.join(t, "_delta_log", "*.checkpoint.*.json")
    )
    sidecars = glob.glob(os.path.join(t, "_delta_log", "_sidecars", "*.parquet"))
    assert len(manifests) == 1 and len(sidecars) == 1
    # manifest carries NO file actions — they live in the sidecar
    for ln in open(manifests[0]).read().splitlines():
        act = json.loads(ln)
        assert "add" not in act and "remove" not in act
    # later commit + expire the pre-checkpoint JSON commits
    write_delta(
        spark.createDataFrame([(100, "x", 1.0)], "id long, s string, v double"),
        t,
    )
    expire_log(t, keep_from=2)
    got = sorted(r.id for r in read_delta(spark, t).collect())
    assert got == [i for i in range(20) if i % 5 != 0] + [100]
    # txn marker and DV descriptors survived the bootstrap
    snap = _replay_log(t, None)
    assert snap.transactions.get("app") == 7
    assert any(a.get("deletionVector") for a in snap.files.values())
