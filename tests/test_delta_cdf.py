"""Delta Change Data Feed (PROTOCOL.md §Change Data Files): DML on
``delta.enableChangeDataFeed=true`` tables stages cdc files under
``_change_data/``, and delta_row_changes reads a commit's cdc actions
EXCLUSIVELY when present (deriving by keyed diff otherwise)."""

from __future__ import annotations

import json
import os

import pytest

from sparkstreamingtwitter_presidential_spark.sources.delta import (
    _replay_log,
    delta_row_changes,
    read_delta,
    set_delta_properties,
    write_delta,
)
from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
    delete_delta,
    delete_delta_dv,
    merge_delta,
    update_delta,
)


def _mk(spark, tmp_path, name, cdf=True, rows=None):
    t = str(tmp_path / name)
    df = spark.createDataFrame(
        rows or [(i, i % 2, float(i)) for i in range(20)],
        "id long, part int, v double",
    ).repartition(2)  # multi-row files: a 1-row file would turn a DV
    # delete into a plain full-file remove and skip the vector path
    write_delta(
        df,
        t,
        mode="append",
        partition_by=["part"],
        configuration=(
            {"delta.enableChangeDataFeed": "true"} if cdf else None
        ),
    )
    return t


def _cdc_paths(t, version):
    commit = os.path.join(t, "_delta_log", f"{version:020d}.json")
    return [
        json.loads(ln)["cdc"]["path"]
        for ln in open(commit)
        if ln.strip() and "cdc" in json.loads(ln)
    ]


def test_cdf_creation_sets_protocol(spark, tmp_path):
    t = _mk(spark, tmp_path, "t")
    pr = _replay_log(t, None).protocol_action
    assert pr["minWriterVersion"] == 4 and pr["minReaderVersion"] == 1


def test_cdf_delete_writes_and_reads_cdc(spark, tmp_path):
    """DELETE on a CDF table emits cdc 'delete' rows that the change
    reader returns — byte-identical to the keyed diff a non-CDF twin
    derives — and the snapshot read never scans them."""
    t = _mk(spark, tmp_path, "cdf")
    u = _mk(spark, tmp_path, "plain", cdf=False)
    delete_delta(spark, t, "id % 5 = 0")
    delete_delta(spark, u, "id % 5 = 0")
    assert _cdc_paths(t, 1) and not _cdc_paths(u, 1)
    assert all(p.startswith("_change_data/") for p in _cdc_paths(t, 1))
    got = delta_row_changes(spark, t, 1, keys=["id"])
    want = delta_row_changes(spark, u, 1, keys=["id"])
    key = lambda r: (r["id"], r["_change_type"])  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(
        map(key, want.collect())
    )
    assert sorted(got.columns) == sorted(want.columns)
    assert {r["_change_type"] for r in got.collect()} == {"delete"}
    # snapshot read: cdc files are not data
    assert read_delta(spark, t).count() == 16


def test_cdf_update_pre_post(spark, tmp_path):
    t = _mk(spark, tmp_path, "t")
    update_delta(spark, t, {"v": "v + 100"}, "id < 3")
    ch = delta_row_changes(spark, t, 1, keys=["id"]).collect()
    pre = sorted((r.id, r.v) for r in ch if r._change_type == "update_preimage")
    post = sorted(
        (r.id, r.v) for r in ch if r._change_type == "update_postimage"
    )
    assert pre == [(0, 0.0), (1, 1.0), (2, 2.0)]
    assert post == [(0, 100.0), (1, 101.0), (2, 102.0)]
    assert len(ch) == 6


def test_cdf_merge_emits_all_change_types(spark, tmp_path):
    t = _mk(spark, tmp_path, "t")
    src = spark.createDataFrame(
        [(1, 1, 500.0), (100, 0, 900.0)], "id long, part int, v double"
    )
    merge_delta(spark, t, src, keys=["id"])
    ch = delta_row_changes(spark, t, 1, keys=["id"]).collect()
    by = {}
    for r in ch:
        by.setdefault(r._change_type, []).append((r.id, r.v))
    assert by["insert"] == [(100, 900.0)]
    assert by["update_preimage"] == [(1, 1.0)]
    assert by["update_postimage"] == [(1, 500.0)]
    # merge-delete variant
    t2 = _mk(spark, tmp_path, "t2")
    merge_delta(
        spark,
        t2,
        src,
        keys=["id"],
        when_matched="delete",
        insert_not_matched=False,
    )
    ch2 = delta_row_changes(spark, t2, 1, keys=["id"]).collect()
    assert [(r.id, r._change_type) for r in ch2] == [(1, "delete")]


def test_cdf_dv_delete_changes_read_through_cdc(spark, tmp_path):
    """A DV delete on a CDF table emits cdc rows for the NEWLY deleted
    rows only, and the change reader serves them even while live adds
    carry deletion vectors (cdc files are self-contained — the
    diff-derived path would refuse)."""
    t = _mk(spark, tmp_path, "t")
    delete_delta_dv(spark, t, "id IN (2, 4)")
    delete_delta_dv(spark, t, "id IN (4, 6)")  # 4 already gone
    ch1 = delta_row_changes(spark, t, 1, keys=["id"]).collect()
    ch2 = delta_row_changes(spark, t, 2, keys=["id"]).collect()
    assert sorted(r.id for r in ch1) == [2, 4]
    assert sorted(r.id for r in ch2) == [6]  # fresh rows only
    assert {r._change_type for r in ch1 + ch2} == {"delete"}
    # non-CDF DV table (r10 late): the keyed diff applies each side's
    # own DV state, so a DV delete derives its exact 'delete' rows
    u = _mk(spark, tmp_path, "u", cdf=False)
    delete_delta_dv(spark, u, "id = 2")
    chu = delta_row_changes(spark, u, 1, keys=["id"]).collect()
    assert [(r.id, r._change_type) for r in chu] == [(2, "delete")]


def test_set_delta_properties_enables_cdf(spark, tmp_path):
    """Enabling CDF later: SET TBLPROPERTIES commits metadata-only,
    bumps the protocol to writer 4, and the NEXT delete stages cdc."""
    t = _mk(spark, tmp_path, "t", cdf=False)
    v = set_delta_properties(t, {"delta.enableChangeDataFeed": "true"})
    assert v == 1
    snap = _replay_log(t, None)
    assert snap.protocol_action["minWriterVersion"] == 4
    assert (
        snap.metadata_action["configuration"][
            "delta.enableChangeDataFeed"
        ]
        == "true"
    )
    delete_delta(spark, t, "id = 7")
    assert _cdc_paths(t, 2)
    got = delta_row_changes(spark, t, 2, keys=["id"]).collect()
    assert [(r.id, r._change_type) for r in got] == [(7, "delete")]


def test_foreign_cdc_actions_are_exclusive(spark, tmp_path):
    """Spec rule: when a commit carries cdc actions, readers use them
    and IGNORE its add/remove diff — pinned by forging a commit whose
    cdc content deliberately disagrees with its file diff."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = _mk(spark, tmp_path, "t", cdf=False)
    delete_delta(spark, t, "id = 3")  # v1: a real diff-visible commit
    cdir = os.path.join(t, "_change_data")
    os.makedirs(cdir)
    cfile = os.path.join(cdir, "cdc-forged.parquet")
    pq.write_table(
        pa.table(
            {
                "id": pa.array([999], pa.int64()),
                "v": pa.array([1.5], pa.float64()),
                "_change_type": pa.array(["delete"], pa.string()),
            }
        ),
        cfile,
    )
    commit = os.path.join(t, "_delta_log", f"{1:020d}.json")
    with open(commit, "a") as fh:
        fh.write(
            json.dumps(
                {
                    "cdc": {
                        "path": "_change_data/cdc-forged.parquet",
                        "partitionValues": {"part": "1"},
                        "size": os.path.getsize(cfile),
                        "dataChange": False,
                    }
                }
            )
            + "\n"
        )
    got = delta_row_changes(spark, t, 1, keys=["id"]).collect()
    assert [(r.id, r.part, r.v, r._change_type) for r in got] == [
        (999, 1, 1.5, "delete")
    ]


def test_cdf_write_job_only_when_enabled(spark, tmp_path):
    """No CDF config -> the DML commit contains zero cdc actions and
    no _change_data dir materializes (no silent extra write job)."""
    t = _mk(spark, tmp_path, "t", cdf=False)
    update_delta(spark, t, {"v": "v + 1"}, "id = 1")
    assert not _cdc_paths(t, 1)
    assert not os.path.exists(os.path.join(t, "_change_data"))


def test_table_changes_range(spark, tmp_path):
    """The version-range TVF shape: cdc commits, insert-only appends
    (no keys needed), and pure-metadata commits composing into one
    frame with per-commit stamps."""
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        delta_table_changes,
    )

    t = _mk(spark, tmp_path, "t")  # v0: CDF-enabled create
    update_delta(spark, t, {"v": "v + 100"}, "id = 1")       # v1 cdc
    write_delta(
        spark.createDataFrame([(50, 0, 5.0)], "id long, part int, v double"),
        t,
        mode="append",
    )                                                         # v2 insert-only
    set_err = __import__(
        "sparkstreamingtwitter_presidential_spark.sources.delta",
        fromlist=["set_delta_properties"],
    ).set_delta_properties
    set_err(t, {"foo": "bar"})                                # v3 metadata-only
    delete_delta(spark, t, "id = 50")                         # v4 cdc
    ch = delta_table_changes(spark, t, 0).collect()
    by_ver = {}
    for r in ch:
        by_ver.setdefault(r._commit_version, []).append(
            (r.id, r._change_type)
        )
    assert sorted(by_ver) == [1, 2, 4]  # v3 emitted nothing
    assert sorted(by_ver[1]) == [
        (1, "update_postimage"), (1, "update_preimage"),
    ]
    assert by_ver[2] == [(50, "insert")]
    assert by_ver[4] == [(50, "delete")]
    # bounded range
    sub = delta_table_changes(spark, t, 1, to_version=2).collect()
    assert [(r.id, r._change_type) for r in sub] == [(50, "insert")]
    # empty range -> empty frame with the full change schema
    empty = delta_table_changes(spark, t, 3, to_version=3)
    assert empty.count() == 0
    assert "_change_type" in empty.columns


def test_table_changes_requires_keys_for_uncdc_rewrites(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        delta_table_changes,
    )

    t = _mk(spark, tmp_path, "t", cdf=False)
    delete_delta(spark, t, "id = 3")
    with pytest.raises(ValueError, match="primary key"):
        delta_table_changes(spark, t, 0)
    got = delta_table_changes(spark, t, 0, keys=["id"]).collect()
    assert [(r.id, r._change_type) for r in got] == [(3, "delete")]
