"""DML on NAME-mode column-mapped Delta tables (r10 — previously a
named refusal): DELETE / UPDATE / MERGE / OPTIMIZE rewrite under the
physical-name contract (files, partition dirs, add.partitionValues,
stats all physical; predicates and results logical), the DV writers
compose with mapping, CDF change files stage physically and read back
logically, and id-mode tables still refuse every write by name."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F  # noqa: F401

from sparkstreamingtwitter_presidential_spark.sources.delta import (
    _column_mapping,
    _replay_log,
    delta_row_changes,
    read_delta,
    write_delta,
)
from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
    delete_delta,
    delete_delta_dv,
    merge_delta,
    merge_delta_dv,
    optimize_delta,
    update_delta,
    update_delta_dv,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, v double")


def _rows(df):
    return sorted(
        (r["id"], r["grp"], r["v"]) for r in df.select("id", "grp", "v").collect()
    )


def _mk_mapped(spark, path, partitioned=False, configuration=None, rows=None):
    rows = rows or [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0), (4, "b", 4.0)]
    # repartition(2): file-granular DV/rewrite semantics need >1-row
    # files under local[32]'s scatter
    df = _df(spark, rows).repartition(2)
    write_delta(
        df,
        path,
        partition_by=["grp"] if partitioned else None,
        column_mapping="name",
        configuration=configuration,
    )
    return path


def _assert_files_physical(path):
    """Every live data file stores ONLY physical col-<uuid> names."""
    import pyarrow.parquet as pq

    snap = _replay_log(path, None)
    mapping = _column_mapping(snap)
    assert mapping is not None
    phys_names = set(mapping.values())
    for rel in snap.files:
        import urllib.parse

        f = os.path.join(path, urllib.parse.unquote(rel))
        names = set(pq.ParquetFile(f).schema_arrow.names)
        assert names <= phys_names, f"{rel} carries non-physical {names - phys_names}"


def test_mapped_delete(spark, tmp_path):
    t = _mk_mapped(spark, str(tmp_path / "t"))
    v = delete_delta(spark, t, "v > 2.5")
    assert v == 1
    assert _rows(read_delta(spark, t)) == [(1, "a", 1.0), (2, "a", 2.0)]
    # time travel still sees the pre-delete snapshot
    assert len(_rows(read_delta(spark, t, version=0))) == 4
    _assert_files_physical(t)


def test_mapped_update_partitioned(spark, tmp_path):
    t = _mk_mapped(spark, str(tmp_path / "t"), partitioned=True)
    update_delta(spark, t, {"v": "v * 10"}, predicate="grp = 'b'")
    assert _rows(read_delta(spark, t)) == [
        (1, "a", 1.0),
        (2, "a", 2.0),
        (3, "b", 30.0),
        (4, "b", 40.0),
    ]
    snap = _replay_log(t, None)
    mapping = _column_mapping(snap)
    # rewritten adds keep physical-keyed partitionValues and physical dirs
    for a in snap.files.values():
        assert set(a["partitionValues"]) == {mapping["grp"]}
    _assert_files_physical(t)
    # stats stay physical-keyed so read-side skipping translates
    stats = [json.loads(a["stats"]) for a in snap.files.values() if a.get("stats")]
    assert stats and all(
        set(s.get("minValues", {})) <= set(mapping.values()) for s in stats
    )
    pruned = read_delta(spark, t, skip_ranges={"v": (30.0, None)})
    assert _rows(pruned.filter("v >= 30")) == [(3, "b", 30.0), (4, "b", 40.0)]


def test_mapped_merge_upsert(spark, tmp_path):
    t = _mk_mapped(spark, str(tmp_path / "t"))
    src = _df(spark, [(2, "a", 200.0), (9, "z", 9.0)])
    merge_delta(spark, t, src, keys=["id"])
    assert _rows(read_delta(spark, t)) == [
        (1, "a", 1.0),
        (2, "a", 200.0),
        (3, "b", 3.0),
        (4, "b", 4.0),
        (9, "z", 9.0),
    ]
    _assert_files_physical(t)


def test_mapped_optimize_compacts(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk_mapped(spark, t, rows=[(1, "a", 1.0), (2, "a", 2.0)])
    write_delta(_df(spark, [(3, "b", 3.0)]), t)
    write_delta(_df(spark, [(4, "b", 4.0)]), t)
    before = _rows(read_delta(spark, t))
    n_before = len(_replay_log(t, None).files)
    v = optimize_delta(spark, t)
    snap = _replay_log(t, None)
    assert len(snap.files) < n_before
    assert _rows(read_delta(spark, t)) == before
    # layout-only: dataChange false on the new adds
    log = os.path.join(t, "_delta_log", f"{v:020d}.json")
    for ln in open(log).read().splitlines():
        act = json.loads(ln)
        if "add" in act:
            assert act["add"]["dataChange"] is False
    _assert_files_physical(t)


def test_mapped_dv_delete_and_update(spark, tmp_path):
    t = _mk_mapped(spark, str(tmp_path / "t"))
    v = delete_delta_dv(spark, t, "id = 3")
    snap = _replay_log(t, None)
    assert any(a.get("deletionVector") for a in snap.files.values())
    assert _rows(read_delta(spark, t)) == [(1, "a", 1.0), (2, "a", 2.0), (4, "b", 4.0)]
    # MOR update: marks + stages updated rows physically
    update_delta_dv(spark, t, {"v": "v + 0.5"}, predicate="id = 4")
    assert _rows(read_delta(spark, t)) == [(1, "a", 1.0), (2, "a", 2.0), (4, "b", 4.5)]
    _assert_files_physical(t)
    assert v == 1


def test_mapped_dv_merge(spark, tmp_path):
    t = _mk_mapped(spark, str(tmp_path / "t"))
    src = _df(spark, [(1, "a", 100.0), (7, "q", 7.0)])
    merge_delta_dv(spark, t, src, keys=["id"])
    assert _rows(read_delta(spark, t)) == [
        (1, "a", 100.0),
        (2, "a", 2.0),
        (3, "b", 3.0),
        (4, "b", 4.0),
        (7, "q", 7.0),
    ]
    _assert_files_physical(t)


def test_mapped_cdf_roundtrip(spark, tmp_path):
    """CDF on a mapped table: cdc files store physical names on disk;
    delta_row_changes reads them back under LOGICAL names."""
    import pyarrow.parquet as pq

    t = _mk_mapped(
        spark,
        str(tmp_path / "t"),
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    v = update_delta(spark, t, {"v": "v + 100"}, predicate="id = 2")
    snap = _replay_log(t, None)
    mapping = _column_mapping(snap)
    cdc_files = []
    for root, _d, names in os.walk(os.path.join(t, "_change_data")):
        cdc_files += [os.path.join(root, n) for n in names if n.endswith(".parquet")]
    assert cdc_files
    for f in cdc_files:
        names = set(pq.ParquetFile(f).schema_arrow.names)
        assert names <= set(mapping.values()) | {"_change_type"}
    changes = delta_row_changes(spark, t, v)
    got = sorted(
        (r["id"], r["v"], r["_change_type"]) for r in changes.collect()
    )
    assert got == [
        (2, 2.0, "update_preimage"),
        (2, 102.0, "update_postimage"),
    ]


def test_mapped_keyed_diff_changes(spark, tmp_path):
    """Without CDF, delta_row_changes derives the diff from the mapped
    data files themselves — also physical-named."""
    t = _mk_mapped(spark, str(tmp_path / "t"))
    v = delete_delta(spark, t, "id = 1")
    changes = delta_row_changes(spark, t, v, keys=["id"])
    got = [(r["id"], r["_change_type"]) for r in changes.collect()]
    assert got == [(1, "delete")]


def test_id_mode_dml_works_with_field_ids(spark, tmp_path):
    """ID-mode DML works since r10: rewrites stage physical names AND
    parquet field ids from delta.columnMapping.id, so id-mode readers
    resolve the rewritten files; an id-mode table WITHOUT ids in its
    schema metadata still refuses by name."""
    t = str(tmp_path / "t")
    phys = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)],
        "`col-abc123` long, `col-def456` string, `col-ghi789` double",
    )
    write_delta(phys, t)
    log = os.path.join(t, "_delta_log", "00000000000000000000.json")
    logical = [("id", "col-abc123"), ("grp", "col-def456"), ("v", "col-ghi789")]
    out = []
    for ln in open(log).read().splitlines():
        act = json.loads(ln)
        if "protocol" in act:
            act["protocol"]["minReaderVersion"] = 2
        if "metaData" in act:
            sch = json.loads(act["metaData"]["schemaString"])
            for f, (lname, pname) in zip(sch["fields"], logical):
                f["name"] = lname
                f["metadata"] = {
                    "delta.columnMapping.id": logical.index((lname, pname)) + 1,
                    "delta.columnMapping.physicalName": pname,
                }
            act["metaData"]["schemaString"] = json.dumps(sch)
            act["metaData"]["configuration"] = {"delta.columnMapping.mode": "id"}
        out.append(json.dumps(act))
    open(log, "w").write("\n".join(out) + "\n")
    assert read_delta(spark, t).count() == 2
    delete_delta(spark, t, "id = 1")
    update_delta(spark, t, {"v": "v + 1"})
    merge_delta(spark, t, _df(spark, [(9, "z", 9.0)]), keys=["id"])
    assert _rows(read_delta(spark, t)) == [(2, "b", 3.0), (9, "z", 9.0)]
    # every rewritten file resolves by ID too: physical names + fids
    import pyarrow.parquet as pq

    snap = _replay_log(t, None)
    want_fids = {b"1", b"2", b"3"}
    for rel in snap.files:
        sch = pq.ParquetFile(os.path.join(t, rel)).schema_arrow
        got = {
            (f.metadata or {}).get(b"PARQUET:field_id") for f in sch
        }
        assert got == want_fids, f"{rel} missing field ids: {got}"
    # an id-mode table with the id metadata STRIPPED still refuses
    log2 = os.path.join(t, "_delta_log", "00000000000000000000.json")
    out2 = []
    for ln in open(log2).read().splitlines():
        act = json.loads(ln)
        if "metaData" in act:
            sch2 = json.loads(act["metaData"]["schemaString"])
            for f in sch2["fields"]:
                f["metadata"].pop("delta.columnMapping.id", None)
            act["metaData"]["schemaString"] = json.dumps(sch2)
        out2.append(json.dumps(act))
    open(log2, "w").write("\n".join(out2) + "\n")
    with pytest.raises(NotImplementedError, match="columnMapping.id"):
        delete_delta(spark, t, "id = 2")


def test_mapped_delta_changes_incremental(spark, tmp_path):
    """File-level incremental reads (delta_changes) resolve physical
    names on mapped tables (r10 — an r8 ADVICE refusal)."""
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        delta_changes,
    )

    t = str(tmp_path / "t")
    write_delta(
        _df(spark, [(1, "a", 1.0)]), t, partition_by=["grp"],
        column_mapping="name",
    )
    write_delta(_df(spark, [(2, "b", 2.0)]), t)
    write_delta(_df(spark, [(3, "a", 3.0)]), t)
    got = sorted(
        (r["id"], r["grp"], r["v"], r["_commit_version"])
        for r in delta_changes(spark, t, from_version=0).collect()
    )
    assert got == [(2, "b", 2.0, 1), (3, "a", 3.0, 2)]


def test_mapped_table_streams_logical_columns(spark, tmp_path):
    """delta_native streams mapped tables (r10 — refused at schema
    time through r9): executors read the physical parquet columns and
    emit logical names, partition values re-keyed through the map."""
    from sparkstreamingtwitter_presidential_spark.sources.delta_stream_ds import (
        register_delta_stream,
    )

    register_delta_stream(spark)
    t = str(tmp_path / "t")
    write_delta(
        _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]),
        t,
        partition_by=["grp"],
        column_mapping="name",
    )
    write_delta(_df(spark, [(3, "a", 3.0)]), t)
    sink: list = []
    q = (
        spark.readStream.format("delta_native")
        .load(t)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: sink.extend(
            (r["id"], r["grp"], r["v"]) for r in df.collect()
        ))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    assert sorted(sink) == [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)]


def test_mapped_rewrite_deletion_vectors(spark, tmp_path):
    """REORG folds DVs on mapped tables through the physical-name
    staging; CoW DML works again afterwards."""
    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        rewrite_deletion_vectors,
    )

    t = _mk_mapped(spark, str(tmp_path / "t"))
    delete_delta_dv(spark, t, "id = 2")
    rewrite_deletion_vectors(spark, t)
    snap = _replay_log(t, None)
    assert not any(a.get("deletionVector") for a in snap.files.values())
    assert _rows(read_delta(spark, t)) == [(1, "a", 1.0), (3, "b", 3.0), (4, "b", 4.0)]
    _assert_files_physical(t)
    update_delta(spark, t, {"v": "v + 1"}, "id = 3")
    assert (3, "b", 4.0) in _rows(read_delta(spark, t))
