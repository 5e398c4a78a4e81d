"""Partition spec evolution (r12 late — spec §Partition Evolution):
`update_partition_spec` installs a new default spec metadata-only;
old files keep their spec, new writes stage the new layout, snapshot
reads handle the mix per manifest spec, pruning keys on each entry's
own spec, rewrites refuse by name, and global-equality MOR upserts
stay correct across the mix (sequence-scoped, spec-agnostic)."""

from __future__ import annotations

import pytest

from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
    read_iceberg,
    update_partition_spec,
    write_iceberg,
)

SCHEMA = "id long, s string, v double"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _meta(t):
    import glob
    import json
    import os

    vs = sorted(
        glob.glob(os.path.join(t, "metadata", "v*.metadata.json")),
        key=lambda p: int(os.path.basename(p)[1:].split(".")[0]),
    )
    return json.load(open(vs[-1]))


def test_unpartitioned_to_identity_and_back(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "p1", 1.0), (2, "p2", 2.0)]), t)
    sid1 = update_partition_spec(t, ["s"])
    assert sid1 == 1
    write_iceberg(
        _df(spark, [(3, "p1", 3.0), (4, "p3", 4.0)]), t, mode="append"
    )
    # mixed read: old flat files + new hive-partitioned files, with
    # identity values injected only for the NEW group
    got = sorted(
        (r.id, r.s, r.v) for r in read_iceberg(spark, t).collect()
    )
    assert got == [
        (1, "p1", 1.0), (2, "p2", 2.0), (3, "p1", 3.0), (4, "p3", 4.0),
    ]
    meta = _meta(t)
    assert meta["default-spec-id"] == 1
    assert len(meta["partition-specs"]) == 2
    # un-partition again: THIRD spec (empty), new files flat
    sid2 = update_partition_spec(t, [])
    write_iceberg(_df(spark, [(5, "p9", 5.0)]), t, mode="append")
    got = sorted(r.id for r in read_iceberg(spark, t).collect())
    assert got == [1, 2, 3, 4, 5]
    # re-partitioning on s REUSES the original spec + field id
    sid3 = update_partition_spec(t, ["s"])
    assert sid3 == sid1
    meta = _meta(t)
    fids = [
        pf["field-id"]
        for sp in meta["partition-specs"]
        for pf in sp["fields"]
    ]
    assert fids == [1000]  # one field ever minted, reused


def test_pruning_keys_on_each_entrys_spec(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t)
    update_partition_spec(t, ["s"])
    write_iceberg(_df(spark, [(3, "a", 3.0), (4, "c", 4.0)]), t,
                  mode="append")
    got = sorted(
        r.id
        for r in read_iceberg(spark, t, skip_ranges={"s": ("a", "a")})
        .filter("s = 'a'")
        .collect()
    )
    # old flat files are conservatively KEPT (no tuples to prune on),
    # new files prune exactly; the filter makes the result exact
    assert got == [1, 3]


def test_transform_evolution_and_noop(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "abcd", 1.0)]), t)
    sid = update_partition_spec(t, ["truncate(2, s)"])
    write_iceberg(_df(spark, [(2, "abzz", 2.0)]), t, mode="append")
    assert sorted(r.id for r in read_iceberg(spark, t).collect()) == [1, 2]
    meta = _meta(t)
    spec = next(
        sp for sp in meta["partition-specs"] if sp["spec-id"] == sid
    )
    assert spec["fields"][0]["transform"] == "truncate[2]"
    # installing the SAME spec again is a no-op: no version burned
    import glob
    import os

    n_before = len(glob.glob(os.path.join(t, "metadata", "v*.metadata.json")))
    assert update_partition_spec(t, ["truncate(2, s)"]) == sid
    assert len(
        glob.glob(os.path.join(t, "metadata", "v*.metadata.json"))
    ) == n_before

    with pytest.raises(ValueError, match="not in schema"):
        update_partition_spec(t, ["nope"])


def test_cow_dml_refuses_on_mixed_specs(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        delete_iceberg,
        update_iceberg,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0)]), t)
    update_partition_spec(t, ["s"])
    write_iceberg(_df(spark, [(2, "b", 2.0)]), t, mode="append")
    for op in (
        lambda: delete_iceberg(spark, t, "id = 1"),
        lambda: update_iceberg(spark, t, {"v": "v + 1"}),
    ):
        with pytest.raises(NotImplementedError, match="partition"):
            op()
    # reads stay fine
    assert read_iceberg(spark, t).count() == 2


def test_compaction_scoped_to_default_spec(spark, tmp_path):
    """Mixed-spec compaction (r12 late, lifting the blanket refusal):
    manifests are spec-homogeneous, so the default spec's small files
    bin-pack while evolved-away specs' manifests carry VERBATIM —
    their files never move and their partition records are never
    re-serialized."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        compact_iceberg,
        rewrite_manifests,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0)]).repartition(1), t)
    old_files = set(read_iceberg(spark, t).inputFiles())
    update_partition_spec(t, ["s"])
    # several small files in ONE partition of the new spec
    for i in range(3):
        write_iceberg(
            _df(spark, [(10 + i, "p", float(i))]).repartition(1),
            t,
            mode="append",
        )
    n_before = len(read_iceberg(spark, t).inputFiles())
    compact_iceberg(spark, t)
    files_after = set(read_iceberg(spark, t).inputFiles())
    # the old-spec file is untouched; the new spec's three smalls fold
    assert old_files <= files_after
    assert len(files_after) < n_before
    got = sorted((r.id, r.s, r.v) for r in read_iceberg(spark, t).collect())
    assert got == [
        (1, "a", 1.0), (10, "p", 0.0), (11, "p", 1.0), (12, "p", 2.0),
    ]
    # manifest collapse keeps the carried spec's manifests verbatim too
    rewrite_manifests(spark, t)
    got2 = sorted((r.id, r.s, r.v) for r in read_iceberg(spark, t).collect())
    assert got2 == got
    assert old_files <= set(read_iceberg(spark, t).inputFiles())


def test_mor_upsert_supersedes_across_specs(spark, tmp_path):
    """The equality-upsert path writes GLOBAL (sequence-scoped)
    delete files, which apply to data files of EVERY spec — so a CDC
    upsert keeps superseding rows written before a repartition."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        upsert_iceberg_mor,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t)
    update_partition_spec(t, ["s"])
    upsert_iceberg_mor(
        spark,
        t,
        _df(spark, [(1, "a", 100.0), (9, "z", 9.0)]),
        keys=["id"],
    )
    got = {r.id: r.v for r in read_iceberg(spark, t).collect()}
    assert got == {1: 100.0, 2: 2.0, 9: 9.0}


def test_incremental_scan_across_evolution_boundary(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        read_iceberg_incremental,
        table_snapshots,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0)]), t)
    write_iceberg(_df(spark, [(2, "b", 2.0)]), t, mode="append")
    update_partition_spec(t, ["s"])
    write_iceberg(_df(spark, [(3, "a", 3.0)]), t, mode="append")
    sids = [
        r.snapshot_id
        for r in table_snapshots(spark, t)
        .orderBy("sequence_number")
        .collect()
    ]
    got = sorted(
        (r.id, r.s, r.v)
        for r in read_iceberg_incremental(
            spark, t, from_snapshot=sids[0], to_snapshot=sids[-1]
        ).collect()
    )
    # the range crosses the evolution: flat file (old spec) + hive
    # file (new spec, identity injected) both read correct values
    assert got == [(2, "b", 2.0), (3, "a", 3.0)]


def test_stream_source_across_evolution_boundary(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg_stream_ds import (
        register_iceberg_stream,
    )

    register_iceberg_stream(spark)
    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0)]), t)
    update_partition_spec(t, ["s"])
    write_iceberg(_df(spark, [(2, "b", 2.0)]), t, mode="append")
    sink: list = []
    q = (
        spark.readStream.format("iceberg_native")
        .load(t)
        .writeStream.outputMode("append")
        .foreachBatch(
            lambda df, bid: sink.extend(tuple(r) for r in df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    # pre-evolution commit reads s from DATA (old flat spec), post-
    # evolution commit INJECTS s from the new spec's tuples — both
    # exact, neither null
    assert sorted(sink) == [(1, "a", 1.0), (2, "b", 2.0)]


def test_table_partitions_refuses_on_mixed_specs(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        table_partitions,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0)]), t)
    update_partition_spec(t, ["s"])
    write_iceberg(_df(spark, [(2, "b", 2.0)]), t, mode="append")
    with pytest.raises(NotImplementedError, match="partition"):
        table_partitions(spark, t)


def test_table_detail_frame(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        table_detail,
    )

    t = str(tmp_path / "t")
    write_iceberg(
        _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]),
        t,
        partition_by=["s"],
        format_version=3,
    )
    d = table_detail(spark, t).collect()[0]
    assert d.format == "iceberg" and d.format_version == 3
    assert d.table_uuid and d.current_snapshot_id is not None
    assert d.partition_spec == ["s"]
    assert d.num_files >= 2 and d.size_in_bytes > 0
    # evolution shows the NEW default spec immediately
    update_partition_spec(t, ["truncate(2, s)"])
    d2 = table_detail(spark, t).collect()[0]
    assert d2.partition_spec == ["truncate[2](s)"]
    assert d2.num_files == d.num_files  # metadata-only
