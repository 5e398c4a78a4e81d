"""Native Iceberg (sources/iceberg.py): spec-layout write -> snapshot
read roundtrip, append vs overwrite snapshot semantics, time travel by
snapshot id, the snapshots inspection frame, commit atomicity, stale
version hints, and the honest refusal boundary (partitioned specs,
delete files, foreign formats)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
    IcebergCommitConflict,
    current_snapshot_id,
    read_iceberg,
    table_snapshots,
    write_iceberg,
)

SCHEMA = "id long, s string, v double, arr array<float>"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_roundtrip_and_layout_is_spec_shaped(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _df(spark, [(1, "a", 1.5, [0.5, -1.0]), (2, "b", None, []), (3, None, 3.0, None)])
    write_iceberg(df, t)
    back = sorted(tuple(r) for r in read_iceberg(spark, t).collect())
    assert back == sorted(tuple(r) for r in df.collect())
    # spec layout: version hint, metadata json, snap-*.avro list,
    # *-m0.avro manifest, parquet data
    md = os.path.join(t, "metadata")
    names = os.listdir(md)
    assert "version-hint.text" in names
    assert "v1.metadata.json" in names
    assert any(n.startswith("snap-") and n.endswith(".avro") for n in names)
    assert any(n.endswith("-m0.avro") for n in names)
    meta = json.load(open(os.path.join(md, "v1.metadata.json")))
    assert meta["format-version"] == 2
    assert meta["partition-specs"] == [{"spec-id": 0, "fields": []}]
    # iceberg schema carries field ids
    assert all("id" in f for f in meta["schemas"][0]["fields"])


def test_append_accumulates_overwrite_replaces(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0, None)]), t)
    write_iceberg(_df(spark, [(2, "b", 2.0, None)]), t, mode="append")
    assert read_iceberg(spark, t).count() == 2
    write_iceberg(_df(spark, [(9, "z", 9.0, None)]), t, mode="overwrite")
    got = [(r.id, r.s) for r in read_iceberg(spark, t).collect()]
    assert got == [(9, "z")]


def test_time_travel_by_snapshot_id(spark, tmp_path):
    t = str(tmp_path / "t")
    s1 = write_iceberg(_df(spark, [(1, "a", 1.0, None)]), t)
    s2 = write_iceberg(_df(spark, [(2, "b", 2.0, None)]), t, mode="append")
    assert read_iceberg(spark, t, snapshot_id=s1).count() == 1
    assert read_iceberg(spark, t, snapshot_id=s2).count() == 2
    assert current_snapshot_id(t) == s2
    with pytest.raises(ValueError, match="does not exist"):
        read_iceberg(spark, t, snapshot_id=12345)


def test_snapshots_frame_attribution(spark, tmp_path):
    t = str(tmp_path / "t")
    s1 = write_iceberg(_df(spark, [(1, "a", 1.0, None), (2, "b", 2.0, None)]), t)
    s2 = write_iceberg(_df(spark, [(3, "c", 3.0, None)]), t, mode="append")
    snaps = {r.snapshot_id: r for r in table_snapshots(spark, t).collect()}
    assert set(snaps) == {s1, s2}
    assert snaps[s1].parent_id is None and snaps[s2].parent_id == s1
    assert (snaps[s1].sequence_number, snaps[s2].sequence_number) == (1, 2)
    assert snaps[s1].operation == "append"
    assert snaps[s1].added_rows == 2 and snaps[s2].added_rows == 1
    assert snaps[s1].existing_files == 0 and snaps[s2].existing_files > 0


def test_schema_is_applied_and_pinned(spark, tmp_path):
    """Reads go through the TABLE schema (schema-stable over files),
    and the writer refuses a mismatched frame rather than evolving."""
    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0, [1.0])]), t)
    assert read_iceberg(spark, t).schema == _df(spark, []).schema
    with pytest.raises(ValueError, match="schema mismatch"):
        write_iceberg(
            spark.createDataFrame([(1,)], "only long"), t, mode="append"
        )


def test_commit_conflict_put_if_absent(spark, tmp_path, monkeypatch):
    """A writer that read v1 while a concurrent winner commits v2 must
    lose the O_EXCL claim on v2 and raise, not overwrite."""
    import shutil

    import sparkstreamingtwitter_presidential_spark.sources.iceberg as I

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0, None)]), t)
    md = os.path.join(t, "metadata")
    # concurrent winner: a valid v2 lands AFTER our reader snapshots v1
    shutil.copy(
        os.path.join(md, "v1.metadata.json"),
        os.path.join(md, "v2.metadata.json"),
    )
    monkeypatch.setattr(I, "_current_metadata_version", lambda p: 1)
    with pytest.raises(IcebergCommitConflict):
        write_iceberg(_df(spark, [(2, "b", 2.0, None)]), t, mode="append")


def test_stale_version_hint_recovers_from_listing(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0, None)]), t)
    write_iceberg(_df(spark, [(2, "b", 2.0, None)]), t, mode="append")
    hint = os.path.join(t, "metadata", "version-hint.text")
    open(hint, "w").write("1")  # stale hint
    assert read_iceberg(spark, t).count() == 2  # listing wins
    os.remove(hint)
    assert read_iceberg(spark, t).count() == 2  # absent hint tolerated


def test_refusals_partitioned_and_deletes(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0, None)]), t)
    md = os.path.join(t, "metadata")
    meta = json.load(open(os.path.join(md, "v1.metadata.json")))

    # bucket[16] is now a SUPPORTED transform (r9): a foreign spec edit
    # over an unpartitioned-written table still reads — data files carry
    # the source column and bucket tuples matter only to pruning.
    meta2 = dict(meta)
    meta2["partition-specs"] = [
        {
            "spec-id": 0,
            "fields": [
                {
                    "source-id": 1,
                    "field-id": 1000,
                    "name": "id_bucket",
                    "transform": "bucket[16]",
                }
            ],
        }
    ]
    json.dump(meta2, open(os.path.join(md, "v2.metadata.json"), "w"))
    open(os.path.join(md, "version-hint.text"), "w").write("2")
    assert read_iceberg(spark, t).count() == 1

    # a transform OUTSIDE the spec's set still refuses by name
    meta2b = dict(meta2)
    meta2b["partition-specs"] = [
        {
            "spec-id": 0,
            "fields": [
                {
                    "source-id": 1,
                    "field-id": 1000,
                    "name": "id_z",
                    "transform": "zorder[4]",
                }
            ],
        }
    ]
    json.dump(meta2b, open(os.path.join(md, "v2.metadata.json"), "w"))
    with pytest.raises(NotImplementedError, match="transform"):
        read_iceberg(spark, t)

    # format-version 3 READS work since r10 (tests/test_iceberg_v3.py)
    # and WRITES since r11 — an append to a foreign-stamped v3 table
    # commits with the lineage bookkeeping; format-version 4 refuses
    meta3 = dict(meta)
    meta3["format-version"] = 3
    json.dump(meta3, open(os.path.join(md, "v3.metadata.json"), "w"))
    open(os.path.join(md, "version-hint.text"), "w").write("3")
    assert read_iceberg(spark, t).count() == 1
    write_iceberg(_df(spark, [(2, "b", 2.0, None)]), t, mode="append")
    assert read_iceberg(spark, t).count() == 2
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        _load_metadata,
    )
    m_after = _load_metadata(t)
    assert m_after["format-version"] == 3
    assert m_after["next-row-id"] == 1  # the appended row's id range
    assert m_after["snapshots"][-1]["first-row-id"] == 0
    meta4 = dict(meta)
    meta4["format-version"] = 4
    json.dump(meta4, open(os.path.join(md, "v4.metadata.json"), "w"))
    open(os.path.join(md, "version-hint.text"), "w").write("4")
    with pytest.raises(NotImplementedError, match="format-version"):
        read_iceberg(spark, t)


def test_map_column_roundtrip_and_unsupported_type_refused(spark, tmp_path):
    # map columns are first-class since r12 late (key-id/value-id
    # allocated in the schema, both type-bridge directions)
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, {"k": 1, "j": None}), (2, {})], "id long, m map<string,long>"
    )
    write_iceberg(df, t)
    got = {r.id: dict(r.m) for r in read_iceberg(spark, t).collect()}
    assert got == {1: {"k": 1, "j": None}, 2: {}}
    # genuinely unsupported types still refuse up front
    from decimal import Decimal

    bad = spark.createDataFrame([(Decimal("1.00"),)], "d decimal(10,2)")
    with pytest.raises(NotImplementedError, match="supports"):
        write_iceberg(bad, str(tmp_path / "t2"))


def test_lakehouse_fallback_routes_to_native_iceberg(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.lakehouse import (
        read_lakehouse,
        write_lakehouse,
    )

    t = str(tmp_path / "t")
    df = _df(spark, [(1, "a", 1.0, None)])
    write_lakehouse(df, "iceberg", t)
    assert read_lakehouse(spark, "iceberg", t).count() == 1


def test_timestamp_column_roundtrip(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.sql(
        "SELECT id, timestamp'2024-03-01 12:00:00' + make_interval(0,0,0,0,0,0,id) AS ts "
        "FROM range(5)"
    )
    write_iceberg(df, t)
    meta = json.load(open(os.path.join(t, "metadata", "v1.metadata.json")))
    assert meta["schemas"][0]["fields"][1]["type"] == "timestamptz"
    back = sorted(tuple(r) for r in read_iceberg(spark, t).collect())
    assert back == sorted(tuple(r) for r in df.collect())


def test_incremental_read_between_snapshots(spark, tmp_path):
    """Incremental scan yields exactly the rows added after
    from_snapshot, selects by sequence range (not listing diff), and
    refuses ranges crossing an overwrite."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        read_iceberg_incremental,
    )

    t = str(tmp_path / "t")
    s1 = write_iceberg(_df(spark, [(1, "a", 1.0, None)]), t)
    s2 = write_iceberg(_df(spark, [(2, "b", 2.0, None)]), t, mode="append")
    s3 = write_iceberg(_df(spark, [(3, "c", 3.0, None)]), t, mode="append")

    inc = read_iceberg_incremental(spark, t, from_snapshot=s1)
    assert sorted(r.id for r in inc.collect()) == [2, 3]
    inc12 = read_iceberg_incremental(spark, t, s1, to_snapshot=s2)
    assert [r.id for r in inc12.collect()] == [2]
    assert read_iceberg_incremental(spark, t, s3).count() == 0  # empty range
    with pytest.raises(ValueError, match="precedes"):
        read_iceberg_incremental(spark, t, s3, to_snapshot=s1)

    s4 = write_iceberg(_df(spark, [(9, "z", 9.0, None)]), t, mode="overwrite")
    with pytest.raises(ValueError, match="not an append"):
        read_iceberg_incremental(spark, t, s1, to_snapshot=s4)
    # a range strictly after the overwrite is fine again
    s5 = write_iceberg(_df(spark, [(10, "y", 1.0, None)]), t, mode="append")
    assert sorted(
        r.id for r in read_iceberg_incremental(spark, t, s4, to_snapshot=s5).collect()
    ) == [10]


def test_expire_snapshots_prunes_history_and_orphans(spark, tmp_path):
    """expire_snapshots removes expired snapshots from metadata (time
    travel refuses), deletes files reachable ONLY from them, and never
    touches anything a kept snapshot still references."""
    import glob as _glob

    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        expire_snapshots,
    )

    t = str(tmp_path / "t")
    s1 = write_iceberg(_df(spark, [(1, "a", 1.0, None)]), t)
    s2 = write_iceberg(_df(spark, [(9, "z", 9.0, None)]), t, mode="overwrite")
    s3 = write_iceberg(_df(spark, [(10, "y", 1.0, None)]), t, mode="append")

    n_data_before = len(_glob.glob(os.path.join(t, "data", "*", "*.parquet")))
    res = expire_snapshots(t, keep_last=2)
    assert res["expired_snapshots"] == [s1]
    assert res["deleted_files"] > 0

    # current and the kept parent still read exactly
    assert sorted(r.id for r in read_iceberg(spark, t).collect()) == [9, 10]
    assert [r.id for r in read_iceberg(spark, t, snapshot_id=s2).collect()] == [9]
    # the expired snapshot is gone from history and time travel
    with pytest.raises(ValueError, match="does not exist"):
        read_iceberg(spark, t, snapshot_id=s1)
    assert {r.snapshot_id for r in table_snapshots(spark, t).collect()} == {s2, s3}
    # s1's data files (overwritten, reachable only from s1) are deleted
    n_data_after = len(_glob.glob(os.path.join(t, "data", "*", "*.parquet")))
    assert n_data_after < n_data_before

    # keep_last covering everything is a no-op
    assert expire_snapshots(t, keep_last=5) == {
        "expired_snapshots": [],
        "deleted_files": 0,
    }
    with pytest.raises(ValueError, match="keep_last"):
        expire_snapshots(t, keep_last=0)


def test_expire_snapshots_keeps_files_shared_with_kept(spark, tmp_path):
    """Append chains share manifests across snapshots: expiring the
    first snapshot of an append chain must delete NOTHING the head
    still reads."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        expire_snapshots,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0, None)]), t)
    write_iceberg(_df(spark, [(2, "b", 2.0, None)]), t, mode="append")
    expire_snapshots(t, keep_last=1)
    assert sorted(r.id for r in read_iceberg(spark, t).collect()) == [1, 2]


def test_compact_binpacks_preserving_rows_and_history(spark, tmp_path):
    """compact_iceberg merges small files into fewer, commits a
    'replace' snapshot, preserves rows exactly, keeps pre-compaction
    time travel, and the incremental reader refuses ranges crossing
    the replace (rewritten rows must not double-count)."""
    import glob as _glob

    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        compact_iceberg,
        read_iceberg_incremental,
    )

    t = str(tmp_path / "t")
    s_ids = []
    for i in range(4):
        s_ids.append(
            write_iceberg(
                _df(spark, [(i * 10 + j, "g", float(j), None) for j in range(5)]),
                t,
                mode="append" if i else "append",
            )
        )
    before = sorted(tuple(r) for r in read_iceberg(spark, t).collect())
    n_files_before = len(
        {f for f in _glob.glob(os.path.join(t, "data", "*", "*.parquet"))}
    )
    sc = compact_iceberg(spark, t)
    assert sc != s_ids[-1]
    after = sorted(tuple(r) for r in read_iceberg(spark, t).collect())
    assert after == before  # rows byte-identical through the rewrite
    snaps = {r.snapshot_id: r for r in table_snapshots(spark, t).collect()}
    assert snaps[sc].operation == "replace"
    # the live file set shrank (old files remain on disk for time
    # travel until expire_snapshots)
    live = read_iceberg(spark, t).inputFiles()
    assert len(live) < n_files_before
    # time travel to pre-compaction still resolves
    assert len(read_iceberg(spark, t, snapshot_id=s_ids[1]).collect()) == 10
    # incremental scans crossing the replace refuse
    with pytest.raises(ValueError, match="not an append"):
        read_iceberg_incremental(spark, t, s_ids[0], to_snapshot=sc)
    # idempotence: nothing left to compact -> current id unchanged
    assert compact_iceberg(spark, t) in (sc, compact_iceberg(spark, t))


def test_bounds_recorded_and_skip_ranges_prune_files(spark, tmp_path):
    """The writer records spec-serialized per-file column bounds from
    the parquet footers; read_iceberg(skip_ranges=...) prunes files
    the bounds PROVE irrelevant, keeps files without bounds, and never
    drops rows a filter would keep."""
    from pyspark.sql import functions as F

    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        read_iceberg,
    )

    t = str(tmp_path / "t")
    # 4 range-clustered files: ids 0..999 in disjoint quarters
    df = (
        spark.range(1000)
        .select(
            F.col("id"),
            F.concat(F.lit("doc_"), F.format_string("%04d", F.col("id"))).alias("s"),
            (F.col("id") * 0.5).alias("v"),
            F.array(F.col("id").cast("float")).alias("arr"),
        )
        .repartitionByRange(4, "id")
        .sortWithinPartitions("id")
    )
    write_iceberg(
        df.select(
            F.col("id"), F.col("s"), F.col("v"), F.col("arr")
        ).withColumnRenamed("s", "s"),
        t,
    )

    full = read_iceberg(spark, t)
    assert len(full.inputFiles()) == 4
    # a narrow id range hits ONE quarter
    pruned = read_iceberg(spark, t, skip_ranges={"id": (100, 120)})
    assert len(pruned.inputFiles()) == 1
    got = sorted(r.id for r in pruned.filter("id BETWEEN 100 AND 120").collect())
    assert got == list(range(100, 121))  # rows exact after own filter
    # string bounds prune too
    pruned_s = read_iceberg(spark, t, skip_ranges={"s": ("doc_0990", None)})
    assert len(pruned_s.inputFiles()) == 1
    # double bounds
    pruned_v = read_iceberg(spark, t, skip_ranges={"v": (None, 10.0)})
    assert len(pruned_v.inputFiles()) == 1
    # unknown / non-primitive columns are advisory no-ops
    assert len(read_iceberg(spark, t, skip_ranges={"arr": (1, 2)}).inputFiles()) == 4
    assert len(read_iceberg(spark, t, skip_ranges={"nope": (1, 2)}).inputFiles()) == 4
    # a range excluding everything reads zero files but keeps schema
    none = read_iceberg(spark, t, skip_ranges={"id": (5000, 6000)})
    # (dtypes, not schema equality: a parquet scan relaxes nullability)
    assert none.count() == 0 and none.dtypes == full.dtypes


def test_timestamp_bounds_skip(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        read_iceberg,
    )
    import datetime

    t = str(tmp_path / "t")
    df = spark.sql(
        "SELECT id, timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,CAST(id AS INT),0,0,0) AS ts "
        "FROM range(100)"
    ).repartitionByRange(4, "id").sortWithinPartitions("id")
    write_iceberg(df, t)
    assert len(read_iceberg(spark, t).inputFiles()) == 4
    lo = datetime.datetime(2024, 1, 11)
    hi = datetime.datetime(2024, 1, 20)
    pruned = read_iceberg(spark, t, skip_ranges={"ts": (lo, hi)})
    assert 1 <= len(pruned.inputFiles()) <= 2
    got = pruned.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))).count()
    assert got == 10  # days 10..19 inclusive of lo..hi window


def test_sort_order_clusters_files_for_skipping(spark, tmp_path):
    """write_iceberg(sort_by=[...]) records the spec's sort order and
    stages CLUSTERED (range exchange + in-partition sort): data files
    get DISJOINT sort-key ranges, so a skip_ranges point read keeps
    ~1 file where the unsorted twin keeps nearly all; appends inherit
    the order (sort_order_id stamped), a mismatched sort_by refuses,
    and row content is unchanged."""
    import random

    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        _entries_and_deletes_for_snapshot,
        _load_metadata,
        _snapshot,
    )

    rows = list(range(20000))
    random.Random(7).shuffle(rows)
    df = spark.createDataFrame(
        [(i, float(i)) for i in rows], "id long, v double"
    ).repartition(8)
    # AQE would (correctly) coalesce this tiny exchange to one file;
    # pin partitions so the multi-file pruning behavior is visible
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key)
    spark.conf.set(coalesce_key, "false")
    try:
        tables = {}
        for name, kw in (("plain", {}), ("sorted", {"sort_by": ["id"]})):
            t = str(tmp_path / name)
            write_iceberg(df, t, **kw)
            tables[name] = t
    finally:
        spark.conf.set(coalesce_key, prev)
    kept = {}
    for name, t in tables.items():
        meta = _load_metadata(t)
        n_all = len(
            _entries_and_deletes_for_snapshot(t, _snapshot(meta, None))[0]
        )
        pruned = read_iceberg(spark, t, skip_ranges={"id": (100, 120)})
        kept[name] = (len(pruned.inputFiles()), n_all)
        got = sorted(
            r.id
            for r in pruned.filter("id between 100 and 120").collect()
        )
        assert got == list(range(100, 121))
    assert kept["sorted"][1] > 1  # clustering actually produced files
    assert kept["sorted"][0] == 1  # disjoint ranges: point read = 1 file
    assert kept["plain"][0] > kept["sorted"][0]
    # append inherits the order and stamps sort_order_id
    t = tables["sorted"]
    write_iceberg(
        spark.createDataFrame([(50000, 1.0)], "id long, v double"),
        t,
        mode="append",
    )
    meta = _load_metadata(t)
    entries, _ = _entries_and_deletes_for_snapshot(t, _snapshot(meta, None))
    assert {e["data_file"].get("sort_order_id") for e in entries} == {1}
    assert read_iceberg(spark, t).count() == 20001
    with pytest.raises(ValueError, match="sort order"):
        write_iceberg(
            spark.createDataFrame([(1, 1.0)], "id long, v double"),
            t,
            mode="append",
            sort_by=["v"],
        )
    with pytest.raises(ValueError, match="sort_by"):
        write_iceberg(df, str(tmp_path / "bad"), sort_by=["nope"])


def test_dml_and_compaction_preserve_sort_order(spark, tmp_path):
    """r11 review fix: DML rewrites and compaction on a sorted table
    re-stage CLUSTERED (sort_order_id stays 1, skipping keeps biting);
    a foreign out-of-subset order (descending) stages unsorted with a
    null stamp instead of refusing the write — spec-legal."""
    import json as _json

    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        _entries_and_deletes_for_snapshot,
        _load_metadata,
        _snapshot,
        compact_iceberg,
        update_iceberg,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(2000)], "id long, v double"
    ).repartition(4)
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key)
    spark.conf.set(coalesce_key, "false")
    try:
        write_iceberg(df, t, sort_by=["id"])
        update_iceberg(spark, t, {"v": "v + 1"}, "id < 100")
    finally:
        spark.conf.set(coalesce_key, prev)

    def stamps(path):
        meta = _load_metadata(path)
        entries, _ = _entries_and_deletes_for_snapshot(
            path, _snapshot(meta, None)
        )
        return {e["data_file"].get("sort_order_id") for e in entries}

    assert stamps(t) == {1}  # the rewrite re-staged clustered
    got = read_iceberg(spark, t)
    assert got.count() == 2000
    assert got.filter("id = 5").collect()[0].v == 6.0
    compact_iceberg(spark, t, target_file_bytes=1 << 30)
    assert stamps(t) == {1}
    assert read_iceberg(spark, t).count() == 2000

    # foreign out-of-subset order: append works, stamps null
    t2 = str(tmp_path / "t2")
    write_iceberg(df, t2)
    md = os.path.join(t2, "metadata")
    meta = _json.load(open(os.path.join(md, "v1.metadata.json")))
    meta["sort-orders"] = [
        {"order-id": 0, "fields": []},
        {
            "order-id": 7,
            "fields": [
                {
                    "transform": "identity",
                    "source-id": 1,
                    "direction": "desc",
                    "null-order": "nulls-last",
                }
            ],
        },
    ]
    meta["default-sort-order-id"] = 7
    _json.dump(meta, open(os.path.join(md, "v2.metadata.json"), "w"))
    open(os.path.join(md, "version-hint.text"), "w").write("2")
    write_iceberg(
        spark.createDataFrame([(99999, 1.0)], "id long, v double"),
        t2,
        mode="append",
    )
    assert read_iceberg(spark, t2).count() == 2001
    assert None in stamps(t2)
    # the foreign DECLARED order survives the append untouched (r12
    # stretch check: an append must never clobber sort-order metadata)
    m2 = _load_metadata(t2)
    assert m2["default-sort-order-id"] == 7
    assert {o["order-id"] for o in m2["sort-orders"]} == {0, 7}
    o7 = next(o for o in m2["sort-orders"] if o["order-id"] == 7)
    assert o7["fields"][0]["direction"] == "desc"

    # foreign IN-subset order under a non-1 id (e.g. a replaced order):
    # staged files must stamp THE TABLE'S default-sort-order-id, not a
    # literal 1 (r11 advice — order 1 may not even exist on the table)
    t3 = str(tmp_path / "t3")
    write_iceberg(df, t3)
    md3 = os.path.join(t3, "metadata")
    meta3 = _json.load(open(os.path.join(md3, "v1.metadata.json")))
    meta3["sort-orders"] = [
        {"order-id": 0, "fields": []},
        {
            "order-id": 3,
            "fields": [
                {
                    "transform": "identity",
                    "source-id": 1,
                    "direction": "asc",
                    "null-order": "nulls-first",
                }
            ],
        },
    ]
    meta3["default-sort-order-id"] = 3
    _json.dump(meta3, open(os.path.join(md3, "v2.metadata.json"), "w"))
    open(os.path.join(md3, "version-hint.text"), "w").write("2")
    write_iceberg(
        spark.createDataFrame([(99999, 1.0)], "id long, v double"),
        t3,
        mode="append",
    )
    assert 3 in stamps(t3) and 1 not in stamps(t3)
