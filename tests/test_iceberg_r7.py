"""Round-7 native Iceberg surface (sources/iceberg.py): small-file-only
compaction with carried-forward EXISTING entries, identity-partitioned
tables (write/read/prune), copy-on-write DELETE/UPDATE/MERGE, commit
revalidation against concurrent writers, expire_snapshots age +
current-snapshot guards, merged-manifest-safe incremental scans, and
exact integer timestamp bound serialization."""

from __future__ import annotations

import datetime
import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
    IcebergCommitConflict,
    compact_iceberg,
    current_snapshot_id,
    delete_iceberg,
    expire_snapshots,
    merge_iceberg,
    read_iceberg,
    read_iceberg_incremental,
    table_snapshots,
    update_iceberg,
    write_iceberg,
)

SCHEMA = "id long, s string, v double"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _live_paths(spark, t):
    return sorted(read_iceberg(spark, t).inputFiles())


# ------------------------------------------------------------- compaction


def test_compact_rewrites_only_small_files(spark, tmp_path):
    """The round-6 scale-killer fix: files already at/over the target
    are carried forward byte-identical (same PATHS — never rewritten);
    only the small set merges. Rows unchanged, replace snapshot
    committed, incremental refusal contract intact."""
    t = str(tmp_path / "t")
    # one big file (single 2k-row append coalesced to 1 file) ...
    big = _df(
        spark, [(i, f"s{i}", float(i)) for i in range(2000)]
    ).coalesce(1)
    s1 = write_iceberg(big, t)
    big_paths = set(_live_paths(spark, t))
    assert len(big_paths) == 1
    big_size = os.path.getsize(next(iter(big_paths)).replace("file:", ""))
    # ... plus several tiny appends
    for i in range(3):
        write_iceberg(_df(spark, [(10000 + i, "tiny", 0.5)]), t, mode="append")
    before = sorted(tuple(r) for r in read_iceberg(spark, t).collect())
    n_before = len(_live_paths(spark, t))
    assert n_before == 4

    # target sized so the big file is at/over it and the tiny ones under
    sc = compact_iceberg(spark, t, target_file_bytes=big_size)
    after_paths = set(_live_paths(spark, t))
    # the big file's PATH survives identically — it was not rewritten
    assert big_paths <= after_paths
    assert len(after_paths) < n_before
    # rows exact through the rewrite
    after = sorted(tuple(r) for r in read_iceberg(spark, t).collect())
    assert after == before
    snaps = {r.snapshot_id: r for r in table_snapshots(spark, t).collect()}
    assert snaps[sc].operation == "replace"
    assert snaps[sc].existing_files >= 1  # the carried big file
    # incremental across the replace refuses
    with pytest.raises(ValueError, match="not an append"):
        read_iceberg_incremental(spark, t, s1, to_snapshot=sc)
    # nothing left to compact -> current id unchanged (no empty commit)
    assert compact_iceberg(spark, t, target_file_bytes=big_size) == sc


def test_compact_commit_conflict_on_concurrent_append(spark, tmp_path):
    """A writer that appends between compaction planning and commit
    must surface as IcebergCommitConflict — never silently lose its
    rows (the put-if-absent claims the PLANNING version + 1)."""
    import sparkstreamingtwitter_presidential_spark.sources.iceberg as I

    t = str(tmp_path / "t")
    for i in range(3):
        write_iceberg(_df(spark, [(i, "x", 1.0)]), t, mode="append")

    real_stage = I._stage_data_files
    fired = {"done": False}

    def stage_with_race(df, path, ice_schema, part_fields, **kw):
        out = real_stage(df, path, ice_schema, part_fields)
        if not fired["done"]:
            fired["done"] = True  # concurrent append lands mid-compaction
            write_iceberg(_df(spark, [(99, "race", 9.9)]), t, mode="append")
        return out

    try:
        I._stage_data_files = stage_with_race
        with pytest.raises(IcebergCommitConflict):
            compact_iceberg(spark, t, target_file_bytes=1 << 30)
    finally:
        I._stage_data_files = real_stage
    # the concurrent append's row is intact
    assert (99, "race", 9.9) in {
        tuple(r) for r in read_iceberg(spark, t).collect()
    }


# ------------------------------------------------------ partitioned tables


def test_partitioned_roundtrip_and_spec_shape(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _df(
        spark,
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0), (4, "c", 4.0)],
    )
    write_iceberg(df, t, partition_by=["s"])
    meta = json.load(open(os.path.join(t, "metadata", "v1.metadata.json")))
    assert meta["partition-specs"] == [
        {
            "spec-id": 0,
            "fields": [
                {
                    "source-id": 2,
                    "field-id": 1000,
                    "name": "s",
                    "transform": "identity",
                }
            ],
        }
    ]
    # hive-style per-partition staging, source column NOT in data files
    staged = glob.glob(os.path.join(t, "data", "*", "s=*", "*.parquet"))
    assert staged
    import pyarrow.parquet as pq

    assert "s" not in pq.ParquetFile(staged[0]).schema_arrow.names
    # read injects partition values back; rows and schema exact
    back = read_iceberg(spark, t)
    assert back.schema == df.schema
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )


def test_partitioned_append_and_pruning(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg(
        _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t, partition_by=["s"]
    )
    write_iceberg(_df(spark, [(3, "a", 3.0), (4, "c", 4.0)]), t, mode="append")
    full = read_iceberg(spark, t)
    assert sorted(r.id for r in full.collect()) == [1, 2, 3, 4]
    n_files = len(full.inputFiles())
    # partition pruning: exact equality range on the partition column
    pruned = read_iceberg(spark, t, skip_ranges={"s": ("a", "a")})
    assert len(pruned.inputFiles()) < n_files
    assert sorted(r.id for r in pruned.collect()) == [1, 3]
    # pruning composes with data-column bounds
    both = read_iceberg(
        spark, t, skip_ranges={"s": ("a", "a"), "id": (3, None)}
    )
    assert [r.id for r in both.collect()] == [3]
    # mismatched partition_by on append refuses
    with pytest.raises(ValueError, match="partition spec"):
        write_iceberg(
            _df(spark, [(9, "z", 9.0)]), t, mode="append", partition_by=["id"]
        )


def test_partitioned_date_column_and_incremental(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.sql(
        "SELECT id, date'2024-01-01' + CAST(id % 3 AS INT) AS d FROM range(9)"
    )
    s1 = write_iceberg(df, t, partition_by=["d"])
    s2 = write_iceberg(
        spark.sql(
            "SELECT id, CASE WHEN id >= 0 THEN date'2024-01-05' END AS d "
            "FROM range(100, 103)"
        ),
        t,
        mode="append",
    )
    back = read_iceberg(spark, t)
    assert back.count() == 12
    assert dict(back.dtypes)["d"] == "date"
    pruned = read_iceberg(
        spark,
        t,
        skip_ranges={"d": (datetime.date(2024, 1, 5), None)},
    )
    assert sorted(r.id for r in pruned.collect()) == [100, 101, 102]
    # incremental over a partitioned table injects partition values too
    inc = read_iceberg_incremental(spark, t, from_snapshot=s1, to_snapshot=s2)
    assert sorted(r.id for r in inc.collect()) == [100, 101, 102]
    assert {r.d for r in inc.collect()} == {datetime.date(2024, 1, 5)}


def test_partition_refusals(spark, tmp_path):
    # null partition values refuse by name
    with pytest.raises(ValueError, match="null partition"):
        write_iceberg(
            _df(spark, [(1, None, 1.0)]), str(tmp_path / "t1"), partition_by=["s"]
        )
    # unsupported partition source type (double) refuses
    with pytest.raises(NotImplementedError, match="partition column"):
        write_iceberg(
            _df(spark, [(1, "a", 1.0)]), str(tmp_path / "t2"), partition_by=["v"]
        )
    # unknown partition column refuses
    with pytest.raises(ValueError, match="not in schema"):
        write_iceberg(
            _df(spark, [(1, "a", 1.0)]), str(tmp_path / "t3"), partition_by=["nope"]
        )


def test_partitioned_compact_stays_inside_partitions(spark, tmp_path):
    t = str(tmp_path / "t")
    for i in range(3):  # 3 appends x 2 partitions = 6 small files
        write_iceberg(
            _df(spark, [(i * 2, "a", 1.0), (i * 2 + 1, "b", 2.0)]),
            t,
            mode="append" if i else "append",
            partition_by=None if i else ["s"],
        )
    before = sorted(tuple(r) for r in read_iceberg(spark, t).collect())
    n_before = len(_live_paths(spark, t))
    assert n_before == 6
    compact_iceberg(spark, t)
    after_files = _live_paths(spark, t)
    assert len(after_files) == 2  # one merged file per partition
    assert sorted(tuple(r) for r in read_iceberg(spark, t).collect()) == before
    # partition pruning still exact after compaction
    pruned = read_iceberg(spark, t, skip_ranges={"s": ("b", "b")})
    assert len(pruned.inputFiles()) == 1
    assert sorted(r.id for r in pruned.collect()) == [1, 3, 5]


# ------------------------------------------------------------ CoW DML


def test_delete_iceberg_cow(spark, tmp_path):
    t = str(tmp_path / "t")
    # two files: one will contain matches, one must not be rewritten
    write_iceberg(_df(spark, [(1, "a", 1.0), (2, "a", 2.0)]).coalesce(1), t)
    write_iceberg(
        _df(spark, [(3, "b", 3.0), (4, "b", 4.0)]).coalesce(1),
        t,
        mode="append",
    )
    untouched = {
        p for p in _live_paths(spark, t)
    }
    s_before = current_snapshot_id(t)
    sd = delete_iceberg(spark, t, "id = 2")
    assert sd != s_before
    got = sorted(r.id for r in read_iceberg(spark, t).collect())
    assert got == [1, 3, 4]
    # the b-file was untouched: its exact path is still live
    after = set(_live_paths(spark, t))
    b_files = {p for p in untouched if p in after}
    assert len(b_files) == 1  # a-file rewritten, b-file carried forward
    # time travel to pre-delete still resolves
    assert len(read_iceberg(spark, t, snapshot_id=s_before).collect()) == 4
    snaps = {r.snapshot_id: r for r in table_snapshots(spark, t).collect()}
    assert snaps[sd].operation == "delete"
    # nothing matched -> no empty commit
    assert delete_iceberg(spark, t, "id = 999") == sd
    # null-predicate rows are NOT deleted (SQL semantics)
    write_iceberg(_df(spark, [(5, None, 5.0)]), t, mode="append")
    delete_iceberg(spark, t, "s = 'zzz'")
    assert 5 in {r.id for r in read_iceberg(spark, t).collect()}


def test_update_iceberg_cow(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]), t)
    su = update_iceberg(
        spark, t, {"v": "v * 10", "s": "upper(s)"}, predicate="id >= 2"
    )
    got = {r.id: (r.s, r.v) for r in read_iceberg(spark, t).collect()}
    assert got == {1: ("a", 1.0), 2: ("B", 20.0), 3: ("C", 30.0)}
    snaps = {r.snapshot_id: r for r in table_snapshots(spark, t).collect()}
    assert snaps[su].operation == "overwrite"
    with pytest.raises(ValueError, match="unknown column"):
        update_iceberg(spark, t, {"nope": "1"})
    # no match -> no commit
    assert update_iceberg(spark, t, {"v": "0.0"}, predicate="id > 99") == su


def test_update_refuses_partition_columns(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0)]), t, partition_by=["s"])
    with pytest.raises(ValueError, match="partition column"):
        update_iceberg(spark, t, {"s": "'z'"})


def test_merge_iceberg_upsert(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t)
    src = _df(spark, [(2, "B2", 22.0), (9, "new", 9.0)])
    sm = merge_iceberg(spark, t, src, keys=["id"])
    got = {r.id: (r.s, r.v) for r in read_iceberg(spark, t).collect()}
    assert got == {1: ("a", 1.0), 2: ("B2", 22.0), 9: ("new", 9.0)}
    snaps = {r.snapshot_id: r for r in table_snapshots(spark, t).collect()}
    assert snaps[sm].operation == "overwrite"

    # when_matched='delete' removes matches, still inserting non-matches
    merge_iceberg(
        spark,
        t,
        _df(spark, [(9, "x", 0.0), (50, "ins", 5.0)]),
        keys=["id"],
        when_matched="delete",
    )
    assert sorted(r.id for r in read_iceberg(spark, t).collect()) == [1, 2, 50]

    # duplicate source keys are ambiguous -> refuse
    with pytest.raises(ValueError, match="duplicate merge keys"):
        merge_iceberg(
            spark, t, _df(spark, [(1, "x", 0.0), (1, "y", 0.0)]), keys=["id"]
        )
    # insert_not_matched=False + no matches -> no commit
    before = current_snapshot_id(t)
    assert (
        merge_iceberg(
            spark,
            t,
            _df(spark, [(777, "no", 0.0)]),
            keys=["id"],
            insert_not_matched=False,
        )
        == before
    )


def test_merge_iceberg_partitioned(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg(
        _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t, partition_by=["s"]
    )
    merge_iceberg(
        spark, t, _df(spark, [(1, "a", 11.0), (3, "c", 3.0)]), keys=["id"]
    )
    got = {r.id: (r.s, r.v) for r in read_iceberg(spark, t).collect()}
    assert got == {1: ("a", 11.0), 2: ("b", 2.0), 3: ("c", 3.0)}
    # partition pruning exact after the merge
    pruned = read_iceberg(spark, t, skip_ranges={"s": ("a", "a")})
    assert [r.id for r in pruned.collect()] == [1]


# --------------------------------------------------------------- expire


def test_expire_snapshots_older_than(spark, tmp_path):
    t = str(tmp_path / "t")
    s1 = write_iceberg(_df(spark, [(1, "a", 1.0)]), t)
    s2 = write_iceberg(_df(spark, [(2, "b", 2.0)]), t, mode="append")
    s3 = write_iceberg(_df(spark, [(3, "c", 3.0)]), t, mode="append")
    # a cutoff BEFORE every commit expires nothing even with keep_last=1
    res = expire_snapshots(t, keep_last=1, older_than=0)
    assert res == {"expired_snapshots": [], "deleted_files": 0}
    assert {r.snapshot_id for r in table_snapshots(spark, t).collect()} == {
        s1,
        s2,
        s3,
    }
    # a cutoff after every commit falls back to keep_last
    future = int(datetime.datetime.now(datetime.timezone.utc).timestamp() * 1000) + 10_000
    res = expire_snapshots(t, keep_last=2, older_than=future)
    assert res["expired_snapshots"] == [s1]
    # datetime form accepted
    expire_snapshots(
        t,
        keep_last=2,
        older_than=datetime.datetime.now(datetime.timezone.utc),
    )
    assert sorted(r.id for r in read_iceberg(spark, t).collect()) == [1, 2, 3]


def test_expire_snapshots_keeps_rolled_back_current(spark, tmp_path):
    """A foreign rollback can point current-snapshot-id below the max
    sequence number; expiry must force that snapshot into the kept set
    instead of leaving metadata pointing at nothing."""
    t = str(tmp_path / "t")
    s1 = write_iceberg(_df(spark, [(1, "a", 1.0)]), t)
    write_iceberg(_df(spark, [(2, "b", 2.0)]), t, mode="append")
    s3 = write_iceberg(_df(spark, [(3, "c", 3.0)]), t, mode="append")
    # simulate the rollback: current points at s1
    md = os.path.join(t, "metadata")
    meta = json.load(open(os.path.join(md, "v3.metadata.json")))
    meta["current-snapshot-id"] = s1
    json.dump(meta, open(os.path.join(md, "v4.metadata.json"), "w"))
    open(os.path.join(md, "version-hint.text"), "w").write("4")

    res = expire_snapshots(t, keep_last=1)
    assert s1 not in res["expired_snapshots"]
    kept = {r.snapshot_id for r in table_snapshots(spark, t).collect()}
    assert {s1, s3} <= kept
    # the rolled-back current still reads
    assert [r.id for r in read_iceberg(spark, t).collect()] == [1]


# ------------------------------------------- foreign merged manifests


def test_incremental_reads_foreign_merged_manifest(spark, tmp_path):
    """Real writers merge manifests on append (manifest-merge-enabled
    defaults true): one manifest carries several appends' entries, the
    older ones re-marked EXISTING, min_sequence_number predating the
    scan range. Entry-level sequence selection must still find the
    in-range adds — the round-6 reader skipped the whole manifest."""
    from sparkstreamingtwitter_presidential_spark.sources.avro import (
        read_container,
        write_container,
    )
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        _manifest_entry_schema,
        _snapshot,
        _load_metadata,
    )

    t = str(tmp_path / "t")
    s1 = write_iceberg(_df(spark, [(1, "a", 1.0)]), t)
    s2 = write_iceberg(_df(spark, [(2, "b", 2.0)]), t, mode="append")
    s3 = write_iceberg(_df(spark, [(3, "c", 3.0)]), t, mode="append")

    # merge s3's manifests the way a real writer would: one manifest,
    # older entries EXISTING with their original sequence numbers
    meta = _load_metadata(t)
    snap = _snapshot(meta, s3)
    _, _, manifests = read_container(snap["manifest-list"])
    all_entries = []
    for m in manifests:
        _, _, entries = read_container(m["manifest_path"])
        for e in entries:
            seq = e["sequence_number"]
            if seq is None:
                seq = m["sequence_number"]
            all_entries.append(
                {
                    "status": 1 if seq == snap["sequence-number"] else 0,
                    "snapshot_id": e["snapshot_id"],
                    "sequence_number": seq,
                    "file_sequence_number": e["file_sequence_number"],
                    "data_file": e["data_file"],
                }
            )
    merged_path = os.path.join(t, "metadata", "merged-m0.avro")
    mlen = write_container(
        merged_path, _manifest_entry_schema([]), all_entries
    )
    merged = {
        "manifest_path": merged_path,
        "manifest_length": mlen,
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": snap["sequence-number"],
        "min_sequence_number": 1,
        "added_snapshot_id": s3,
        "added_files_count": 1,
        "existing_files_count": len(all_entries) - 1,
        "deleted_files_count": 0,
        "added_rows_count": 1,
        "existing_rows_count": len(all_entries) - 1,
        "deleted_rows_count": 0,
    }
    write_container(
        snap["manifest-list"],
        __import__(
            "sparkstreamingtwitter_presidential_spark.sources.iceberg",
            fromlist=["_MANIFEST_FILE_SCHEMA"],
        )._MANIFEST_FILE_SCHEMA,
        [merged],
    )

    # full read unaffected
    assert sorted(r.id for r in read_iceberg(spark, t).collect()) == [1, 2, 3]
    # incremental (s1, s3]: the merged manifest's min_seq=1 <= lo_seq=1,
    # yet rows 2 and 3 are in range — entry-level selection finds them
    inc = read_iceberg_incremental(spark, t, from_snapshot=s1)
    assert sorted(r.id for r in inc.collect()) == [2, 3]
    inc12 = read_iceberg_incremental(spark, t, s1, to_snapshot=s2)
    assert sorted(r.id for r in inc12.collect()) == [2]


# ------------------------------------------------- timestamp bound exactness


def test_timestamp_bound_encoding_is_exact_integer_micros():
    """float-seconds conversion has ~0.24 µs resolution at current
    epochs and int() truncates — a recorded upper bound 1 µs low
    would wrongly prune a file whose true max equals a query's lower
    bound. Integer arithmetic must be exact for every microsecond."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        _decode_bound,
        _encode_bound,
    )

    base = datetime.datetime(2024, 3, 1, 12, 0, 0, tzinfo=datetime.timezone.utc)
    base_us = int(base.timestamp()) * 1_000_000
    for delta_us in list(range(0, 50)) + [123457, 999999, 10**10 + 7]:
        dt = base + datetime.timedelta(microseconds=delta_us)
        enc = _encode_bound("timestamptz", dt)
        assert _decode_bound("timestamptz", enc) == base_us + delta_us
    # naive datetimes are read as UTC (Spark TIMESTAMP normalization)
    naive = datetime.datetime(2024, 3, 1, 12, 0, 0, 1)
    assert _decode_bound(
        "timestamptz", _encode_bound("timestamptz", naive)
    ) == base_us + 1


# -------------------------------------------- field-id column projection


def _foreign_rename(t: str, old: str, new: str) -> None:
    """Simulate a foreign engine's rename: a NEW schema with the same
    field ids under a new name, current-schema-id bumped — a pure
    metadata edit, data files untouched (the spec's rename)."""
    md = os.path.join(t, "metadata")
    v = max(
        int(n[1:].split(".")[0])
        for n in os.listdir(md)
        if n.startswith("v") and n.endswith(".metadata.json")
    )
    meta = json.load(open(os.path.join(md, f"v{v}.metadata.json")))
    old_schema = next(
        s
        for s in meta["schemas"]
        if s.get("schema-id", 0) == meta.get("current-schema-id", 0)
    )
    new_schema = json.loads(json.dumps(old_schema))
    new_schema["schema-id"] = old_schema.get("schema-id", 0) + 1
    for f in new_schema["fields"]:
        if f["name"] == old:
            f["name"] = new
    meta["schemas"].append(new_schema)
    meta["current-schema-id"] = new_schema["schema-id"]
    json.dump(meta, open(os.path.join(md, f"v{v + 1}.metadata.json"), "w"))
    open(os.path.join(md, "version-hint.text"), "w").write(str(v + 1))


def test_read_after_foreign_rename_projects_by_field_id(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t)
    _foreign_rename(t, "s", "label")
    back = read_iceberg(spark, t)
    assert back.columns == ["id", "label", "v"]
    got = sorted((r.id, r.label, r.v) for r in back.collect())
    assert got == [(1, "a", 1.0), (2, "b", 2.0)]
    # skip_ranges under the NEW name still prunes (bounds are id-keyed)
    write_iceberg(
        spark.createDataFrame(
            [(10, "z", 9.0)], "id long, label string, v double"
        ),
        t,
        mode="append",
    )
    pruned = read_iceberg(spark, t, skip_ranges={"id": (10, None)})
    assert [r.label for r in pruned.collect()] == ["z"]
    # mixed writing schemas (pre- and post-rename files) read as one
    assert sorted(r.label for r in read_iceberg(spark, t).collect()) == [
        "a",
        "b",
        "z",
    ]


def test_read_added_column_scans_null_for_old_files(spark, tmp_path):
    """A field-id the writing schema lacks (column added later) scans
    as NULL for the old files — the spec's added-column rule."""
    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0)]), t)
    md = os.path.join(t, "metadata")
    meta = json.load(open(os.path.join(md, "v1.metadata.json")))
    old_schema = meta["schemas"][0]
    new_schema = json.loads(json.dumps(old_schema))
    new_schema["schema-id"] = 1
    new_schema["fields"].append(
        {"id": 99, "name": "extra", "required": False, "type": "long"}
    )
    meta["schemas"].append(new_schema)
    meta["current-schema-id"] = 1
    meta["last-column-id"] = 99
    json.dump(meta, open(os.path.join(md, "v2.metadata.json"), "w"))
    open(os.path.join(md, "version-hint.text"), "w").write("2")

    back = read_iceberg(spark, t)
    assert back.columns == ["id", "s", "v", "extra"]
    row = back.collect()[0]
    assert (row.id, row.s, row.extra) == (1, "a", None)


# --------------------------------------- exactly-once streaming sink


def test_iceberg_sink_markers_and_idempotence(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        last_committed_batch,
    )
    from sparkstreamingtwitter_presidential_spark.streaming import (
        iceberg_batch_committer,
    )

    t = str(tmp_path / "t")
    assert last_committed_batch(t, "job") is None  # table doesn't exist
    commit = iceberg_batch_committer(t, "job")
    commit(_df(spark, [(1, "a", 1.0)]), 0)
    commit(_df(spark, [(2, "b", 2.0)]), 1)
    n_snaps = table_snapshots(spark, t).count()
    # crash-replay: batches 0 and 1 re-delivered -> skipped, no commit
    commit(_df(spark, [(1, "a", 1.0)]), 0)
    commit(_df(spark, [(2, "b", 2.0)]), 1)
    assert table_snapshots(spark, t).count() == n_snaps
    assert sorted(r.id for r in read_iceberg(spark, t).collect()) == [1, 2]
    # fresh batch still lands; markers are per-app
    commit(_df(spark, [(3, "c", 3.0)]), 2)
    assert last_committed_batch(t, "job") == 2
    iceberg_batch_committer(t, "job_b")(_df(spark, [(9, "z", 9.0)]), 0)
    assert read_iceberg(spark, t).count() == 4
    assert last_committed_batch(t, "job") == 2  # job_b didn't touch it


def test_iceberg_sink_stream_equals_batch(spark, tmp_path):
    import shutil
    import uuid as _uuid

    from sparkstreamingtwitter_presidential_spark.io import load_table
    from sparkstreamingtwitter_presidential_spark.queries import streaming as qs
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        last_committed_batch,
    )
    from sparkstreamingtwitter_presidential_spark.sources.replay import (
        read_events_stream,
    )
    from sparkstreamingtwitter_presidential_spark.streaming import (
        write_stream_to_iceberg,
    )

    SF_DIR = "/root/testdata/sf0.001"
    staged = qs._staged(spark, SF_DIR)
    run = f"/tmp/iceberg_sink_{_uuid.uuid4().hex[:8]}"
    table, ckpt = f"{run}/table", f"{run}/ckpt"
    try:
        stream = read_events_stream(spark, staged, files_per_trigger=1)
        q = write_stream_to_iceberg(stream, table, ckpt, app_id="test_ingest")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)
        got = read_iceberg(spark, table).select(
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


# ------------------------------------------------- orphan file cleanup


def test_remove_orphan_files(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        remove_orphan_files,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0)]), t)
    write_iceberg(_df(spark, [(2, "b", 2.0)]), t, mode="append")
    live_before = sorted(tuple(r) for r in read_iceberg(spark, t).collect())

    # plant orphans: a stale staged parquet dir and a stale avro
    orphan_dir = os.path.join(t, "data", "deadbeefcafe")
    os.makedirs(orphan_dir)
    orphan_parquet = os.path.join(orphan_dir, "part-orphan.parquet")
    open(orphan_parquet, "wb").write(b"PAR1junkPAR1")
    orphan_avro = os.path.join(t, "metadata", "deadbeef-m0.avro")
    open(orphan_avro, "wb").write(b"Obj\x01junk")
    old = 1  # epoch 1970 -> definitely older than any cutoff
    os.utime(orphan_parquet, (old, old))
    os.utime(orphan_avro, (old, old))

    # a FRESH orphan (mtime now) must survive the age guard
    fresh = os.path.join(orphan_dir, "part-fresh.parquet")
    open(fresh, "wb").write(b"PAR1junkPAR1")

    deleted = remove_orphan_files(t)
    assert orphan_parquet in deleted and orphan_avro in deleted
    assert os.path.exists(fresh)
    assert not os.path.exists(orphan_parquet)
    # nothing referenced was touched: reads exact, time travel intact
    assert sorted(tuple(r) for r in read_iceberg(spark, t).collect()) == live_before
    for sid in [r.snapshot_id for r in table_snapshots(spark, t).collect()]:
        read_iceberg(spark, t, snapshot_id=sid).collect()
    # explicit future cutoff sweeps the fresh orphan too
    future = int(__import__("time").time() * 1000) + 60_000
    deleted2 = remove_orphan_files(t, older_than_ms=future)
    assert fresh in deleted2
    assert sorted(tuple(r) for r in read_iceberg(spark, t).collect()) == live_before


def test_conflict_loser_files_become_orphans_and_sweep(spark, tmp_path):
    """The commit-conflict path leaves staged files on disk; the
    orphan sweep with an explicit cutoff reclaims them."""
    import sparkstreamingtwitter_presidential_spark.sources.iceberg as I
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        remove_orphan_files,
    )

    t = str(tmp_path / "t")
    for i in range(3):
        write_iceberg(_df(spark, [(i, "x", 1.0)]), t, mode="append")

    real_stage = I._stage_data_files
    fired = {"done": False}

    def stage_with_race(df, path, ice_schema, part_fields, **kw):
        out = real_stage(df, path, ice_schema, part_fields)
        if not fired["done"]:
            fired["done"] = True
            write_iceberg(_df(spark, [(99, "race", 9.9)]), t, mode="append")
        return out

    try:
        I._stage_data_files = stage_with_race
        with pytest.raises(IcebergCommitConflict):
            compact_iceberg(spark, t, target_file_bytes=1 << 30)
    finally:
        I._stage_data_files = real_stage

    future = int(__import__("time").time() * 1000) + 60_000
    deleted = remove_orphan_files(t, older_than_ms=future)
    assert deleted  # the losing compaction's staged parquet reclaimed
    got = sorted(r.id for r in read_iceberg(spark, t).collect())
    assert got == [0, 1, 2, 99]


def test_iceberg_upsert_committer_idempotence_and_collapse(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        last_committed_batch,
    )
    from sparkstreamingtwitter_presidential_spark.streaming import (
        iceberg_upsert_committer,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t)  # seed
    commit = iceberg_upsert_committer(spark, t, keys=["id"], app_id="up")
    commit(_df(spark, [(2, "B", 22.0), (3, "c", 3.0)]), 0)
    got = {r.id: (r.s, r.v) for r in read_iceberg(spark, t).collect()}
    assert got == {1: ("a", 1.0), 2: ("B", 22.0), 3: ("c", 3.0)}
    n_snaps = table_snapshots(spark, t).count()
    # redelivery of batch 0 is skipped — no new snapshot, values stable
    commit(_df(spark, [(2, "B", 22.0), (3, "c", 3.0)]), 0)
    assert table_snapshots(spark, t).count() == n_snaps
    assert last_committed_batch(t, "up") == 0

    # within-batch collapse: several changes for one key, last wins by v
    commit2 = iceberg_upsert_committer(
        spark, t, keys=["id"], app_id="up", order_col="v"
    )
    commit2(_df(spark, [(5, "first", 1.0), (5, "last", 9.0)]), 1)
    got = {r.id: r.s for r in read_iceberg(spark, t).collect()}
    assert got[5] == "last"
    # without collapse, duplicate keys refuse (MERGE ambiguity)
    with pytest.raises(ValueError, match="duplicate merge keys"):
        iceberg_upsert_committer(spark, t, keys=["id"], app_id="up")(
            _df(spark, [(6, "x", 1.0), (6, "y", 2.0)]), 2
        )


# ------------------------------------------------------ schema evolution


def test_add_column_reads_null_then_appends_carry_it(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        add_column_iceberg,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0)]), t)
    add_column_iceberg(t, "score", "double")
    back = read_iceberg(spark, t)
    assert back.columns == ["id", "s", "v", "score"]
    assert back.collect()[0].score is None  # old file: added-column NULL
    # appends must now carry the evolved schema
    with pytest.raises(ValueError, match="schema mismatch"):
        write_iceberg(_df(spark, [(2, "b", 2.0)]), t, mode="append")
    evolved = spark.createDataFrame(
        [(2, "b", 2.0, 0.5)], "id long, s string, v double, score double"
    )
    write_iceberg(evolved, t, mode="append")
    got = {r.id: r.score for r in read_iceberg(spark, t).collect()}
    assert got == {1: None, 2: 0.5}
    with pytest.raises(ValueError, match="already exists"):
        add_column_iceberg(t, "score", "double")
    with pytest.raises(NotImplementedError, match="primitive"):
        add_column_iceberg(t, "m", "map<string,int>")


def test_rename_column_first_class(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        rename_column_iceberg,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0)]), t)
    rename_column_iceberg(t, "s", "label")
    back = read_iceberg(spark, t)
    assert back.columns == ["id", "label", "v"]
    assert back.collect()[0].label == "a"
    with pytest.raises(ValueError, match="not in schema"):
        rename_column_iceberg(t, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        rename_column_iceberg(t, "id", "label")
    # partition SOURCE renames work since r9 late: manifest tuples key
    # by the SPEC field name (immutable under column renames) and
    # resolve to the current column by source-id
    t2 = str(tmp_path / "t2")
    write_iceberg(_df(spark, [(1, "a", 1.0)]), t2, partition_by=["s"])
    rename_column_iceberg(t2, "s", "label")
    back2 = read_iceberg(spark, t2)
    assert back2.columns == ["id", "label", "v"]
    assert back2.collect()[0].label == "a"


def test_partitioned_fast_path_single_scan_and_special_chars(spark, tmp_path):
    """Above _UNION_MAX_GROUPS distinct tuples, the hive-layout fast
    path reads the table in ONE scan (plan width independent of
    partition count — no Union node), and partition values with
    hive-escaped or url_decode-hostile characters (space, '+', '%',
    '#', '=') roundtrip exactly through the path decoding."""
    t = str(tmp_path / "t")
    vals = ["plain", "with space", "a+b", "100%", "x#y", "k=v"] + [
        f"bulk_{i:02d}" for i in range(30)
    ]  # 36 distinct tuples > the 32-group union ceiling
    rows = [(i, v, float(i)) for i, v in enumerate(vals)]
    write_iceberg(_df(spark, rows), t, partition_by=["s"])
    back = read_iceberg(spark, t)
    assert sorted(r.s for r in back.collect()) == sorted(vals)
    plan = back._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan  # single scan, not per-partition union
    # pruned reads drop under the ceiling -> union path with literal
    # folding; values still exact
    pruned = read_iceberg(spark, t, skip_ranges={"s": ("a+b", "a+b")})
    assert [r.s for r in pruned.collect()] == ["a+b"]
    # the DML probe (with_file) rides the same single-scan path
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        update_iceberg,
    )

    update_iceberg(spark, t, {"v": "v + 1"}, predicate="s = '100%'")
    got = {r.s: r.v for r in read_iceberg(spark, t).collect()}
    assert got["100%"] == 4.0 and got["plain"] == 0.0


def test_partitioned_required_column_falls_back_to_union(spark, tmp_path):
    """A REQUIRED (non-nullable) partition column cannot take the
    path-parsing fast path (it analyzes nullable); the literal-union
    fallback preserves the table schema exactly."""
    t = str(tmp_path / "t")
    df = spark.sql(
        "SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS s "
        "FROM range(6)"
    )  # range() id and the exhaustive CASE are non-nullable
    assert not df.schema["s"].nullable
    write_iceberg(df, t, partition_by=["s"])
    back = read_iceberg(spark, t)
    # the REQUIRED partition column keeps its nullability through the
    # literal-union fallback (data columns relax to nullable on any
    # parquet scan — the engine-wide documented behavior)
    assert not back.schema["s"].nullable
    assert back.dtypes == df.dtypes
    plan = back._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" in plan  # fallback took the per-partition shape
    assert sorted((r.id, r.s) for r in back.collect()) == sorted(
        (r.id, r.s) for r in df.collect()
    )


def test_rename_guards_refuse_silent_null_paths(spark, tmp_path):
    """Name-projected surfaces that would materialize NULLs for a
    renamed column refuse by name (CoW DML over pre-rename files);
    partitioned READS project by field-id since r8, and partitioned
    RENAMES are first-class since r9 late — see
    test_partitioned_rename_first_class."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        rename_column_iceberg,
        update_iceberg,
    )

    # partitioned rename works; old files keep serving via projection
    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0)]), t, partition_by=["s"])
    rename_column_iceberg(t, "v", "val")
    assert read_iceberg(spark, t).collect()[0].val == 1.0

    # DML over pre-rename files refuses (unpartitioned)
    t2 = str(tmp_path / "t2")
    write_iceberg(_df(spark, [(1, "a", 1.0)]), t2)
    _foreign_rename(t2, "v", "val")
    with pytest.raises(NotImplementedError, match="materialize"):
        update_iceberg(spark, t2, {"val": "val + 1"})
    # but plain reads still project correctly by field id
    assert read_iceberg(spark, t2).collect()[0].val == 1.0


def test_partitioned_read_after_foreign_rename(spark, tmp_path):
    """r8 (r7 stretch item 9): partitioned reads project by field-id —
    files written before a foreign rename scan under their OWN names
    with partition values injected under the writing schema's source
    name, then alias to the read schema; mixed pre-/post-rename files
    union to one correct frame. The r7 refusal is lifted."""
    t = str(tmp_path / "t")
    write_iceberg(
        _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t, partition_by=["s"]
    )
    # rename a DATA column
    _foreign_rename(t, "v", "val")
    back = read_iceberg(spark, t)
    assert back.columns == ["id", "s", "val"]
    assert sorted((r.id, r.s, r.val) for r in back.collect()) == [
        (1, "a", 1.0),
        (2, "b", 2.0),
    ]
    # rename the PARTITION SOURCE column too (spec fields are
    # source-id keyed, so injection follows the field id)
    _foreign_rename(t, "s", "label")
    back2 = read_iceberg(spark, t)
    assert back2.columns == ["id", "label", "val"]
    assert sorted((r.id, r.label, r.val) for r in back2.collect()) == [
        (1, "a", 1.0),
        (2, "b", 2.0),
    ]
    # an append under the NEW names mixes with the pre-rename files
    write_iceberg(
        spark.createDataFrame(
            [(3, "c", 3.0)], "id long, label string, val double"
        ),
        t,
        mode="append",
    )
    got = sorted((r.id, r.label, r.val) for r in read_iceberg(spark, t).collect())
    assert got == [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]
    # partition skipping still prunes across the mixed history, under
    # the NEW source name
    pruned = read_iceberg(spark, t, skip_ranges={"label": ("c", "c")})
    assert [r.id for r in pruned.collect()] == [3]


def test_dml_after_add_column_uses_evolved_schema(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        add_column_iceberg,
        update_iceberg,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t)
    add_column_iceberg(t, "score", "double")
    # SET may reference and assign the evolved column; old rows' NULL
    # score flows through the rewrite for non-matching rows
    update_iceberg(spark, t, {"score": "v * 10"}, predicate="id = 2")
    got = {r.id: r.score for r in read_iceberg(spark, t).collect()}
    assert got == {1: None, 2: 20.0}


def test_snapshots_frame_existing_not_double_counted(spark, tmp_path):
    """An append AFTER a compaction carries the compaction's manifest
    (which holds EXISTING entries); the frame must count each
    pre-existing file once."""
    t = str(tmp_path / "t")
    for i in range(3):
        write_iceberg(_df(spark, [(i, "x", 1.0)]), t, mode="append")
    compact_iceberg(spark, t)  # 3 small -> 1 file (EXISTING none, ADDED 1)
    s5 = write_iceberg(_df(spark, [(9, "z", 9.0)]), t, mode="append")
    snaps = {r.snapshot_id: r for r in table_snapshots(spark, t).collect()}
    # before the append: 1 live file (the compacted one); the append
    # adds 1 -> existing_files for the append snapshot is exactly 1
    assert snaps[s5].existing_files == 1
    assert snaps[s5].added_files == 1


def test_rename_guard_covers_compact_and_incremental(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        rename_column_iceberg,
    )

    t = str(tmp_path / "t")
    s1 = write_iceberg(_df(spark, [(1, "a", 1.0)]), t)
    s2 = write_iceberg(_df(spark, [(2, "b", 2.0)]), t, mode="append")
    rename_column_iceberg(t, "v", "val")
    with pytest.raises(NotImplementedError, match="compaction"):
        compact_iceberg(spark, t, target_file_bytes=1 << 30)
    with pytest.raises(NotImplementedError, match="incremental"):
        read_iceberg_incremental(spark, t, from_snapshot=s1).collect()
    # the snapshot read itself still projects correctly by field id
    assert sorted(r.val for r in read_iceberg(spark, t).collect()) == [1.0, 2.0]


def test_rewrite_manifests_collapses_the_walk(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.avro import (
        read_container,
    )
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        _load_metadata,
        _snapshot,
        rewrite_manifests,
    )

    t = str(tmp_path / "t")
    for i in range(6):
        write_iceberg(_df(spark, [(i, "x", float(i))]), t, mode="append")
    before = sorted(tuple(r) for r in read_iceberg(spark, t).collect())
    files_before = set(read_iceberg(spark, t).inputFiles())
    snap = _snapshot(_load_metadata(t), None)
    assert len(read_container(snap["manifest-list"])[2]) == 6

    sc = rewrite_manifests(spark, t)
    snap2 = _snapshot(_load_metadata(t), None)
    assert len(read_container(snap2["manifest-list"])[2]) == 1  # collapsed
    # zero data movement: same files, same rows
    assert set(read_iceberg(spark, t).inputFiles()) == files_before
    assert sorted(tuple(r) for r in read_iceberg(spark, t).collect()) == before
    snaps = {r.snapshot_id: r for r in table_snapshots(spark, t).collect()}
    assert snaps[sc].operation == "replace" and snaps[sc].added_files == 0
    # appends continue normally and incremental works after the rewrite
    s_next = write_iceberg(_df(spark, [(99, "y", 9.0)]), t, mode="append")
    inc = read_iceberg_incremental(spark, t, from_snapshot=sc, to_snapshot=s_next)
    assert [r.id for r in inc.collect()] == [99]
    # idempotent: single manifest -> no new commit
    write_iceberg(_df(spark, [(100, "z", 1.0)]), t, mode="append")
    collapsed = rewrite_manifests(spark, t)
    assert rewrite_manifests(spark, t) == collapsed  # no empty commit


def test_table_partitions_metadata_frame(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        table_partitions,
    )

    t = str(tmp_path / "t")
    write_iceberg(
        _df(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)]),
        t,
        partition_by=["s"],
    )
    write_iceberg(_df(spark, [(4, "b", 4.0)]), t, mode="append")
    parts = {r.s: (r.n_files, r.n_rows) for r in table_partitions(spark, t).collect()}
    assert set(parts) == {"a", "b"}
    assert parts["a"][1] == 2 and parts["b"][1] == 2
    assert parts["b"][0] == 2  # two appends -> two files in b
    # date partitions decode back to dates
    t2 = str(tmp_path / "t2")
    df = spark.sql(
        "SELECT id, date'2024-01-01' + CAST(id % 2 AS INT) AS d FROM range(4)"
    )
    write_iceberg(df, t2, partition_by=["d"])
    got = {r.d for r in table_partitions(spark, t2).collect()}
    assert got == {datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)}
    # unpartitioned: one totals row
    t3 = str(tmp_path / "t3")
    write_iceberg(_df(spark, [(1, "a", 1.0)]), t3)
    rows = table_partitions(spark, t3).collect()
    assert len(rows) == 1 and rows[0].n_rows == 1


def test_bound_codec_roundtrips_exactly():
    """Appendix-D single-value serialization: decode(encode(v)) is
    exact for every supported primitive across sign/extreme values."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        _decode_bound,
        _encode_bound,
    )

    cases = [
        ("int", [0, 1, -1, 2**31 - 1, -(2**31)]),
        ("long", [0, 1, -1, 2**63 - 1, -(2**63)]),
        ("double", [0.0, -0.0, 1.5, -2.25, 1e308, 5e-324]),
        ("string", ["", "a", "doc_0099", "Ünïcodé ✓", "a\tb"]),
        ("date", [datetime.date(1970, 1, 1), datetime.date(2024, 2, 29),
                  datetime.date(1969, 12, 31)]),
    ]
    for typ, vals in cases:
        for v in vals:
            enc = _encode_bound(typ, v)
            dec = _decode_bound(typ, enc)
            if typ == "date":
                assert dec == (v - datetime.date(1970, 1, 1)).days
            else:
                assert dec == v, (typ, v)
    # float roundtrips through float32 precision
    import struct

    f = _decode_bound("float", _encode_bound("float", 1.5))
    assert f == 1.5
    # unsupported values record NO bound (readers keep the file)
    assert _encode_bound("int", "not a number") is None


def test_expire_after_rewrite_manifests(spark, tmp_path):
    """Expiring pre-rewrite snapshots deletes their per-append
    manifests while the collapsed manifest keeps every data file
    reachable — the reachability diff across the two shapes."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        rewrite_manifests,
    )

    t = str(tmp_path / "t")
    for i in range(4):
        write_iceberg(_df(spark, [(i, "x", float(i))]), t, mode="append")
    before = sorted(tuple(r) for r in read_iceberg(spark, t).collect())
    rewrite_manifests(spark, t)
    res = expire_snapshots(t, keep_last=1)
    assert len(res["expired_snapshots"]) == 4
    assert res["deleted_files"] > 0  # old manifest lists + manifests
    assert sorted(tuple(r) for r in read_iceberg(spark, t).collect()) == before


def test_fast_path_refuses_when_path_disagrees_with_manifest(spark, tmp_path):
    """The manifest's partition tuples are authoritative (the spec's
    identity allowance — dir names are NOT required to agree). Above
    the union ceiling, a file whose /col=val/ segment decodes to a
    value different from its manifest tuple must force the literal
    union, which returns the MANIFEST's values (was: silently
    different answers above vs below the ceiling; ADVICE r7)."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        _read_files,
    )
    import pyspark.sql.types as T

    base = str(tmp_path / "data")
    spark.createDataFrame(
        [(i, f"p{i:02d}") for i in range(40)], "id long, s string"
    ).write.partitionBy("s").parquet(base)
    files = []
    for d in sorted(os.listdir(base)):
        if not d.startswith("s="):
            continue
        for fn in os.listdir(os.path.join(base, d)):
            if fn.endswith(".parquet"):
                files.append(
                    {
                        "file_path": os.path.join(base, d, fn),
                        "partition": {"s_part": d[2:]},
                    }
                )
    assert len(files) >= 40
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("s", T.StringType()),
        ]
    )
    pf = [
        {
            "name": "s_part",
            "source_name": "s",
            "type": "string",
            "transform": "identity",
            "param": None,
            "result_type": "string",
        }
    ]
    back = _read_files(spark, files, schema, pf)
    plan = back._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan  # agreeing layout: fast path holds
    assert sorted(r.s for r in back.collect()) == sorted(
        f"p{i:02d}" for i in range(40)
    )
    # forge disagreement: one manifest tuple differs from its dir
    files[7] = dict(files[7], partition={"s_part": "zz"})
    back2 = _read_files(spark, files, schema, pf)
    plan2 = back2._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" in plan2  # fast path refused
    got = sorted(r.s for r in back2.collect())
    assert "zz" in got and len(got) == 40  # the manifest's value wins


# ------------------------------------------------ r8: type promotion


def _foreign_retype(t: str, col: str, new_type: str) -> None:
    """Simulate a foreign engine's type evolution: a NEW schema with
    the same field ids where ``col`` carries ``new_type``,
    current-schema-id bumped — a pure metadata edit, data files
    untouched (the spec's type promotion)."""
    md = os.path.join(t, "metadata")
    v = max(
        int(n[1:].split(".")[0])
        for n in os.listdir(md)
        if n.startswith("v") and n.endswith(".metadata.json")
    )
    meta = json.load(open(os.path.join(md, f"v{v}.metadata.json")))
    old_schema = next(
        s
        for s in meta["schemas"]
        if s.get("schema-id", 0) == meta.get("current-schema-id", 0)
    )
    new_schema = json.loads(json.dumps(old_schema))
    new_schema["schema-id"] = old_schema.get("schema-id", 0) + 1
    for f in new_schema["fields"]:
        if f["name"] == col:
            f["type"] = new_type
    meta["schemas"].append(new_schema)
    meta["current-schema-id"] = new_schema["schema-id"]
    json.dump(meta, open(os.path.join(md, f"v{v + 1}.metadata.json"), "w"))
    open(os.path.join(md, "version-hint.text"), "w").write(str(v + 1))


def test_read_after_safe_type_promotion_widens_old_files(spark, tmp_path):
    """The spec's safe promotions (int->long, float->double) read
    exactly: files written under the OLD type scan under it and widen
    to the read schema; files written under the NEW type scan
    directly; mixed histories union to one frame (r7 verdict item 4)."""
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10, 1.5), (2, 20, 2.5)], "id long, n int, x float"
    )
    write_iceberg(df, t)
    _foreign_retype(t, "n", "long")
    _foreign_retype(t, "x", "double")
    back = read_iceberg(spark, t)
    assert dict(back.dtypes) == {"id": "bigint", "n": "bigint", "x": "double"}
    got = sorted((r.id, r.n, round(r.x, 1)) for r in back.collect())
    assert got == [(1, 10, 1.5), (2, 20, 2.5)]
    # append under the WIDENED schema: mixed writing types read as one
    write_iceberg(
        spark.createDataFrame(
            [(3, 2**40, 3.5)], "id long, n long, x double"
        ),
        t,
        mode="append",
    )
    got2 = sorted((r.id, r.n) for r in read_iceberg(spark, t).collect())
    assert got2 == [(1, 10), (2, 20), (3, 2**40)]
    # skip_ranges still prunes across the mixed history
    pruned = read_iceberg(spark, t, skip_ranges={"id": (3, None)})
    assert [r.n for r in pruned.collect()] == [2**40]


def test_unsafe_type_changes_still_refuse(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame([(1, 10)], "id long, n int"), t
    )
    _foreign_retype(t, "n", "string")  # not a spec promotion
    with pytest.raises(NotImplementedError, match="safe promotions"):
        read_iceberg(spark, t).collect()
    # narrowing is never safe either
    t2 = str(tmp_path / "t2")
    write_iceberg(
        spark.createDataFrame([(1, 2**40)], "id long, n long"), t2
    )
    _foreign_retype(t2, "n", "int")
    with pytest.raises(NotImplementedError, match="safe promotions"):
        read_iceberg(spark, t2).collect()


def test_partitioned_read_over_promoted_files_widens(spark, tmp_path):
    """Partitioned reads ride the same per-writing-schema remap as
    unpartitioned ones (r8): files written under the OLD type scan
    under it, widen to the read type, and partition values inject from
    the manifests — correct values, no refusal, no parquet-reader
    crash."""
    t = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b")], "id long, n int, s string"
        ),
        t,
        partition_by=["s"],
    )
    _foreign_retype(t, "n", "long")
    back = read_iceberg(spark, t)
    assert dict(back.dtypes)["n"] == "bigint"
    assert sorted((r.id, r.n, r.s) for r in back.collect()) == [
        (1, 10, "a"),
        (2, 20, "b"),
    ]
    # unsafe changes still refuse on the partitioned path too
    _foreign_retype(t, "n", "string")
    with pytest.raises(NotImplementedError, match="safe promotions"):
        read_iceberg(spark, t).collect()


# ------------------------------------------------ r8: position deletes


def test_positional_delete_write_read_roundtrip(spark, tmp_path):
    """MOR DELETE: delete_iceberg_positional writes a (file_path, pos)
    delete file through a content=1 delete manifest; snapshot reads
    apply it (anti-join on _metadata row position); time travel to the
    pre-delete snapshot still sees every row."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        delete_iceberg_positional,
        table_snapshots,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(i, f"s{i}", float(i)) for i in range(10)]), t)
    write_iceberg(
        _df(spark, [(i, f"s{i}", float(i)) for i in range(10, 20)]),
        t,
        mode="append",
    )
    pre = read_iceberg(spark, t)
    assert pre.count() == 20
    sid = delete_iceberg_positional(spark, t, "id % 3 = 0")
    back = read_iceberg(spark, t)
    got = sorted(r.id for r in back.collect())
    assert got == [i for i in range(20) if i % 3 != 0]
    # the delete snapshot is a 'delete' op; rows survive in history
    snaps = {r.snapshot_id: r.operation for r in table_snapshots(spark, t).collect()}
    assert snaps[sid] == "delete"
    hist = sorted(
        s for s in snaps if s != sid
    )
    at = read_iceberg(spark, t, snapshot_id=hist[-1])
    assert at.count() in (10, 20)  # pre-delete snapshot intact
    # no-match predicate commits nothing
    sid2 = delete_iceberg_positional(spark, t, "id > 1000000")
    assert sid2 == sid
    # second delete stacks on the first
    delete_iceberg_positional(spark, t, "id = 1")
    got2 = sorted(r.id for r in read_iceberg(spark, t).collect())
    assert got2 == [i for i in range(20) if i % 3 != 0 and i != 1]


def test_positional_deletes_scope_by_sequence_number(spark, tmp_path):
    """A position delete applies only to data files with sequence
    number <= the delete's: rows appended AFTER the delete at the same
    in-file positions must survive."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        delete_iceberg_positional,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t)
    delete_iceberg_positional(spark, t, "id = 1")
    # append rows that could collide positionally with deleted ones
    write_iceberg(
        _df(spark, [(1, "a2", 10.0), (2, "b2", 20.0)]), t, mode="append"
    )
    got = sorted((r.id, r.s) for r in read_iceberg(spark, t).collect())
    assert got == [(1, "a2"), (2, "b"), (2, "b2")]


def test_live_deletes_block_dml_and_rewrite_restores(spark, tmp_path):
    """Compaction refuses while position deletes are live (its scan
    does not apply them); CoW DML runs DIRECTLY since r10 late (the
    DML scan applies the deletes — pinned here by an UPDATE whose
    rewrite must not resurrect the deleted row);
    rewrite_position_deletes folds the backlog — only affected files
    rewrite — and compaction works again."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        compact_iceberg,
        delete_iceberg_positional,
        rewrite_position_deletes,
        update_iceberg,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(i, f"s{i}", float(i)) for i in range(6)]), t)
    write_iceberg(
        _df(spark, [(i, f"s{i}", float(i)) for i in range(6, 12)]),
        t,
        mode="append",
    )
    delete_iceberg_positional(spark, t, "id = 3")  # touches file 1 only
    with pytest.raises(NotImplementedError, match="position-delete"):
        compact_iceberg(spark, t)
    # DML applies the live delete: id=3 stays gone through the rewrite
    update_iceberg(spark, t, {"v": "v + 1"}, predicate="id = 4")
    got_mid = sorted(r.id for r in read_iceberg(spark, t).collect())
    assert got_mid == [i for i in range(12) if i != 3]
    update_iceberg(spark, t, {"v": "v - 1"}, predicate="id = 4")  # undo

    before = {
        f for f in read_iceberg(spark, t).inputFiles()
    }
    rewrite_position_deletes(spark, t)
    after = {f for f in read_iceberg(spark, t).inputFiles()}
    # the untouched file survives byte-identical (same path)
    assert before & after, "unaffected files must carry forward"
    got = sorted(r.id for r in read_iceberg(spark, t).collect())
    assert got == [i for i in range(12) if i != 3]
    # DML works again
    update_iceberg(spark, t, {"v": "v + 100"}, predicate="id = 0")
    assert read_iceberg(spark, t).filter("id = 0").collect()[0].v == 100.0


def test_positional_delete_on_partitioned_table(spark, tmp_path):
    # the r8 refusal is LIFTED in r9: delete files are partition-scoped
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        delete_iceberg_positional,
        read_iceberg,
    )

    t = str(tmp_path / "t")
    write_iceberg(
        _df(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)]),
        t,
        partition_by=["s"],
    )
    delete_iceberg_positional(spark, t, "id = 2")
    got = sorted((r.id, r.s) for r in read_iceberg(spark, t).collect())
    assert got == [(1, "a"), (3, "b")]


def test_mor_upsert_equality_deletes(spark, tmp_path):
    """upsert_iceberg_mor: one snapshot = new data files + an equality
    delete file on the key columns; the strict sequence rule (delete
    seq s removes only rows of files with seq < s) makes reads
    last-write-wins without rewriting a single old file."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        table_snapshots,
        upsert_iceberg_mor,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]), t)
    files_before = set(read_iceberg(spark, t).inputFiles())
    sid = upsert_iceberg_mor(
        spark, t, _df(spark, [(2, "B2", 22.0), (9, "new", 9.0)]), keys=["id"]
    )
    got = {r.id: (r.s, r.v) for r in read_iceberg(spark, t).collect()}
    assert got == {
        1: ("a", 1.0),
        2: ("B2", 22.0),
        3: ("c", 3.0),
        9: ("new", 9.0),
    }
    # MOR: the original data files were NOT rewritten
    assert files_before <= set(read_iceberg(spark, t).inputFiles())
    snaps = {
        r.snapshot_id: r.operation
        for r in table_snapshots(spark, t).collect()
    }
    assert snaps[sid] == "overwrite"
    # stacked upserts: later delete outranks earlier batch's data file
    upsert_iceberg_mor(spark, t, _df(spark, [(2, "B3", 222.0)]), keys=["id"])
    assert read_iceberg(spark, t).filter("id = 2").collect()[0].s == "B3"
    assert read_iceberg(spark, t).count() == 4
    # duplicate source keys refuse; empty batch is a no-op
    import pytest as _pt

    with _pt.raises(ValueError, match="duplicate keys"):
        upsert_iceberg_mor(
            spark, t, _df(spark, [(5, "x", 1.0), (5, "y", 2.0)]), keys=["id"]
        )
    cur = snaps  # noqa: F841
    before = read_iceberg(spark, t).count()
    upsert_iceberg_mor(spark, t, _df(spark, []), keys=["id"])
    assert read_iceberg(spark, t).count() == before


def test_mor_upsert_rewrite_folds_both_delete_kinds(spark, tmp_path):
    """rewrite_position_deletes folds positional AND equality deletes:
    after the fold the delete manifests are gone, rows are exact, and
    CoW DML works again."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        delete_iceberg_positional,
        rewrite_position_deletes,
        update_iceberg,
        upsert_iceberg_mor,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(i, f"s{i}", float(i)) for i in range(8)]), t)
    upsert_iceberg_mor(
        spark, t, _df(spark, [(1, "U1", 11.0), (100, "ins", 100.0)]),
        keys=["id"],
    )
    delete_iceberg_positional(spark, t, "id = 4")
    want = sorted(
        [(i, f"s{i}", float(i)) for i in range(8) if i not in (1, 4)]
        + [(1, "U1", 11.0), (100, "ins", 100.0)]
    )
    assert sorted(tuple(r) for r in read_iceberg(spark, t).collect()) == want
    rewrite_position_deletes(spark, t)
    assert sorted(tuple(r) for r in read_iceberg(spark, t).collect()) == want
    # DML-able again
    update_iceberg(spark, t, {"v": "v + 1000"}, predicate="id = 100")
    assert read_iceberg(spark, t).filter("id = 100").collect()[0].v == 1100.0


def test_mor_upsert_refusals_and_null_keys(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        upsert_iceberg_mor,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0)]), t, partition_by=["s"])
    # partitioned upserts work since r9 — but keying on an identity
    # partition SOURCE column still refuses (values inject after the
    # read-side delete filter)
    with pytest.raises(NotImplementedError, match="partition column"):
        upsert_iceberg_mor(spark, t, _df(spark, [(1, "a", 2.0)]), keys=["s"])
    # equality deletes match NULL keys null-safely
    t2 = str(tmp_path / "t2")
    write_iceberg(
        spark.createDataFrame([(1, None), (2, "b")], "id long, s string"),
        t2,
    )
    upsert_iceberg_mor(
        spark,
        t2,
        spark.createDataFrame([(9, None)], "id long, s string"),
        keys=["s"],
    )
    got = sorted(
        (r.id, r.s) for r in
        __import__("sparkstreamingtwitter_presidential_spark.sources.iceberg",
                   fromlist=["read_iceberg"]).read_iceberg(spark, t2).collect()
    )
    assert got == [(2, "b"), (9, None)]  # null key matched null-safely


def test_positional_delete_distributed_pair_path(spark, tmp_path, monkeypatch):
    """Backlogs above _PAIRS_DRIVER_MAX build the pair set as a
    distributed plan whose frames are themselves parquet-scan-derived;
    the scan-side anti-join must not trip AMBIGUOUS_REFERENCE on the
    `_metadata` pseudo-columns (review-confirmed crash: the condition
    must reference materialized left-side columns, never an unresolved
    `_metadata` across the join)."""
    import sparkstreamingtwitter_presidential_spark.sources.iceberg as I
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        delete_iceberg_positional,
        rewrite_position_deletes,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(i, f"s{i}", float(i)) for i in range(40)]), t)
    delete_iceberg_positional(spark, t, "id % 4 = 0")
    monkeypatch.setattr(I, "_PAIRS_DRIVER_MAX", 0)  # force distributed
    got = sorted(r.id for r in read_iceberg(spark, t).collect())
    assert got == [i for i in range(40) if i % 4 != 0]
    # the rewrite (the documented remedy for large backlogs) must run
    # on the distributed path too
    rewrite_position_deletes(spark, t)
    got2 = sorted(r.id for r in read_iceberg(spark, t).collect())
    assert got2 == got


def test_equality_deletes_refuse_over_foreign_renamed_files(
    spark, tmp_path
):
    """The equality filter resolves CURRENT column names inside scan
    branches; file groups written under a drifted (renamed) schema
    scan under their WRITING names, where a current-name lookup would
    miss — or bind the wrong column on a name swap. The combination
    refuses by name (review finding)."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        upsert_iceberg_mor,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t)
    _foreign_rename(t, "v", "val")
    upsert_iceberg_mor(
        spark,
        t,
        spark.createDataFrame(
            [(2, "B2", 22.0)], "id long, s string, val double"
        ),
        keys=["id"],
    )
    with pytest.raises(NotImplementedError, match="equality-delete read"):
        read_iceberg(spark, t).collect()


# ------------------------------------------------------- r8: refs


def test_refs_tag_read_protect_and_drop(spark, tmp_path):
    """Spec v2 refs: a tag pins a snapshot by name — read_iceberg(ref=)
    time travel, expire_snapshots protection (the audit/repro
    primitive: pin the snapshot a model trained on), drop to release;
    'main' is the implicit current branch."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        create_ref,
        drop_ref,
        expire_snapshots,
        table_refs,
    )

    t = str(tmp_path / "t")
    s1 = write_iceberg(_df(spark, [(1, "a", 1.0)]), t)
    create_ref(t, "v1.0", kind="tag")  # pins s1 (current)
    write_iceberg(_df(spark, [(2, "b", 2.0)]), t, mode="append")
    write_iceberg(_df(spark, [(3, "c", 3.0)]), t, mode="append")

    assert sorted(r.id for r in read_iceberg(spark, t, ref="v1.0").collect()) == [1]
    assert sorted(r.id for r in read_iceberg(spark, t, ref="main").collect()) == [1, 2, 3]
    refs = {r.name: (r.type, r.snapshot_id) for r in table_refs(spark, t).collect()}
    assert refs["v1.0"] == ("tag", s1) and refs["main"][0] == "branch"

    # expiry keeps the tagged snapshot (and its files) alive
    out = expire_snapshots(t, keep_last=1)
    assert s1 not in out["expired_snapshots"]
    assert sorted(r.id for r in read_iceberg(spark, t, ref="v1.0").collect()) == [1]

    # unknown / duplicate / main refusals
    with pytest.raises(ValueError, match="unknown ref"):
        read_iceberg(spark, t, ref="nope")
    with pytest.raises(ValueError, match="already exists"):
        create_ref(t, "v1.0")
    with pytest.raises(ValueError, match="main"):
        create_ref(t, "main")
    with pytest.raises(ValueError, match="at most one"):
        read_iceberg(spark, t, snapshot_id=s1, ref="v1.0")

    # drop releases the pin; the next expiry reclaims it
    drop_ref(t, "v1.0")
    out2 = expire_snapshots(t, keep_last=1)
    assert s1 in out2["expired_snapshots"]
    with pytest.raises(ValueError, match="unknown ref"):
        read_iceberg(spark, t, ref="v1.0")


def test_iceberg_timestamp_travel(spark, tmp_path):
    import time as _time

    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        snapshot_at_timestamp,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.0)]), t)
    t_after_s1 = int(_time.time() * 1000)
    _time.sleep(0.05)
    write_iceberg(_df(spark, [(2, "b", 2.0)]), t, mode="append")

    sid = snapshot_at_timestamp(t, t_after_s1)
    assert sorted(
        r.id for r in read_iceberg(spark, t, timestamp=t_after_s1).collect()
    ) == [1]
    assert sorted(r.id for r in read_iceberg(spark, t).collect()) == [1, 2]
    # the resolved id reads identically to explicit snapshot travel
    assert sorted(
        r.id for r in read_iceberg(spark, t, snapshot_id=sid).collect()
    ) == [1]
    with pytest.raises(ValueError, match="at most one"):
        read_iceberg(spark, t, ref="main", timestamp=t_after_s1)
    with pytest.raises(ValueError, match="at or before"):
        snapshot_at_timestamp(t, 0)


def test_positional_delete_read_plan_broadcasts_pairs(spark, tmp_path):
    """Small delete sets (the CDC steady state) build pairs as a
    driver-side LocalRelation with a KNOWN size, so the scan-side
    LeftAnti join plans as a BroadcastHashJoin — no shuffle of the
    table for a kilobyte of deletes (the 100 TB plan shape)."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        delete_iceberg_positional,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(i, f"s{i}", float(i)) for i in range(100)]), t)
    delete_iceberg_positional(spark, t, "id % 10 = 0")
    df = read_iceberg(spark, t)
    assert len(df.collect()) == 90  # execute THIS frame's plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_equality_deletes_apply_on_partitioned_tables(spark, tmp_path):
    """Foreign partitioned tables carrying DATA-column-keyed GLOBAL
    equality deletes (the spec's empty partition record — an
    unpartitioned-spec delete file) read correctly (every scan branch
    holds the data columns); a delete keyed on a PARTITION SOURCE
    column refuses by name (its values inject after the filter); and
    a NON-empty partition record — even a tuple of nulls, which
    scopes to the NULL partition, not globally — refuses as
    partition-scoped (r9 review fix)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import sparkstreamingtwitter_presidential_spark.sources.iceberg as I

    t = str(tmp_path / "t")
    write_iceberg(
        _df(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)]),
        t,
        partition_by=["s"],
    )
    # forge a foreign equality-delete commit keyed on the DATA column
    # id (field 1): one value row deleting id=2 wherever it lives
    meta = I._load_metadata(t)
    ddir = os.path.join(t, "data", "eqdel")
    os.makedirs(ddir)
    dfile = os.path.join(ddir, "eq.parquet")
    pq.write_table(pa.table({"id": pa.array([2], pa.int64())}), dfile)
    eq = {
        "content": 2,
        "file_path": dfile,
        "file_format": "PARQUET",
        "partition": {},
        "record_count": 1,
        "file_size_in_bytes": os.path.getsize(dfile),
        "lower_bounds": None,
        "upper_bounds": None,
        "equality_ids": [1],
    }
    ice_schema = I._schema_for(meta, meta.get("current-schema-id", 0))
    pf = I._partition_fields(meta, ice_schema)
    I._commit_snapshot(
        t, meta, ice_schema, pf,
        added_files=[], existing_entries=[], deleted_entries=[],
        carry_prior_manifests=True, operation="overwrite",
        added_delete_files=[eq],
        delete_files_unpartitioned_spec=True,
    )
    got = sorted((r.id, r.s) for r in read_iceberg(spark, t).collect())
    assert got == [(1, "a"), (3, "b")]  # id=2 gone across partitions
    # keyed on the partition source -> named refusal
    meta2 = I._load_metadata(t)
    eq2 = dict(eq, equality_ids=[2])  # field 2 == partition source 's'
    I._commit_snapshot(
        t, meta2, ice_schema, pf,
        added_files=[], existing_entries=[], deleted_entries=[],
        carry_prior_manifests=True, operation="overwrite",
        added_delete_files=[eq2],
        delete_files_unpartitioned_spec=True,
    )
    with pytest.raises(NotImplementedError, match="partition source"):
        read_iceberg(spark, t).collect()


def test_partition_scoped_equality_delete_null_tuple_scopes(spark, tmp_path):
    """A NON-empty partition record on an equality delete — including
    a tuple of NULLs, which per the spec scopes the delete to the
    NULL partition — applies to EXACTLY that partition's files (r10;
    a named refusal through r9). No data file lives in the NULL
    partition here, so the matching key in partition 'a' survives
    instead of being over-deleted."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import sparkstreamingtwitter_presidential_spark.sources.iceberg as I

    t = str(tmp_path / "t")
    write_iceberg(
        _df(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)]),
        t,
        partition_by=["s"],
    )
    meta = I._load_metadata(t)
    ddir = os.path.join(t, "data", "eqdel")
    os.makedirs(ddir)
    dfile = os.path.join(ddir, "eq.parquet")
    pq.write_table(pa.table({"id": pa.array([2], pa.int64())}), dfile)
    eq = {
        "content": 2,
        "file_path": dfile,
        "file_format": "PARQUET",
        "partition": {"s": None},
        "record_count": 1,
        "file_size_in_bytes": os.path.getsize(dfile),
        "lower_bounds": None,
        "upper_bounds": None,
        "equality_ids": [1],
    }
    ice_schema = I._schema_for(meta, meta.get("current-schema-id", 0))
    pf = I._partition_fields(meta, ice_schema)
    I._commit_snapshot(
        t, meta, ice_schema, pf,
        added_files=[], existing_entries=[], deleted_entries=[],
        carry_prior_manifests=True, operation="overwrite",
        added_delete_files=[eq],
    )
    got = sorted(r.id for r in read_iceberg(spark, t).collect())
    assert got == [1, 2, 3]


def test_equality_deletes_on_many_partition_fast_path(spark, tmp_path):
    """Above the 32-tuple union ceiling the hive fast path derives
    partition values from `_metadata` — which must happen BEFORE the
    delete filter's joins (they leave `_metadata` ambiguous). A
    40-partition table with a data-column-keyed equality delete reads
    single-scan and exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import sparkstreamingtwitter_presidential_spark.sources.iceberg as I

    t = str(tmp_path / "t")
    write_iceberg(
        _df(spark, [(i, f"p{i:02d}", float(i)) for i in range(40)]),
        t,
        partition_by=["s"],
    )
    meta = I._load_metadata(t)
    ddir = os.path.join(t, "data", "eqdel")
    os.makedirs(ddir)
    dfile = os.path.join(ddir, "eq.parquet")
    pq.write_table(pa.table({"id": pa.array([7, 13], pa.int64())}), dfile)
    eq = {
        "content": 2,
        "file_path": dfile,
        "file_format": "PARQUET",
        "partition": {},
        "record_count": 2,
        "file_size_in_bytes": os.path.getsize(dfile),
        "lower_bounds": None,
        "upper_bounds": None,
        "equality_ids": [1],
    }
    ice_schema = I._schema_for(meta, meta.get("current-schema-id", 0))
    pf = I._partition_fields(meta, ice_schema)
    I._commit_snapshot(
        t, meta, ice_schema, pf,
        added_files=[], existing_entries=[], deleted_entries=[],
        carry_prior_manifests=True, operation="overwrite",
        added_delete_files=[eq],
        delete_files_unpartitioned_spec=True,
    )
    back = read_iceberg(spark, t)
    got = sorted((r.id, r.s) for r in back.collect())
    assert got == [
        (i, f"p{i:02d}") for i in range(40) if i not in (7, 13)
    ]
    plan = back._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan  # the single-scan fast path held


def test_partitioned_rename_first_class(spark, tmp_path):
    """Partition-source and data-column renames on PARTITIONED tables
    (r9 late): historical manifest tuples decode through the spec-
    field-name key, pre-rename files project by field-id, post-rename
    appends land in the right partitions, partition pruning works
    under the NEW name, the .partitions frame surfaces it, and CoW
    DML over pre-rename files keeps its conservative refusal."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        delete_iceberg,
        rename_column_iceberg,
        table_partitions,
    )

    t = str(tmp_path / "t")
    write_iceberg(
        _df(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)]),
        t,
        partition_by=["s"],
    )
    rename_column_iceberg(t, "s", "region")
    # post-rename append under the new name, same spec
    write_iceberg(
        spark.createDataFrame(
            [(4, "b", 4.0)], "id long, region string, v double"
        ),
        t,
        partition_by=["region"],
        mode="append",
    )
    back = read_iceberg(spark, t)
    assert back.columns == ["id", "region", "v"]
    assert sorted((r.id, r.region) for r in back.collect()) == [
        (1, "a"), (2, "a"), (3, "b"), (4, "b"),
    ]
    # pruning by the NEW name prunes pre-rename files too
    pruned = read_iceberg(spark, t, skip_ranges={"region": ("b", "b")})
    assert sorted(r.id for r in pruned.collect()) == [3, 4]
    pframe = table_partitions(spark, t)
    assert "region" in pframe.columns  # surfaces the NEW source name
    parts = {r.region: r.n_rows for r in pframe.collect()}
    assert parts == {"a": 2, "b": 2}
    # rewrite paths stay conservative over pre-rename files
    with pytest.raises(NotImplementedError):
        delete_iceberg(spark, t, "id = 1")


def test_transform_partitioned_source_rename(spark, tmp_path):
    """Renaming the SOURCE column of a day(ts) transform partition:
    the transform tuple keys by the spec field name, so decode,
    grouping, and reads under the new column name all hold."""
    import datetime

    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        rename_column_iceberg,
    )

    t = str(tmp_path / "t")
    rows = [
        (i, datetime.datetime(2024, 1, 1 + i % 3, 12, 0), float(i))
        for i in range(9)
    ]
    write_iceberg(
        spark.createDataFrame(rows, "id long, ts timestamp, v double"),
        t,
        partition_by=["day(ts)"],
    )
    rename_column_iceberg(t, "ts", "event_ts")
    back = read_iceberg(spark, t)
    assert back.columns == ["id", "event_ts", "v"]
    got = sorted((r.id, r.event_ts.day) for r in back.collect())
    assert got == sorted((i, 1 + i % 3) for i in range(9))


def test_iceberg_row_changes_shapes_and_refusals(spark, tmp_path):
    """Changelog over CoW snapshots: append=inserts (no keys needed),
    update=pre/post, delete=deletes, compaction=silence; MOR
    snapshots, missing keys on rewrites, and expired parents refuse
    by name."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        compact_iceberg,
        delete_iceberg,
        expire_snapshots,
        iceberg_row_changes,
        update_iceberg,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "a" if i < 3 else "b", float(i)) for i in range(6)],
        "id long, s string, v double",
    )
    s0 = write_iceberg(df.repartition(1), t, partition_by=["s"])
    s1 = update_iceberg(spark, t, {"v": "v * 10"}, "id = 1")
    s2 = delete_iceberg(spark, t, "id = 4")
    # pure append: inserts, keys optional
    ch0 = iceberg_row_changes(spark, t, s0)
    assert sorted((r.id, r._change_type) for r in ch0.collect()) == [
        (i, "insert") for i in range(6)
    ]
    ch1 = iceberg_row_changes(spark, t, s1, keys=["id"]).collect()
    assert sorted((r.id, r.v, r._change_type) for r in ch1) == [
        (1, 1.0, "update_preimage"), (1, 10.0, "update_postimage"),
    ]
    assert all(r._snapshot_id == s1 for r in ch1)
    ch2 = iceberg_row_changes(spark, t, s2, keys=["id"]).collect()
    assert [(r.id, r._change_type) for r in ch2] == [(4, "delete")]
    # rewrites without keys refuse by name
    with pytest.raises(ValueError, match="primary key"):
        iceberg_row_changes(spark, t, s1)
    # compaction: layout-only, silence (append a second small file
    # first so the compactor actually rewrites instead of no-opping)
    write_iceberg(
        _df(spark, [(7, "b", 7.0)]).repartition(1),
        t,
        partition_by=["s"],
        mode="append",
    )
    s3 = compact_iceberg(spark, t, target_file_bytes=1 << 30)
    assert s3 != s2
    assert iceberg_row_changes(spark, t, s3, keys=["id"]).count() == 0
    # expired PARENT: s1 is retained but s0 (its pre-image) is gone
    # — the changes are permanently unavailable, by name
    expire_snapshots(t, keep_last=4)  # drops only s0 (5 snapshots)
    with pytest.raises(ValueError, match="expired"):
        iceberg_row_changes(spark, t, s1, keys=["id"])
    # expired SNAPSHOT itself: the generic missing-snapshot error
    expire_snapshots(t, keep_last=1)
    with pytest.raises(ValueError, match="does not exist"):
        iceberg_row_changes(spark, t, s1, keys=["id"])


def test_iceberg_row_changes_derives_position_delete_commits(
    spark, tmp_path
):
    """MOR changelog (r10 late): a position-delete commit derives its
    exact 'delete' rows — each side reads under its OWN delete state,
    and the touched scope extends to the files the changed delete
    files reference. Later CoW DML on the MOR table diffs exactly
    too; since r12 a changed GLOBAL equality delete (the upsert's
    channel) derives exactly as well (budgeted by touched files)."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        delete_iceberg_positional,
        iceberg_row_changes,
        table_snapshots,
        update_iceberg,
        upsert_iceberg_mor,
    )

    t = str(tmp_path / "t")
    write_iceberg(
        _df(spark, [(i, "x", float(i)) for i in range(6)]).repartition(1), t
    )
    delete_iceberg_positional(spark, t, "id = 2")

    def _last_sid():
        return (
            table_snapshots(spark, t)
            .orderBy("sequence_number")
            .collect()[-1]
            .snapshot_id
        )

    ch = iceberg_row_changes(spark, t, _last_sid(), keys=["id"]).collect()
    assert [(r.id, r._change_type) for r in ch] == [(2, "delete")]
    # a CoW UPDATE on the still-MOR table: pre/post derive under the
    # live delete (the deleted row never appears on either side)
    update_iceberg(spark, t, {"v": "v + 100"}, "id = 3")
    ch2 = iceberg_row_changes(spark, t, _last_sid(), keys=["id"]).collect()
    got = sorted((r.id, r.v, r._change_type) for r in ch2)
    assert got == [
        (3, 3.0, "update_preimage"),
        (3, 103.0, "update_postimage"),
    ]
    # equality-delete commits (the upsert's channel): derive exactly
    # since r12 — the upserted key surfaces as update pre/post
    upsert_iceberg_mor(
        spark,
        t,
        _df(spark, [(4, "x", 400.0)]),
        keys=["id"],
    )
    ch3 = iceberg_row_changes(spark, t, _last_sid(), keys=["id"]).collect()
    assert sorted((r.id, r.v, r._change_type) for r in ch3) == [
        (4, 4.0, "update_preimage"),
        (4, 400.0, "update_postimage"),
    ]


def test_iceberg_table_changes_range(spark, tmp_path):
    """The range TVF: appends (keyless), a keyed-rewrite commit, and a
    compaction composing into one frame with per-snapshot stamps; the
    replace snapshot contributes nothing."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        compact_iceberg,
        iceberg_table_changes,
        update_iceberg,
    )

    t = str(tmp_path / "t")
    s0 = write_iceberg(
        _df(spark, [(1, "a", 1.0), (2, "a", 2.0)]).repartition(1), t
    )
    s1 = update_iceberg(spark, t, {"v": "v * 10"}, "id = 1")
    s2 = write_iceberg(
        _df(spark, [(3, "b", 3.0)]).repartition(1), t, mode="append"
    )
    compact_iceberg(spark, t, target_file_bytes=1 << 30)
    ch = iceberg_table_changes(spark, t, s0, keys=["id"]).collect()
    by_snap = {}
    for r in ch:
        by_snap.setdefault(r._snapshot_id, []).append(
            (r.id, r.v, r._change_type)
        )
    assert sorted(by_snap) == sorted([s1, s2])
    assert sorted(by_snap[s1]) == [
        (1, 1.0, "update_preimage"), (1, 10.0, "update_postimage"),
    ]
    assert by_snap[s2] == [(3, 3.0, "insert")]
    # empty range -> typed empty frame
    empty = iceberg_table_changes(spark, t, s0, to_snapshot=s0)
    assert empty.count() == 0 and "_change_type" in empty.columns


# ------------------------------------------- r12 late: DROP COLUMN


def test_drop_column_metadata_only_and_fresh_id_on_readd(spark, tmp_path):
    """DROP COLUMN leaves data bytes in place (field-id projection
    stops requesting the id); a later same-named ADD mints a FRESH id,
    so pre-drop files read NULL for it — never the dropped bytes."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        add_column_iceberg,
        drop_column_iceberg,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a", 1.5), (2, "b", 2.5)]), t)
    files_before = _live_paths(spark, t)
    drop_column_iceberg(t, "v")
    assert _live_paths(spark, t) == files_before  # zero data movement
    rows = read_iceberg(spark, t).collect()
    assert sorted((r.asDict() for r in rows), key=lambda d: d["id"]) == [
        {"id": 1, "s": "a"},
        {"id": 2, "s": "b"},
    ]
    # append without the dropped column
    write_iceberg(
        spark.createDataFrame([(3, "c")], "id long, s string"),
        t,
        mode="append",
    )
    assert sorted(r.id for r in read_iceberg(spark, t).collect()) == [1, 2, 3]
    # re-add the NAME: fresh id -> old files read NULL, not old bytes
    add_column_iceberg(t, "v", "double")
    got = {r.id: r.v for r in read_iceberg(spark, t).collect()}
    assert got == {1: None, 2: None, 3: None}


def test_drop_column_refusals(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        drop_column_iceberg,
        upsert_iceberg_mor,
        write_iceberg as _wi,
    )

    # partition source column
    t1 = str(tmp_path / "t1")
    _wi(
        spark.createDataFrame([(1, "p1")], "id long, s string"),
        t1,
        partition_by=["s"],
    )
    with pytest.raises(ValueError, match="partition source"):
        drop_column_iceberg(t1, "s")

    # sort-order column
    t2 = str(tmp_path / "t2")
    _wi(
        spark.createDataFrame([(1, "a")], "id long, s string"),
        t2,
        sort_by=["id"],
    )
    with pytest.raises(ValueError, match="sort-order"):
        drop_column_iceberg(t2, "id")

    # live equality-delete key
    t3 = str(tmp_path / "t3")
    _wi(spark.createDataFrame([(1, "a")], "id long, s string"), t3)
    upsert_iceberg_mor(
        spark,
        t3,
        spark.createDataFrame([(1, "A")], "id long, s string"),
        keys=["id"],
    )
    with pytest.raises(ValueError, match="equality"):
        drop_column_iceberg(t3, "id")

    # identifier field
    t4 = str(tmp_path / "t4")
    _wi(spark.createDataFrame([(1, "a")], "id long, s string"), t4)
    import glob as _glob
    import json as _json
    import os as _os

    md = sorted(
        _glob.glob(_os.path.join(t4, "metadata", "v*.metadata.json")),
        key=lambda p: int(_os.path.basename(p)[1:].split(".")[0]),
    )[-1]
    meta = _json.load(open(md))
    for s in meta["schemas"]:
        s["identifier-field-ids"] = [1]
    _json.dump(meta, open(md, "w"))
    with pytest.raises(ValueError, match="identifier"):
        drop_column_iceberg(t4, "id")

    # only column / unknown
    t5 = str(tmp_path / "t5")
    _wi(spark.createDataFrame([(1,)], "id long"), t5)
    with pytest.raises(ValueError, match="only column"):
        drop_column_iceberg(t5, "id")
    with pytest.raises(ValueError, match="not in schema"):
        drop_column_iceberg(t5, "nope")
