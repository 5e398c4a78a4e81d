"""Row-level deletes on PARTITIONED Iceberg tables (r9 — r8 verdict
item 4): partition-scoped position-delete files, globally-scoped
equality deletes under a registered unpartitioned spec, and
rewrite_position_deletes folding the backlog per partition."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
    _entries_and_deletes_for_snapshot,
    _load_metadata,
    _snapshot,
    delete_iceberg_positional,
    read_iceberg,
    rewrite_position_deletes,
    upsert_iceberg_mor,
    write_iceberg,
)


def _dels(path):
    meta = _load_metadata(path)
    _, dels = _entries_and_deletes_for_snapshot(path, _snapshot(meta, None))
    return dels


@pytest.fixture()
def part_table(spark, tmp_path):
    t = str(tmp_path / "t")
    rows = [(i, f"g{i % 3}", float(i)) for i in range(90)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    write_iceberg(df, t, partition_by=["g"])
    return t, rows


def test_positional_delete_scopes_files_by_partition(spark, part_table):
    t, rows = part_table
    delete_iceberg_positional(spark, t, "id % 10 = 3 AND g = 'g0'")
    got = sorted(map(tuple, read_iceberg(spark, t).collect()))
    want = sorted(r for r in rows if not (r[0] % 10 == 3 and r[0] % 3 == 0))
    assert got == want
    # every delete file carries the partition tuple of the data it
    # scopes — here only g0 was touched
    parts = [d["data_file"]["partition"] for d in _dels(t)]
    assert parts and all(p == {"g": "g0"} for p in parts)


def test_positional_delete_predicate_may_use_partition_column(
    spark, part_table
):
    # identity partition values are NOT in the data files; the matcher
    # must inject them before evaluating the predicate
    t, rows = part_table
    delete_iceberg_positional(spark, t, "g = 'g1'")
    got = read_iceberg(spark, t)
    assert got.filter("g = 'g1'").count() == 0
    assert got.count() == len([r for r in rows if r[1] != "g1"])


def test_mor_upsert_partitioned_global_equality_delete(spark, part_table):
    t, rows = part_table
    src = spark.createDataFrame(
        [(3, "g0", 999.0), (1000, "g1", 5.0)], "id long, g string, v double"
    )
    upsert_iceberg_mor(spark, t, src, keys=["id"])
    got = {r.id: (r.g, r.v) for r in read_iceberg(spark, t).collect()}
    assert got[3] == ("g0", 999.0)
    assert got[1000] == ("g1", 5.0)
    assert len(got) == 91
    # the equality delete commits GLOBALLY: empty partition tuple, and
    # the metadata registers an unpartitioned spec for it
    eqs = [d for d in _dels(t) if d["data_file"]["content"] == 2]
    assert eqs and all(
        not any((d["data_file"].get("partition") or {}).values())
        for d in eqs
    )
    specs = _load_metadata(t)["partition-specs"]
    assert any(sp["fields"] == [] for sp in specs)


def test_mor_upsert_moves_row_across_partitions(spark, part_table):
    # an update that CHANGES the partition value: the old version
    # (other partition) must disappear — the global equality scope
    t, _rows = part_table
    src = spark.createDataFrame([(7, "g0", 70.0)], "id long, g string, v double")
    upsert_iceberg_mor(spark, t, src, keys=["id"])  # 7 was g1
    got = read_iceberg(spark, t).filter("id = 7").collect()
    assert [(r.g, r.v) for r in got] == [("g0", 70.0)]


def test_rewrite_folds_partitioned_backlog(spark, part_table):
    t, _rows = part_table
    delete_iceberg_positional(spark, t, "id < 9")
    upsert_iceberg_mor(
        spark,
        t,
        spark.createDataFrame([(20, "g2", 0.5)], "id long, g string, v double"),
        keys=["id"],
    )
    before = sorted(map(tuple, read_iceberg(spark, t).collect()))
    assert _dels(t)
    rewrite_position_deletes(spark, t)
    assert sorted(map(tuple, read_iceberg(spark, t).collect())) == before
    assert _dels(t) == []
    # partition tuples survived the rewrite (read still injects them)
    assert read_iceberg(spark, t).filter("g = 'g2'").count() > 0


def test_transform_partitioned_mor_roundtrip(spark, tmp_path):
    t = str(tmp_path / "t")
    rows = [(i, dt.datetime(2024, 1, 1 + i % 4), float(i)) for i in range(80)]
    df = spark.createDataFrame(rows, "id long, ts timestamp, v double")
    write_iceberg(df, t, partition_by=["day(ts)"])
    delete_iceberg_positional(spark, t, "id < 8")
    assert read_iceberg(spark, t).count() == 72
    upsert_iceberg_mor(
        spark,
        t,
        spark.createDataFrame(
            [(10, dt.datetime(2024, 3, 1), 7.0)], df.schema
        ),
        keys=["id"],
    )
    got = read_iceberg(spark, t)
    assert got.count() == 72
    assert got.filter("id = 10").collect()[0].v == 7.0
    rewrite_position_deletes(spark, t)
    assert read_iceberg(spark, t).count() == 72
    assert _dels(t) == []


def test_matched_rows_budget_refuses(spark, part_table):
    t, _rows = part_table
    with pytest.raises(ValueError, match="max_matched_rows"):
        delete_iceberg_positional(spark, t, "true", max_matched_rows=5)
    # nothing committed, nothing deleted
    assert read_iceberg(spark, t).count() == 90
    assert _dels(t) == []


def test_partition_scoped_equality_delete_applies_exactly(spark, tmp_path):
    """A FOREIGN partition-scoped equality delete (non-empty tuple on a
    content=2 file — the Flink-CDC per-partition shape, a named refusal
    through r9) applies ONLY to data files sharing its partition tuple:
    the same key in another partition survives."""
    import sparkstreamingtwitter_presidential_spark.sources.iceberg as I

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (1, "b", 10.0), (2, "b", 20.0)],
        "id long, g string, v double",
    )
    write_iceberg(df, t, partition_by=["g"])
    import pyarrow as pa
    import pyarrow.parquet as pq

    ddir = os.path.join(t, "data", "eqdel")
    os.makedirs(ddir)
    dfile = os.path.join(ddir, "eq.parquet")
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}), dfile)
    eq = {
        "content": 2,
        "file_path": dfile,
        "file_format": "PARQUET",
        "partition": {"g": "a"},
        "record_count": 1,
        "file_size_in_bytes": os.path.getsize(dfile),
        "lower_bounds": None,
        "upper_bounds": None,
        "equality_ids": [1],
    }
    meta = I._load_metadata(t)
    ice_schema = I._schema_for(meta, meta.get("current-schema-id", 0))
    pf = I._partition_fields(meta, ice_schema)
    I._commit_snapshot(
        t, meta, ice_schema, pf,
        added_files=[], existing_entries=[], deleted_entries=[],
        carry_prior_manifests=True, operation="overwrite",
        added_delete_files=[eq],
    )
    got = sorted(map(tuple, read_iceberg(spark, t).collect()))
    # id=1 deleted ONLY in partition a; (1, b) survives
    assert got == [(1, "b", 10.0), (2, "a", 2.0), (2, "b", 20.0)]


def test_partition_scoped_eq_delete_keys_on_spec_id(spark, tmp_path):
    """Tuple equality is SPEC-ID-keyed (the spec's rule for evolved
    partition specs): the same-looking tuple under a foreign spec id
    applies to NOTHING, while the file's own spec id applies exactly."""
    from pyspark.sql import functions as F

    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        _row_delete_filter,
        _schema_for,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, g string, v double"
    )
    write_iceberg(df, t, partition_by=["g"])
    upsert_iceberg_mor(
        spark,
        t,
        spark.createDataFrame([(1, "a", 9.0)], "id long, g string, v double"),
        keys=["id"],
    )
    meta = _load_metadata(t)
    snap = _snapshot(meta, None)
    entries, dels = _entries_and_deletes_for_snapshot(t, snap)
    assert [d for d in dels if d["data_file"]["content"] == 2]
    ice_schema = _schema_for(meta, meta.get("current-schema-id", 0))

    def apply_with(spec_id):
        scoped = [
            {
                **d,
                "spec_id": spec_id,
                "data_file": {**d["data_file"], "partition": {"g": "a"}},
            }
            for d in dels
        ]
        flt = _row_delete_filter(spark, meta, entries, scoped, ice_schema)
        scan = spark.read.schema("id long, v double").parquet(
            *sorted(e["data_file"]["file_path"] for e in entries)
        )
        return sorted(
            (r.id, r.v) for r in flt(scan).select("id", "v").collect()
        )

    # the DATA files' spec id (the upsert's global delete itself rides
    # the registered unpartitioned spec — a different id by design)
    own_spec = entries[0]["spec_id"]
    # data spec id + tuple a: the pre-image (1, 1.0) is deleted
    assert apply_with(own_spec) == [(1, 9.0), (2, 2.0)]
    # foreign spec id, identical tuple: nothing applies
    assert apply_with(9) == [(1, 1.0), (1, 9.0), (2, 2.0)]


# ------------------------------------------------- branch writes (r9)


def test_branch_write_roundtrip_main_untouched(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        create_ref,
        table_refs,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    write_iceberg(df, t)
    create_ref(t, "dev", kind="branch")
    write_iceberg(
        spark.createDataFrame([(3, "c")], "id long, s string"),
        t,
        mode="append",
        branch="dev",
    )
    # branch sees base + branch-append; main sees only base
    at_dev = sorted(r.id for r in read_iceberg(spark, t, ref="dev").collect())
    assert at_dev == [1, 2, 3]
    assert sorted(r.id for r in read_iceberg(spark, t).collect()) == [1, 2]
    # a second branch append stacks on the BRANCH head
    write_iceberg(
        spark.createDataFrame([(4, "d")], "id long, s string"),
        t,
        mode="append",
        branch="dev",
    )
    assert sorted(
        r.id for r in read_iceberg(spark, t, ref="dev").collect()
    ) == [1, 2, 3, 4]
    # main keeps advancing independently
    write_iceberg(
        spark.createDataFrame([(9, "z")], "id long, s string"),
        t,
        mode="append",
    )
    assert sorted(r.id for r in read_iceberg(spark, t).collect()) == [1, 2, 9]
    assert sorted(
        r.id for r in read_iceberg(spark, t, ref="dev").collect()
    ) == [1, 2, 3, 4]
    refs = {r.name: r.snapshot_id for r in table_refs(spark, t).collect()}
    assert refs["dev"] != refs["main"]


def test_branch_overwrite_and_refusals(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        create_ref,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    write_iceberg(df, t)
    create_ref(t, "v1", kind="tag")
    create_ref(t, "exp", kind="branch")
    # overwrite on the branch starts a fresh file set THERE only
    write_iceberg(
        spark.createDataFrame([(7, "x")], "id long, s string"),
        t,
        mode="overwrite",
        branch="exp",
    )
    assert [r.id for r in read_iceberg(spark, t, ref="exp").collect()] == [7]
    assert [r.id for r in read_iceberg(spark, t).collect()] == [1]
    # tags are immutable pins
    with pytest.raises(ValueError, match="tag"):
        write_iceberg(df, t, mode="append", branch="v1")
    # unknown branches refuse with the remediation
    with pytest.raises(ValueError, match="create_ref"):
        write_iceberg(df, t, mode="append", branch="nope")
    # branch writes need an existing table
    with pytest.raises(ValueError, match="existing table"):
        write_iceberg(df, str(tmp_path / "new"), branch="exp")


# ------------------------------------------- metadata tables (r9)


def test_metadata_tables_files_history_manifests(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        table_files,
        table_history,
        table_manifests,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"g{i % 2}", float(i)) for i in range(20)],
        "id long, g string, v double",
    )
    write_iceberg(df.repartition(1), t, partition_by=["g"])
    write_iceberg(df.repartition(1), t, mode="append")
    delete_iceberg_positional(spark, t, "id = 3")

    files = table_files(spark, t).collect()
    data = [r for r in files if r.content == 0]
    dels = [r for r in files if r.content == 1]
    assert len(data) == 4  # 2 partitions x 2 appends
    assert len(dels) == 1  # one touched partition
    assert sum(r.record_count for r in data) == 40
    assert dels[0].record_count == 2  # id=3 appended twice, same part
    import json as _json

    parts = {tuple(sorted(_json.loads(r.partition).items())) for r in data}
    assert parts == {(("g", "g0"),), (("g", "g1"),)}

    hist = table_history(spark, t).orderBy("made_current_at").collect()
    assert len(hist) == 3
    assert all(h.is_current_ancestor for h in hist)
    assert hist[0].parent_id is None

    man = table_manifests(spark, t).collect()
    assert {m.content for m in man} == {0, 1}
    assert sum(m.added_data_files_count for m in man if m.content == 0) >= 2


def test_history_marks_orphans_after_foreign_rollback(spark, tmp_path):
    """A foreign writer's rollback (current-snapshot-id moved back)
    leaves later snapshot-log entries as NON-ancestors."""
    import json as _json
    import os

    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        table_history,
        _metadata_dir,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    write_iceberg(df, t)
    write_iceberg(df, t, mode="append")
    meta = _load_metadata(t)
    first = meta["snapshot-log"][0]["snapshot-id"]
    new_meta = dict(meta)
    new_meta.pop("_loaded_version", None)
    new_meta["current-snapshot-id"] = first
    md = _metadata_dir(t)
    v = meta["_loaded_version"] + 1
    with open(os.path.join(md, f"v{v}.metadata.json"), "w") as fh:
        _json.dump(new_meta, fh)
    open(os.path.join(md, "version-hint.text"), "w").write(str(v))
    hist = {r.snapshot_id: r.is_current_ancestor
            for r in table_history(spark, t).collect()}
    assert hist[first] is True
    assert sum(1 for v_ in hist.values() if not v_) == 1


def test_null_partition_scoped_equality_delete_scopes_to_null(
    spark, tmp_path
):
    """A foreign equality delete scoped to the NULL partition carries
    a tuple of all-null VALUES — presence of the record (any keys),
    not value nullness, marks it scoped (r9 review finding: a
    value-based check would classify it global and over-delete).
    Since r10 the scoped delete APPLIES to exactly the null
    partition's files — none here, so every row survives, including
    the matching key in partition 'a'."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import sparkstreamingtwitter_presidential_spark.sources.iceberg as I

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, g string, v double"
    )
    write_iceberg(df, t, partition_by=["g"])
    ddir = os.path.join(t, "data", "eqdel")
    os.makedirs(ddir)
    dfile = os.path.join(ddir, "eq.parquet")
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}), dfile)
    eq = {
        "content": 2,
        "file_path": dfile,
        "file_format": "PARQUET",
        "partition": {"g": None},
        "record_count": 1,
        "file_size_in_bytes": os.path.getsize(dfile),
        "lower_bounds": None,
        "upper_bounds": None,
        "equality_ids": [1],
    }
    meta = I._load_metadata(t)
    ice_schema = I._schema_for(meta, meta.get("current-schema-id", 0))
    pf = I._partition_fields(meta, ice_schema)
    I._commit_snapshot(
        t, meta, ice_schema, pf,
        added_files=[], existing_entries=[], deleted_entries=[],
        carry_prior_manifests=True, operation="overwrite",
        added_delete_files=[eq],
    )
    got = sorted(map(tuple, read_iceberg(spark, t).collect()))
    assert got == [(1, "a", 1.0), (2, "b", 2.0)]


def test_branch_commits_do_not_leak_into_main_range_reads(
    spark, tmp_path
):
    """Branch commits share the table-wide sequence clock; the range
    readers (table_changes, incremental, the streaming source) must
    walk MAIN's ancestry, not 'snapshots in seq range' (r9 late fix):
    a branch append interleaved between main appends leaks neither
    rows nor false refusals into main-history reads."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        create_ref,
        iceberg_table_changes,
        read_iceberg_incremental,
    )
    from sparkstreamingtwitter_presidential_spark.sources.iceberg_stream_ds import (
        register_iceberg_stream,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    s0 = write_iceberg(df.repartition(1), t)
    create_ref(t, "dev", kind="branch")
    write_iceberg(  # branch commit BETWEEN two main commits
        spark.createDataFrame([(100, "BR")], "id long, s string"),
        t,
        mode="append",
        branch="dev",
    )
    s2 = write_iceberg(
        spark.createDataFrame([(3, "c")], "id long, s string"),
        t,
        mode="append",
    )
    # table_changes over main: branch row 100 absent
    ch = iceberg_table_changes(spark, t, s0, keys=["id"]).collect()
    assert sorted((r.id, r._change_type) for r in ch) == [(3, "insert")]
    # incremental over main: no leak, no false refusal
    inc = read_iceberg_incremental(spark, t, from_snapshot=s0)
    assert sorted(r.id for r in inc.collect()) == [3]
    # streaming source: cold drain delivers main rows only
    register_iceberg_stream(spark)
    sink: list = []
    q = (
        spark.readStream.format("iceberg_native")
        .load(t)
        .writeStream.outputMode("append")
        .foreachBatch(
            lambda d, b: sink.extend(tuple(r) for r in d.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    assert sorted(r[0] for r in sink) == [1, 2, 3]  # no 100
    # cross-branch range refuses by name
    import pytest as _pytest

    refs_meta = __import__(
        "sparkstreamingtwitter_presidential_spark.sources.iceberg",
        fromlist=["_load_metadata"],
    )
    meta = refs_meta._load_metadata(t)
    dev_head = meta["refs"]["dev"]["snapshot-id"]
    with _pytest.raises(ValueError, match="different branches"):
        iceberg_table_changes(spark, t, dev_head, to_snapshot=s2)


def test_cow_dml_applies_row_deletes_directly(spark, part_table):
    """CoW DELETE/UPDATE/MERGE run DIRECTLY on tables with live
    position/equality deletes (r10 late — previously refused via
    _entries_for_snapshot): the DML scan applies the deletes (no
    resurrection) and the commit carries the delete manifests forward
    so untouched files stay filtered."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        delete_iceberg,
        merge_iceberg,
        update_iceberg,
    )

    t, rows = part_table  # 90 rows, ids 0..89, g = id % 3
    delete_iceberg_positional(spark, t, "id < 10")  # MOR backlog
    assert read_iceberg(spark, t).count() == 80
    # CoW delete of one more id: the <10 rows must NOT resurrect
    delete_iceberg(spark, t, "id = 50")
    got = sorted(r.id for r in read_iceberg(spark, t).collect())
    assert got == [i for i in range(10, 90) if i != 50]
    # deletes referencing untouched files still apply after the rewrite
    update_iceberg(spark, t, {"v": "v + 1000"}, "id = 20")
    got2 = read_iceberg(spark, t)
    assert got2.count() == 79
    assert got2.filter("id = 20").collect()[0].v == 1020.0
    merge_iceberg(
        spark,
        t,
        spark.createDataFrame([(200, "g2", 2.0)], "id long, g string, v double"),
        keys=["id"],
    )
    assert read_iceberg(spark, t).count() == 80
    assert read_iceberg(spark, t).filter("id < 10").count() == 0


def test_changelog_derives_scoped_equality_delete_commit(spark, tmp_path):
    """r11 (r10 verdict item 3): a changed PARTITION-SCOPED equality
    delete (the Flink-CDC per-checkpoint shape) derives exact change
    rows — the victim scope is the delete's same-spec partition tuple
    at lower sequence, so the keyed diff sees the vanished rows as
    'delete' (or update pre/post when the checkpoint also carries the
    new version). A GLOBAL equality delete still refuses by name."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import sparkstreamingtwitter_presidential_spark.sources.iceberg as I
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        iceberg_row_changes,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (1, "b", 10.0), (2, "b", 20.0)],
        "id long, g string, v double",
    )
    write_iceberg(df, t, partition_by=["g"])

    def _scoped_eq_commit(ids: list[int], part: str) -> int:
        ddir = os.path.join(t, "data", f"eqdel_{part}_{len(ids)}")
        os.makedirs(ddir, exist_ok=True)
        dfile = os.path.join(ddir, "eq.parquet")
        pq.write_table(pa.table({"id": pa.array(ids, pa.int64())}), dfile)
        eq = {
            "content": 2,
            "file_path": dfile,
            "file_format": "PARQUET",
            "partition": {"g": part},
            "record_count": len(ids),
            "file_size_in_bytes": os.path.getsize(dfile),
            "lower_bounds": None,
            "upper_bounds": None,
            "equality_ids": [1],
        }
        meta = I._load_metadata(t)
        ice_schema = I._schema_for(meta, meta.get("current-schema-id", 0))
        pf = I._partition_fields(meta, ice_schema)
        return I._commit_snapshot(
            t, meta, ice_schema, pf,
            added_files=[], existing_entries=[], deleted_entries=[],
            carry_prior_manifests=True, operation="delete",
            added_delete_files=[eq],
        )

    sid = _scoped_eq_commit([1], "a")
    ch = iceberg_row_changes(spark, t, sid, keys=["id", "g"]).collect()
    assert [(r.id, r.g, r._change_type) for r in ch] == [(1, "a", "delete")]
    # a second checkpoint deleting in the OTHER partition: scope stays
    # exactly that partition (same key in 'a' already gone, untouched)
    sid2 = _scoped_eq_commit([2], "b")
    ch2 = iceberg_row_changes(spark, t, sid2, keys=["id", "g"]).collect()
    assert [(r.id, r.g, r._change_type) for r in ch2] == [
        (2, "b", "delete")
    ]
    got = sorted(map(tuple, read_iceberg(spark, t).collect()))
    assert got == [(1, "b", 10.0), (2, "a", 2.0)]
    # GLOBAL equality delete (the upsert channel): derives exactly
    # since r12 — the victim set is every lower-sequence file, so the
    # upserted key surfaces as update pre/post
    upsert_iceberg_mor(
        spark,
        t,
        spark.createDataFrame([(2, "a", 9.0)], "id long, g string, v double"),
        keys=["id"],
    )
    meta = I._load_metadata(t)
    sid3 = meta["current-snapshot-id"]
    ch3 = iceberg_row_changes(spark, t, sid3, keys=["id", "g"]).collect()
    assert sorted((r.id, r.g, r.v, r._change_type) for r in ch3) == [
        (2, "a", 2.0, "update_preimage"),
        (2, "a", 9.0, "update_postimage"),
    ]
    # above the file budget the named refusal stays (scope ∝ table)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(I, "_CHANGELOG_GLOBAL_EQ_MAX_FILES", 0)
        with pytest.raises(NotImplementedError, match="changelog budget"):
            iceberg_row_changes(spark, t, sid3, keys=["id", "g"])


def test_changelog_derives_global_equality_delete_unpartitioned(
    spark, tmp_path
):
    """r12 (r11 verdict item 4): a changed GLOBAL equality delete on an
    UNPARTITIONED table (the Flink-CDC delete shape — no re-insert)
    derives exact 'delete' rows: the victim set is every
    lower-sequence data file, all of which join both diff sides under
    their own delete state."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import sparkstreamingtwitter_presidential_spark.sources.iceberg as I
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        iceberg_row_changes,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(8)], "id long, v double"
    )
    write_iceberg(df.repartition(2), t)
    write_iceberg(
        spark.createDataFrame([(100, 1.5)], "id long, v double"),
        t,
        mode="append",
    )

    ddir = os.path.join(t, "data", "eqdel_global")
    os.makedirs(ddir, exist_ok=True)
    dfile = os.path.join(ddir, "eq.parquet")
    pq.write_table(
        pa.table({"id": pa.array([3, 100], pa.int64())}), dfile
    )
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
    meta = I._load_metadata(t)
    ice_schema = I._schema_for(meta, meta.get("current-schema-id", 0))
    pf = I._partition_fields(meta, ice_schema)
    sid = I._commit_snapshot(
        t, meta, ice_schema, pf,
        added_files=[], existing_entries=[], deleted_entries=[],
        carry_prior_manifests=True, operation="delete",
        added_delete_files=[eq],
    )
    ch = iceberg_row_changes(spark, t, sid, keys=["id"]).collect()
    assert sorted((r.id, r.v, r._change_type) for r in ch) == [
        (3, 3.0, "delete"),
        (100, 1.5, "delete"),
    ]
    got = sorted(r.id for r in read_iceberg(spark, t).collect())
    assert got == [0, 1, 2, 4, 5, 6, 7]
