"""Mapped-table DDL (r12 late): RENAME COLUMN and DROP COLUMN as
metadata-only commits on column-mapped tables — the physicalName
decouples logical names from data files, so neither op moves a byte.
Non-mapped tables refuse by name; contract-referencing columns refuse
(stored SQL would silently break). Spec: Delta PROTOCOL.md §Column
Mapping; the real writer's ALTER TABLE RENAME/DROP COLUMN rules."""

from __future__ import annotations

import pytest

from sparkstreamingtwitter_presidential_spark.sources.delta import (
    drop_column_delta,
    read_delta,
    rename_column_delta,
    write_delta,
)


def _mapped(spark, t, rows=None, partition_by=None, configuration=None):
    df = spark.createDataFrame(
        rows or [(1, "a", 10.0), (2, "b", 20.0)],
        "id long, s string, v double",
    )
    write_delta(
        df, t, column_mapping="name",
        partition_by=partition_by, configuration=configuration,
    )


def test_rename_is_metadata_only_and_reads_carry(spark, tmp_path):
    t = str(tmp_path / "t")
    _mapped(spark, t)
    import glob
    import os

    files_before = set(
        glob.glob(os.path.join(t, "**", "*.parquet"), recursive=True)
    )
    rename_column_delta(t, "v", "amount")
    # no data moved; old files serve the new logical name
    assert set(
        glob.glob(os.path.join(t, "**", "*.parquet"), recursive=True)
    ) == files_before
    got = sorted((r.id, r.amount) for r in read_delta(spark, t).collect())
    assert got == [(1, 10.0), (2, 20.0)]
    # appends under the NEW name land in the same physical column
    write_delta(
        spark.createDataFrame(
            [(3, "c", 30.0)], "id long, s string, amount double"
        ),
        t,
        mode="append",
    )
    got = sorted((r.id, r.amount) for r in read_delta(spark, t).collect())
    assert got == [(1, 10.0), (2, 20.0), (3, 30.0)]


def test_rename_partition_column(spark, tmp_path):
    t = str(tmp_path / "t")
    _mapped(
        spark, t,
        rows=[(1, "p1", 1.0), (2, "p2", 2.0)],
        partition_by=["s"],
    )
    rename_column_delta(t, "s", "part")
    got = sorted((r.id, r.part) for r in read_delta(spark, t).collect())
    assert got == [(1, "p1"), (2, "p2")]
    write_delta(
        spark.createDataFrame(
            [(3, "p1", 3.0)], "id long, part string, v double"
        ),
        t,
        mode="append",
    )
    assert read_delta(spark, t).filter("part = 'p1'").count() == 2


def test_drop_column_metadata_only(spark, tmp_path):
    t = str(tmp_path / "t")
    _mapped(spark, t)
    drop_column_delta(t, "v")
    rows = read_delta(spark, t).collect()
    assert sorted((r.asDict() for r in rows), key=lambda d: d["id"]) == [
        {"id": 1, "s": "a"},
        {"id": 2, "s": "b"},
    ]
    # appends no longer carry the dropped column
    write_delta(
        spark.createDataFrame([(3, "c")], "id long, s string"),
        t,
        mode="append",
    )
    assert read_delta(spark, t).count() == 3


def test_ddl_refusals(spark, tmp_path):
    t_plain = str(tmp_path / "plain")
    write_delta(
        spark.createDataFrame([(1, "a")], "id long, s string"), t_plain
    )
    with pytest.raises(NotImplementedError, match="column mapping"):
        rename_column_delta(t_plain, "s", "z")
    with pytest.raises(NotImplementedError, match="column mapping"):
        drop_column_delta(t_plain, "s")

    t = str(tmp_path / "t")
    _mapped(
        spark, t,
        configuration={"delta.constraints.v_pos": "v >= 0"},
    )
    with pytest.raises(ValueError, match="CHECK constraint"):
        rename_column_delta(t, "v", "amount")
    with pytest.raises(ValueError, match="CHECK constraint"):
        drop_column_delta(t, "v")
    # non-referenced columns still rename/drop fine
    rename_column_delta(t, "s", "label")
    with pytest.raises(ValueError, match="unknown column"):
        drop_column_delta(t, "nope")
    with pytest.raises(ValueError, match="already exists"):
        rename_column_delta(t, "id", "label")

    t2 = str(tmp_path / "t2")
    _mapped(spark, t2, rows=[(1, "p1", 1.0)], partition_by=["s"])
    with pytest.raises(ValueError, match="partition column"):
        drop_column_delta(t2, "s")


def test_dml_after_rename(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        delete_delta,
        update_delta,
    )

    t = str(tmp_path / "t")
    _mapped(spark, t)
    rename_column_delta(t, "v", "amount")
    update_delta(spark, t, {"amount": "amount * 2"}, "id = 1")
    delete_delta(spark, t, "id = 2")
    got = sorted(
        (r.id, r.amount) for r in read_delta(spark, t).collect()
    )
    assert got == [(1, 20.0)]


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        add_check_constraint,
        drop_check_constraint,
    )

    t = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(1, 10.0), (2, -5.0)], "id long, v double"
        ),
        t,
    )
    # existing data violates -> refuse with a sample, nothing commits
    with pytest.raises(ValueError, match="existing row violates"):
        add_check_constraint(spark, t, "v_pos", "v >= 0")
    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        delete_delta,
    )

    delete_delta(spark, t, "v < 0")
    add_check_constraint(spark, t, "v_pos", "v >= 0")
    # the new contract is ENFORCED on later writes
    with pytest.raises(ValueError, match="v_pos"):
        write_delta(
            spark.createDataFrame([(3, -1.0)], "id long, v double"),
            t,
            mode="append",
        )
    # NULL passes (SQL CHECK semantics)
    write_delta(
        spark.createDataFrame([(4, None)], "id long, v double"),
        t,
        mode="append",
    )
    # protocol declares the feature for foreign writers
    import json as _json
    import os as _os

    pr = None
    log = _os.path.join(t, "_delta_log")
    for n in sorted(_os.listdir(log)):
        if n.endswith(".json"):
            for ln in open(_os.path.join(log, n)):
                a = _json.loads(ln)
                if "protocol" in a:
                    pr = a["protocol"]
    assert pr["minWriterVersion"] >= 3

    with pytest.raises(ValueError, match="already exists"):
        add_check_constraint(spark, t, "v_pos", "v >= 0")
    drop_check_constraint(t, "v_pos")
    # dropped: violating appends land again
    write_delta(
        spark.createDataFrame([(5, -9.0)], "id long, v double"),
        t,
        mode="append",
    )
    with pytest.raises(ValueError, match="unknown constraint"):
        drop_check_constraint(t, "v_pos")
    with pytest.raises(ValueError, match="identifier"):
        add_check_constraint(spark, t, "bad name", "v >= 0")


def test_describe_detail_frame(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        describe_detail,
        enable_row_tracking,
    )

    t = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(1, "p1", 1.0), (2, "p2", 2.0)], "id long, s string, v double"
        ),
        t,
        partition_by=["s"],
        configuration={"delta.appendOnly": "false"},
    )
    d = describe_detail(spark, t).collect()[0]
    assert d.format == "delta" and d.id
    assert d.partition_columns == ["s"]
    assert d.num_files >= 2 and d.size_in_bytes > 0
    assert '"delta.appendOnly": "false"' in d.properties
    assert d.min_reader_version >= 1 and d.min_writer_version >= 2
    # the frame tracks protocol upgrades
    enable_row_tracking(spark, t)
    d2 = describe_detail(spark, t).collect()[0]
    assert "rowTracking" in d2.writer_features
    assert d2.min_writer_version == 7
    assert d2.num_files == d.num_files  # backfill re-adds, not grows
