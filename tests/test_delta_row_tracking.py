"""Delta ROW TRACKING, read side (r12 — PROTOCOL.md §Row Tracking,
the Delta twin of Iceberg v3 row lineage and r11 verdict item 6):

* ``read_delta_rows`` surfaces ``_row_id`` / ``_row_commit_version``:
  fresh values derive from the add action's baseRowId +
  ``_metadata.row_index`` and defaultRowCommitVersion; MATERIALIZED
  columns (physical names from the table's
  ``delta.rowTracking.materialized*ColumnName`` config) win where
  non-null; files missing baseRowId (pre-enablement history) read
  NULL rather than a guessed id.
* WRITE SIDE (r12-late): ``enable_row_tracking`` upgrades the
  protocol, mints materialized column names, and backfills live
  files; appends claim fresh id ranges from the ``rowIdHighWaterMark``
  domain metadata; CoW and DV DML/OPTIMIZE/REORG rewrites carry ids
  as materialized columns (DV deletes re-add actions verbatim);
  a rewrite on a foreign table lacking the materialized-name config
  refuses by name.
* ``read_delta_rows`` on a non-row-tracked table refuses by name.
"""

import json
import os

import pytest

from sparkstreamingtwitter_presidential_spark.sources.delta import (
    read_delta,
    write_delta,
)
from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
    read_delta_rows,
)

_MAT_ID = "_row_id_col_7f3a"
_MAT_VER = "_row_commit_col_7f3a"


def _forge_row_tracking(
    table: str, bases: list[int | None], dvers: list[int | None],
    materialized: bool = False,
) -> None:
    """Rewrite commit 0: protocol -> writer v7 + rowTracking, config ->
    enableRowTracking (+ materialized column names), and stamp the i-th
    add action (sorted by path) with bases[i]/dvers[i] (None = omit,
    the pre-enablement shape)."""
    log = os.path.join(table, "_delta_log", f"{0:020d}.json")
    acts = [json.loads(x) for x in open(log).read().splitlines() if x.strip()]
    adds = sorted(
        (a for a in acts if "add" in a), key=lambda a: a["add"]["path"]
    )
    assert len(adds) == len(bases)
    for a, b, v in zip(adds, bases, dvers):
        if b is not None:
            a["add"]["baseRowId"] = b
        if v is not None:
            a["add"]["defaultRowCommitVersion"] = v
    out = []
    for a in acts:
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 1,
                "minWriterVersion": 7,
                "writerFeatures": ["rowTracking", "domainMetadata"],
            }
        if "metaData" in a:
            cfg = dict(a["metaData"].get("configuration") or {})
            cfg["delta.enableRowTracking"] = "true"
            if materialized:
                cfg["delta.rowTracking.materializedRowIdColumnName"] = _MAT_ID
                cfg[
                    "delta.rowTracking.materializedRowCommitVersionColumnName"
                ] = _MAT_VER
            a["metaData"]["configuration"] = cfg
            if materialized:
                # the materialized columns live in the FILES but OUTSIDE
                # the table schema — strip them from schemaString
                sch = json.loads(a["metaData"]["schemaString"])
                sch["fields"] = [
                    f
                    for f in sch["fields"]
                    if f["name"] not in (_MAT_ID, _MAT_VER)
                ]
                a["metaData"]["schemaString"] = json.dumps(sch)
        out.append(json.dumps(a))
    # the high-watermark domain metadata a real enabling writer commits
    out.append(
        json.dumps(
            {
                "domainMetadata": {
                    "domain": "delta.rowTracking",
                    "configuration": json.dumps(
                        {"rowIdHighWaterMark": max(
                            (b or 0) for b in bases
                        ) + 1000}
                    ),
                    "removed": False,
                }
            }
        )
    )
    open(log, "w").write("\n".join(out) + "\n")


def _n_adds(table: str) -> int:
    log = os.path.join(table, "_delta_log", f"{0:020d}.json")
    return sum(
        1
        for x in open(log).read().splitlines()
        if x.strip() and "add" in json.loads(x)
    )


def test_fresh_row_ids_derive_from_base_and_position(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id long, v double"
    ).repartition(2)
    write_delta(df, t)
    assert _n_adds(t) == 2
    _forge_row_tracking(t, [0, 1000], [7, 7])
    rows = read_delta_rows(spark, t).collect()
    ids = sorted(r._row_id for r in rows)
    # two files, bases 0 and 1000: each file's rows take base..base+n-1
    lo = [i for i in ids if i < 1000]
    hi = [i for i in ids if i >= 1000]
    assert lo == list(range(len(lo)))
    assert hi == list(range(1000, 1000 + len(hi)))
    assert {r._row_commit_version for r in rows} == {7}
    assert len({r._row_id for r in rows}) == 20
    # plain reads never expose the columns
    assert "_row_id" not in read_delta(spark, t).columns


def test_missing_base_row_id_reads_null(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "id long, v double"
        ).repartition(2),
        t,
    )
    _forge_row_tracking(t, [0, None], [7, None])
    rows = read_delta_rows(spark, t).collect()
    with_id = [r for r in rows if r._row_id is not None]
    without = [r for r in rows if r._row_id is None]
    assert with_id and without  # one backfilled file, one awaiting
    assert all(r._row_commit_version is None for r in without)


def test_materialized_columns_win_over_derivation(spark, tmp_path):
    t = str(tmp_path / "t")
    # the materialized columns ride INSIDE the staged files, then get
    # stripped from the declared schema by the forge — the real layout
    # a copying writer produces
    df = spark.createDataFrame(
        [(i, float(i), 5000 + i, 3) for i in range(10)],
        f"id long, v double, {_MAT_ID} long, {_MAT_VER} long",
    ).coalesce(1)
    write_delta(df, t)
    assert _n_adds(t) == 1
    _forge_row_tracking(t, [0], [7], materialized=True)
    rows = read_delta_rows(spark, t).collect()
    assert sorted(r._row_id for r in rows) == [5000 + i for i in range(10)]
    assert {r._row_commit_version for r in rows} == {3}
    assert sorted(r[0] for r in rows) == list(range(10))
    # the materialized physical columns stay hidden from the output
    assert set(read_delta_rows(spark, t).columns) == {
        "id", "v", "_row_id", "_row_commit_version"
    }


def test_foreign_row_tracked_writes_maintain_or_refuse(spark, tmp_path):
    """r12-late: appends to a FOREIGN row-tracked table MAINTAIN ids
    (fresh range from the forged high watermark); a REWRITE on a table
    WITHOUT materialized column names refuses by name (it could not
    preserve ids — both the CoW and the DV-update shapes); a DV DELETE
    works regardless (the re-added action carries ids verbatim)."""
    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        delete_delta,
        delete_delta_dv,
        update_delta_dv,
    )

    t = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(1, 1.0), (3, 3.0)], "id long, v double"
        ).coalesce(1),
        t,
    )
    _forge_row_tracking(t, [0], [7])  # watermark forged to base+1000
    write_delta(
        spark.createDataFrame([(2, 2.0)], "id long, v double").coalesce(1), t
    )
    lin = {r.id: r._row_id for r in read_delta_rows(spark, t).collect()}
    assert lin[2] == 1001  # fresh id ABOVE the forged watermark
    assert {lin[1], lin[3]} == {0, 1}
    # rewrites without materialized names: named refusals
    with pytest.raises(NotImplementedError, match="materialized"):
        delete_delta(spark, t, "id = 1")
    with pytest.raises(NotImplementedError, match="materialized"):
        update_delta_dv(spark, t, {"v": "v + 1"}, "id = 1")
    # a DV DELETE never moves a row: works, survivors keep their ids
    delete_delta_dv(spark, t, "id = 3")
    lin2 = {r.id: r._row_id for r in read_delta_rows(spark, t).collect()}
    assert lin2 == {1: lin[1], 2: 1001}


def test_read_delta_rows_refuses_without_the_feature(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(spark.createDataFrame([(1, 1.0)], "id long, v double"), t)
    with pytest.raises(NotImplementedError, match="rowTracking"):
        read_delta_rows(spark, t)


def test_enable_and_maintain_row_tracking_end_to_end(spark, tmp_path):
    """r12-late, the WRITE side: enable_row_tracking backfills live
    files and mints the materialized column names; appends claim fresh
    id ranges from the high watermark; UPDATE/MERGE carry the touched
    row's id with a new commit version (copied file-mates keep both);
    DELETE survivors and OPTIMIZE carry everything; the watermark
    survives a checkpoint (no id reuse after log collapse)."""
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        enable_row_tracking,
        write_checkpoint,
    )
    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        delete_delta,
        merge_delta,
        optimize_delta,
        update_delta,
    )

    t = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(20)], "id long, v double"
        ).repartition(2),
        t,
    )
    enable_row_tracking(spark, t)
    assert enable_row_tracking(spark, t) == 1  # idempotent, no commit

    def lineage():
        return {
            r.id: (r._row_id, r._row_commit_version)
            for r in read_delta_rows(spark, t).collect()
        }

    base = lineage()
    assert sorted(x[0] for x in base.values()) == list(range(20))
    assert {x[1] for x in base.values()} == {1}  # the backfill commit

    write_delta(
        spark.createDataFrame([(100, 1.0), (101, 2.0)], "id long, v double"),
        t,
    )
    l2 = lineage()
    assert all(l2[i] == base[i] for i in base)
    assert {l2[100][0], l2[101][0]} == {20, 21} and l2[100][1] == 2

    update_delta(spark, t, {"v": "v + 50"}, "id = 3")
    l3 = lineage()
    assert l3[3][0] == base[3][0] and l3[3][1] == 3
    assert all(l3[i] == l2[i] for i in l3 if i != 3)

    merge_delta(
        spark, t,
        spark.createDataFrame([(5, -1.0), (200, 9.0)], "id long, v double"),
        ["id"],
    )
    l4 = lineage()
    assert l4[5][0] == base[5][0] and l4[5][1] == 4
    assert l4[200][0] not in {x[0] for x in l3.values()} and l4[200][1] == 4
    assert all(l4[i] == l3[i] for i in l4 if i not in (5, 200))

    delete_delta(spark, t, "id = 7")
    l5 = lineage()
    assert 7 not in l5 and all(l5[i] == l4[i] for i in l5)

    optimize_delta(spark, t, target_file_bytes=1 << 30)
    assert lineage() == l5

    # watermark survives checkpoint + further appends never reuse ids
    write_checkpoint(t)
    write_delta(
        spark.createDataFrame([(300, 3.0)], "id long, v double"), t
    )
    l7 = lineage()
    ids = [x[0] for x in l7.values()]
    assert len(ids) == len(set(ids))
    assert l7[300][0] > max(x[0] for x in l5.values())
    # plain reads stay clean and values are the post-DML state
    got = {r.id: r.v for r in read_delta(spark, t).collect()}
    assert got[3] == 53.0 and got[5] == -1.0
    assert "_row_id" not in read_delta(spark, t).columns


def test_dv_family_maintains_row_tracking(spark, tmp_path):
    """r12-late completion: the DV write family maintains ids too — a
    DV delete leaves survivors' ids untouched (the vector never moves
    a row), DV update/merge re-stage touched rows CARRYING their id
    with the new commit's version, and REORG's fold keeps both values
    for every surviving row."""
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        enable_row_tracking,
    )
    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        delete_delta_dv,
        merge_delta_dv,
        rewrite_deletion_vectors,
        update_delta_dv,
    )

    t = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(20)], "id long, v double"
        ).repartition(2),
        t,
    )
    enable_row_tracking(spark, t)

    def lineage():
        return {
            r.id: (r._row_id, r._row_commit_version)
            for r in read_delta_rows(spark, t).collect()
        }

    base = lineage()
    assert sorted(x[0] for x in base.values()) == list(range(20))

    delete_delta_dv(spark, t, "id = 4")  # v2
    l2 = lineage()
    assert 4 not in l2 and all(l2[i] == base[i] for i in l2)

    update_delta_dv(spark, t, {"v": "v + 50"}, "id = 3")  # v3
    l3 = lineage()
    assert l3[3][0] == base[3][0] and l3[3][1] == 3
    assert all(l3[i] == l2[i] for i in l3 if i != 3)

    merge_delta_dv(
        spark, t,
        spark.createDataFrame([(5, -1.0), (400, 4.0)], "id long, v double"),
        ["id"],
    )  # v4
    l4 = lineage()
    assert l4[5][0] == base[5][0] and l4[5][1] == 4
    assert l4[400][0] not in {x[0] for x in l3.values()} and l4[400][1] == 4
    assert all(l4[i] == l3[i] for i in l4 if i not in (5, 400))

    rewrite_deletion_vectors(spark, t)  # v5: layout-only fold
    assert lineage() == l4
    got = {r.id: r.v for r in read_delta(spark, t).collect()}
    assert got[3] == 53.0 and got[5] == -1.0 and 4 not in got


def test_watermark_survives_both_checkpoint_forms_and_log_expiry(
    spark, tmp_path
):
    """The rowIdHighWaterMark domain metadata must round-trip BOTH
    checkpoint forms (classic parquet and the V2 manifest+sidecars) —
    after expire_log drops the JSON commits, a lost watermark would
    make the next append REUSE row ids."""
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        enable_row_tracking,
        expire_log,
        write_checkpoint,
    )

    for v2 in (False, True):
        t = str(tmp_path / f"t_v2_{v2}")
        write_delta(
            spark.createDataFrame(
                [(i, float(i)) for i in range(10)], "id long, v double"
            ).coalesce(1),
            t,
        )
        enable_row_tracking(spark, t)
        cp = write_checkpoint(t, v2=v2)
        expire_log(t, keep_from=cp)
        write_delta(
            spark.createDataFrame([(100, 1.0)], "id long, v double"), t
        )
        lin = {
            r.id: r._row_id for r in read_delta_rows(spark, t).collect()
        }
        ids = sorted(lin.values())
        assert len(ids) == len(set(ids)), f"id reuse (v2={v2})"
        assert lin[100] >= 10, f"watermark lost through checkpoint v2={v2}"


def test_lineage_read_plans_without_shuffle(spark, tmp_path):
    """Scale pin: read_delta_rows resolves ids with ONE broadcast
    hash join against the metadata id map — no Exchange other than the
    broadcast, no window, no global ordering pass (the 100 TB shape)."""
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        enable_row_tracking,
    )

    t = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(100)], "id long, v double"
        ).repartition(2),
        t,
    )
    enable_row_tracking(spark, t)
    plan = read_delta_rows(spark, t)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_row_tracking_on_column_mapped_table(spark, tmp_path):
    """Row tracking composes with name-mode column mapping: the
    materialized columns are PHYSICAL names riding beside the mapped
    data columns, so enable + append + CoW update carry ids exactly as
    on unmapped tables."""
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        enable_row_tracking,
    )
    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        update_delta,
    )

    t = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(12)], "id long, v double"
        ).coalesce(1),
        t,
        column_mapping="name",
    )
    enable_row_tracking(spark, t)
    base = {
        r.id: (r._row_id, r._row_commit_version)
        for r in read_delta_rows(spark, t).collect()
    }
    assert sorted(x[0] for x in base.values()) == list(range(12))
    write_delta(
        spark.createDataFrame([(50, 5.0)], "id long, v double"), t
    )
    update_delta(spark, t, {"v": "v * 10"}, "id = 3")
    lin = {
        r.id: (r._row_id, r._row_commit_version)
        for r in read_delta_rows(spark, t).collect()
    }
    assert lin[3][0] == base[3][0] and lin[3][1] == 3
    assert lin[50][0] == 12 and lin[50][1] == 2
    assert all(lin[i] == base[i] for i in base if i != 3)
    got = {r.id: r.v for r in read_delta(spark, t).collect()}
    assert got[3] == 30.0 and got[50] == 5.0


def test_streaming_upsert_sink_maintains_row_tracking(spark, tmp_path):
    """The exactly-once upsert committer (merge_delta / merge_delta_dv
    under foreachBatch) maintains row tracking batch over batch:
    matched keys keep their ids across micro-batches, inserts mint
    fresh ones, and the txn idempotence marker rides the same commit."""
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        enable_row_tracking,
    )
    from sparkstreamingtwitter_presidential_spark.streaming.delta_upsert import (
        delta_upsert_committer,
    )

    for use_dvs in (False, True):
        t = str(tmp_path / f"t_dv_{use_dvs}")
        write_delta(
            spark.createDataFrame(
                [(i, float(i)) for i in range(8)], "id long, v double"
            ).coalesce(1),
            t,
        )
        enable_row_tracking(spark, t)
        base = {
            r.id: r._row_id for r in read_delta_rows(spark, t).collect()
        }
        commit = delta_upsert_committer(
            spark, t, ["id"], app_id=f"rt-{use_dvs}", use_dvs=use_dvs
        )
        commit(
            spark.createDataFrame([(3, 30.0), (90, 9.0)], "id long, v double"),
            0,
        )
        commit(
            spark.createDataFrame([(90, 91.0)], "id long, v double"), 1
        )
        commit(  # redelivery of batch 1: must be a durable no-op
            spark.createDataFrame([(90, -1.0)], "id long, v double"), 1
        )
        lin = {
            r.id: (r._row_id, r._row_commit_version)
            for r in read_delta_rows(spark, t).collect()
        }
        assert lin[3][0] == base[3], f"matched id shifted (dv={use_dvs})"
        first_90 = lin[90][0]
        assert first_90 not in set(base.values())
        got = {r.id: r.v for r in read_delta(spark, t).collect()}
        assert got[3] == 30.0 and got[90] == 91.0, f"dv={use_dvs}"
        ids = [x[0] for x in lin.values()]
        assert len(ids) == len(set(ids))


def test_restore_keeps_ids_and_never_reuses_the_watermark(spark, tmp_path):
    """RESTORE re-adds the target version's files verbatim (ids carried
    in the add actions) and leaves the watermark domain UNTOUCHED — so
    rows removed by the rollback never get their ids recycled by a
    later append (the spec's ids-are-never-reused rule)."""
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        enable_row_tracking,
        restore_delta,
    )

    t = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(6)], "id long, v double"
        ).coalesce(1),
        t,
    )
    enable_row_tracking(spark, t)  # v1
    base = {r.id: r._row_id for r in read_delta_rows(spark, t).collect()}
    write_delta(
        spark.createDataFrame([(100, 1.0)], "id long, v double"), t
    )  # v2 claims ids >= 6
    restore_delta(spark, t, 1)  # roll back past the append
    lin = {r.id: r._row_id for r in read_delta_rows(spark, t).collect()}
    assert lin == base
    # a post-restore append must NOT recycle the rolled-back range
    write_delta(
        spark.createDataFrame([(200, 2.0)], "id long, v double"), t
    )
    lin2 = {r.id: r._row_id for r in read_delta_rows(spark, t).collect()}
    assert lin2[200] >= 7, f"id recycled: {lin2[200]}"
    assert len(set(lin2.values())) == len(lin2)


def test_set_properties_steers_to_enable_row_tracking(spark, tmp_path):
    """Setting delta.enableRowTracking through set_delta_properties
    would leave an unmaintainable half-state (no protocol feature, no
    backfill, no watermark) — it steers to enable_row_tracking."""
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        set_delta_properties,
    )

    t = str(tmp_path / "t")
    write_delta(spark.createDataFrame([(1, 1.0)], "id long, v double"), t)
    with pytest.raises(ValueError, match="enable_row_tracking"):
        set_delta_properties(t, {"delta.enableRowTracking": "true"})
