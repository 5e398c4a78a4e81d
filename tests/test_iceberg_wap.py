"""Write-audit-publish (r12): `fast_forward` + `cherrypick_snapshot`,
the publish half of branch-staged writes (the r9 branch-write surface
wrote to branches; these move the audited work onto main). Semantics
pinned to the public Spark procedures `system.fast_forward` /
`system.cherrypick_snapshot` (iceberg.apache.org/docs/latest/spark-
procedures): publish is metadata-only, diverged fast-forwards refuse,
cherry-pick re-applies APPENDS only and refuses duplicates."""

from __future__ import annotations

import json

import pytest

from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
    cherrypick_snapshot,
    create_ref,
    current_snapshot_id,
    fast_forward,
    read_iceberg,
    table_refs,
    write_iceberg,
)

SCHEMA = "id long, s string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _meta(t):
    import glob
    import os

    vs = sorted(
        glob.glob(os.path.join(t, "metadata", "v*.metadata.json")),
        key=lambda p: int(os.path.basename(p)[1:].split(".")[0]),
    )
    with open(vs[-1]) as fh:
        return json.load(fh), len(vs)


def _ids(spark, t, **kw):
    return sorted(r.id for r in read_iceberg(spark, t, **kw).collect())


def test_fast_forward_publishes_audit_branch(spark, tmp_path):
    """The WAP happy path: stage two appends on an audit branch
    (main frozen for readers), audit THERE, then publish by
    fast-forwarding main — a metadata-only commit after which main's
    head IS the branch head and the staged snapshots are in main's
    snapshot-log (they became current at publish time)."""
    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a"), (2, "b")]), t)
    create_ref(t, "audit", kind="branch")
    write_iceberg(_df(spark, [(3, "c")]), t, mode="append", branch="audit")
    write_iceberg(_df(spark, [(4, "d")]), t, mode="append", branch="audit")

    # audit: the branch sees staged rows, main does not
    assert _ids(spark, t, ref="audit") == [1, 2, 3, 4]
    assert _ids(spark, t) == [1, 2]
    meta_before, _ = _meta(t)
    log_before = len(meta_before.get("snapshot-log", []))

    head = fast_forward(t, "main", "audit")
    assert _ids(spark, t) == [1, 2, 3, 4]
    assert current_snapshot_id(t) == head
    refs = {r.name: r.snapshot_id for r in table_refs(spark, t).collect()}
    assert refs["main"] == refs["audit"] == head

    meta, _ = _meta(t)
    log = meta["snapshot-log"]
    # both staged snapshots were published, oldest first, and the log
    # stays monotone (timestamp time-travel depends on it)
    assert len(log) == log_before + 2
    assert log[-1]["snapshot-id"] == head
    ts = [e["timestamp-ms"] for e in log]
    assert ts == sorted(ts)


def test_fast_forward_noop_and_divergence_refusal(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a")]), t)
    create_ref(t, "audit", kind="branch")
    write_iceberg(_df(spark, [(2, "b")]), t, mode="append", branch="audit")

    fast_forward(t, "main", "audit")
    _, n_versions = _meta(t)
    # idempotent no-op: already at the target, no version burned
    assert fast_forward(t, "main", "audit") == current_snapshot_id(t)
    _, n_after = _meta(t)
    assert n_after == n_versions

    # main advances past the branch point -> diverged -> refuse,
    # pointing at cherrypick_snapshot
    write_iceberg(_df(spark, [(8, "x")]), t, mode="append", branch="audit")
    write_iceberg(_df(spark, [(9, "z")]), t, mode="append")
    with pytest.raises(ValueError, match="cherrypick_snapshot"):
        fast_forward(t, "main", "audit")


def test_fast_forward_named_branch_create_and_tag_refusal(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a")]), t)
    create_ref(t, "dev", kind="branch")
    write_iceberg(_df(spark, [(2, "b")]), t, mode="append", branch="dev")

    # advancing an ABSENT branch creates it (the procedure's contract)
    head = fast_forward(t, "staging", "dev")
    refs = {
        r.name: (r.type, r.snapshot_id)
        for r in table_refs(spark, t).collect()
    }
    assert refs["staging"] == ("branch", head)
    assert _ids(spark, t, ref="staging") == [1, 2]

    create_ref(t, "pin", kind="tag")
    with pytest.raises(ValueError, match="tag"):
        fast_forward(t, "pin", "dev")
    with pytest.raises(ValueError, match="unknown ref"):
        fast_forward(t, "main", "nope")


def test_cherrypick_append_onto_moved_main(spark, tmp_path):
    """Main moved past the branch point: fast-forward refuses, but the
    branch's APPEND re-applies file-for-file as a NEW main snapshot —
    no data bytes move, the branch head stays where it was, and the
    new snapshot records its provenance in the summary."""
    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a")]), t)
    create_ref(t, "fix", kind="branch")
    write_iceberg(_df(spark, [(5, "e")]), t, mode="append", branch="fix")
    picked = {
        r.name: r.snapshot_id for r in table_refs(spark, t).collect()
    }["fix"]
    write_iceberg(_df(spark, [(9, "z")]), t, mode="append")  # main moves

    new_head = cherrypick_snapshot(t, picked)
    assert current_snapshot_id(t) == new_head != picked
    assert _ids(spark, t) == [1, 5, 9]
    assert _ids(spark, t, ref="fix") == [1, 5]  # branch untouched

    meta, _ = _meta(t)
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[new_head]
    assert snap["summary"]["cherry-picked-snapshot-id"] == str(picked)
    assert snap["summary"]["operation"] == "append"

    # picking it again would duplicate rows -> refuse. BOTH witnesses:
    # the new head is literally in main's ancestry...
    with pytest.raises(ValueError, match="already in main's ancestry"):
        cherrypick_snapshot(t, new_head)
    # ...while the ORIGINAL picked id is NOT (the pick is a new
    # snapshot), so only its recorded provenance proves the duplicate
    # (r13: pre-fix this re-pick silently doubled the rows)
    with pytest.raises(ValueError, match="already published"):
        cherrypick_snapshot(t, picked)
    assert _ids(spark, t) == [1, 5, 9]
    with pytest.raises(ValueError, match="unknown snapshot"):
        cherrypick_snapshot(t, 12345)


def test_cherrypick_refuses_non_append(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        delete_iceberg,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a"), (2, "b")]), t)
    delete_iceberg(spark, t, "id = 1")
    meta, _ = _meta(t)
    overwrite_id = meta["snapshots"][-1]["snapshot-id"]
    # a rolled-back overwrite cannot be re-applied onto a moved head
    with pytest.raises(NotImplementedError, match="append"):
        cherrypick_snapshot(t, overwrite_id)


def test_cherrypick_v3_mints_fresh_row_ids(spark, tmp_path):
    """v3 lineage across publish: the branch assigned row ids in ITS
    history; main never saw those rows, so the cherry-picked commit
    mints FRESH ids from main's next-row-id (explicit branch-side
    stamps are stripped) and the final read keeps ids unique."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg_dv import (
        read_iceberg_lineage,
    )

    t = str(tmp_path / "t")
    write_iceberg(_df(spark, [(1, "a"), (2, "b")]), t, format_version=3)
    create_ref(t, "stage", kind="branch")
    write_iceberg(_df(spark, [(3, "c")]), t, mode="append", branch="stage")
    picked = {
        r.name: r.snapshot_id for r in table_refs(spark, t).collect()
    }["stage"]
    write_iceberg(_df(spark, [(4, "d")]), t, mode="append")  # main moves

    cherrypick_snapshot(t, picked)
    lin = read_iceberg_lineage(spark, t)
    rows = {r.id: r._row_id for r in lin.collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    ids = list(rows.values())
    assert len(set(ids)) == 4 and all(i is not None for i in ids)
    # the picked row's id was minted AFTER main's append consumed its
    # range -- strictly the largest assigned id
    assert rows[3] == max(ids)
