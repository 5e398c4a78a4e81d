"""In-commit timestamps, WRITE side (r12 late): enablement via
set_delta_properties (protocol feature + provenance properties),
monotonic stamping across every commit path (append, DML via
commit_actions), commitInfo-first action ordering, time travel off the
stamped clock, and clone re-basing. Spec: Delta PROTOCOL.md §In-Commit
Timestamps (writer feature `inCommitTimestamp`). Read-side ICT
preference in version_at_timestamp landed r8; this pins the writer."""

from __future__ import annotations

import json
import os

import pytest

from sparkstreamingtwitter_presidential_spark.sources.delta import (
    read_delta,
    set_delta_properties,
    version_at_timestamp,
    write_delta,
)

SCHEMA = "id long, s string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _commit(t, v):
    with open(os.path.join(t, "_delta_log", f"{v:020d}.json")) as fh:
        return [json.loads(ln) for ln in fh if ln.strip()]


def _ict(t, v):
    acts = _commit(t, v)
    ci = next(a["commitInfo"] for a in acts if "commitInfo" in a)
    return ci.get("inCommitTimestamp")


def _enable(spark, t):
    return set_delta_properties(
        t, {"delta.enableInCommitTimestamps": "true"}
    )


def test_enablement_protocol_provenance_and_ordering(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    v = _enable(spark, t)
    acts = _commit(t, v)
    pr = next(a["protocol"] for a in acts if "protocol" in a)
    assert "inCommitTimestamp" in pr["writerFeatures"]
    assert pr["minWriterVersion"] == 7
    # legacy-implied features carried through the conversion
    assert {"appendOnly", "invariants"} <= set(pr["writerFeatures"])
    md = next(a["metaData"] for a in acts if "metaData" in a)
    cfg = md["configuration"]
    assert cfg["delta.inCommitTimestampEnablementVersion"] == str(v)
    # the recorded enablement timestamp IS the commit's own stamp
    assert int(cfg["delta.inCommitTimestampEnablementTimestamp"]) == _ict(
        t, v
    )
    # commitInfo FIRST in an ICT commit (the spec's requirement)
    assert "commitInfo" in acts[0]


def test_every_commit_path_stamps_monotonically(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        delete_delta,
        update_delta,
    )

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(i, "x") for i in range(10)]), t)
    v0 = _enable(spark, t)
    write_delta(_df(spark, [(100, "y")]), t, mode="append")
    update_delta(spark, t, {"s": "'z'"}, "id = 100")
    delete_delta(spark, t, "id = 0")
    stamps = [_ict(t, v) for v in range(v0, v0 + 4)]
    assert all(s is not None for s in stamps)
    assert stamps == sorted(stamps) and len(set(stamps)) == 4
    for v in range(v0, v0 + 4):
        assert "commitInfo" in _commit(t, v)[0]
    # pre-enablement commits carry NO stamp
    assert _ict(t, 0) is None


def test_monotonic_across_clock_regression(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    v = _enable(spark, t)
    # forge: parent's stamp far in the future (writer clock skew)
    f = os.path.join(t, "_delta_log", f"{v:020d}.json")
    acts = [json.loads(ln) for ln in open(f) if ln.strip()]
    future = int(acts[0]["commitInfo"]["inCommitTimestamp"]) + 10**9
    acts[0]["commitInfo"]["inCommitTimestamp"] = future
    with open(f, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in acts) + "\n")
    write_delta(_df(spark, [(2, "b")]), t, mode="append")
    # the child may not regress below the parent's clock
    assert _ict(t, v + 1) == future + 1


def test_timestamp_travel_uses_ict(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    v = _enable(spark, t)
    write_delta(_df(spark, [(2, "b")]), t, mode="append")
    write_delta(_df(spark, [(3, "c")]), t, mode="append")
    s1, s2 = _ict(t, v + 1), _ict(t, v + 2)
    assert version_at_timestamp(t, s1) == v + 1
    assert version_at_timestamp(t, s2 - 1) == v + 1
    assert version_at_timestamp(t, s2) == v + 2
    got = sorted(
        r.id
        for r in read_delta(spark, t, timestamp=s1).collect()
    )
    assert got == [1, 2]


def test_clone_rebases_ict_provenance(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        clone_delta,
    )

    t = str(tmp_path / "t")
    dst = str(tmp_path / "dst")
    write_delta(_df(spark, [(1, "a")]), t)
    _enable(spark, t)
    write_delta(_df(spark, [(2, "b")]), t, mode="append")
    clone_delta(t, dst)
    acts = _commit(dst, 0)
    assert "commitInfo" in acts[0]  # ICT ordering holds in the clone
    assert acts[0]["commitInfo"]["inCommitTimestamp"] is not None
    md = next(a["metaData"] for a in acts if "metaData" in a)
    cfg = md["configuration"]
    assert cfg["delta.inCommitTimestampEnablementVersion"] == "0"
    assert int(cfg["delta.inCommitTimestampEnablementTimestamp"]) == int(
        acts[0]["commitInfo"]["inCommitTimestamp"]
    )
    # clone appends keep stamping
    write_delta(_df(spark, [(3, "c")]), dst, mode="append")
    assert _ict(dst, 1) > _ict(dst, 0)


def test_idempotent_enable_and_non_ict_unchanged(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a")]), t)
    write_delta(_df(spark, [(2, "b")]), t, mode="append")
    # non-ICT table: no stamp, commitInfo stays LAST (legacy shape)
    assert _ict(t, 1) is None
    assert "commitInfo" in _commit(t, 1)[-1]
    v = _enable(spark, t)
    # re-enabling is a plain property set, provenance NOT re-based
    v2 = set_delta_properties(
        t, {"delta.enableInCommitTimestamps": "true", "foo": "bar"}
    )
    md = next(a["metaData"] for a in _commit(t, v2) if "metaData" in a)
    assert md["configuration"][
        "delta.inCommitTimestampEnablementVersion"
    ] == str(v)
    assert _ict(t, v2) is not None
