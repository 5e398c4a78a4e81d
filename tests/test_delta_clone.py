"""SHALLOW CLONE (r12 late): `clone_delta` forks a Delta table by
absolute-path add actions in a fresh log — zero-copy, metadata-only.
Covers divergence in both directions, version-pinned clones, deletion
vectors ("u" descriptors re-anchored as "p"), row-tracking carry with
non-colliding appends, partitioned reads through absolute paths, and
the vacuum table-root guard (a clone's vacuum must never reclaim
SOURCE storage)."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.sources.delta import (
    clone_delta,
    read_delta,
    write_delta,
)

SCHEMA = "id long, s string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _ids(spark, t, **kw):
    return sorted(r.id for r in read_delta(spark, t, **kw).collect())


def _commit0(t):
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json")) as fh:
        return [json.loads(ln) for ln in fh if ln.strip()]


def test_clone_roundtrip_and_divergence(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_delta(_df(spark, [(1, "a"), (2, "b")]), src)
    write_delta(_df(spark, [(3, "c")]), src, mode="append")

    assert clone_delta(src, dst) == 0
    assert _ids(spark, dst) == [1, 2, 3]

    # divergence: source commits invisible to the clone, and vice versa
    write_delta(_df(spark, [(9, "z")]), src, mode="append")
    write_delta(_df(spark, [(7, "x")]), dst, mode="append")
    assert _ids(spark, src) == [1, 2, 3, 9]
    assert _ids(spark, dst) == [1, 2, 3, 7]

    # fresh identity + CLONE provenance in the version-0 commit
    acts = _commit0(dst)
    md = next(a["metaData"] for a in acts if "metaData" in a)
    src_md = None
    for n in sorted(glob.glob(os.path.join(src, "_delta_log", "*.json"))):
        with open(n) as fh:
            for ln in fh:
                a = json.loads(ln)
                if "metaData" in a:
                    src_md = a["metaData"]
    assert md["id"] != src_md["id"]
    ci = next(a["commitInfo"] for a in acts if "commitInfo" in a)
    assert ci["operation"] == "CLONE"
    assert ci["operationParameters"]["sourceVersion"] == "1"
    # adds point INTO the source storage (url-encoded absolute paths)
    import urllib.parse

    adds = [a["add"]["path"] for a in acts if "add" in a]
    assert adds and all(
        urllib.parse.unquote(p).startswith(os.path.abspath(src) + os.sep)
        for p in adds
    )


def test_clone_at_pinned_version(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_delta(_df(spark, [(1, "a")]), src)
    write_delta(_df(spark, [(2, "b")]), src, mode="append")
    write_delta(_df(spark, [(3, "c")]), src, mode="append")
    clone_delta(src, dst, version=1)
    assert _ids(spark, dst) == [1, 2]  # not 3

    with pytest.raises(ValueError, match="already a Delta table"):
        clone_delta(src, dst)


def test_clone_carries_deletion_vectors(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        delete_delta_dv,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_delta(
        _df(spark, [(i, f"s{i}") for i in range(20)]).repartition(2), src
    )
    delete_delta_dv(spark, src, "id % 5 = 0")
    clone_delta(src, dst)
    assert _ids(spark, dst) == [i for i in range(20) if i % 5 != 0]
    # the clone's descriptors are absolute ("p") into source storage
    dvs = [
        a["add"]["deletionVector"]
        for a in _commit0(dst)
        if "add" in a and a["add"].get("deletionVector")
    ]
    assert dvs and all(dv["storageType"] == "p" for dv in dvs)
    assert all(os.path.isfile(dv["pathOrInlineDv"]) for dv in dvs)


def test_clone_partitioned_reads_inject_partition_values(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = spark.createDataFrame(
        [(1, "x", "p1"), (2, "y", "p2"), (3, "z", "p1")],
        "id long, s string, part string",
    )
    write_delta(df, src, partition_by=["part"])
    clone_delta(src, dst)
    got = sorted(
        (r.id, r.part) for r in read_delta(spark, dst).collect()
    )
    assert got == [(1, "p1"), (2, "p2"), (3, "p1")]


def test_clone_row_tracking_carries_and_appends_mint_fresh(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        enable_row_tracking,
    )
    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        read_delta_rows,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_delta(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), src)
    enable_row_tracking(spark, src)
    clone_delta(src, dst)

    src_ids = {r.id: r._row_id for r in read_delta_rows(spark, src).collect()}
    dst_ids = {r.id: r._row_id for r in read_delta_rows(spark, dst).collect()}
    assert dst_ids == src_ids  # ids carry verbatim through the fork

    # the watermark domain carried too: clone appends mint BEYOND it
    write_delta(_df(spark, [(4, "d")]), dst, mode="append")
    after = {r.id: r._row_id for r in read_delta_rows(spark, dst).collect()}
    assert after[4] > max(src_ids.values())
    assert len(set(after.values())) == 4


def test_clone_vacuum_never_reclaims_source(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        delete_delta,
        vacuum_delta,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_delta(
        _df(spark, [(i, f"s{i}") for i in range(10)]).repartition(2), src
    )
    clone_delta(src, dst)
    # CoW delete on the clone tombstones the ABSOLUTE source files and
    # rewrites survivors locally under dst
    delete_delta(spark, dst, "id < 5")
    assert _ids(spark, dst) == [5, 6, 7, 8, 9]
    src_files = set(glob.glob(os.path.join(src, "**", "*.parquet"),
                              recursive=True))
    deleted = vacuum_delta(dst, retention_hours=0.0)
    # vacuum reclaimed nothing outside dst; source is byte-identical
    assert set(
        glob.glob(os.path.join(src, "**", "*.parquet"), recursive=True)
    ) == src_files
    assert all(not os.path.isabs(p) for p in deleted)
    assert _ids(spark, src) == list(range(10))
    assert _ids(spark, dst) == [5, 6, 7, 8, 9]


def test_clone_refuses_missing_source(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        clone_delta(str(tmp_path / "nope"), str(tmp_path / "dst"))
