"""Row-level change feed (delta_row_changes): keyed diff of a commit's
removed vs added files — inserts, deletes, update pre/post pairs, the
silence of copy-over rows and OPTIMIZE, and the primary-key contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.sources.delta import (
    delta_row_changes,
    write_delta,
)
from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
    delete_delta,
    merge_delta,
    optimize_delta,
    update_delta,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, v double")


def _changes(spark, t, version):
    return sorted(
        (r.id, r.grp, r.v, r._change_type)
        for r in delta_row_changes(spark, t, version, ["id"]).collect()
    )


def test_append_commit_is_all_inserts(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a", 1.0)]), t)
    write_delta(_df(spark, [(2, "a", 2.0), (3, "b", 3.0)]), t, mode="append")
    assert _changes(spark, t, 1) == [
        (2, "a", 2.0, "insert"),
        (3, "b", 3.0, "insert"),
    ]


def test_update_emits_pre_post_pairs_only_for_changed_rows(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)]), t)
    v = update_delta(spark, t, {"v": "v * 10"}, "v > 1.5")
    got = _changes(spark, t, v)
    # row 1 lives in a rewritten file but is byte-identical -> silent
    assert got == [
        (2, "a", 2.0, "update_preimage"),
        (2, "a", 20.0, "update_postimage"),
        (3, "b", 3.0, "update_preimage"),
        (3, "b", 30.0, "update_postimage"),
    ]


def test_delete_emits_deletes(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a", 1.0), (2, "a", 2.0)]), t)
    v = delete_delta(spark, t, "id = 2")
    assert _changes(spark, t, v) == [(2, "a", 2.0, "delete")]


def test_merge_emits_updates_and_inserts(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a", 1.0), (2, "a", 2.0)]), t)
    src = _df(spark, [(2, "a", 99.0), (7, "b", 7.0)])
    v = merge_delta(spark, t, src, keys=["id"])
    assert _changes(spark, t, v) == [
        (2, "a", 2.0, "update_preimage"),
        (2, "a", 99.0, "update_postimage"),
        (7, "b", 7.0, "insert"),
    ]


def test_optimize_emits_nothing(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a", 1.0)]), t)
    write_delta(_df(spark, [(2, "a", 2.0)]), t, mode="append")
    v = optimize_delta(spark, t)
    assert delta_row_changes(spark, t, v, ["id"]).count() == 0


def test_duplicate_key_raises(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a", 1.0), (1, "a", 2.0)]), t)
    with pytest.raises(ValueError, match="not unique"):
        delta_row_changes(spark, t, 0, ["id"]).count()


def test_partitioned_table_changes_carry_partition_values(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(
        _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t, partition_by=["grp"]
    )
    v = update_delta(spark, t, {"v": "v + 0.5"}, "grp = 'b'")
    got = _changes(spark, t, v)
    assert got == [
        (2, "b", 2.0, "update_preimage"),
        (2, "b", 2.5, "update_postimage"),
    ]


def test_row_changes_refuse_collapsed_log(spark, tmp_path):
    """After checkpointing + deleting the per-commit JSON, row changes
    for that commit are unrecoverable — refuse with a clear error, not
    a crash or empty result."""
    import os

    from sparkstreamingtwitter_presidential_spark.sources.delta import write_checkpoint

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a", 1.0)]), t)
    write_delta(_df(spark, [(2, "a", 2.0)]), t, mode="append")
    write_checkpoint(t)
    os.remove(os.path.join(t, "_delta_log", f"{1:020d}.json"))
    with pytest.raises(ValueError, match="not available"):
        delta_row_changes(spark, t, 1, ["id"])


def test_row_changes_readable_below_checkpoint_while_json_retained(
    spark, tmp_path
):
    """A checkpoint collapses REPLAY, it does not delete commits: row
    changes for a commit below the checkpoint stay readable as long as
    its JSON is retained (the retention contract's positive half)."""
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        write_checkpoint,
    )

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a", 1.0)]), t)
    write_delta(_df(spark, [(2, "a", 2.0)]), t, mode="append")
    write_checkpoint(t)  # at v1 — v1 is now "collapsed"
    write_delta(_df(spark, [(3, "a", 3.0)]), t, mode="append")
    assert _changes(spark, t, 1) == [(2, "a", 2.0, "insert")]


def test_expire_log_enforces_checkpoint_and_kills_expired_reads(
    spark, tmp_path
):
    """expire_log refuses without a covering checkpoint; after expiry
    the latest snapshot still reads, while time travel and row changes
    below the horizon refuse with clear errors."""
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        expire_log,
        read_delta,
        write_checkpoint,
    )

    t = str(tmp_path / "t")
    write_delta(_df(spark, [(1, "a", 1.0)]), t)
    write_delta(_df(spark, [(2, "a", 2.0)]), t, mode="append")
    with pytest.raises(ValueError, match="no checkpoint"):
        expire_log(t, keep_from=2)
    write_checkpoint(t)  # v1
    write_delta(_df(spark, [(3, "a", 3.0)]), t, mode="append")
    assert expire_log(t, keep_from=2) == [0, 1]
    assert read_delta(spark, t).count() == 3  # latest snapshot intact
    with pytest.raises(ValueError, match="expired by log retention"):
        delta_row_changes(spark, t, 1, ["id"])
    with pytest.raises(ValueError, match="does not exist"):
        read_delta(spark, t, version=0)
