"""Incremental Delta->Delta ETL (streaming/incremental.py): exactly-once
via the watermark-in-destination-txn pattern — data and high-water mark
commit atomically, so re-polls, capped polls, interleaved source
appends, and source compactions can never duplicate or drop rows."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
import pytest

from sparkstreamingtwitter_presidential_spark.sources.delta import (
    delta_history,
    read_delta,
    write_delta,
)
from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
    delete_delta,
    optimize_delta,
)
from sparkstreamingtwitter_presidential_spark.streaming.incremental import (
    drain_delta_incremental,
    run_delta_incremental,
)

APP = "etl_test"


def _append(spark, path, ids):
    write_delta(
        spark.createDataFrame(
            [Row(id=i, cat="a" if i % 2 else "b", val=float(i)) for i in ids]
        ),
        path,
    )


def _ids(spark, path):
    return sorted(r["id"] for r in read_delta(spark, path).collect())


def test_drain_then_repoll_is_exactly_once(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _append(spark, src, [1, 2])
    _append(spark, src, [3])
    assert drain_delta_incremental(spark, src, dst, APP) == 2  # v0, v1
    assert _ids(spark, dst) == [1, 2, 3]
    # caught up: polling again moves nothing and commits nothing
    assert run_delta_incremental(spark, src, dst, APP) == 0
    assert len(delta_history(dst)) == 1  # one data commit, no empty ones
    # new source data -> only the increment lands
    _append(spark, src, [4, 5])
    assert run_delta_incremental(spark, src, dst, APP) == 1
    assert _ids(spark, dst) == [1, 2, 3, 4, 5]


def test_capped_polls_advance_watermark_per_step(spark, tmp_path):
    """max_commits=1 -> one dest commit per source commit; every step is
    its own exactly-once unit (this is the backlog-bounding mode)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    for i in range(3):
        _append(spark, src, [i])
    assert run_delta_incremental(spark, src, dst, APP, max_commits=1) == 1
    assert _ids(spark, dst) == [0]
    assert drain_delta_incremental(spark, src, dst, APP, max_commits=1) == 2
    assert _ids(spark, dst) == [0, 1, 2]
    assert len(delta_history(dst)) == 3


def test_transform_applies_per_increment(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _append(spark, src, [1, 2, 3, 4])

    def keep_odd(inc):
        return inc.filter(F.col("id") % 2 == 1).select("id", "cat", "val")

    drain_delta_incremental(spark, src, dst, APP, transform=keep_odd)
    assert _ids(spark, dst) == [1, 3]


def test_source_compaction_invisible_to_pipeline(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _append(spark, src, [1])
    _append(spark, src, [2])
    drain_delta_incremental(spark, src, dst, APP)
    optimize_delta(spark, src, target_file_bytes=64 * 1024 * 1024)
    _append(spark, src, [3])
    drain_delta_incremental(spark, src, dst, APP)
    assert _ids(spark, dst) == [1, 2, 3]  # no re-delivery from compaction


def test_source_data_rewrite_halts_pipeline(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _append(spark, src, [1, 2])
    drain_delta_incremental(spark, src, dst, APP)
    delete_delta(spark, src, "id = 1")
    _append(spark, src, [3])
    with pytest.raises(ValueError, match="rewrites data"):
        run_delta_incremental(spark, src, dst, APP)
    assert _ids(spark, dst) == [1, 2]  # nothing half-applied


def test_two_apps_keep_independent_watermarks(spark, tmp_path):
    src = str(tmp_path / "src")
    d1, d2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    _append(spark, src, [1])
    drain_delta_incremental(spark, src, d1, "app_one")
    _append(spark, src, [2])
    drain_delta_incremental(spark, src, d2, "app_two")
    drain_delta_incremental(spark, src, d1, "app_one")
    assert _ids(spark, d1) == [1, 2]
    assert _ids(spark, d2) == [1, 2]
