"""Mergeable HLL sketch artifacts: merge-vs-rebuild consistency,
relative-error bound vs exact distinct counts, artifact persistence."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.operators.sketches import (
    build_sketches,
    merge_estimates,
)

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return load_table(spark, SF_DIR, "events").select(
        "event_type", "user_id", F.to_date("ts").alias("day")
    )


def test_merged_estimate_within_error_bound(spark):
    ev = _events(spark)
    sketches = build_sketches(ev, ["day", "event_type"], "user_id")
    total = merge_estimates(sketches).collect()[0]
    exact = ev.agg(
        F.count("*").alias("n"), F.count_distinct("user_id").alias("d")
    ).collect()[0]
    assert total["n_rows"] == exact["n"]  # row counts are exact
    rel = abs(total["approx_distinct"] - exact["d"]) / exact["d"]
    assert rel < 0.03, f"HLL relative error {rel:.3f} >= 3%"


def test_rollup_groups_match_exact_within_bound(spark):
    ev = _events(spark)
    sketches = build_sketches(ev, ["day", "event_type"], "user_id")
    merged = {
        r["event_type"]: r["approx_distinct"]
        for r in merge_estimates(sketches, ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("d"))
        .collect()
    }
    assert set(merged) == set(exact)
    for k in exact:
        assert abs(merged[k] - exact[k]) / exact[k] < 0.03, k


def test_merge_equals_direct_sketch(spark):
    """Merging per-slice sketches must estimate the same value as one
    sketch built over the whole input (mergeability, the property the
    artifact pattern rests on)."""
    ev = _events(spark)
    per_slice = merge_estimates(
        build_sketches(ev, ["day", "event_type"], "user_id")
    ).collect()[0]["approx_distinct"]
    direct = (
        ev.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("d")
        ).collect()[0]["d"]
    )
    assert per_slice == direct


def test_sketch_artifact_survives_parquet(spark, tmp_path):
    ev = _events(spark)
    sk = build_sketches(ev, ["event_type"], "user_id")
    p = str(tmp_path / "sk")
    sk.write.parquet(p)
    reloaded = spark.read.parquet(p)
    a = merge_estimates(reloaded).collect()[0]["approx_distinct"]
    b = merge_estimates(sk).collect()[0]["approx_distinct"]
    assert a == b
