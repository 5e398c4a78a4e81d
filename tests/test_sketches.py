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


def test_theta_overlap_estimates_within_error(spark):
    """Theta sketches must estimate pairwise slice overlap (the thing
    HLL cannot do) within a few percent of exact on planted overlaps."""
    from sparkstreamingtwitter_presidential_spark.operators.sketches import (
        build_theta_sketches,
        slice_overlap_estimates,
    )

    # slices A and B share ids 0..4999; C is disjoint from both
    df = spark.sql("""
        SELECT 'A' AS src, id FROM range(0, 10000)
        UNION ALL SELECT 'B', id FROM range(0, 5000)
        UNION ALL SELECT 'B', id FROM range(20000, 25000)
        UNION ALL SELECT 'C', id FROM range(50000, 60000)
    """)
    sk = build_theta_sketches(df, ["src"], "id")
    out = {
        (r.slice_a, r.slice_b): r
        for r in slice_overlap_estimates(sk, "src").collect()
    }
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = out[("A", "B")]
    assert abs(ab.overlap_est - 5000) / 5000 < 0.05
    assert abs(ab.distinct_a - 10000) / 10000 < 0.05
    assert abs(ab.jaccard_est - 5000 / 15000) < 0.03
    assert out[("A", "C")].overlap_est < 200  # disjoint ~ 0
    assert out[("B", "C")].overlap_est < 200


def test_kll_merged_quantiles_track_exact_percentiles(spark):
    """Merging per-slice KLL sketches must estimate rollup quantiles
    within the sketch's rank-error bound of the exact percentiles, and
    merge must see ALL slices (a dropped slice shifts the median)."""
    from pyspark.sql import functions as F

    from sparkstreamingtwitter_presidential_spark.operators.sketches import (
        build_kll_sketches,
        merge_quantile_estimates,
    )

    # values 1..10000 split across 4 slices by modulus
    df = spark.range(1, 10001).select(
        (F.col("id") % 4).alias("slice"), F.col("id").alias("v")
    )
    sk = build_kll_sketches(df, ["slice"], "v")
    total = merge_quantile_estimates(sk).first()
    assert total.n_rows == 10000
    # rank error ~1.65% at k=200 -> generous 3% value tolerance on a
    # uniform 1..10000 stream
    assert abs(total.q50 - 5000) < 300
    assert abs(total.q90 - 9000) < 300
    assert abs(total.q99 - 9900) < 300
    # per-group rollup keeps the slice column and its own estimates
    per = {r.slice: r.q50 for r in merge_quantile_estimates(sk, ["slice"]).collect()}
    assert set(per) == {0, 1, 2, 3}
    assert all(abs(v - 5000) < 400 for v in per.values())
