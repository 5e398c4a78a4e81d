"""observe()-piggybacked quality metrics: batch metrics equal the
direct aggregate, ride a write action, refuse streaming frames (with
the documented streaming alternative verified via query progress)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.operators.observability import (
    observed_profile,
    quality_metric_exprs,
    with_quality_observation,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "a", 2.0), (2, None, -1.5), (3, "c", None), (4, None, 7.0)],
        "id long, text string, score double",
    )


def test_observed_profile_matches_direct_aggregate(spark):
    got = observed_profile(_docs(spark), ["text", "score"])
    assert got == {
        "n_rows": 4,
        "text_nulls": 2,
        "score_nulls": 1,
        "score_min": -1.5,
        "score_max": 7.0,
    }


def test_metrics_ride_a_write_action(spark, tmp_path):
    """The canonical use: metrics come out of the pipeline's own write
    — no second scan issued by the caller."""
    profiled, obs = with_quality_observation(_docs(spark), ["text"])
    profiled.write.mode("overwrite").parquet(str(tmp_path / "out"))
    assert obs.get == {"n_rows": 4, "text_nulls": 2}


def test_unknown_column_fails_fast(spark):
    with pytest.raises(ValueError, match="not in frame"):
        observed_profile(_docs(spark), ["nope"])


def test_streaming_refused_with_alternative_that_works(spark, tmp_path):
    """Observation is batch-only by Spark's design; the documented
    streaming alternative (string-named observe + progress) must
    actually deliver per-batch metrics."""
    from sparkstreamingtwitter_presidential_spark.sources.synthdocs_ds import (
        register_synthdocs,
    )

    register_synthdocs(spark)
    stream = (
        spark.readStream.format("synthdocs")
        .option("rows_per_batch", "50")
        .option("max_rows", "100")
        .load()
    )
    with pytest.raises(ValueError, match="streaming"):
        with_quality_observation(stream)

    observed = stream.observe(
        "quality", *quality_metric_exprs(stream, ["lang"])
    )
    seen: list = []

    def sink(df, bid):
        df.count()

    q = (
        observed.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        for p in q.recentProgress:
            m = p["observedMetrics"].get("quality")
            if m:
                seen.append((m["n_rows"], m["lang_nulls"]))
    finally:
        q.stop()
        q.awaitTermination(30)
    assert sum(n for n, _ in seen if n) == 100  # all rows metered
    assert all(nulls == 0 for _, nulls in seen)
