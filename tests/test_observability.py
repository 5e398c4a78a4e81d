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
    — no second scan issued by the caller. Runs on newSession(): the
    Observation rider engages the session's ObservationManager, whose
    listener poisons LATER ML-summary closures on the same session
    (Spark 4.1 footgun, module docstring) — a per-SparkSession
    instance, so newSession() isolates the shared test session."""
    iso = spark.newSession()
    docs = iso.createDataFrame(
        [(1, "a", 2.0), (2, None, -1.5), (3, "c", None), (4, None, 7.0)],
        "id long, text string, score double",
    )
    profiled, obs = with_quality_observation(docs, ["text"])
    profiled.write.mode("overwrite").parquet(str(tmp_path / "out"))
    assert obs.get == {"n_rows": 4, "text_nulls": 2}


def test_ml_closures_survive_after_observed_profile(spark):
    """The regression that motivated the two-path design: after
    observed_profile (string-observe, no ObservationManager), a fitted
    model's transform().collect() — whose closure serializes the
    session via the training summary — must still work on the SAME
    session."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, Tokenizer

    observed_profile(_docs(spark), ["text"])
    fresh = spark.createDataFrame(
        [(1, "aa bb", 1.0), (2, "cc dd", 0.0)], "id long, text string, label double"
    )
    tok = Tokenizer(inputCol="text", outputCol="w")
    h = HashingTF(inputCol="w", outputCol="f", numFeatures=16)
    ldf = h.transform(tok.transform(fresh))
    model = LogisticRegression(featuresCol="f", labelCol="label").fit(ldf)
    assert len(model.transform(ldf).collect()) == 2


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
    with pytest.raises(ValueError, match="streaming"):
        observed_profile(stream)

    observed = stream.observe(
        "quality", *quality_metric_exprs(stream, ["lang"])[0]
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
