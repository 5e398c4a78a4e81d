"""Trained quality classifier: weak-label wiring, discrimination on a
corpus with planted quality structure, save/load score equality, and
the map-only scoring plan."""

from __future__ import annotations

from pyspark.ml import PipelineModel
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.ml.quality import (
    label_from_heuristics,
    score_quality,
    train_quality_model,
)

SF_DIR = "/root/testdata/sf0.001"

_GOOD = (
    "the supplier shipped the order and the customer confirmed the "
    "invoice while the warehouse recorded the delivery in the ledger"
)
_BAD = "@@@@ ???? !!!! #### $$$$ %%%% ^^^^ &&&& **** (((( )))) ;;;; ::::"


def _corpus(spark, n=120):
    rows = []
    for i in range(n):
        good = i % 2 == 0
        text = f"{_GOOD} item {i}" if good else f"{_BAD} {i}"
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_weak_labels_separate_planted_classes(spark):
    labeled = label_from_heuristics(_corpus(spark))
    agg = {
        r["good"]: r["mean_label"]
        for r in labeled.withColumn("good", F.col("doc_id") % 2 == 0)
        .groupBy("good")
        .agg(F.avg("label").alias("mean_label"))
        .collect()
    }
    assert agg[True] > 0.9 and agg[False] < 0.1


def test_model_discriminates_and_roundtrips(spark, tmp_path):
    corpus = _corpus(spark)
    model = train_quality_model(corpus)
    scored = score_quality(corpus, model)
    assert scored.columns == ["doc_id", "text", "quality_prob"]
    by_class = {
        r["good"]: r["m"]
        for r in scored.withColumn("good", F.col("doc_id") % 2 == 0)
        .groupBy("good")
        .agg(F.avg("quality_prob").alias("m"))
        .collect()
    }
    assert by_class[True] > 0.8 and by_class[False] < 0.2

    path = str(tmp_path / "qmodel")
    model.write().overwrite().save(path)
    reloaded = PipelineModel.load(path)
    a = {r["doc_id"]: r["quality_prob"] for r in scored.collect()}
    b = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(corpus, reloaded).collect()
    }
    assert a == b  # identical floats: same coefficients, same features


def test_scoring_plan_is_map_only(spark):
    corpus = _corpus(spark, n=40)
    model = train_quality_model(corpus)
    plan = (
        score_quality(corpus, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_model_generalizes_past_rules(spark):
    # documents the model never saw, containing vocabulary overlapping
    # the planted classes: the classifier ranks the clean one higher
    corpus = _corpus(spark)
    model = train_quality_model(corpus)
    unseen = spark.createDataFrame(
        [
            (1, "the customer recorded the invoice and the supplier confirmed"),
            (2, "#### $$$$ ;;;; @@@@ ???? ^^^^"),
        ],
        "doc_id long, text string",
    )
    s = {r["doc_id"]: r["quality_prob"] for r in score_quality(unseen, model).collect()}
    assert s[1] > s[2]


def test_scoring_preserves_caller_label_column(spark):
    corpus = _corpus(spark, n=40)
    model = train_quality_model(corpus)
    withlab = corpus.withColumn("label", F.lit(7.0))
    out = score_quality(withlab, model)
    assert "label" in out.columns
    assert {r["label"] for r in out.select("label").distinct().collect()} == {7.0}
