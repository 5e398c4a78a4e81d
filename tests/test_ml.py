"""ML smoke tests (SURVEY.md §5.4): pipeline fits on the documents
fixture, k centroids exist, assignments are deterministic under the
pinned seed, bigrams match the reference's sliding(2) semantics, and
the model survives a save/load round trip (ML4)."""

from __future__ import annotations

import shutil
import uuid

from pyspark.ml import PipelineModel
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.ml import bigram_kmeans_pipeline, cluster_documents
from sparkstreamingtwitter_presidential_spark.ml.clustering import K, NUM_FEATURES

SF_DIR = "/root/testdata/sf0.001"


def test_kmeans_centroids_and_coverage(spark):
    model, pred = cluster_documents(spark, SF_DIR)
    centers = model.stages[-1].clusterCenters()
    assert len(centers) == K
    assert all(len(c) == NUM_FEATURES for c in centers)
    n = pred.count()
    assert n == 500  # every non-null doc assigned
    assert pred.select("prediction").distinct().count() <= K


def test_kmeans_cluster_sizes_golden(spark):
    """Exact cluster-size histogram under the pinned seed on the
    sf0.001 documents fixture (identical at sf0.01 — the table doesn't
    scale below sf0.1). A drift here means the featurization, hashing,
    or KMeans seed path changed — a hard red, not a determinism shrug.
    (Golden values computed 2026-08-13, pyspark 4.1.2.)"""
    _, pred = cluster_documents(spark, SF_DIR)
    got = {
        r.prediction: r.n_docs
        for r in pred.groupBy("prediction").agg(F.count("*").alias("n_docs")).collect()
    }
    assert got == {0: 23, 1: 94, 2: 59, 3: 25, 4: 97, 5: 49, 6: 20, 7: 63, 8: 58, 9: 12}


def test_kmeans_deterministic_under_seed(spark):
    _, p1 = cluster_documents(spark, SF_DIR)
    _, p2 = cluster_documents(spark, SF_DIR)
    a = {(r.doc_id, r.prediction) for r in p1.collect()}
    b = {(r.doc_id, r.prediction) for r in p2.collect()}
    assert a == b


def test_bigram_sliding_parity(spark):
    """Bigramizer == Scala s.sliding(2).toSeq (README.md:173): overlapping
    pairs, 1-char tail behavior, empty -> []."""
    df = spark.createDataFrame(
        [("abcd",), ("a",), ("",), ("héllo",)], "text string"
    ).withColumn("text_clean", F.col("text"))
    stage = bigram_kmeans_pipeline().getStages()[0]
    got = {r.text: r.bigrams for r in stage.transform(df).collect()}
    assert got["abcd"] == ["ab", "bc", "cd"]
    assert got["a"] == ["a"]
    assert got[""] == []
    assert got["héllo"] == ["hé", "él", "ll", "lo"]


def test_model_save_load_roundtrip(spark):
    model, pred = cluster_documents(spark, SF_DIR)
    path = f"/tmp/kmeans_model_{uuid.uuid4().hex[:8]}"
    try:
        model.save(path)
        loaded = PipelineModel.load(path)
        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("text").isNotNull())
            .withColumn("text_clean", F.col("text"))
        )
        again = {
            (r.doc_id, r.prediction)
            for r in loaded.transform(docs).select("doc_id", "prediction").collect()
        }
        orig = {(r.doc_id, r.prediction) for r in pred.collect()}
        assert again == orig
    finally:
        shutil.rmtree(path, ignore_errors=True)
