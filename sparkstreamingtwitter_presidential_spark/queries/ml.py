"""ML queries (rows-only: iterative K-Means has no SQL oracle; the
driver records schema + row count, and tests/test_ml.py pins
determinism, centroid count, and save/load parity)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.ml import cluster_documents
from sparkstreamingtwitter_presidential_spark.queries.registry import query


@query(
    "ml_kmeans_document_clusters",
    oracle=None,
    doc="ML1-ML3: char-bigram -> HashingTF(1000) -> KMeans(k=10,seed=42) assignments",
)
def ml_kmeans_document_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, pred = cluster_documents(spark, sf_dir)
    return pred


@query(
    "ml_kmeans_cluster_sizes",
    oracle=None,
    doc="cluster-size histogram of the KMeans assignment (k rows)",
)
def ml_kmeans_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, pred = cluster_documents(spark, sf_dir)
    return pred.groupBy("prediction").agg(F.count("*").alias("n_docs"))


@query(
    "ml_quality_classifier_by_source",
    oracle=None,  # LBFGS float reductions are partitioning-order
    # sensitive, so scores are behaviorally (not bitwise) stable;
    # discrimination/AUC/save-load contracts live in
    # tests/test_quality_model.py
    doc=(
        "NEW r5: trained quality classifier — weak labels from the "
        "heuristic quality score, RegexTokenizer -> HashingTF(2^15) -> "
        "IDF -> LogisticRegression, then per-source mean model "
        "probability and high-quality share (map-only scoring pass)"
    ),
)
def ml_quality_classifier_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkstreamingtwitter_presidential_spark.io import load_table
    from sparkstreamingtwitter_presidential_spark.ml.quality import (
        score_quality,
        train_quality_model,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    model = train_quality_model(docs)
    scored = score_quality(docs, model)
    return scored.groupBy("source").agg(
        F.avg("quality_prob").alias("mean_prob"),
        F.avg((F.col("quality_prob") > 0.5).cast("double")).alias("hq_share"),
        F.count("*").alias("n"),
    )
