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
