from sparkstreamingtwitter_presidential_spark.ml.clustering import (
    bigram_kmeans_pipeline,
    cluster_documents,
)

__all__ = ["bigram_kmeans_pipeline", "cluster_documents"]
