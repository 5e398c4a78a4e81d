from sparkstreamingtwitter_presidential_spark.ml.clustering import (
    bigram_kmeans_pipeline,
    cluster_documents,
)
from sparkstreamingtwitter_presidential_spark.ml.quality import (
    label_from_heuristics,
    quality_pipeline,
    score_quality,
    train_quality_model,
)

__all__ = [
    "bigram_kmeans_pipeline",
    "cluster_documents",
    "label_from_heuristics",
    "quality_pipeline",
    "score_quality",
    "train_quality_model",
]
