"""Char-bigram -> HashingTF(1000) -> KMeans(k=10) text clustering
(SURVEY.md §2.8 ML1-ML4).

Reference workflow (README.md:163-199): featurize(s) = HashingTF(1000)
.transform(s.sliding(2)) over tweet texts, KMeans.train(vectors, k=10,
maxIterations=20), driver-side prediction loop, centroid export. Here
the whole thing is a single pyspark.ml Pipeline fit on a DataFrame:

  * the bigramizer is a SQLTransformer holding a builtin-expression
    char-2-gram (exact ``sliding(2)`` parity: "ab", "bc", ... via
    substring), so it is JVM-side AND persists with the model;
  * HashingTF(numFeatures=1000) — pyspark.ml uses MurmurHash3 where
    Spark-1.5 mllib used a different term hash; SURVEY.md §7 scopes
    parity to pipeline shape, not bucket ids;
  * KMeans(k=10, maxIter=20, seed=42): the reference trains unseeded
    (README.md:179); we pin a seed for reproducible tests;
  * model.save/load replaces the centroid object-file export (SNK2).

Scale: fit is iterative (k x maxIter distributed passes over cached
features); transform is a single map-side pass — no shuffle at predict
time.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import HashingTF, SQLTransformer
from pyspark.sql import DataFrame, SparkSession

from sparkstreamingtwitter_presidential_spark.io import load_table

NUM_FEATURES = 1000
K = 10
MAX_ITER = 20
SEED = 42

#: Exact char-bigram parity with the reference's ``s.sliding(2)``
#: (README.md:173): all overlapping 2-char substrings; 1-char strings
#: yield the string itself (sliding's tail behavior), empty -> [].
_BIGRAM_SQL = """
SELECT *,
       CASE WHEN length(text_clean) >= 2 THEN
           transform(sequence(1, length(text_clean) - 1),
                     i -> substring(text_clean, i, 2))
       WHEN length(text_clean) = 1 THEN array(text_clean)
       ELSE array() END AS bigrams
FROM __THIS__
"""


def bigram_kmeans_pipeline(
    k: int = K, max_iter: int = MAX_ITER, seed: int = SEED
) -> Pipeline:
    bigramizer = SQLTransformer(statement=_BIGRAM_SQL)
    tf = HashingTF(inputCol="bigrams", outputCol="features", numFeatures=NUM_FEATURES)
    km = KMeans(k=k, maxIter=max_iter, seed=seed, featuresCol="features",
                predictionCol="prediction")
    return Pipeline(stages=[bigramizer, tf, km])


def _prepare(docs: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return docs.filter(F.col("text").isNotNull()).withColumn(
        "text_clean", F.col("text")
    )


def cluster_documents(
    spark: SparkSession, sf_dir: str, k: int = K, seed: int = SEED
) -> tuple[PipelineModel, DataFrame]:
    """Fit the pipeline on documents.text; return (model, assignments).

    Assignments: (doc_id, prediction). The feature DataFrame is cached
    around the iterative fit (X3 parity with the reference's
    ``vectors.cache()``, README.md:176) and unpersisted after.
    """
    docs = _prepare(load_table(spark, sf_dir, "documents"))
    docs = docs.cache()
    try:
        model = bigram_kmeans_pipeline(k=k, seed=seed).fit(docs)
        pred = model.transform(docs).select("doc_id", "prediction")
    finally:
        docs.unpersist()
    return model, pred
