"""Trained quality classifier: fastText-shaped hashed bag-of-words
logistic regression over documents, weakly supervised by the engine's
own heuristic quality rules.

This is the model-based leg of the curation stack (the heuristic legs
— length/punct/stopword score, Gopher repetition rules, C4 line rules,
unigram-LM logprob, OOV rate — live in functions/text_stats.py): real
pipelines bootstrap a classifier from weak labels (heuristics or a
trusted-domain positive set) and then score the whole corpus with the
model, because the model generalizes past the rules that seeded it
(the CCNet / GPT-3 "quality filter" recipe).

Shape (all pyspark.ml, persists as one PipelineModel):

  RegexTokenizer(\\W) -> HashingTF(2^15, binary) -> IDF
      -> LogisticRegression

Weak labels: ``label_from_heuristics`` = 1 when the composite
heuristic ``quality_score`` clears a threshold. Training is supervised
distributed LBFGS (iterative passes over the cached feature frame);
scoring is a single map-side transform — no shuffle, no Python in the
loop (all four stages are JVM transformers), so corpus-scale scoring
is embarrassingly parallel.

Determinism note: LBFGS float reductions vary in summation order
across partitionings, so tests pin BEHAVIOR (AUC floor on held-out
weak labels, save/load equality of scores, schema) rather than exact
coefficients — same policy as the KMeans goldens in ml/clustering.py.

Extension op (not reference parity): the reference's ML surface stops
at KMeans clustering (README.md:163-199); quality classification is
part of the north-star LLM-pipeline extension surface (SURVEY.md §4
custom-rule assessment / BASELINE.json).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.functions.text_stats import quality_score

NUM_FEATURES = 1 << 15
SEED = 42


def label_from_heuristics(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.5
) -> DataFrame:
    """Weak supervision: label 1.0 iff the composite heuristic quality
    score clears ``threshold``. Pure builtin expressions (one map-side
    projection); the classifier then learns a smoother decision surface
    over lexical features than the step rules themselves."""
    return docs.withColumn(
        "label",
        (quality_score(text_col) > F.lit(threshold)).cast("double"),
    )


def quality_pipeline(
    text_col: str = "text",
    num_features: int = NUM_FEATURES,
    reg_param: float = 0.01,
    max_iter: int = 30,
) -> Pipeline:
    tok = RegexTokenizer(
        inputCol=text_col, outputCol="__words", pattern=r"\W+", toLowercase=True
    )
    tf = HashingTF(
        inputCol="__words", outputCol="__tf", numFeatures=num_features, binary=True
    )
    idf = IDF(inputCol="__tf", outputCol="__features")
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol="label",
        maxIter=max_iter,
        regParam=reg_param,
        probabilityCol="__prob",
        rawPredictionCol="__raw",
        predictionCol="__pred",
    )
    return Pipeline(stages=[tok, tf, idf, lr])


def train_quality_model(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    num_features: int = NUM_FEATURES,
) -> PipelineModel:
    """Fit the weak-label pipeline. The labeled frame is cached around
    the iterative LBFGS fit and unpersisted after (X3 discipline)."""
    labeled = label_from_heuristics(docs, text_col, threshold).cache()
    try:
        return quality_pipeline(text_col, num_features).fit(labeled)
    finally:
        labeled.unpersist()


def score_quality(
    docs: DataFrame, model: PipelineModel, score_col: str = "quality_prob"
) -> DataFrame:
    """All input columns + ``score_col``: P(high quality). Map-side
    only — the fitted stages are JVM transformers, so scoring keeps
    whole-stage codegen and adds zero shuffles."""
    from pyspark.ml.functions import vector_to_array

    # the LR stage declares a labelCol; satisfy it with a dummy, but
    # never clobber (or silently drop) a caller's own `label` column
    had_label = "label" in docs.columns
    inp = docs if had_label else docs.withColumn("label", F.lit(0.0))
    scored = model.transform(inp).withColumn(
        score_col, F.element_at(vector_to_array("__prob"), 2)
    )
    drop = ["__words", "__tf", "__features", "__prob", "__raw", "__pred"]
    if not had_label:
        drop.append("label")
    return scored.drop(*drop)
