"""sparkstreamingtwitter_presidential_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame / Spark SQL / Structured
Streaming) engine providing the query and data-processing capabilities of
the reference project ``BTajini/SparkStreamingTwitter-presidential`` (a
Spark-1.5 DStream tweet collector + documented HiveQL/MLlib analysis
workflow), re-expressed Spark-first and extended with the operators a
large-scale LLM training-data pipeline needs (dedup, similarity search,
text analysis, multimodal column plumbing).

Layout:
    session.py    SparkSession factory (AQE on, UTC, Arrow)
    io.py         table loading / temp-view registration for the fixtures
    schemas.py    explicit StructTypes (nothing inferred)
    functions/    builtin-expression Column libraries (text clean/stats, vectors)
    operators/    composed DataFrame operators (dedup, similarity, topk)
    queries/      the named query registry the driver contract exposes
    sources/      batch + streaming source helpers (file replay)
    streaming/    collector job, watermarked windows, sessionization
    ml/           char-bigram -> HashingTF -> KMeans pipeline
    plans/        plan-inspection helpers (explain capture, shuffle audit)
"""

__version__ = "0.1.0"
