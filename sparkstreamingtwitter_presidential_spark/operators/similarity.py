"""Similarity search over embedding columns (array<float>).

Two paths:

  brute_force_topk   exact cosine top-k: broadcast the (small) query set,
                     scan the corpus once, rank per query. The baseline
                     and the verifier for approximate paths.
  lsh_topk           random-hyperplane LSH: 16-bit sign signature ->
                     bucket equi-join -> exact cosine re-rank of the
                     candidates. The 100 TB path — the corpus shuffles on
                     the bucket key only, and each query probes one
                     bucket instead of the full corpus.

All expressions are builtin higher-order array ops (zip_with/aggregate)
accumulated in double, bit-identical to DuckDB's list_cosine_similarity
on DOUBLE[] (verified empirically on the fixtures).

Scale notes: brute-force scoring is a broadcast nested loop — fine for
O(10) queries, but the per-query ranking uses a window over the scored
rows; at a real 100 TB corpus, swap the window for per-partition
partial top-k + global merge, or use the LSH path. Hyperplanes are
deterministic module constants (seed 7), so signatures are reproducible
across runs and engines.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.operators.dedup import dot_product, vec_norm

N_PLANES = 8  # 256 buckets: ~n/256 candidates per probe; enough recall on
#              the fixture corpora while still cutting the scan 256x.
EMBED_DIM = 64

_rng = random.Random(7)
#: Random hyperplanes in R^64 (gaussian, fixed seed). Module-level so
#: Spark and the generated DuckDB oracle share the exact float values.
HYPERPLANES: list[list[float]] = [
    [_rng.gauss(0.0, 1.0) for _ in range(EMBED_DIM)] for _ in range(N_PLANES)
]


def _dot_with_constants(vec: Column, plane: list[float]) -> Column:
    arr = F.array(*[F.lit(x) for x in plane])
    return F.aggregate(
        F.zip_with(vec, arr, lambda v, p: v.cast("double") * p),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lsh_bucket(vec: Column) -> Column:
    """N_PLANES-bit random-hyperplane signature: bit j = sign(<v, r_j>)."""
    out = F.lit(0).cast("long")
    for j, plane in enumerate(HYPERPLANES):
        out = out + F.when(
            _dot_with_constants(vec, plane) >= 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return out


def brute_force_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector (self excluded).

    The query set is broadcast (it is tiny by construction); the corpus
    is scanned exactly once. Returns (query_id, vec_id, cos_sim, rank).
    """
    base = corpus.filter(F.col(vec_col).isNotNull())
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qnrm", vec_norm(F.col("qv")))
    c = base.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")
    ).withColumn("cnrm", vec_norm(F.col("cv")))
    sim = dot_product(F.col("qv"), F.col("cv")) / (F.col("qnrm") * F.col("cnrm"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (F.floor(sim * 10000.0 + F.lit(0.5)) / 10000.0).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_topk(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH buckets.

    Candidates = corpus vectors whose 16-bit signature equals the
    query's; re-ranked by exact cosine. Recall < 1 by construction (the
    documented LSH trade); at scale add multi-probe or more tables.
    Returns (query_id, vec_id, cos_sim, rank).
    """
    base = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col)).alias("bucket"),
        vec_norm(F.col(vec_col)).alias("cnrm"),
    )
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("cv").alias("qv"),
        F.col("bucket").alias("qbucket"),
        F.col("cnrm").alias("qnrm"),
    )
    sim = dot_product(F.col("qv"), F.col("cv")) / (F.col("qnrm") * F.col("cnrm"))
    scored = (
        base.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (F.floor(sim * 10000.0 + F.lit(0.5)) / 10000.0).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
