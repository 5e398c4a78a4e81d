"""Similarity-search queries over the embeddings table.

The brute-force oracle uses DuckDB's list_cosine_similarity on DOUBLE[]
(bit-identical to our sequential double fold — verified). The LSH query's
oracle REPLICATES THE BUCKETING: the same seeded hyperplanes are inlined
as SQL literals, so candidate sets — and therefore results — are equal by
construction, not merely approximately."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.operators import similarity as S
from sparkstreamingtwitter_presidential_spark.queries.registry import query

#: Fixed query-vector ids, present at every scale factor.
QUERY_IDS = [0, 101, 202, 303, 404]
TOP_K = 10


@query(
    "sim_bruteforce_topk",
    oracle=f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                   WHERE embedding IS NOT NULL),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e
              WHERE vec_id IN ({", ".join(map(str, QUERY_IDS))})),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   floor(list_cosine_similarity(q.qv, e.v) * 10000.0 + 0.5)
                       / 10000.0 AS cos_sim
            FROM e CROSS JOIN q
            WHERE e.vec_id <> q.query_id
        )
        SELECT query_id, vec_id, cos_sim, rank FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos_sim DESC, vec_id) AS rank
            FROM scored
        ) WHERE rank <= {TOP_K}
    """,
    doc="exact cosine top-10 neighbors for 5 query vectors (baseline ANN)",
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.brute_force_topk(load_table(spark, sf_dir, "embeddings"), QUERY_IDS, TOP_K)


def _duck_bucket_expr(vec: str) -> str:
    """DuckDB twin of operators.similarity.lsh_bucket using the same
    hyperplane constants (repr() preserves the exact doubles)."""
    parts = []
    for j, plane in enumerate(S.HYPERPLANES):
        arr = "[" + ", ".join(repr(x) for x in plane) + "]"
        # sequential fold, same op order as the Spark aggregate()
        dot = (
            f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(list_zip({vec}, {arr}::DOUBLE[]), "
            f"p -> p[1]::DOUBLE * p[2])), (acc, x) -> acc + x)"
        )
        parts.append(f"(CASE WHEN {dot} >= 0 THEN {1 << j}::BIGINT ELSE 0 END)")
    return " + ".join(parts)


#: DuckDB twin of operators.similarity.probe_buckets: the query's bucket
#: plus its Hamming-1 neighbors (xor of each signature bit).
_DUCK_PROBES = "[bucket, " + ", ".join(
    f"xor(bucket, {1 << j}::BIGINT)" for j in range(S.N_PLANES)
) + "]"


@query(
    "sim_lsh_topk",
    oracle=f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                          {_duck_bucket_expr('embedding::DOUBLE[]')} AS bucket
                   FROM embeddings WHERE embedding IS NOT NULL),
        q AS (SELECT vec_id AS query_id, v AS qv,
                     unnest({_DUCK_PROBES}) AS qbucket FROM e
              WHERE vec_id IN ({", ".join(map(str, QUERY_IDS))})),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   floor(list_cosine_similarity(q.qv, e.v) * 10000.0 + 0.5)
                       / 10000.0 AS cos_sim
            FROM e JOIN q ON e.bucket = q.qbucket
            WHERE e.vec_id <> q.query_id
        )
        SELECT query_id, vec_id, cos_sim, rank FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos_sim DESC, vec_id) AS rank
            FROM scored
        ) WHERE rank <= {TOP_K}
    """,
    doc=(
        "random-hyperplane LSH top-10 with Hamming-1 multi-probe: bucket "
        "join + exact re-rank (scale path); oracle replicates the probing"
    ),
)
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.lsh_topk(load_table(spark, sf_dir, "embeddings"), QUERY_IDS, TOP_K)


@query(
    "sim_ivf_topk",
    oracle=None,  # KMeans quantizer is iterative/seeded — no SQL twin;
    #               quality pinned by tests/test_similarity.py recall bound
    doc=(
        "NEW: IVF ANN top-10 — KMeans(16) coarse quantizer, 4-cell probe, "
        "exact cosine re-rank; the data-adaptive alternative to sign-LSH"
    ),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.ivf_topk(load_table(spark, sf_dir, "embeddings"), QUERY_IDS, TOP_K)
