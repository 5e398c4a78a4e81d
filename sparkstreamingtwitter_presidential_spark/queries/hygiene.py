r"""Corpus-hygiene queries (round 5, late): benchmark decontamination,
exact duplicated-span statistics, and signed-random-projection
dimensionality reduction. Every query has an exact DuckDB twin —
n-grams are joined as strings, span fractions use the house floor-
rounding, and the SRP is fixed-point integer arithmetic, so all three
are hash-matchable, not just rows/schema.

The eval set for the graded decontamination query is carved from the
fixture deterministically (doc_id % 10 == 0 plays the "benchmark",
the rest the training corpus) — same derivation in Spark and SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.operators import decontam as DC
from sparkstreamingtwitter_presidential_spark.operators import projection as PJ
from sparkstreamingtwitter_presidential_spark.operators import span_dedup as SD
from sparkstreamingtwitter_presidential_spark.queries.registry import query

DECONTAM_N = 6
DECONTAM_MIN_HITS = 3
SPAN_K = 8
SRP_DIM = 8

# DuckDB n-gram builder over the shared tokenizer (twin of
# decontam._gram_array: position-ordered, non-distinct).
def _duck_grams(n: int) -> str:
    concat = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return f"""
      toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
        FROM documents WHERE text IS NOT NULL
      ),
      grams AS (
        SELECT doc_id, len(t) AS n_tokens, i - 1 AS pos, {concat} AS g
        FROM toks, UNNEST(generate_series(1, greatest(len(t) - {n - 1}, 0))) AS u(i)
      )
    """


_DECONTAM_ORACLE = f"""
    WITH {_duck_grams(DECONTAM_N)},
    ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0)
    SELECT c.doc_id,
           count(DISTINCT c.g) AS n_hits,
           count(DISTINCT c.g) >= {DECONTAM_MIN_HITS} AS contaminated
    FROM grams c JOIN ev USING (g)
    WHERE c.doc_id % 10 <> 0
    GROUP BY c.doc_id
"""


@query(
    "decontam_eval_overlap",
    oracle=_DECONTAM_ORACLE,
    doc="NEW r5: benchmark decontamination — per-doc distinct eval-set "
    f"{DECONTAM_N}-gram overlaps; eval = doc_id % 10 == 0, contaminated "
    f"at >= {DECONTAM_MIN_HITS} distinct leaked grams. Eval gram set "
    "broadcast; corpus side is one scan + per-doc count.",
)
def decontam_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return DC.contamination_hits(
        corpus, ev, n=DECONTAM_N, min_hits=DECONTAM_MIN_HITS
    )


_SPAN_ORACLE = f"""
    WITH {_duck_grams(SPAN_K)},
    dup AS (
      SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (SELECT doc_id, n_tokens, pos, g FROM grams JOIN dup USING (g)),
    covered AS (
      SELECT doc_id, n_tokens, pos, c.tok
      FROM hits, UNNEST(generate_series(pos, pos + {SPAN_K - 1})) AS c(tok)
    )
    SELECT doc_id, n_tokens,
           count(DISTINCT pos) AS n_dup_kgrams,
           count(DISTINCT tok) AS dup_tokens,
           floor(count(DISTINCT tok)::DOUBLE / n_tokens * 1000000.0 + 0.5)
               / 1000000.0 AS dup_fraction
    FROM covered
    GROUP BY doc_id, n_tokens
"""


@query(
    "dedup_duplicate_span_stats",
    oracle=_SPAN_ORACLE,
    doc=f"NEW r5: Lee-et-al-style exact duplicated-span coverage — tokens "
    f"inside verbatim cross-document {SPAN_K}-gram runs, per doc. One "
    "gram-keyed shuffle; dup-gram set broadcast back.",
)
def dedup_duplicate_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # hashed=True (r15): the production path — the gram shuffle keys
    # on xxhash64(gram) (8 bytes) instead of the k-gram string (guide
    # §2.3, narrower shuffle keys; interleaved A/B at sf0.1: ~-17%
    # per run, identical rows). Equality with the exact-string path is
    # pinned by test_span_stats_hashed_equals_string_keys, and this
    # query's rows were value-hash-verified against the DuckDB oracle
    # (exact strings) at sf0.001/0.01/0.1 before the switch.
    #
    # Collision bound (r16): an xxhash64 collision between two distinct
    # k-grams merges their position lists and can only OVER-count
    # duplicated spans (the conservative direction). Birthday bound:
    # P(any collision) ~= d^2 / 2^65 over d distinct grams — negligible
    # through d ~ 10^8, likely by d ~ 10^10 (100 TB class); re-verify
    # hashed parity (or use hashed=False, still implemented) before
    # trusting exact equality at that scale.
    return SD.duplicate_span_stats(docs, k=SPAN_K, hashed=True)


_SRP_ORACLE = f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                 v -> CAST(floor(CAST(v AS DOUBLE) * {PJ.QUANT} + 0.5) AS BIGINT)) AS qv
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    cells AS (
      SELECT vec_id, i.i - 1 AS i, qv[i.i] AS v
      FROM q, UNNEST(generate_series(1, len(qv))) AS i(i)
    ),
    h0 AS (
      SELECT vec_id, v, j.j AS dim,
             (i * {PJ._MIX_A} + j.j * {PJ._MIX_B} + {PJ._MIX_C})
                 & {PJ._MASK31} AS h
      FROM cells, UNNEST(generate_series(0, {SRP_DIM - 1})) AS j(j)
    ),
    h1 AS (SELECT vec_id, v, dim, xor(h, h >> 16) AS h FROM h0),
    h2 AS (SELECT vec_id, v, dim, (h * {PJ._MIX_MULT}) & {PJ._MASK31} AS h FROM h1),
    h3 AS (SELECT vec_id, v, dim, xor(h, h >> 13) AS h FROM h2),
    proj AS (
      SELECT vec_id, dim,
             CAST(sum(v * (CASE WHEN (h & 1) = 1 THEN 1 ELSE -1 END))
                  AS BIGINT) AS value
      FROM h3 GROUP BY vec_id, dim
    )
    SELECT vec_id, dim, value FROM proj
"""


@query(
    "sim_random_projection",
    oracle=_SRP_ORACLE,
    doc=f"NEW r5: signed random projection to {SRP_DIM} dims, exact "
    "fixed-point integer arithmetic (JL/SimHash-hyperplane family); "
    "map-only, no shuffle in the Spark plan.",
)
def sim_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return PJ.random_project(emb, out_dim=SRP_DIM)
