r"""Training-data assembly queries: sequence packing, token chunking,
and BM25 keyword search over the documents table.

These are the "last mile" of an LLM data pipeline (reference has no
analogue — its surface stops at collection, `Collector.scala:71`; these
extend SURVEY.md §2's LLM-pipeline block): after curation/dedup you
chunk oversized documents, pack the rest into fixed-token-budget
training sequences, and use keyword search to slice/inspect the corpus.

Every query here has an EXACT DuckDB twin:
  * packing is integer window-cumsum arithmetic (engine-portable by
    construction; the window sum is CAST AS BIGINT against the DuckDB
    HUGEINT repr trap),
  * chunking is the same regex split + 1-based slice in both engines,
  * BM25 writes the same literal arithmetic shape in both engines
    (constant folding then produces bit-identical doubles) and floors
    scores on the 1e-4 grid (DESIGN.md cross-engine float rule) to
    absorb libm ln() last-ulp differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.operators.packing import (
    pack_sequences,
    token_chunks,
)
from sparkstreamingtwitter_presidential_spark.operators.search import (
    BM25_B,
    BM25_K1,
    bm25_topk,
)
from sparkstreamingtwitter_presidential_spark.queries.registry import query

PACK_BUDGET = 128  # ~2.4 docs/bin at the fixtures' ~54 ws-tokens/doc
CHUNK_TOKENS = 16
BM25_TERMS = ["spark", "vector", "window"]
BM25_K = 10


@query(
    "pack_documents_by_source",
    oracle=f"""
        WITH t AS (
          SELECT source AS grp, doc_id,
                 len(string_split_regex(trim(text), '\\s+')) AS n_tokens
          FROM documents WHERE text IS NOT NULL
        ), c AS (
          SELECT grp, doc_id, n_tokens,
                 COALESCE(CAST(SUM(n_tokens) OVER (
                     PARTITION BY grp ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS BIGINT), 0) AS start
          FROM t
        )
        SELECT grp, doc_id, n_tokens,
               start // {PACK_BUDGET} AS bin_id,
               start % {PACK_BUDGET} AS bin_offset
        FROM c
    """,
    doc="greedy sequential packing of documents into "
    f"{PACK_BUDGET}-token training bins per source",
)
def pack_documents_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return pack_sequences(d, budget=PACK_BUDGET)


@query(
    "chunk_documents_tokens",
    oracle=f"""
        WITH t AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
          FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id, i AS chunk_index,
               array_to_string(
                 list_slice(toks, i * {CHUNK_TOKENS} + 1,
                            i * {CHUNK_TOKENS} + {CHUNK_TOKENS}), ' '
               ) AS chunk_text
        FROM t, UNNEST(generate_series(
            0, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS INT) - 1)) AS u(i)
    """,
    doc=f"split each document into {CHUNK_TOKENS}-token chunks "
    "(upstream companion to packing for oversized docs)",
)
def chunk_documents_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return token_chunks(d, chunk_tokens=CHUNK_TOKENS)


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in sorted(BM25_TERMS))
    # Literal arithmetic SHAPE matches operators/search.py exactly:
    # (k1 + 1) and (1 - b) fold to the same doubles in both engines.
    return f"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents WHERE text IS NOT NULL
        ), corpus AS (
          SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM d
        ), post AS (
          SELECT doc_id, len(toks) AS dl, term, COUNT(*) AS tf
          FROM d, UNNEST(toks) AS u(term)
          WHERE term IN ({terms})
          GROUP BY doc_id, dl, term
        ), dfq AS (
          SELECT term, COUNT(*) AS df FROM post GROUP BY term
        )
        SELECT p.doc_id,
               COUNT(*) AS n_terms_hit,
               FLOOR(SUM(
                 LN(1 + (n_docs - df + 0.5) / (df + 0.5)) *
                 (tf * ({BM25_K1} + 1)) /
                 (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl))
               ) * 10000.0 + 0.5) / 10000.0 AS score
        FROM post p JOIN dfq USING (term) CROSS JOIN corpus
        GROUP BY p.doc_id
        ORDER BY score DESC, p.doc_id
        LIMIT {BM25_K}
    """


@query(
    "search_bm25_topk",
    oracle=_bm25_oracle(),
    doc=f"BM25 top-{BM25_K} keyword search for {BM25_TERMS} over documents",
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return bm25_topk(d, BM25_TERMS, k=BM25_K)


# ---------------------------------------------------------------------------
# End-to-end curation pipeline: the composition a real training-data run
# executes — quality + language gate, exact dedup, then packing — as ONE
# declarative plan (Catalyst fuses the gates into the scan; the only
# shuffles are the dedup groupBy and the pack window, both on real keys).
# ---------------------------------------------------------------------------

QUALITY_MIN = 0.5
PIPELINE_LANG = "en"


def _pipeline_oracle() -> str:
    from sparkstreamingtwitter_presidential_spark.functions.text_stats import LANG_STOPWORDS
    from sparkstreamingtwitter_presidential_spark.queries.text_stats import (
        _DUCK_HITS,
        _DUCK_PUNCT_HITS,
        _DUCK_WS,
    )

    quality = f"""
        floor((0.5 * least(1.0, {_DUCK_WS} / 64.0)
            + 0.3 * least(1.0, 4.0 * (CASE WHEN {_DUCK_WS} > 0
                  THEN {_DUCK_HITS['en']}::DOUBLE / {_DUCK_WS} ELSE 0 END))
            + 0.2 * (1.0 - least(1.0, 4.0 * (CASE WHEN length(text) > 0
                  THEN {_DUCK_PUNCT_HITS}::DOUBLE / length(text) ELSE 0 END))))
              * 10000.0 + 0.5) / 10000.0
    """
    best = "greatest({})".format(
        ", ".join(_DUCK_HITS[lang] for lang in LANG_STOPWORDS)
    )
    whens = "\n".join(
        f"WHEN {_DUCK_HITS[lang]} = best THEN '{lang}'" for lang in LANG_STOPWORDS
    )
    return f"""
        WITH scored AS (
          SELECT doc_id, source, text, {quality} AS q, {best} AS best
          FROM documents WHERE text IS NOT NULL
        ), kept AS (
          SELECT doc_id, source, text FROM scored
          WHERE q >= {QUALITY_MIN} AND best > 0
            AND (CASE {whens} END) = '{PIPELINE_LANG}'
        ), canon AS (
          SELECT doc_id, source, text FROM (
            SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS keeper
            FROM kept) WHERE doc_id = keeper
        ), t AS (
          SELECT source AS grp, doc_id,
                 len(string_split_regex(trim(text), '\\s+')) AS n_tokens
          FROM canon
        ), c AS (
          SELECT grp, doc_id, n_tokens,
                 COALESCE(CAST(SUM(n_tokens) OVER (
                     PARTITION BY grp ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS BIGINT), 0) AS start
          FROM t
        )
        SELECT grp, doc_id, n_tokens,
               start // {PACK_BUDGET} AS bin_id,
               start % {PACK_BUDGET} AS bin_offset
        FROM c
    """


@query(
    "pipeline_curate_pack",
    oracle=_pipeline_oracle(),
    doc="end-to-end curation: quality>=0.5 + en-only gate, exact dedup "
    f"(min doc_id per text), greedy {PACK_BUDGET}-token packing",
)
def pipeline_curate_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from sparkstreamingtwitter_presidential_spark.functions import text_stats as ts

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    kept = d.filter(
        (ts.quality_score("text") >= QUALITY_MIN)
        & (ts.lang_id("text") == PIPELINE_LANG)
    )
    canon = (
        kept.withColumn(
            "keeper", F.min("doc_id").over(Window.partitionBy("text"))
        )
        .filter(F.col("doc_id") == F.col("keeper"))
        .select("doc_id", "source", "text")
    )
    return pack_sequences(canon, budget=PACK_BUDGET)


STRIDE_CHUNK = 40
STRIDE = 20


@query(
    "chunk_documents_strided",
    oracle=f"""
        WITH t AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
          FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id, i AS chunk_index,
               array_to_string(
                 list_slice(toks, i * {STRIDE} + 1,
                            i * {STRIDE} + {STRIDE_CHUNK}), ' '
               ) AS chunk_text
        FROM t, UNNEST(generate_series(
            0, CAST(floor(greatest(len(toks) - {STRIDE_CHUNK} + {STRIDE} - 1, 0)
                          / {STRIDE}) AS INT))) AS u(i)
    """,
    doc=f"NEW r5: overlapping context windows — {STRIDE_CHUNK}-token "
    f"chunks at stride {STRIDE} (each boundary token gets a window "
    "with left context); map-only",
)
def chunk_documents_strided(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkstreamingtwitter_presidential_spark.operators.packing import strided_token_chunks

    d = load_table(spark, sf_dir, "documents")
    return strided_token_chunks(d, chunk_tokens=STRIDE_CHUNK, stride=STRIDE)


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 lexical leg + exact-cosine semantic leg fused by
# Reciprocal Rank Fusion. The oracle rebuilds BOTH legs (the BM25 CTE at
# k_each with ranks, the cosine CTE for the one query vector) and the same
# 1/(60+rank) arithmetic, so fusion is exact cross-engine, not approximate.
# ---------------------------------------------------------------------------

HYBRID_VEC_ID = 101
HYBRID_K_EACH = 20
HYBRID_K = 10
HYBRID_RRF_K = 60


def _hybrid_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in sorted(BM25_TERMS))
    return f"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents WHERE text IS NOT NULL
        ), corpus AS (
          SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM d
        ), post AS (
          SELECT doc_id, len(toks) AS dl, term, COUNT(*) AS tf
          FROM d, UNNEST(toks) AS u(term)
          WHERE term IN ({terms})
          GROUP BY doc_id, dl, term
        ), dfq AS (
          SELECT term, COUNT(*) AS df FROM post GROUP BY term
        ), bm25 AS (
          SELECT p.doc_id,
                 FLOOR(SUM(
                   LN(1 + (n_docs - df + 0.5) / (df + 0.5)) *
                   (tf * ({BM25_K1} + 1)) /
                   (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl))
                 ) * 10000.0 + 0.5) / 10000.0 AS score
          FROM post p JOIN dfq USING (term) CROSS JOIN corpus
          GROUP BY p.doc_id
          ORDER BY score DESC, p.doc_id
          LIMIT {HYBRID_K_EACH}
        ), lex AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY score DESC, doc_id) AS rank_lex
          FROM bm25
        ), e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          WHERE embedding IS NOT NULL
        ), q AS (
          SELECT v AS qv FROM e WHERE vec_id = {HYBRID_VEC_ID}
        ), scored AS (
          SELECT e.vec_id AS doc_id,
                 floor(list_cosine_similarity(q.qv, e.v) * 10000.0 + 0.5)
                     / 10000.0 AS cos_sim
          FROM e CROSS JOIN q
          WHERE e.vec_id <> {HYBRID_VEC_ID}
        ), sem AS (
          SELECT doc_id, rank_sem FROM (
            SELECT doc_id, row_number() OVER (ORDER BY cos_sim DESC, doc_id)
                       AS rank_sem
            FROM scored
          ) WHERE rank_sem <= {HYBRID_K_EACH}
        )
        SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
               FLOOR((COALESCE(1.0 / ({HYBRID_RRF_K} + rank_lex), 0.0)
                    + COALESCE(1.0 / ({HYBRID_RRF_K} + rank_sem), 0.0))
                     * 10000000.0 + 0.5) / 10000000.0 AS rrf,
               rank_lex, rank_sem
        FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
        ORDER BY rrf DESC, COALESCE(lex.doc_id, sem.doc_id)
        LIMIT {HYBRID_K}
    """


@query(
    "search_hybrid_rrf",
    oracle=_hybrid_oracle(),
    doc=(
        "NEW r5: hybrid retrieval — BM25 lexical top-20 + exact-cosine "
        "semantic top-20 fused by Reciprocal Rank Fusion (1/(60+rank), "
        "non-retrieved leg contributes 0), top-10 by fused score; both "
        "legs and the fusion arithmetic are rebuilt exactly in the "
        "oracle (the RAG-stack retrieval composition)"
    ),
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkstreamingtwitter_presidential_spark.operators.search import hybrid_rrf_topk

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return hybrid_rrf_topk(
        d, e, BM25_TERMS, HYBRID_VEC_ID,
        k_each=HYBRID_K_EACH, k=HYBRID_K, rrf_k=HYBRID_RRF_K,
    )


@query(
    "pipeline_rag_ingest",
    oracle=None,  # the composition's pieces are each individually
    # DuckDB-oracled (C4 gate, paragraph dedup, strided chunking, BM25);
    # composing their four CTE chains into one twin adds no new
    # correctness signal over the graded parts — rows-only here
    doc=(
        "NEW r5: RAG ingest composition end-to-end — C4-gate the "
        "(synthesized multi-line) corpus, strip cross-doc boilerplate "
        "paragraphs, slice survivors into strided context-window "
        "chunks, build the BM25 inverted index over CHUNKS, and "
        "retrieve the top-10 chunks for the standing query terms; one "
        "declarative plan, chunk granularity end to end (the "
        "chunk-then-index shape a retrieval corpus actually ships)"
    ),
)
def pipeline_rag_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkstreamingtwitter_presidential_spark.functions import text_stats as ts
    from sparkstreamingtwitter_presidential_spark.operators.dedup import paragraph_dedup
    from sparkstreamingtwitter_presidential_spark.operators.packing import (
        strided_token_chunks,
    )
    from sparkstreamingtwitter_presidential_spark.operators.search import bm25_topk

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # same deterministic multi-line synthesis as the C4/paragraph graded
    # queries (the fixture's docs are single-line)
    synth = F.concat(
        F.replace(F.col("text"), F.lit(" batch "), F.lit(".\n")),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(7)) == 0,
            F.lit("\nembedded javascript snippet here."),
        ).otherwise(F.lit("")),
        F.when(
            F.pmod(F.col("doc_id"), F.lit(11)) == 0,
            F.lit("\nfunction f() { return 1; }"),
        ).otherwise(F.lit("")),
    )
    docs = d.select("doc_id", synth.alias("text"))
    gated = (
        docs.select(
            "doc_id", "text", ts.clean_lines("text").alias("lines")
        )
        .select("*", ts.c4_kept_lines("lines").alias("kept"))
        .filter(ts.c4_doc_pass("text", "kept"))
        .select("doc_id", F.concat_ws("\n", F.col("kept")).alias("text"))
    )
    cleaned = paragraph_dedup(gated).filter(F.col("clean_text") != "").select(
        "doc_id", F.col("clean_text").alias("text")
    )
    chunks = strided_token_chunks(cleaned, chunk_tokens=24, stride=12)
    chunk_docs = chunks.select(
        # composite chunk id: stable, unique, BIGINT
        (F.col("doc_id") * 10_000 + F.col("chunk_index")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )
    return bm25_topk(chunk_docs, BM25_TERMS, k=10)


@query(
    "pack_length_bucket_stats",
    oracle="""
        WITH fb AS (
            SELECT list_transform(
                       quantile_cont(n_chars, [0.2, 0.4, 0.6, 0.8]),
                       v -> FLOOR(v * 1e6 + 0.5) / 1e6) AS q
            FROM documents
        ), assigned AS (
            SELECT d.n_chars,
                   CASE WHEN d.n_chars <= q[1] THEN 0
                        WHEN d.n_chars <= q[2] THEN 1
                        WHEN d.n_chars <= q[3] THEN 2
                        WHEN d.n_chars <= q[4] THEN 3
                        ELSE 4 END AS bucket
            FROM documents d, fb
        )
        SELECT bucket,
               COUNT(*) AS n_docs,
               MIN(n_chars) AS min_len,
               MAX(n_chars) AS max_len,
               FLOOR((1 - SUM(n_chars)::DOUBLE / (COUNT(*) * MAX(n_chars)))
                     * 1e6 + 0.5) / 1e6 AS pad_waste
        FROM assigned GROUP BY bucket
    """,
    doc=(
        "NEW r6: sequence-length bucketing — equal-frequency buckets by "
        "exact interpolated percentile boundaries (ONE aggregate to the "
        "driver, n-1 doubles; assignment is a map-only CASE chain fused "
        "into the scan — no shuffle, no NTILE SinglePartition sort), "
        "with per-bucket padding-waste economics (1 - sum/(n*max), the "
        "fraction of batch tokens that would be padding at the bucket "
        "max); boundaries floor-rounded to 1e-6 on both engines so the "
        "interpolated doubles compare bit-identically"
    ),
)
def pack_length_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkstreamingtwitter_presidential_spark.operators.packing import (
        bucket_padding_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    return bucket_padding_stats(docs, "n_chars", n_buckets=5)
