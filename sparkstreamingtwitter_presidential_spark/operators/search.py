"""Full-text keyword search: BM25-scored top-k over the documents table
— the lexical counterpart to operators/similarity.py's embedding ANN
(a training-data pipeline needs both: embedding search for semantic
near-dups, keyword search for targeted corpus slicing/inspection).

Pipeline (all builtin expressions, zero Python in the hot path):

  tokenize -> posting list        one explode off a persisted token
  (doc_id, term, tf)              table; tf via groupBy count
  document frequency df(term)     groupBy on the QUERY terms only —
                                  the posting table is pre-filtered to
                                  the query vocabulary, so df/tf/score
                                  all run on |matching postings|, not
                                  |corpus|
  BM25 score                      idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
                                  summed per doc; idf = ln(1 + (N-df+0.5)/(df+0.5))
  top-k                           orderBy + limit (TakeOrderedAndProject)

Scale: the posting list shuffles once on term; filtering to query terms
happens BEFORE that shuffle (predicate on the exploded term — Catalyst
pushes an isin() into the generate), so cost tracks documents matching
the query vocabulary. At 100 TB the posting table is the persisted
artifact (bucketed by term), and each query is a pruned scan + small
aggregate — the classic inverted-index deployment.

Scores are floor-rounded at 1e-4 for cross-engine comparison (ln/÷ can
differ in the last ulp between libms; a 1e-4 grid absorbs that — same
rule as embedding cosine, DESIGN.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75

#: Tokenization: lowercase, split on any non-letter/digit run. The
#: DuckDB twin uses the identical regex, so token streams are equal.
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokenize(text: F.Column) -> F.Column:
    """text -> array of lowercase alphanumeric tokens (no empties)."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != ""
    )


def posting_list(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf, dl): one row per distinct term per document,
    with term frequency and the document's token length. The persisted
    100 TB artifact — bucket it by term so queries prune."""
    toks = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("toks")
    )
    # dl in its own projection: referenced by every exploded row, and
    # Generate inlines its input expression (measured round-2 trap).
    toks = toks.withColumn("dl", F.size("toks"))
    return (
        toks.select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25.

    Returns (doc_id, n_terms_hit, score) ordered by score desc (doc_id
    tiebreak). N and avgdl are corpus constants computed in one tiny
    aggregate and cross-joined (broadcast of a 1-row frame).
    """
    terms = sorted({t.lower() for t in query_terms})
    post = posting_list(docs, id_col, text_col)
    corpus = docs.filter(F.col(text_col).isNotNull()).select(
        F.count("*").alias("n_docs"),
        F.avg(F.size(tokenize(F.col(text_col)))).alias("avgdl"),
    )
    # The isin() filter is pushed below the posting groupBy by Catalyst,
    # so `hits` is tiny (query-vocab postings only) — but it fans out to
    # two consumers (df aggregation + scoring join). Persist-and-
    # materialize before the fan-out or each branch re-runs the full
    # corpus scan + explode + aggregate (measured repo pattern; blocks
    # are released by the ContextCleaner with the result's lineage).
    hits = post.filter(F.col("term").isin(terms)).persist()
    hits.count()
    df_ = hits.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        hits.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_hit"),
            (F.floor(F.sum(idf * tf_part) * 10000.0 + F.lit(0.5)) / 10000.0).alias(
                "score"
            ),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k_each: int = 20,
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hybrid retrieval: BM25 lexical leg + exact-cosine semantic leg,
    fused by Reciprocal Rank Fusion (Cormack et al. 2009):

        rrf(d) = sum over legs of 1 / (rrf_k + rank_leg(d))

    Returns (doc_id, rrf, rank_lex, rank_sem) — top ``k`` by fused
    score (doc_id tiebreak); a document absent from one leg has a NULL
    rank there and contributes only the other leg's term (the standard
    RRF treatment of non-retrieved documents).

    Scale: each leg is its own already-scale-shaped operator (inverted
    postings / partial-topk scan); the fusion joins two k_each-row
    frames — driver-free, broadcast-sized by construction. The rank
    windows run on ≤ k_each rows (the leg outputs), so their single
    partition holds k rows, never corpus rows. RRF scores floor-round
    at 1e-7 (division on bit-identical inputs is exact, but the grid
    keeps the cross-engine contract uniform with BM25/cosine).
    """
    from pyspark.sql import Window
    from sparkstreamingtwitter_presidential_spark.operators.similarity import (
        brute_force_topk,
    )

    lex = bm25_topk(docs, query_terms, k=k_each, id_col=id_col, text_col=text_col)
    lex_ranked = lex.select(
        id_col,
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col(id_col)))
        .alias("rank_lex"),
    )
    sem_ranked = brute_force_topk(embeddings, [query_vec_id], k=k_each).select(
        F.col("vec_id").alias(id_col), F.col("rank").alias("rank_sem")
    )
    one = F.lit(1.0)
    rrf = F.coalesce(one / (F.lit(rrf_k) + F.col("rank_lex")), F.lit(0.0)) + F.coalesce(
        one / (F.lit(rrf_k) + F.col("rank_sem")), F.lit(0.0)
    )
    return (
        lex_ranked.join(sem_ranked, on=id_col, how="full_outer")
        .select(
            id_col,
            (F.floor(rrf * 1e7 + F.lit(0.5)) / 1e7).alias("rrf"),
            "rank_lex",
            "rank_sem",
        )
        .orderBy(F.col("rrf").desc(), F.col(id_col))
        .limit(k)
    )
