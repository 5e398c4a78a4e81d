r"""Benchmark decontamination: flag/remove corpus documents that overlap
an evaluation set by shared word n-grams.

The standard training-data hygiene step (GPT-3 appendix C, PaLM, Llama
data cards all describe the same shape): take every n-gram of every
benchmark/eval document, mark any training document containing one (or
``min_hits`` distinct ones) as contaminated, and drop it so downstream
eval numbers measure generalization, not memorization.

Operators (all pure DataFrame compositions, no Python UDFs):

  eval_ngrams            distinct n-grams of the eval set (the probe set)
  contamination_hits     per-corpus-doc distinct overlapping n-grams
  decontaminate          corpus minus contaminated docs

Scale design (100 TB corpus, ~10^5-doc eval set): the eval n-gram set
is a few million short strings — the canonical SMALL side. We aggregate
it once and let AQE/the optimizer broadcast it, so the corpus side is a
single map-over-scan (tokenize -> gram -> hash-join against the
broadcast probe set) followed by a partial-aggregated per-doc count:
one shuffle, keyed by doc_id, carrying only hit rows (a tiny fraction
of the corpus). No corpus-side distinct over all n-grams, no
corpus×eval shuffle join. The n-grams are joined as STRINGS here so the
DuckDB oracle is exact; at petabyte scale you would xxhash64 both sides
to 8-byte keys (collisions only ever over-delete, which is the safe
direction for decontamination) — flip ``hashed=True`` for that.

Reference parity note: the reference engine (157-line Scala DStream
collector) has no decontamination surface; this extends the engine for
the training-data pipeline mandate (SURVEY.md §6 forward-looking ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.operators.dedup import tokens


def _gram_array(t: Column, n: int, hashed: bool) -> Column:
    """All (non-distinct) word n-grams of a MATERIALIZED token-array
    column, in position order. Same lazy CaseWhen guard as
    dedup.word_shingles_from_tokens: sequence() must never see
    size < n (negative-step inference)."""
    k = F.size(t)
    idx = F.when(k >= n, F.sequence(F.lit(0), k - n)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    if hashed:
        grams = F.transform(grams, lambda g: F.xxhash64(g))
    return grams


def eval_ngrams(
    eval_docs: DataFrame,
    n: int = 6,
    text_col: str = "text",
    hashed: bool = False,
) -> DataFrame:
    """Distinct n-grams of the eval set: one column ``gram``. Small by
    contract (eval benchmarks are orders of magnitude under the
    corpus); the caller's join against it broadcasts."""
    t = eval_docs.filter(F.col(text_col).isNotNull()).select(
        tokens(text_col).alias("t")
    )
    return (
        t.select(F.explode(_gram_array(F.col("t"), n, hashed)).alias("gram"))
        .distinct()
    )


def contamination_hits(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 6,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    hashed: bool = False,
) -> DataFrame:
    """(doc_id, n_hits, contaminated) for every corpus doc with at
    least one eval-overlapping n-gram. n_hits counts DISTINCT
    overlapping n-grams (a doc repeating one leaked gram is one hit);
    contaminated = n_hits >= min_hits.

    Plan: eval grams aggregated once and broadcast; corpus is a single
    scan -> explode grams -> broadcast semi-ish inner join -> per-doc
    partial+final count. Docs with zero hits don't appear (join keeps
    the output proportional to leakage, not corpus size); callers
    wanting the full corpus annotated left-join this back.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    probe = F.broadcast(eval_ngrams(eval_docs, n, text_col, hashed))
    corpus_grams = (
        corpus.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), tokens(text_col).alias("t"))
        .select(F.col(id_col), F.explode(_gram_array(F.col("t"), n, hashed)).alias("gram"))
    )
    return (
        corpus_grams.join(probe, "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_hits"))
        .select(
            id_col,
            "n_hits",
            (F.col("n_hits") >= min_hits).alias("contaminated"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = 6,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    hashed: bool = True,
) -> DataFrame:
    """Corpus minus contaminated docs (left_anti on the hit list).
    Defaults to hashed grams — the production path; the anti-join's
    right side is small (leaked docs only) so it broadcasts too."""
    bad = (
        contamination_hits(corpus, eval_docs, n, min_hits, id_col, text_col, hashed)
        .filter(F.col("contaminated"))
        .select(id_col)
    )
    return corpus.join(F.broadcast(bad), id_col, "left_anti")
