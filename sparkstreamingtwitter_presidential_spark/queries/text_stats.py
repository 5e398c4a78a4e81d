r"""Text-analysis queries over the documents table (LLM-pipeline ops):
token counting, language ID, quality scoring, fingerprinting, and a
per-source corpus profile. Each Spark expression has an exact DuckDB
twin (same regexes — Java and RE2 agree on \p{L}/\p{N}/\b here; rolling
hash proven byte-identical on Unicode inputs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.functions import text_stats as ts
from sparkstreamingtwitter_presidential_spark.io import load_table
from sparkstreamingtwitter_presidential_spark.queries.registry import query

# DuckDB twins of the shared expressions (same constants/regexes).
_DUCK_WS = r"len(string_split_regex(trim(text), '\s+'))"
_DUCK_BPE = r"len(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\s\p{L}\p{N}]'))"
_DUCK_PUNCT_HITS = r"""len(regexp_extract_all(text, '[.,;:!?''"()\-]'))"""
_DUCK_HITS = {
    lang: rf"len(regexp_extract_all(lower(text), '{pat}'))"
    for lang, pat in ts.LANG_STOPWORDS.items()
}
_DUCK_FP = """
    list_reduce(
      list_prepend(0::BIGINT,
        list_transform(regexp_extract_all(text, '.'), c -> ascii(c)::BIGINT)),
      (acc, c) -> (acc * 31 + c) % 1000000007)
"""


@query(
    "text_token_counts",
    oracle=f"""
        SELECT doc_id,
               {_DUCK_WS} AS ws_tokens,
               {_DUCK_BPE} AS bpe_tokens
        FROM documents WHERE text IS NOT NULL
    """,
    doc="whitespace + BPE-ish regex token counts per document",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return d.select(
        "doc_id",
        ts.ws_token_count("text").alias("ws_tokens"),
        ts.bpe_token_count("text").alias("bpe_tokens"),
    )


def _duck_lang_id_sql() -> str:
    """CASE-chain twin of functions.text_stats.lang_id (same tiebreak)."""
    hits = _DUCK_HITS
    best = "greatest({})".format(", ".join(hits[lang] for lang in ts.LANG_STOPWORDS))
    whens = "\n".join(
        f"WHEN {hits[lang]} = best THEN '{lang}'" for lang in ts.LANG_STOPWORDS
    )
    return f"""
        SELECT doc_id, CASE WHEN best > 0 THEN (CASE {whens} END)
                            ELSE 'und' END AS lang_pred
        FROM (SELECT doc_id, text, {best} AS best
              FROM documents WHERE text IS NOT NULL)
    """


@query(
    "text_lang_id",
    oracle=_duck_lang_id_sql(),
    doc="stopword-heuristic language ID with deterministic tiebreak",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return d.select("doc_id", ts.lang_id("text").alias("lang_pred"))


@query(
    "text_quality_scores",
    oracle=f"""
        SELECT doc_id,
               floor((0.5 * least(1.0, {_DUCK_WS} / 64.0)
                   + 0.3 * least(1.0, 4.0 * (CASE WHEN {_DUCK_WS} > 0
                         THEN {_DUCK_HITS['en']}::DOUBLE / {_DUCK_WS} ELSE 0 END))
                   + 0.2 * (1.0 - least(1.0, 4.0 * (CASE WHEN length(text) > 0
                         THEN {_DUCK_PUNCT_HITS}::DOUBLE / length(text) ELSE 0 END))))
                     * 10000.0 + 0.5) / 10000.0 AS quality
        FROM documents WHERE text IS NOT NULL
    """,
    doc="composite length/stopword/punctuation quality score in [0,1]",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return d.select("doc_id", ts.quality_score("text").alias("quality"))


@query(
    "text_fingerprints",
    oracle=f"""
        SELECT doc_id, {_DUCK_FP} AS fp
        FROM documents WHERE text IS NOT NULL
    """,
    doc="rolling polynomial hash fingerprint (engine-portable, one pass)",
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return d.select("doc_id", ts.fingerprint("text").alias("fp"))


@query(
    "text_corpus_profile_by_source",
    oracle=f"""
        SELECT source,
               count(*) AS n_docs,
               floor((avg(n_chars)) * 10000 + 0.5) / 10000 AS avg_chars,
               floor((avg({_DUCK_WS})) * 10000 + 0.5) / 10000 AS avg_tokens,
               count(DISTINCT lang) AS n_langs
        FROM documents WHERE text IS NOT NULL
        GROUP BY source
    """,
    doc="per-source corpus profile: doc counts, avg length, lang spread",
)
def text_corpus_profile_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        (F.floor((F.avg("n_chars")) * 10000 + F.lit(0.5)) / 10000).alias("avg_chars"),
        (F.floor((F.avg(ts.ws_token_count("text"))) * 10000 + F.lit(0.5)) / 10000).alias("avg_tokens"),
        F.countDistinct("lang").alias("n_langs"),
    )
