r"""Text-analysis queries over the documents table (LLM-pipeline ops):
token counting, language ID, quality scoring, fingerprinting, and a
per-source corpus profile. Each Spark expression has an exact DuckDB
twin (same regexes — Java and RE2 agree on \p{L}/\p{N}/\b here; rolling
hash proven byte-identical on Unicode inputs)."""

from __future__ import annotations

import os

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


# ---------------------------------------------------------------------------
# PII scrubbing + deterministic dataset mixing (pipeline extensions).
# ---------------------------------------------------------------------------

#: Synthesized contact tail so the fixture (clean synthetic prose)
#: actually exercises every redaction category; both engines build the
#: identical string from doc_id.
_DUCK_SYNTH = (
    "text || ' Contact user' || lpad(CAST(doc_id AS VARCHAR), 4, '0')"
    " || '@example.com or +1-555-' || lpad(CAST(doc_id AS VARCHAR), 4, '0')"
    " || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'"
)


@query(
    "text_pii_scrub",
    oracle=f"""
        WITH synth AS (
            SELECT doc_id, {_DUCK_SYNTH} AS t FROM documents
            WHERE text IS NOT NULL
        ),
        s1 AS (SELECT doc_id, t,
                      len(regexp_extract_all(t, '{ts.PII_EMAIL_RE}')) AS n_emails,
                      regexp_replace(t, '{ts.PII_EMAIL_RE}', '[EMAIL]', 'g') AS t1
               FROM synth),
        s2 AS (SELECT doc_id, n_emails,
                      len(regexp_extract_all(t1, '{ts.PII_IP_RE}')) AS n_ips,
                      regexp_replace(t1, '{ts.PII_IP_RE}', '[IP]', 'g') AS t2
               FROM s1),
        s3 AS (SELECT doc_id, n_emails, n_ips,
                      len(regexp_extract_all(t2, '{ts.PII_PHONE_RE}')) AS n_phones,
                      regexp_replace(t2, '{ts.PII_PHONE_RE}', '[PHONE]', 'g') AS clean_text
               FROM s2)
        SELECT doc_id, clean_text, n_emails, n_ips, n_phones FROM s3
    """,
    doc=(
        "NEW: PII redaction (email/IPv4/phone -> typed placeholders) with "
        "per-category audit counts; RE2-compatible regexes so the oracle "
        "applies the identical chain"
    ),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    pad = F.lpad(F.col("doc_id").cast("string"), 4, "0")
    synth = F.concat(
        F.col("text"),
        F.lit(" Contact user"), pad,
        F.lit("@example.com or +1-555-"), pad,
        F.lit(" at 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".1"),
    )
    d = d.select("doc_id", synth.alias("t"))
    counts = ts.pii_counts(F.col("t"))
    return d.select(
        "doc_id",
        ts.scrub_pii(F.col("t")).alias("clean_text"),
        counts["n_emails"].alias("n_emails"),
        counts["n_ips"].alias("n_ips"),
        counts["n_phones"].alias("n_phones"),
    )


#: Dataset-mixing weights for the fixture's 20 sources: upweight the
#: first five, midweight the next five, tail-sample the rest.
_MIX_RATES = {f"src{i}": 0.5 for i in range(5)} | {f"src{i}": 0.25 for i in range(5, 10)}
_MIX_DEFAULT = 0.05


def _duck_mix_threshold() -> str:
    from sparkstreamingtwitter_presidential_spark.operators import sampling as smp

    hi = ", ".join(f"'src{i}'" for i in range(5))
    mid = ", ".join(f"'src{i}'" for i in range(5, 10))
    return (
        f"CASE WHEN source IN ({hi}) THEN {smp.rate_threshold(0.5)} "
        f"WHEN source IN ({mid}) THEN {smp.rate_threshold(0.25)} "
        f"ELSE {smp.rate_threshold(_MIX_DEFAULT)} END"
    )


@query(
    "sample_documents_stratified",
    oracle=f"""
        -- pmod-equivalent ((x % m) + m) % m: DuckDB's % takes the
        -- dividend's sign while Spark's pmod is non-negative; this form
        -- agrees for ALL int64 ids, negative included (advice r2)
        SELECT doc_id, source FROM documents
        WHERE (((doc_id * 2654435761) % 2147483648) + 2147483648) % 2147483648
              < ({_duck_mix_threshold()})
    """,
    doc=(
        "NEW: deterministic dataset mixing — per-source keep rates via "
        "integer multiplicative hash of doc_id (no floats, no "
        "seed-dependence); exact cross-engine row selection"
    ),
)
def sample_documents_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkstreamingtwitter_presidential_spark.operators import sampling as smp

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return smp.stratified_sample(d, "doc_id", "source", _MIX_RATES, _MIX_DEFAULT)


#: Oversampling mix: "2 parts src0/src1, 1.5 parts src2/src3, 0.4 parts
#: src4" — integer parts become full epoch copies, fractions become
#: epoch-salted hash selections.
_MIX_PARTS = {"src0": 2.0, "src1": 2.0, "src2": 1.5, "src3": 1.5, "src4": 0.4}


def _duck_epoch_hash(epoch: int) -> str:
    from sparkstreamingtwitter_presidential_spark.operators import sampling as smp

    x = f"(doc_id + {epoch * smp.EPOCH_SALT})"
    return (
        f"((({x} * {smp.HASH_MULT}) % {smp.HASH_MOD}) + {smp.HASH_MOD})"
        f" % {smp.HASH_MOD}"
    )


def _duck_mix_epochs() -> str:
    from sparkstreamingtwitter_presidential_spark.operators import sampling as smp

    return f"""
        SELECT doc_id, source, 0 AS epoch FROM documents
        WHERE source IN ('src0', 'src1', 'src2', 'src3')
           OR (source = 'src4'
               AND {_duck_epoch_hash(0)} < {smp.rate_threshold(0.4)})
        UNION ALL
        SELECT doc_id, source, 1 AS epoch FROM documents
        WHERE source IN ('src0', 'src1')
           OR (source IN ('src2', 'src3')
               AND {_duck_epoch_hash(1)} < {smp.rate_threshold(0.5)})
    """


@query(
    "mix_documents_weighted",
    oracle=_duck_mix_epochs(),
    doc=(
        "NEW r4: weighted corpus mixing WITH oversampling — weights > 1 "
        "produce full epoch copies plus an epoch-salted fractional "
        "selection (2 parts src0/src1, 1.5 parts src2/src3, 0.4 parts "
        "src4), tagged with the copy number for downstream interleave; "
        "pure integer arithmetic, identical row selection in the oracle"
    ),
)
def mix_documents_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkstreamingtwitter_presidential_spark.operators import sampling as smp

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return smp.weighted_mix(d, "doc_id", "source", _MIX_PARTS)


@query(
    "io_jsonl_roundtrip_docs",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
    doc=(
        "NEW r4: documents -> gzip JSONL -> read-back must be the "
        "identity, including texts with embedded newlines/quotes/"
        "unicode that line formats mangle — proves the interchange "
        "path (sources/jsonl.py) end-to-end against the oracle's "
        "direct parquet read"
    ),
)
def io_jsonl_roundtrip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkstreamingtwitter_presidential_spark.sources.jsonl import (
        read_jsonl,
        write_jsonl,
    )
    from sparkstreamingtwitter_presidential_spark.sources.replay import (
        schema_keyed_dir,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    staged = schema_keyed_dir("spark_graft_jsonl_docs", sf_dir, d.schema)
    if not os.path.exists(os.path.join(staged, "_SUCCESS")):
        write_jsonl(d, staged, n_files=4)
    return read_jsonl(spark, staged, d.schema)
