r"""Text-analysis Column expressions for LLM-data-pipeline workloads:
language ID (stopword n-gram heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and rolling-hash document fingerprinting.

All builtin/higher-order expressions — JVM-side, codegen-friendly, no
Python UDFs — so they run at full scan speed over 100 TB of documents.
Every expression has an exact DuckDB-SQL twin (queries/text_stats.py)
proven byte-identical on ASCII and non-ASCII inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Stopword alternations per language for the lang-ID heuristic. Kept
#: deliberately small and word-boundary-anchored; the heuristic is
#: deterministic, not statistical.
LANG_STOPWORDS: dict[str, str] = {
    "en": r"\b(the|a|and|is|of|to|in|that|it)\b",
    "fr": r"\b(le|la|les|et|un|une|des|du|est|je)\b",
    "de": r"\b(der|die|das|und|ist|ein|eine|nicht|ich)\b",
    "es": r"\b(el|los|las|y|es|un|una|que|no)\b",
}

#: GPT-2-flavoured pretokenizer shape: runs of letters, runs of digits,
#: or single non-space-non-alnum symbols. Java and RE2 agree on \p{L}/\p{N}.
BPE_TOKEN_RE = r"\p{L}+|\p{N}+|[^\s\p{L}\p{N}]"

#: Simple visible-punctuation class shared with the oracle.
PUNCT_RE = r"[.,;:!?'\"()\-]"

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ws_token_count(col: Column | str) -> Column:
    """Whitespace token count. Empty/blank text counts as 1 by split
    semantics (both engines agree), which the quality score guards."""
    return F.size(F.split(F.trim(_c(col)), r"\s+"))


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish pretoken count via regexp_extract_all(BPE_TOKEN_RE)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_TOKEN_RE), F.lit(0)))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Number of stopword occurrences for one language (lower-cased)."""
    return F.size(
        F.regexp_extract_all(F.lower(_c(col)), F.lit(LANG_STOPWORDS[lang]), F.lit(0))
    )


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language stopword hits with a
    fixed priority-order tiebreak (en > fr > de > es); 'und' when no
    stopword of any language occurs."""
    hits = {lang: stopword_hits(col, lang) for lang in LANG_STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # Build the CASE in reverse priority so earlier langs win ties.
    for lang in reversed(list(LANG_STOPWORDS)):
        expr = F.when(hits[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    c = _c(col)
    n = F.length(c)
    hits = F.size(F.regexp_extract_all(c, F.lit(PUNCT_RE), F.lit(0)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str) -> Column:
    """English-stopword hits / whitespace tokens (0 for blank text)."""
    toks = ws_token_count(col)
    return F.when(
        toks > 0, stopword_hits(col, "en").cast("double") / toks.cast("double")
    ).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite heuristic quality score in [0,1]:
    0.5 * min(1, tokens/64) + 0.3 * min(1, 4*stopword_ratio)
    + 0.2 * (1 - min(1, 4*punct_ratio)). Deterministic, rounded to 4."""
    toks = ws_token_count(col).cast("double")
    len_part = F.least(F.lit(1.0), toks / F.lit(64.0))
    stop_part = F.least(F.lit(1.0), F.lit(4.0) * stopword_ratio(col))
    punct_part = F.lit(1.0) - F.least(F.lit(1.0), F.lit(4.0) * punct_ratio(col))
    score = F.lit(0.5) * len_part + F.lit(0.3) * stop_part + F.lit(0.2) * punct_part
    # floor(x*1e4 + 0.5)/1e4 instead of round(): Spark rounds via BigDecimal
    # HALF_UP on the decimal rendering, DuckDB on the binary double — they
    # disagree on exact .xxxx5 boundaries. Explicit floor arithmetic is the
    # same double ops in both engines, hence bit-identical.
    return F.floor(score * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def fingerprint(col: Column | str) -> Column:
    """Rolling polynomial hash of the whole document:
    fold over characters of ``(acc*31 + codepoint) % 1e9+7``. A stable,
    engine-portable exact-content fingerprint (unlike xxhash64/md5 whose
    outputs differ across engines). Runs as a higher-order ``aggregate``
    expression — one pass, JVM-side."""
    c = _c(col)
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FINGERPRINT_BASE + F.ascii(ch)) % FINGERPRINT_MOD,
    )


# ---------------------------------------------------------------------------
# PII scrubbing — redact contact identifiers before a corpus is trained
# on. Patterns are deliberately RE2-compatible (no lookaround) so the
# DuckDB oracle applies the IDENTICAL regex; both engines replace ALL
# occurrences (Spark regexp_replace is global; DuckDB needs the 'g'
# flag). Chained as email -> ip -> phone: scrubbing emails first removes
# their digit runs from phone's view, and ips (dotted) before the
# dot-free phone pattern keeps the two from overlapping.
# ---------------------------------------------------------------------------

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+?\d[\d\- ]{6,}\d"

_PII_CHAIN = [
    (PII_EMAIL_RE, "[EMAIL]"),
    (PII_IP_RE, "[IP]"),
    (PII_PHONE_RE, "[PHONE]"),
]


def scrub_pii(col: Column | str) -> Column:
    """Redact emails, IPv4 addresses, and phone-shaped digit runs with
    typed placeholders. A stateless per-row expression: at 100 TB this
    runs at scan speed inside whole-stage codegen, no shuffle."""
    out = _c(col)
    for pattern, repl in _PII_CHAIN:
        out = F.regexp_replace(out, pattern, repl)
    return out


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-category PII occurrence counts (for corpus audit metrics).
    Counted on the SAME chain order as scrub_pii, each category counted
    on text with the earlier categories already redacted, so the two
    views are consistent (an email's digits never double-count as a
    phone)."""
    out: dict[str, Column] = {}
    scrubbed = _c(col)
    for (pattern, repl), name in zip(_PII_CHAIN, ("n_emails", "n_ips", "n_phones")):
        out[name] = F.size(F.regexp_extract_all(scrubbed, F.lit(pattern), F.lit(0)))
        scrubbed = F.regexp_replace(scrubbed, pattern, repl)
    return out
