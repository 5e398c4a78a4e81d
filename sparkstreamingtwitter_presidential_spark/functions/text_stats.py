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


# ---------------------------------------------------------------------------
# Repetition / structure signals (Gopher-style quality rules).
#
# All functions below take ALREADY-MATERIALIZED array columns (lines,
# words, bigrams) rather than raw text: higher-order-function lambdas
# get no subexpression elimination (DESIGN.md measured lesson), so the
# caller must project the split arrays as named columns ONCE and feed
# those — see clean_lines()/clean_words()/word_bigrams() and the
# text_repetition_signals query. Every ratio is integer-count division
# (no sum-of-doubles), so cross-engine comparison is exact.
# ---------------------------------------------------------------------------


def clean_lines(col: Column | str) -> Column:
    """Non-empty trimmed lines of a document (array<string>)."""
    return F.filter(
        F.transform(F.split(_c(col), "\n"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )


def clean_words(col: Column | str) -> Column:
    """Non-empty whitespace tokens (array<string>; [] for blank text)."""
    return F.filter(
        F.split(F.trim(_c(col)), r"\s+"), lambda x: F.length(x) > 0
    )


def word_bigrams(words: Column | str) -> Column:
    """Adjacent-word bigrams of a MATERIALIZED words column ([] when
    fewer than 2 words). 1-based element_at matches DuckDB's 1-based
    list indexing, so the oracle twin is the same arithmetic."""
    w = _c(words)
    n = F.size(w)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i), F.element_at(w, i + F.lit(1))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _dup_fraction(arr: Column) -> Column:
    """1 - distinct/total for any array (0.0 when empty)."""
    n = F.size(arr)
    d = F.size(F.array_distinct(arr))
    return F.when(
        n > 0, (n - d).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def dup_line_fraction(lines: Column | str) -> Column:
    """Fraction of line occurrences that repeat an earlier line."""
    return _dup_fraction(_c(lines))


def dup_line_char_fraction(lines: Column | str) -> Column:
    """Fraction of line CHARACTERS belonging to repeated occurrences
    (total line chars minus distinct-line chars, over total)."""
    ln = _c(lines)
    tot = F.aggregate(
        F.transform(ln, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dis = F.aggregate(
        F.transform(F.array_distinct(ln), lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.when(
        tot > 0, (tot - dis).cast("double") / tot.cast("double")
    ).otherwise(F.lit(0.0))


def dup_bigram_fraction(bigrams: Column | str) -> Column:
    """Fraction of repeated adjacent-word bigrams (C4-style repetition)."""
    return _dup_fraction(_c(bigrams))


def mean_word_length(words: Column | str) -> Column:
    """Mean characters per word (0.0 for no words); int/int division,
    engine-exact."""
    w = _c(words)
    n = F.size(w)
    tot = F.aggregate(
        F.transform(w, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.when(
        n > 0, tot.cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def bullet_line_fraction(lines: Column | str) -> Column:
    """Fraction of lines starting with a bullet marker (-, *, •)."""
    ln = _c(lines)
    n = F.size(ln)
    hits = F.size(
        F.filter(
            ln,
            lambda x: F.substring(x, 1, 1).isin("-", "*", "•"),
        )
    )
    return F.when(
        n > 0, hits.cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def ellipsis_line_fraction(lines: Column | str) -> Column:
    """Fraction of lines ending in '...' or '…'."""
    ln = _c(lines)
    n = F.size(ln)
    hits = F.size(
        F.filter(
            ln,
            lambda x: x.endswith("...") | x.endswith("…"),
        )
    )
    return F.when(
        n > 0, hits.cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def symbol_word_ratio(col: Column | str, words: Column | str) -> Column:
    """(# and ellipsis occurrences) / words — Gopher's symbol ratio."""
    hits = F.size(
        F.regexp_extract_all(_c(col), F.lit(r"(#|\.\.\.|…)"), F.lit(0))
    )
    n = F.size(_c(words))
    return F.when(
        n > 0, hits.cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


# ---------------------------------------------------------------------------
# C4-style line-level cleaning (Raffel et al. 2020 §2.2, the canonical
# web-corpus cleanup): keep only lines that read like sentences, then
# gate whole documents. Thresholds ADAPTED to the fixture's short docs
# (C4's originals assume full web pages); every rule is a builtin
# Column expression with an exact DuckDB list-function twin.
# ---------------------------------------------------------------------------

#: A kept line must end like a sentence...
C4_TERMINAL_PUNCT_RE = "[.!?\"']$"
#: ...carry at least this many whitespace words...
C4_MIN_LINE_WORDS = 3
#: ...and not be code/boilerplate (C4 drops any line with this word).
C4_BAD_LINE_SUBSTR = "javascript"
#: Document gate: at least this many kept lines (C4: >= 5 sentences),
#: no placeholder text, no curly braces (code).
C4_MIN_KEPT_LINES = 3


def c4_keep_line(line: Column) -> Column:
    """Line-level C4 keep predicate (for use inside F.filter lambdas;
    ``line`` is a trimmed non-empty line from clean_lines)."""
    words = F.size(
        F.filter(F.split(line, r"\s+"), lambda w: F.length(w) > 0)
    )
    return (
        line.rlike(C4_TERMINAL_PUNCT_RE)
        & (words >= C4_MIN_LINE_WORDS)
        & ~F.contains(F.lower(line), F.lit(C4_BAD_LINE_SUBSTR))
    )


def c4_kept_lines(lines: Column | str) -> Column:
    """The C4-surviving subset of a MATERIALIZED lines column."""
    return F.filter(_c(lines), c4_keep_line)


def c4_doc_pass(text: Column | str, kept: Column | str) -> Column:
    """Document-level C4 gate over the original text and the
    MATERIALIZED kept-lines column."""
    return (
        (F.size(_c(kept)) >= C4_MIN_KEPT_LINES)
        & ~F.contains(F.lower(_c(text)), F.lit("lorem ipsum"))
        & ~F.contains(_c(text), F.lit("{"))
    )


#: Gopher-style acceptance thresholds, ADAPTED to the fixture's short
#: documents (the published rules assume web pages; min word count 50
#: would reject the whole corpus). Every comparison is against an
#: integer-division double — deterministic in both engines.
GOPHER_THRESHOLDS = {
    "min_words": 20,
    "max_words": 100_000,
    "min_mean_word_len": 2.0,
    "max_mean_word_len": 12.0,
    "max_dup_line_frac": 0.30,
    "max_dup_line_char_frac": 0.20,
    "max_dup_bigram_frac": 0.40,
    "max_bullet_line_frac": 0.90,
    "max_ellipsis_line_frac": 0.30,
    "max_symbol_word_ratio": 0.10,
}


def gopher_pass(
    text: Column | str, lines: Column | str, words: Column | str,
    bigrams: Column | str,
) -> Column:
    """Boolean: document passes every (adapted) Gopher repetition /
    structure rule. Args are the materialized array columns."""
    t = GOPHER_THRESHOLDS
    n_words = F.size(_c(words))
    return (
        (n_words >= t["min_words"])
        & (n_words <= t["max_words"])
        & (mean_word_length(words) >= t["min_mean_word_len"])
        & (mean_word_length(words) <= t["max_mean_word_len"])
        & (dup_line_fraction(lines) <= t["max_dup_line_frac"])
        & (dup_line_char_fraction(lines) <= t["max_dup_line_char_frac"])
        & (dup_bigram_fraction(bigrams) <= t["max_dup_bigram_frac"])
        & (bullet_line_fraction(lines) <= t["max_bullet_line_frac"])
        & (ellipsis_line_fraction(lines) <= t["max_ellipsis_line_frac"])
        & (symbol_word_ratio(text, words) <= t["max_symbol_word_ratio"])
    )
