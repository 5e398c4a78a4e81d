r"""Text sanitization as builtin Column expressions (SURVEY.md §2.2 S1-S5).

The reference sanitizes each field before pipe-joining it into a delimited
text row (reference Collector.scala:57-68, ``safeValue``):

  S1  null -> ""                      (getOrElse(""))
  S2  remove \t and \" ; "," -> "'"   (literal replaces)
      remove \r and \n                (intended as regex "[\r\n]"; the
                                       reference literal-replaces the
                                       4-char string — a latent bug we fix,
                                       per SURVEY.md §7 "scrub-semantics")
  S3  remove all Unicode control/format chars (replaceAll("[\p{C}]",""))
  S4  timestamp -> "yyyy-MM-dd HH:mm:ss.0" (Collector.scala:45,53)
  S5  fields.mkString("|")            (Utils.scala:9 separator)

All implemented as JVM-side builtin expressions — no Python UDFs — so they
stay inside WholeStageCodegen and cost nothing extra at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Field separator of the reference's delimited table (Utils.scala:9).
SEPARATOR = "|"

#: Hive-compatible timestamp format with the hard-coded ".0" fractional
#: second (Collector.scala:45). Quoted literal so Spark's DateTimeFormatter
#: treats ".0" as text, not a pattern.
HIVE_TS_FORMAT = "yyyy-MM-dd HH:mm:ss'.0'"


def null_to_empty(col: Column | str) -> Column:
    """S1 — NULL coalesced to empty string (Collector.scala:57,64)."""
    return F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))


def scrub_chars(col: Column | str) -> Column:
    """S2 — exact character scrub (Collector.scala:59-62).

    Removes tabs and double quotes, removes CR/LF (the *intended* regex
    semantics of the reference's literal ``"[\\r\\n]"`` replace), and maps
    commas to apostrophes so the value can never collide with a CSV/pipe
    delimiter. One ``translate`` handles tab/quote/CR/LF deletion and the
    comma mapping in a single codegen'd pass.
    """
    c = F.col(col) if isinstance(col, str) else col
    # translate: chars in the 2nd arg map positionally to the 3rd; chars
    # with no counterpart are deleted.  ,->'  and  \t " \r \n -> deleted.
    return F.translate(c, ",\t\"\r\n", "'")


def strip_control(col: Column | str) -> Column:
    """S3 — strip every Unicode control/format char (Collector.scala:63)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"\p{C}", "")


def clean_text(col: Column | str) -> Column:
    """S1+S2+S3 composed: the reference's full ``safeValue`` for strings
    (Collector.scala:57-64). NULL-safe (NULL -> "")."""
    return strip_control(scrub_chars(null_to_empty(col)))


def hive_timestamp(col: Column | str) -> Column:
    """S4 — format a timestamp as the reference writes it
    (Collector.scala:45,53): ``yyyy-MM-dd HH:mm:ss.0``. NULL -> ""."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.date_format(c, HIVE_TS_FORMAT), F.lit(""))


def pipe_row(*cols: Column) -> Column:
    """S5 — serialize already-sanitized fields into one pipe-delimited row
    (Collector.scala:66-68). Fields must be NULL-coalesced first (S1), as
    in the reference, so a NULL yields an empty cell rather than being
    skipped by concat_ws."""
    return F.concat_ws(SEPARATOR, *cols)
