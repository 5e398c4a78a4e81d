"""The documented Python extension point (SURVEY.md §2.7).

Engine policy: the entire parity surface and every hot-path operator is
builtin Column expressions — Python UDFs never appear there. When a user
genuinely needs custom Python, THIS is the sanctioned shape: an
Arrow-vectorized ``pandas_udf`` (batch transfer, numpy math), never a
row-at-a-time ``F.udf``. ``zscore`` is the worked example and the test
fixture; it is deliberately NOT used by any registry query.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def zscore(v: pd.Series) -> pd.Series:
    """Vectorized z-score of a numeric column (per Arrow batch — for an
    exact global z-score, join against a precomputed mean/std instead;
    this exists to demonstrate the batch-UDF shape, and the test pins
    the per-batch semantics)."""
    std = v.std(ddof=0)
    if std == 0 or pd.isna(std):
        return v * 0.0
    return (v - v.mean()) / std


def global_zscore(df, col: str, out: str = "zscore"):
    """The RIGHT way to z-score at scale: one tiny aggregate (mean/std),
    broadcast back over the scan — all builtin expressions, exact, no
    Python. Kept beside the pandas_udf example to steer users to the
    builtin path when semantics allow."""
    stats = df.agg(
        F.avg(col).alias("__mu"), F.stddev_pop(col).alias("__sigma")
    )
    return df.crossJoin(F.broadcast(stats)).withColumn(
        out, (F.col(col) - F.col("__mu")) / F.col("__sigma")
    ).drop("__mu", "__sigma")


# --------------------------------------------------------------------------
# The TABLE-function extension point (Spark 4 Python UDTF): one input row
# -> many output rows. Same policy as the scalar point above: builtin
# generators (explode/sequence/posexplode over builtin-split arrays) cover
# most fan-out shapes JVM-side — reach for a UDTF only when the row
# expansion needs real Python logic. Worked example: sentence splitting
# with per-sentence indices (the chunking shapes in operators/packing.py
# stay builtin because token windows ARE expressible with sequence()).
# --------------------------------------------------------------------------

try:  # pyspark >= 3.5
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx int, sentence string")
    class SplitSentences:
        """(idx, sentence) per sentence-ish segment of the input text.

        Deliberately simple segmentation (./!/? terminators); the point
        is the extension SHAPE: a lateral-join table function whose
        Python runs once per input row, streaming output rows without
        materializing the fan-out on the driver. Register + use:

            spark.udtf.register("split_sentences", SplitSentences)
            spark.sql("SELECT d.doc_id, s.* FROM {d} d,"
                      " LATERAL split_sentences(text) s", d=docs)
        """

        def eval(self, text: str | None):
            if text is None:
                return
            parts = (
                s.strip()
                for s in text.replace("!", ".").replace("?", ".").split(".")
            )
            for i, s in enumerate(p for p in parts if p):
                yield i, s

except ImportError:  # pragma: no cover - older pyspark
    SplitSentences = None
