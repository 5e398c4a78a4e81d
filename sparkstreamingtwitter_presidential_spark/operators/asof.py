"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_join_last`` attaches, to every left row, the most recent right
row with the same key and right_ts <= left_ts (backward as-of, ties
inclusive). Implemented with the union+window technique: tag both
inputs, union them into one stream, and carry the last-seen right value
forward with ``last(..., ignorenulls=True)`` over (key, ts) order.

Why this instead of per-group ``pd.merge_asof`` via applyInPandas: the
union plan is ONE shuffle on the key + a sort within partitions — all
JVM-side, no Python, no per-group materialization — which is the shape
that survives 100 TB (skewed keys go through AQE; a hot key's rows
stay a single sorted run). DuckDB's native ASOF JOIN provides the
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_last(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: left rows keep all columns; each gains
    ``<value_col><suffix>`` = that column from the latest right row with
    the same ``key`` and ``right_ts <= left_ts`` (NULL when none).

    Ties (right_ts == left_ts) are INCLUSIVE: the union sorts right
    rows before left rows at equal timestamps via the tag.
    """
    lcols = left.columns
    tagged_left = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__rv_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__rv_{c}") for c in value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__rv_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__tag") == 1).select(
        *lcols, *[f"{c}{suffix}" for c in value_cols]
    )
