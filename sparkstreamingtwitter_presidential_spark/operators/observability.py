"""Scan-piggybacked data-quality metrics via ``Dataset.observe`` —
the named-observation API (SPARK-34806): metric expressions evaluate
INSIDE the job that already scans the data, so a 100 TB pipeline gets
row counts / null rates / value ranges for free with its write, rather
than paying a second full scan for a profiling query. This is the
engine's data-quality surface for ETL runs:

    profiled, obs = with_quality_observation(df, ["text", "lang"])
    profiled.write.parquet(out)          # the REAL action
    metrics = obs.get                    # free — same job

Batch frames use ``Observation`` (blocking .get after the first
action). Streaming frames cannot use Observation (no terminal action);
``observe`` with a plain string name works there and each micro-batch's
metrics surface in query progress (``lastProgress["observedMetrics"]``)
— covered by the streaming test, documented as the streaming contract.

Metric set per column: null count (completeness), plus min/max for
numeric columns (range drift). All metrics are Column expressions
evaluated JVM-side in the same whole-stage pipeline — zero Python,
zero extra shuffle (observe aggregates partial per task and merges on
the driver via AccumulatorV2, like any agg's map side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.ShortType,
    T.ByteType,
    T.DecimalType,
)


def quality_metric_exprs(df: DataFrame, cols: list[str] | None = None) -> list:
    """The metric Column list: n_rows, per-column null counts, and
    min/max for numeric columns. Shared by the batch and streaming
    paths so both observe identical metrics."""
    if cols is None:
        cols = [f.name for f in df.schema.fields]
    by_name = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in by_name]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls")
        )
        if isinstance(by_name[c], _NUMERIC):
            metrics.append(F.min(c).alias(f"{c}_min"))
            metrics.append(F.max(c).alias(f"{c}_max"))
    return metrics


def with_quality_observation(
    df: DataFrame,
    cols: list[str] | None = None,
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """(frame, observation): run any ONE action on the frame (write,
    count, collect), then read ``observation.get`` — the metrics rode
    the action's own scan. Batch only; for streaming pass a string
    name to ``df.observe`` directly and read query progress."""
    if df.isStreaming:
        raise ValueError(
            "Observation does not support streaming frames; use "
            "df.observe('<name>', *quality_metric_exprs(df, cols)) and "
            "read lastProgress['observedMetrics']"
        )
    obs = Observation(name)
    return df.observe(obs, *quality_metric_exprs(df, cols)), obs


def observed_profile(
    df: DataFrame, cols: list[str] | None = None
) -> dict[str, object]:
    """Convenience: force a minimal count action and return the metric
    dict. For pipelines that write anyway, prefer
    ``with_quality_observation`` so the metrics ride the real action
    instead of this dedicated pass."""
    profiled, obs = with_quality_observation(df, cols)
    profiled.count()
    return obs.get
