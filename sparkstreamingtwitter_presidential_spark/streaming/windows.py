"""Event-time window aggregations (NEW capabilities over the reference,
SURVEY.md §2.6 ST5): watermarked tumbling / sliding / session windows
over the events stream. Each transform is a pure DataFrame function that
works identically on a batch DataFrame — which is exactly how the tests
and the DuckDB oracles validate the streaming results.

Watermarking bounds state: with a 10-minute watermark, a 1-hour window's
state is dropped ~70 minutes after its end — at 100 TB/day of events this
is the difference between bounded and unbounded aggregation state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "10 minutes"


def _half_up_2dp(c: Column) -> Column:
    # exact half-up to 2dp via floor: Spark round() is HALF_UP, DuckDB's
    # round() disagrees on .xx5 boundaries — cross-engine rule (DESIGN.md)
    return F.floor(c * 100 + F.lit(0.5)) / 100


def _win_cols(w: Column) -> list[Column]:
    return [
        F.date_format(w.getField("start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format(w.getField("end"), "yyyy-MM-dd HH:mm:ss").alias("window_end"),
    ]


def tumbling_aggregate(
    events: DataFrame, width: str = "1 hour", watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Per (1h tumbling window, event_type): count + rounded value sum."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    agg = (
        src.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), _half_up_2dp(F.sum("value")).alias("total_value"))
    )
    return agg.select(*_win_cols(F.col("w")), "event_type", "n", "total_value")


def sliding_aggregate(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Per (1h window sliding every 30m): event count + rounded value
    sum. Each event lands in width/slide windows. (No distinct aggs here:
    streaming aggregation forbids them, and approx_count_distinct has no
    cross-engine oracle.)"""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    agg = (
        src.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n"), _half_up_2dp(F.sum("value")).alias("total_value"))
    )
    return agg.select(*_win_cols(F.col("w")), "n", "total_value")


def session_aggregate(
    events: DataFrame, gap: str = "30 minutes",
    watermark: str | None = DEFAULT_WATERMARK,
) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap: events
    whose windows [ts, ts+gap) chain/overlap merge into one session.
    Output: user_id, session start/end, event count, rounded value sum.

    ``watermark=None`` keeps all session state (required for complete-
    mode output: session windows + watermark evicts finalized sessions
    from the state store, silently losing them from complete output —
    observed empirically). Production streaming uses append/update mode
    WITH a watermark so state stays bounded; batch calls ignore both.
    """
    src = (
        events.withWatermark("ts", watermark)
        if events.isStreaming and watermark is not None
        else events
    )
    agg = (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), _half_up_2dp(F.sum("value")).alias("total_value"))
    )
    return agg.select(
        "user_id", *_win_cols(F.col("w")), "n_events", "total_value"
    )
