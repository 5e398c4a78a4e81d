"""Streaming deduplication (NEW capability over the reference; the
batch/incremental paths live in operators/dedup.py).

A training-data ingest stream re-delivers records: at-least-once
sources, backfill overlaps, producer retries. Spark's
``dropDuplicatesWithinWatermark`` is the bounded-state answer — the
first arrival of each key is emitted immediately (it is a stateful
filter, not an aggregation, so append mode emits without waiting for
window finalization), and later copies are dropped for as long as the
key's state lives. The watermark bounds that state: a key is evictable
once the event-time watermark passes its last-seen timestamp plus the
delay, so state size tracks the duplicate-arrival horizon, not the
corpus — the difference between bounded and unbounded dedup state at
100 TB/day.

Contract (and the driver-oracle trick): if every duplicate arrives
within the watermark delay of its first copy — true by construction
for producer retries and for our replay staging, which duplicates rows
inside the same time-sliced file — the streamed result is EXACTLY the
batch ``dropDuplicates`` of the drained input, which is what the DuckDB
oracle and the differential test pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_DEDUP_WATERMARK = "10 minutes"


def streaming_exact_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = DEFAULT_DEDUP_WATERMARK,
) -> DataFrame:
    """Drop re-deliveries of the same key from an event stream, keeping
    each key's first-arriving row. State per key is evicted once the
    watermark passes; duplicates separated by more than the watermark
    delay are NOT caught (that regime is batch/incremental dedup's job —
    see operators/dedup.py).

    On a batch DataFrame this degrades to plain dropDuplicates, which is
    exactly the replay-drained semantics the oracle checks."""
    if not stream.isStreaming:
        return stream.dropDuplicates(key_cols)
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
