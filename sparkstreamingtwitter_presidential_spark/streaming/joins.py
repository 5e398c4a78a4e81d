"""Watermarked stream-stream joins (NEW capability over the reference:
its collector consumes a single stream, Collector.scala:71, so joining
two live streams never arose — but events ⋈ late-arriving enrichment is
a standard ingest-pipeline ask).

Spark buffers BOTH sides in the state store and matches across
micro-batches; without bounds that state is unbounded. Two constraints
bound it (and we always set both):

  * a watermark on each side's event-time column — how late either
    stream may be, and
  * a time-range predicate in the join condition (``right_ts`` within
    ``[left_ts, left_ts + within]``) — how far apart matching rows may
    be in event time.

Together they let Spark evict a buffered row once the global watermark
(min across both inputs) passes the last instant a match could still
arrive — state tracks the lateness horizon, not the stream length,
which is the difference between bounded and unbounded join state at
100 TB/day.

Emission semantics (what the oracle may pin):

  * ``inner``: a pair is emitted in the first micro-batch where both
    rows are present — no watermark wait. A fully drained bounded
    replay therefore equals the batch join exactly (the DuckDB-oracle
    trick, same as streaming/dedup.py).
  * ``left_outer``: the NULL-padded row for an unmatched left row is
    emitted only once the watermark proves no match can arrive, i.e.
    after event time advances past ``left_ts + within + watermark``.
    Rows near the end of a bounded replay never cross that horizon
    unless the replay appends a later sentinel — tests stage one; a
    real deployment's stream simply keeps flowing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: How late either stream may deliver (state-eviction horizon). Far
#: larger than one replay batch's event-time span boundary effects need.
DEFAULT_JOIN_WATERMARK = "1 hour"


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "enr_ts",
    within: str = "30 minutes",
    watermark: str = DEFAULT_JOIN_WATERMARK,
    how: str = "inner",
) -> DataFrame:
    """Join two event-time streams on ``on`` where ``right_ts`` falls in
    ``[left_ts, left_ts + within]``. Both sides are watermarked so join
    state is evictable; sides are aliased ``l`` / ``r`` and the right
    join key is dropped, so callers select unambiguous columns.

    On batch DataFrames this degrades to the identical batch join —
    which IS the drained-replay semantics for ``inner`` (see module
    docstring) and the differential the tests pin.
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    cond = F.expr(
        f"l.{on} = r.{on} AND r.{right_ts} >= l.{left_ts} "
        f"AND r.{right_ts} <= l.{left_ts} + INTERVAL {within}"
    )
    return left.alias("l").join(right.alias("r"), on=cond, how=how).drop(
        F.col(f"r.{on}")
    )
