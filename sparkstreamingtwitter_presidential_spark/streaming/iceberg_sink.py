"""Exactly-once streaming sink into the native Iceberg connector —
the Iceberg twin of `streaming/delta_sink.py`.

Structured Streaming's `foreachBatch` gives at-least-once batch
delivery; Iceberg's public answer is the SNAPSHOT SUMMARY: the real
Spark sink records its streaming epoch id (and Flink its checkpoint
id) as summary properties of the very snapshot that commits the data,
so marker and rows are one atomic commit. This sink does the same
through `sources/iceberg.py`: each append carries
`streaming-app-id` / `streaming-batch-id` summary properties
(`write_iceberg(summary_extra=...)`), and the committer consults
`last_committed_batch` before writing — a redelivered batch after a
crash between "sink committed" and "checkpoint advanced" is skipped,
never re-appended.

The guarantee holds within one checkpoint lineage (batch_id -> data is
deterministic under a preserved checkpoint); a lost checkpoint
renumbers batches and the job must start a fresh app_id — the same
contract the Delta sink documents for txnAppId. Marker retention:
`expire_snapshots` must keep at least one marker-bearing snapshot per
app (keep_last >= 1 always does for a live stream, since the newest
append IS marker-bearing).

Scale notes: the marker lookup is a driver-side metadata read
(O(snapshots) over the current metadata json — no manifest I/O); the
data write is a distributed parquet write per micro-batch; commit
atomicity is the connector's put-if-absent metadata version — one
writer per table on object stores without a catalog, same caveat as
the Delta twin.

Reference scope note: the reference collector appends micro-batches to
plain text part-files with no redelivery story (Collector.scala:84-96);
this sink is the lakehouse-grade upgrade of that path, completing the
exactly-once family (Delta append, Delta upsert, Iceberg append).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
    last_committed_batch,
    write_iceberg,
)


def iceberg_batch_committer(
    table_path: str,
    app_id: str,
    partition_by: list[str] | None = None,
):
    """The `foreachBatch` function: append `batch_df` to the Iceberg
    table unless a snapshot tagged (app_id, >= batch_id) already
    exists (a post-crash redelivery). Exposed separately so the
    idempotence contract is directly unit-testable without a stream."""

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        last = last_committed_batch(table_path, app_id)
        if last is not None and batch_id <= last:
            return  # replayed batch; its rows are already durable
        write_iceberg(
            batch_df,
            table_path,
            mode="append",
            partition_by=partition_by,
            summary_extra={
                "streaming-app-id": app_id,
                "streaming-batch-id": str(int(batch_id)),
            },
        )

    return _commit


def write_stream_to_iceberg(
    stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    app_id: str,
    partition_by: list[str] | None = None,
) -> StreamingQuery:
    """Start an exactly-once streaming append into an Iceberg table.

    `app_id` must be stable across restarts of the same logical job
    (it namespaces the markers; two jobs writing the same table under
    different app_ids don't interfere)."""
    return (
        stream.writeStream.foreachBatch(
            iceberg_batch_committer(table_path, app_id, partition_by)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def iceberg_upsert_committer(
    spark,
    table_path: str,
    keys: list[str],
    app_id: str,
    order_col: str | None = None,
):
    """The CDC-shaped sibling (the Iceberg twin of
    `delta_upsert.delta_upsert_committer`): each micro-batch MERGEs
    into the table (update matched keys, insert new ones), the marker
    riding the merge snapshot's summary. With ``order_col`` the batch
    first collapses to the LAST row per key (same last-change-wins
    reduction, reused from delta_upsert.collapse_latest). A batch that
    merges nothing commits nothing — replaying a no-op is a no-op, so
    skipping the marker there is safe (see merge_iceberg)."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import merge_iceberg
    from sparkstreamingtwitter_presidential_spark.streaming.delta_upsert import (
        collapse_latest,
    )

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        last = last_committed_batch(table_path, app_id)
        if last is not None and batch_id <= last:
            return  # post-crash redelivery; this merge is already durable
        if order_col is not None:
            batch_df = collapse_latest(batch_df, keys, order_col)
        merge_iceberg(
            spark,
            table_path,
            batch_df,
            keys,
            when_matched="update",
            insert_not_matched=True,
            summary_extra={
                "streaming-app-id": app_id,
                "streaming-batch-id": str(int(batch_id)),
            },
        )

    return _commit


def upsert_stream_to_iceberg(
    stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    keys: list[str],
    app_id: str,
    order_col: str | None = None,
) -> StreamingQuery:
    """Start an exactly-once streaming upsert (MERGE per micro-batch)
    into an Iceberg table. The target table must already exist (MERGE
    needs a schema to probe); seed it with an empty or initial
    `write_iceberg` first — the same contract as the real sink."""
    spark = stream.sparkSession
    return (
        stream.writeStream.foreachBatch(
            iceberg_upsert_committer(spark, table_path, keys, app_id, order_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
