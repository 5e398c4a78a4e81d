"""Exactly-once streaming sink into the native Hudi connector — the
third member of the exactly-once family (Delta append/upsert, Iceberg
append/upsert twins in `streaming/delta_sink.py`, `delta_upsert.py`,
`iceberg_sink.py`).

Structured Streaming's `foreachBatch` gives at-least-once batch
delivery; Hudi's public answer is COMMIT METADATA: the real writers
(DeltaStreamer checkpoints, the Spark streaming sink's batch ids)
record their progress marker in the `.commit` file's `extraMetadata`,
so marker and rows become durable in the same O_EXCL completion. This
sink does the same through `sources/hudi.py`: each INSERT/UPSERT
commit carries `streaming-app-id` / `streaming-batch-id` in
`extraMetadata` (`write_hudi(extra_metadata=...)`), and the committer
consults `last_committed_batch` before writing — a redelivered batch
after a crash between "sink committed" and "checkpoint advanced" is
skipped, never re-applied.

The guarantee holds within one checkpoint lineage (batch_id -> data is
deterministic under a preserved checkpoint); a lost checkpoint
renumbers batches and the job must start a fresh app_id — the same
contract the Delta and Iceberg twins document. Marker retention:
clean_hudi retires data slices but never timeline files, so markers
outlive any cleaning; a future timeline-archival op must keep the
newest marker-bearing commit per app.

Scale notes: the marker lookup is a driver-side metadata read
(O(commits) over the active timeline, no data I/O); the data write is
the connector's single-job bulk committer per micro-batch; commit
atomicity is the O_EXCL `.commit` creation — one writer per table on
object stores without a lock provider, same caveat as the twins.

Reference scope note: the reference collector appends micro-batches to
plain text part-files with no redelivery story (Collector.scala:84-96);
this sink completes the exactly-once family's third format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from sparkstreamingtwitter_presidential_spark.sources.hudi import (
    last_committed_batch,
    upsert_hudi,
    write_hudi,
)


def hudi_batch_committer(
    table_path: str,
    record_key: str,
    app_id: str,
    partition_by: str | None = None,
    n_file_groups: int = 1,
):
    """The `foreachBatch` function: INSERT-append `batch_df` into the
    Hudi table unless a completed commit tagged (app_id, >= batch_id)
    already exists (a post-crash redelivery). Exposed separately so
    the idempotence contract is directly unit-testable without a
    stream. The first batch creates the table (record_key + partition
    spec fixed then, the connector's contract)."""

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        last = last_committed_batch(table_path, app_id)
        if last is not None and batch_id <= last:
            return  # replayed batch; its rows are already durable
        write_hudi(
            batch_df,
            table_path,
            record_key=record_key,
            mode="append",
            n_file_groups=n_file_groups,
            partition_by=partition_by,
            extra_metadata={
                "streaming-app-id": app_id,
                "streaming-batch-id": str(int(batch_id)),
            },
        )

    return _commit


def write_stream_to_hudi(
    stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    record_key: str,
    app_id: str,
    partition_by: str | None = None,
    n_file_groups: int = 1,
) -> StreamingQuery:
    """Start an exactly-once streaming INSERT-append into a Hudi table.

    `app_id` must be stable across restarts of the same logical job
    (it namespaces the markers; two jobs writing the same table under
    different app_ids don't interfere)."""
    return (
        stream.writeStream.foreachBatch(
            hudi_batch_committer(
                table_path, record_key, app_id, partition_by, n_file_groups
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def hudi_upsert_committer(
    spark,
    table_path: str,
    app_id: str,
    record_key: str | None = None,
    order_col: str | None = None,
):
    """The CDC-shaped sibling (the Hudi twin of
    `delta_upsert.delta_upsert_committer`): each micro-batch UPSERTs
    into the table by record key — Hudi's native core write op, no
    separate MERGE needed — with the marker riding the commit's
    extraMetadata. With ``order_col`` the batch first collapses to the
    LAST row per key (same last-change-wins reduction, reused from
    delta_upsert.collapse_latest). An empty batch commits nothing
    (upsert_hudi writes no slices and records no marker) — replaying
    a no-op is a no-op, so the missing marker there is safe, same as
    merge_iceberg. The target table must already exist (UPSERT reads
    the snapshot to target file groups); seed it with an initial
    write_hudi first — the same contract as the Iceberg upsert sink."""
    from sparkstreamingtwitter_presidential_spark.sources.hudi import _load_props
    from sparkstreamingtwitter_presidential_spark.streaming.delta_upsert import (
        collapse_latest,
    )

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        last = last_committed_batch(table_path, app_id)
        if last is not None and batch_id <= last:
            return  # post-crash redelivery; this upsert is already durable
        key = record_key or _load_props(table_path).get(
            "hoodie.table.recordkey.fields"
        )
        if order_col is not None and key is not None:
            batch_df = collapse_latest(batch_df, [key], order_col)
        upsert_hudi(
            spark,
            table_path,
            batch_df,
            record_key=record_key,
            extra_metadata={
                "streaming-app-id": app_id,
                "streaming-batch-id": str(int(batch_id)),
            },
        )

    return _commit


def upsert_stream_to_hudi(
    stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    app_id: str,
    record_key: str | None = None,
    order_col: str | None = None,
) -> StreamingQuery:
    """Start an exactly-once streaming upsert (record-key UPSERT per
    micro-batch) into an existing Hudi table."""
    spark = stream.sparkSession
    return (
        stream.writeStream.foreachBatch(
            hudi_upsert_committer(
                spark, table_path, app_id, record_key, order_col
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
