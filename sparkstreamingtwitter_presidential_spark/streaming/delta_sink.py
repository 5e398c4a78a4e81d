"""Exactly-once streaming sink into the native Delta connector.

Structured Streaming's `foreachBatch` gives at-least-once batch
delivery: after a crash between "sink wrote" and "checkpoint advanced",
the same (batch_id, data) is re-delivered. Delta's answer — the public
protocol's `txn` action — turns that into exactly-once: each commit
records (appId, batch_id), and the sink consults the table's highest
committed txn version before writing, skipping batches already durable.
That check-and-commit is the same recipe the real delta-spark sink uses
(idempotent writes keyed on txnAppId/txnVersion); here it is built on
`sources/delta.py`'s `last_txn_version` / `write_delta(txn=...)`.
The guarantee holds within one checkpoint lineage — batch_id -> data is
deterministic under a preserved checkpoint; if the checkpoint itself is
lost, batches renumber and the job must start a fresh appId (the same
contract the real sink documents for txnAppId).

Scale notes: the txn lookup is driver-side log replay (O(actions since
checkpoint) metadata, amortizable by caching the snapshot); the data
write is a distributed parquet write per micro-batch. Commit atomicity
is the connector's put-if-absent `N.json` — one writer per table on
object stores without a coordinator, same caveat as delta-rs.

Reference scope note: the reference collector appends micro-batches to
plain text part-files with no redelivery story (Collector.scala:84-96);
this sink is the lakehouse-grade upgrade of that path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from sparkstreamingtwitter_presidential_spark.sources.delta import (
    last_txn_version,
    write_delta,
)


def delta_batch_committer(
    table_path: str,
    app_id: str,
    partition_by: list[str] | None = None,
):
    """The `foreachBatch` function: append `batch_df` to the Delta
    table unless a commit tagged (app_id, >= batch_id) already exists
    (i.e. this is a post-crash redelivery). Exposed separately so the
    idempotence contract is directly unit-testable without a stream."""

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        last = last_txn_version(table_path, app_id)
        if last is not None and batch_id <= last:
            return  # replayed batch; its rows are already durable
        write_delta(
            batch_df,
            table_path,
            mode="append",
            partition_by=partition_by,
            txn=(app_id, int(batch_id)),
        )

    return _commit


def write_stream_to_delta(
    stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    app_id: str,
    partition_by: list[str] | None = None,
) -> StreamingQuery:
    """Start an exactly-once streaming append into a Delta table.

    `app_id` must be stable across restarts of the same logical job
    (it namespaces the txn markers; two different jobs writing the same
    table use different app_ids and don't interfere)."""
    return (
        stream.writeStream.foreachBatch(
            delta_batch_committer(table_path, app_id, partition_by)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
