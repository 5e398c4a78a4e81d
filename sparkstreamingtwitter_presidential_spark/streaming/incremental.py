"""Incremental Delta -> Delta ETL with exactly-once delivery and NO
separate checkpoint store.

The trick: the consumer's high-water mark (last source version
processed) is recorded in the DESTINATION table's own ``txn`` action,
inside the same atomic commit as the transformed data. A crash at any
point either committed nothing (poll retries from the old watermark) or
committed data+watermark together (poll skips it) — there is no window
where data is durable but the watermark is not, which is the window a
file-based checkpoint has to fence with idempotence tricks. This is the
"store your offsets in the sink transaction" pattern, radically simpler
than the foreachBatch + txn-dedup recipe in delta_sink.py because the
source (an append-only Delta log) already names its increments.

Scale shape per poll: O(actions in range) driver metadata
(`delta_changes`), a distributed scan of ONLY the new files, one
distributed append. Aggregating transforms are per-increment (a poll
sees only new rows); a rollup consumer stores partial aggregates and
compacts downstream — the same contract as any streaming sink in
update mode.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sparkstreamingtwitter_presidential_spark.sources.delta import (
    delta_changes,
    last_txn_version,
    table_version,
    write_delta,
)


def run_delta_incremental(
    spark: SparkSession,
    source_path: str,
    dest_path: str,
    app_id: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    partition_by: list[str] | None = None,
    max_commits: int | None = None,
) -> int:
    """One poll of the incremental pipeline. Returns the number of new
    SOURCE commits processed (0 = caught up; loop until 0 for
    Trigger.AvailableNow semantics).

    ``transform`` maps the increment DataFrame (which carries
    ``_commit_version``) to the rows to append; default drops the
    version column and forwards rows unchanged. ``max_commits`` caps
    how many source commits one poll consumes (bounds poll latency and
    memory on a backlogged source; the watermark advances per poll, so
    a capped poll is just a shorter exactly-once step)."""
    last = last_txn_version(dest_path, app_id)
    from_v = last if last is not None else -1
    src_v = table_version(source_path)
    if max_commits is not None:
        src_v = min(src_v, from_v + max_commits)
    if src_v <= from_v:
        return 0
    inc = delta_changes(spark, source_path, from_version=from_v, to_version=src_v)
    out = transform(inc) if transform is not None else inc.drop("_commit_version")
    write_delta(
        out,
        dest_path,
        mode="append",
        partition_by=partition_by,
        txn=(app_id, src_v),
    )
    return src_v - from_v


def drain_delta_incremental(
    spark: SparkSession,
    source_path: str,
    dest_path: str,
    app_id: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    partition_by: list[str] | None = None,
    max_commits: int | None = None,
) -> int:
    """Poll until caught up (Trigger.AvailableNow). Returns total source
    commits processed across polls."""
    total = 0
    while True:
        n = run_delta_incremental(
            spark,
            source_path,
            dest_path,
            app_id,
            transform=transform,
            partition_by=partition_by,
            max_commits=max_commits,
        )
        if n == 0:
            return total
        total += n
