"""The reference's streaming collector re-expressed in Structured
Streaming (SURVEY.md §2.6 ST1-ST7).

Reference loop (Collector.scala:84-102): per micro-batch — count, log,
repartition, append to a text file, accumulate a driver-side total, and
``System.exit`` once N tweets are collected. Structural upgrades over
the reference, per SURVEY.md §4 "known bugs":

  * checkpointing ON (the reference commented it out, ST4) -> restart
    recovery + exactly-once file sink (ST6) instead of a fixed output
    path overwritten every batch;
  * the per-batch count is computed once (the reference ran the count
    job twice, A1);
  * stop-after-N is a graceful ``query.stop()`` after the batch commits
    (ST3) rather than a mid-batch hard exit, so counts are >= N by at
    most one batch.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CollectorResult:
    rows_collected: int = 0
    batches: int = 0
    batch_counts: list[int] = field(default_factory=list)


def run_bounded_collector(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    stop_after: int,
    partitions: int = 1,
    timeout_s: float = 120.0,
    trigger_interval: str | None = None,
) -> CollectorResult:
    """Run the collector until >= ``stop_after`` rows are written, then
    stop gracefully. Returns driver-side counters (A5 parity).

    The sink is ``foreachBatch``: count once (A1 fix), repartition to the
    configured output-partition count (X1, reference CLI arg 3), append
    parquet. The foreachBatch function runs on the driver, so the plain
    closure counter IS the reference's driver-side accumulation
    (Collector.scala:12,88) without a separate accumulator.
    """
    result = CollectorResult()

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()  # once, not twice (reference bug A1)
        if n == 0:  # F3: non-empty-batch guard
            return
        batch_df.repartition(partitions).write.mode("append").parquet(out_dir)
        result.rows_collected += n
        result.batches += 1
        result.batch_counts.append(n)

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_interval:  # ST1: the reference's batch-interval CLI arg
        writer = writer.trigger(processingTime=trigger_interval)
    q = writer.start()
    try:
        deadline = time.monotonic() + timeout_s
        while q.isActive and time.monotonic() < deadline:
            if result.rows_collected >= stop_after:
                break  # ST3: graceful stop after the batch committed
            # Drained-replay exit: only trustworthy after the first batch
            # has committed — right after start() the source hasn't listed
            # its files yet and reports isDataAvailable=False, so checking
            # it cold would exit before any data was processed (observed
            # as a cold-JVM flake).
            if (
                q.lastProgress is not None
                and not q.status["isDataAvailable"]
                and not q.status["isTriggerActive"]
            ):
                time.sleep(0.2)
                if not q.status["isDataAvailable"]:
                    break
            time.sleep(0.1)
    finally:
        q.stop()
        q.awaitTermination(30)
    return result
