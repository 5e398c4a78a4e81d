"""Custom stateful streaming operator via applyInPandasWithState:
per-user running counters that emit a row whenever a user crosses each
``emit_every`` events. The kind of arbitrary per-key state Structured
Streaming can't express with window aggregations — the extension point
SURVEY.md §2.7 reserves for genuinely non-declarative semantics.

State is one (count, value_sum) pair per user — O(keys), not O(events)
— and lives in the state store (RocksDB on a real cluster), so the
operator scales with distinct users, not stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, milestone long, total_value double"
STATE_SCHEMA = "count long, value_sum double"


def milestone_counter(events: DataFrame, emit_every: int = 50) -> DataFrame:
    """Streaming: emit (user_id, milestone, total_value) each time a
    user's cumulative event count crosses a multiple of ``emit_every``."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        count, value_sum = state.get if state.exists else (0, 0.0)
        # The shuffle into the stateful operator does NOT preserve order;
        # sort the batch's rows by event time so milestone totals are
        # deterministic prefix sums (batches themselves arrive in
        # event-time order from the range-partitioned replay source).
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        if len(batch) == 0:
            state.update((count, value_sum))
            return
        # Vectorized prefix sums over the whole key-batch: a hot user's
        # batch costs O(n) numpy ops, never a Python-level per-row loop.
        # Seeding the cumsum with the carried state keeps the exact
        # left-to-right FP association of per-row accumulation.
        counts = count + np.arange(1, len(batch) + 1, dtype=np.int64)
        vals = batch["value"].astype("float64").to_numpy()
        sums = np.cumsum(np.concatenate(([value_sum], vals)))[1:]
        mask = counts % emit_every == 0
        state.update((int(counts[-1]), float(sums[-1])))
        if mask.any():
            # Cross-engine rounding rule (DESIGN.md): floor(x*100+0.5)/100,
            # never Python round() (banker's) / Spark round() (HALF_UP).
            totals = np.floor(sums[mask] * 100.0 + 0.5) / 100.0
            yield pd.DataFrame(
                {
                    "user_id": np.full(int(mask.sum()), user_id, dtype=np.int64),
                    "milestone": counts[mask],
                    "total_value": totals,
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
