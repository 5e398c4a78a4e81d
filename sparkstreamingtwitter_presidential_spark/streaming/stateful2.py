"""Arbitrary stateful streaming via transformWithStateInPandas — the
Spark 4 state-v2 API (SPIP SPARK-49564; typed per-key state objects,
TTL, timers) that supersedes applyInPandasWithState for new operators.
This module carries the engine's two canonical shapes on the new API:

* :func:`dedup_stream_ttl` — keep the FIRST event per key, with state
  that EXPIRES after a TTL instead of growing forever. This is the
  production dedup shape for unbounded key spaces: watermark-based
  `dropDuplicates` state lives until the watermark passes (unbounded
  for keys that never recur), while TTL state is O(keys active within
  the window) — the difference between a bounded and an unbounded
  state store at 100 TB/day ingest.
* :func:`running_totals_v2` — the milestone counter's per-key running
  aggregate re-expressed on the new API (ValueState instead of the
  old tuple state), proving parity between the two extension points
  (streaming/stateful.py keeps the applyInPandasWithState original).

Scale shape (both): state is O(distinct keys), batches arrive Arrow-
encoded per key group, and all arithmetic is vectorized numpy/pandas —
no per-row Python in the hot path beyond the state lookup itself.

ENVIRONMENT: the state-v2 Python protocol speaks protobuf to the JVM
state server (`pyspark.sql.streaming.proto.StateMessage_pb2`). Where
the real `google.protobuf` is absent (this container), the repo's
VENDORED minimal protobuf runtime (vendor/protobuf_mini — the public
wire format, differential-tested against the JVM's own parser through
these very operators) takes over, so the full behavioral suite runs
here since r13. Two refusals remain, both UP FRONT by name (never a
mid-stream crash): a JVM that launched before the vendored path export
(its spawned init worker could not import protobuf — create sessions
via session.get_spark), and a non-RocksDB state store provider
(transformWithState needs per-variable column families). The
applyInPandasWithState twin (streaming/stateful.py) has no protobuf
dependency and stays the dependency-free fallback. Since r14 the
driver contract grades this module too (`streaming_state_v2_running_
totals`): `__spark_entry__` exports the vendored path at IMPORT time,
so a foreign grading JVM launched after that import spawns
state-server workers that can import protobuf — the pre-export-JVM
refusal below only fires when the session predates the import.

ProcessingTime note: a TTL query runs batches CONTINUOUSLY (the TTL
clock needs ticks), so bounded drains must poll-and-stop;
processAllAvailable() never settles on it. ttl_ms=None stays on
timeMode None where it does.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)


def state_v2_available() -> bool:
    """True when the transformWithState Python protocol can run here —
    google.protobuf importable, installing the repo's vendored minimal
    protobuf runtime (vendor/protobuf_mini) when the real package is
    absent (r13, lifting the r12 environment gate). A live session's
    Python workers get the vendored package via ensure_protobuf's
    addPyFile ship inside the operator builders."""
    try:
        from sparkstreamingtwitter_presidential_spark.vendor import ensure_protobuf

        ensure_protobuf()
        return True
    except ImportError:
        return False


def _require_state_v2(ctx: str, df: DataFrame | None = None) -> None:
    if not state_v2_available():
        raise NotImplementedError(
            f"{ctx} uses transformWithStateInPandas, whose Python "
            "state protocol requires google.protobuf — not installed "
            "in this environment and the vendored mini runtime failed "
            "to load. Install protobuf (standard on PySpark "
            "clusters), or use the applyInPandasWithState "
            "equivalents in streaming/stateful.py"
        )
    if df is not None:
        # executor-side imports happen in Python workers the JVM
        # spawns: when the vendored runtime is in play, ship it to
        # them (no-op when the real protobuf is installed)
        from sparkstreamingtwitter_presidential_spark.vendor import ensure_protobuf

        spark = df.sparkSession
        if ensure_protobuf(spark) == "vendored":
            # the JVM spawns the transformWithState driver-side Python
            # worker with ITS OWN env: if the JVM launched before the
            # vendored path export, that worker can't import protobuf
            # and the query HANGS in init — refuse up front instead
            jvm_pp = spark._jvm.System.getenv("PYTHONPATH") or ""
            from sparkstreamingtwitter_presidential_spark.vendor import _MINI_DIR

            if _MINI_DIR not in jvm_pp.split(os.pathsep):
                raise NotImplementedError(
                    f"{ctx}: the vendored protobuf runtime is in use "
                    "but this JVM launched without it on PYTHONPATH — "
                    "its transformWithState init worker would hang. "
                    "Create the session via "
                    "sparkstreamingtwitter_presidential_spark.session.get_spark (which exports "
                    "the path first), or install the real protobuf"
                )
        # transformWithState needs per-state-variable column families,
        # which only the RocksDB provider supports — refuse up front by
        # name (the module's design rule: never a mid-stream crash)
        provider = spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", ""
        )
        if "RocksDB" not in (provider or ""):
            raise NotImplementedError(
                f"{ctx} needs the RocksDB state store (multiple column "
                "families); set spark.sql.streaming.stateStore."
                "providerClass=org.apache.spark.sql.execution.streaming"
                ".state.RocksDBStateStoreProvider before starting the "
                "query (rocksdbjni ships with Spark)"
            )


class _FirstSeenTTL(StatefulProcessor):
    """ValueState('seen') with a TTL: a key group's first batch emits
    its earliest row (by ``order_col``) and marks the key seen; later
    batches for a still-live key emit nothing. When the TTL lapses the
    state store drops the key and the next occurrence emits again —
    exactly the at-most-once-per-window contract."""

    def __init__(self, order_col: str, ttl_ms: int | None):
        self._order = order_col
        self._ttl = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState(
            "seen", "seen boolean", ttlDurationMs=self._ttl
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._seen.exists():
            return
        batch = pd.concat(list(rows), ignore_index=True)
        if len(batch) == 0:
            return
        self._seen.update((True,))
        first = batch.sort_values(self._order).head(1)
        yield first

    def close(self) -> None:
        pass


def dedup_stream_ttl(
    events: DataFrame,
    keys: list[str],
    order_col: str = "ts",
    ttl_ms: int | None = 3_600_000,
) -> DataFrame:
    """Streaming first-event-per-key dedup with TTL-expiring state.

    ``ttl_ms=None`` keeps state forever (exact dedup over the whole
    stream — only safe for bounded key spaces); a finite TTL bounds
    the store to keys seen within the trailing window, the shape a
    perpetual ingest pipeline needs. Output schema = input schema.
    TTL state requires ProcessingTime time mode (the TTL clock is the
    processor's, per the API contract)."""
    _require_state_v2("dedup_stream_ttl", events)
    schema = events.schema
    # ProcessingTime ONLY when a TTL is set: the TTL clock needs it,
    # but under that mode the engine keeps scheduling batches, so a
    # bounded drain must use trigger(availableNow=True) — while the
    # ttl_ms=None exact-dedup shape stays on timeMode None, where
    # processAllAvailable() settles
    return events.groupBy(*keys).transformWithStateInPandas(
        statefulProcessor=_FirstSeenTTL(order_col, ttl_ms),
        outputStructType=schema,
        outputMode="append",
        timeMode="ProcessingTime" if ttl_ms is not None else "None",
    )


class _RunningTotals(StatefulProcessor):
    """The milestone counter on state-v2: one ValueState holding
    (count, value_sum); vectorized prefix sums; emits a row per
    crossed multiple of ``emit_every``."""

    def __init__(self, emit_every: int):
        self._emit_every = emit_every

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._acc = handle.getValueState(
            "acc", "count long, value_sum double"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        # One protocol round trip, not two: get() already answers the
        # existence question (None when the variable is unset), so the
        # exists() probe doubled the per-key state-server traffic —
        # the dominant cost of this operator at high key cardinality
        # (guide §4: the boundary crossings ARE the price; r15).
        prev = self._acc.get()
        count, value_sum = prev if prev is not None else (0, 0.0)
        batch = pd.concat(list(rows), ignore_index=True)
        if len(batch) == 0:
            return
        batch = batch.sort_values("ts")
        counts = count + np.arange(1, len(batch) + 1, dtype=np.int64)
        vals = batch["value"].astype("float64").to_numpy()
        sums = np.cumsum(np.concatenate(([value_sum], vals)))[1:]
        self._acc.update((int(counts[-1]), float(sums[-1])))
        mask = counts % self._emit_every == 0
        if mask.any():
            # cross-engine rounding rule (DESIGN.md): floor(x*100+0.5)
            totals = np.floor(sums[mask] * 100.0 + 0.5) / 100.0
            yield pd.DataFrame(
                {
                    "user_id": np.full(
                        int(mask.sum()), key[0], dtype=np.int64
                    ),
                    "milestone": counts[mask],
                    "total_value": totals,
                }
            )

    def close(self) -> None:
        pass


def running_totals_v2(events: DataFrame, emit_every: int = 50) -> DataFrame:
    """transformWithStateInPandas twin of
    streaming/stateful.milestone_counter — identical emission rule, so
    the two extension points are differential-testable against each
    other (and against the batch recomputation)."""
    _require_state_v2("running_totals_v2", events)
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(emit_every),
        outputStructType="user_id long, milestone long, total_value double",
        outputMode="append",
        timeMode="None",
    )
