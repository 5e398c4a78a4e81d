"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query registry
(``sparkstreamingtwitter_presidential_spark.queries``): every operator implemented from
SURVEY.md §2 registers there once, and this module exposes the registry to
the driver. ``entry`` runs the flagship query (the reference's analytical
core composed: filter NOT NULL -> project -> group-by count -> order ->
limit, reference README.md:149,156,126) at sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Export the vendored protobuf runtime (when the real google.protobuf
# is absent) BEFORE the driver launches its JVM: the JVM's spawned
# transformWithState init worker inherits this process's PYTHONPATH,
# which is what lets the state-v2 graded query run in a foreign
# session. Best-effort — everything except stateful2 works without it.
try:
    from sparkstreamingtwitter_presidential_spark.vendor import ensure_protobuf as _ep

    _ep()
except Exception:
    pass

FLAGSHIP = "flagship_event_type_counts"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _registry():
    from sparkstreamingtwitter_presidential_spark.queries import load_all

    return load_all()


def _utc(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    """Pin the session timezone before running a query: the DuckDB oracle
    reads parquet timestamps UTC-naive, so a driver session configured
    with any other zone would skew date_format/window outputs. The conf
    is runtime-settable and scoped to the session, not the cluster."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # tz-naive parquet reads as TIMESTAMP (not NTZ): watermarks and
        # unix_micros reject NTZ; with UTC pinned the instant is identical
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # right-size shuffles for the fixture scale: a driver session
        # left at the 200 default spends more time scheduling empty
        # tasks than computing (observed on the streaming queries)
        spark.conf.set("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32"))
        return fn(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _utc(_registry()[FLAGSHIP].fn)(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _utc(q.fn) for name, q in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted for non-SQL-expressible
    ops (streaming/ML/LSH) -> driver records a rows-only check."""
    return {name: q.oracle for name, q in _registry().items() if q.oracle is not None}
