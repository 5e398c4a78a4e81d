"""Named-query registry: the single source of truth behind the driver
contract (``__spark_entry__.queries()`` / ``oracle_sql()``), the pytest
oracle-differential suite, and ``bench.py``.

Every operator claimed in SURVEY.md §2 registers here as:
  * a callable ``(spark, sf_dir) -> DataFrame`` built with the DataFrame /
    Spark SQL API, and
  * (when SQL-expressible) an equivalent ANSI-SQL string DuckDB can run on
    the same parquet tables, producing identical column NAMES (the driver
    sorts columns by name before value-hashing, so aliases must agree).

Non-SQL-expressible ops (stateful streaming, iterative ML, LSH) register
with ``oracle=None`` → the driver records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered fixture views
    doc: str = ""


QUERIES: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a named query (and its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: registration) and return
    the full registry. Import errors in one module must not take down the
    whole contract, but we surface them loudly."""
    import importlib

    modules = [
        "sparkstreamingtwitter_presidential_spark.queries.parity",
        "sparkstreamingtwitter_presidential_spark.queries.analytics",
        "sparkstreamingtwitter_presidential_spark.queries.advanced",
        "sparkstreamingtwitter_presidential_spark.queries.sessions",
        "sparkstreamingtwitter_presidential_spark.queries.relational2",
        "sparkstreamingtwitter_presidential_spark.queries.functions_sweep",
        "sparkstreamingtwitter_presidential_spark.queries.tpch_more",
        "sparkstreamingtwitter_presidential_spark.queries.text_stats",
        "sparkstreamingtwitter_presidential_spark.queries.dedup",
        "sparkstreamingtwitter_presidential_spark.queries.similarity",
        "sparkstreamingtwitter_presidential_spark.queries.streaming",
        "sparkstreamingtwitter_presidential_spark.queries.ml",
        "sparkstreamingtwitter_presidential_spark.queries.multimodal",
    ]
    for m in modules:
        try:
            importlib.import_module(m)
        except ModuleNotFoundError as e:
            if e.name and e.name.startswith("sparkstreamingtwitter_presidential_spark"):
                continue  # module not built yet (incremental rounds)
            raise
    return QUERIES
