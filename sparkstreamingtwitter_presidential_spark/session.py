"""SparkSession factory.

Single place where engine-wide physical-execution policy lives, so every
entry point (driver contract, tests, bench) runs the same way:

* AQE on (runtime shuffle-partition coalescing, skew-join splitting) —
  at 100 TB the static ``spark.sql.shuffle.partitions`` is always wrong
  for some stage; AQE re-plans from runtime statistics.
* UTC session timezone — parquet timestamps are naive; the DuckDB oracle
  reads them as UTC-naive, so Spark must too.
* Arrow enabled — every Pandas-UDF / toPandas boundary is Arrow-batched.
* Shuffle partitions sized to local cores; on a real cluster this is
  overridden per-deploy (and AQE coalesces down from it anyway).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "sparkstreamingtwitter_presidential_spark",
              cpus: str | int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local-mode testing uses ``local[$SPARK_GRAFT_CPUS]``; the same builder
    config is valid unchanged on a cluster master (the ``master`` call is
    skipped if one is already set by spark-submit).
    """
    cpus = str(cpus or DEFAULT_CPUS)
    # make google.protobuf importable BEFORE the JVM launches: the
    # transformWithState driver-side Python worker is spawned with the
    # JVM's env, so the vendored runtime's PYTHONPATH export must
    # precede session creation (no-op when protobuf is installed or a
    # JVM already runs — the late-session case refuses by name in
    # streaming/stateful2._require_state_v2)
    try:
        from sparkstreamingtwitter_presidential_spark.vendor import ensure_protobuf

        ensure_protobuf()
    except ImportError:
        pass
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Join strategy (guide §3.1/§9): let the planner pick shuffled
        # hash join when its size conditions hold instead of always
        # sorting both sides for sort-merge, and let AQE rewrite an
        # SMJ to SHJ at runtime when every post-shuffle partition fits
        # a 64 MB local map (runtime statistics, so the choice stays
        # safe at any scale; skew-split still applies first). At sf0.1
        # this is a scale default, not a measured local win: the TPC-H
        # joins are already broadcast under the 64 MB threshold, and the
        # only static plan it flips is search_hybrid_rrf (SMJ->SHJ, see
        # OPTIMIZATION_r15.md c553691); its value is on real table stats
        # at production scale where big-big SMJs appear.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # tz-naive parquet must read as session-tz TIMESTAMP, not
        # TIMESTAMP_NTZ: watermarks/unix_micros reject NTZ, and with the
        # session tz pinned UTC the two label the same instant anyway.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    )
    if "SPARK_MASTER" not in os.environ and not os.environ.get("SPARK_SUBMIT"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
