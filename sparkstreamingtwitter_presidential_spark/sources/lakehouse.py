"""Lakehouse-format connectors (Delta / Iceberg / Hudi).

Delta and Iceberg are REAL here even without their jars:
`sources/delta.py` implements the Delta transaction-log protocol
natively (JSON/checkpoint replay + plain parquet IO) and
`sources/iceberg.py` implements the Iceberg table spec's
Hadoop-catalog layout (metadata.json + avro manifest lists/manifests
via the package's own avro codec), so `read_lakehouse` /
`write_lakehouse` fall back to them when the classpath probes fail.
Hudi (round 7) is native too: `sources/hudi.py` implements the CoW
timeline + file-group/file-slice layout (record-key upserts, time
travel, incremental pull, clean/rollback); the facade falls back to it
when the jar probe fails. Writing through the facade requires a
``record_key`` kwarg (Hudi's mandatory record key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = {
    "delta": ("delta", "io.delta:delta-spark"),
    "iceberg": ("iceberg", "org.apache.iceberg:iceberg-spark-runtime"),
    "hudi": ("hudi", "org.apache.hudi:hudi-spark-bundle"),
}


def _require(fmt: str, spark: SparkSession) -> str:
    name, pkg = _FORMATS[fmt]
    try:
        spark._jvm.java.lang.Class.forName(  # cheap classpath probe
            {
                "delta": "io.delta.tables.DeltaTable",
                "iceberg": "org.apache.iceberg.Table",
                "hudi": "org.apache.hudi.DataSourceReadOptions",
            }[fmt]
        )
    except Exception as e:
        raise NotImplementedError(
            f"{fmt} support needs the {pkg} jar on the Spark classpath "
            f"(plus its catalog config); not present in this environment"
        ) from e
    return name


def read_lakehouse(
    spark: SparkSession, fmt: str, path: str, **kwargs
) -> DataFrame:
    """``spark.read.format(fmt).load(path)``; without the jar, the
    native readers (`sources/delta.py` / `iceberg.py` / `hudi.py`).
    ``kwargs`` always route to the NATIVE reader (version=, timestamp=,
    snapshot_id=, ref=, skip_ranges=, as_of=, partition_filter=, ...)
    — the jar path takes no options here, so passing any option picks
    the native implementation rather than silently dropping it."""
    try:
        if kwargs:
            raise NotImplementedError("kwargs route to the native readers")
        return spark.read.format(_require(fmt, spark)).load(path)
    except NotImplementedError:
        if fmt == "delta":
            from sparkstreamingtwitter_presidential_spark.sources.delta import read_delta

            return read_delta(spark, path, **kwargs)
        if fmt == "iceberg":
            from sparkstreamingtwitter_presidential_spark.sources.iceberg import read_iceberg

            return read_iceberg(spark, path, **kwargs)
        if fmt == "hudi":
            from sparkstreamingtwitter_presidential_spark.sources.hudi import read_hudi

            return read_hudi(spark, path, **kwargs)
        raise


def write_lakehouse(
    df: DataFrame,
    fmt: str,
    path: str,
    mode: str = "append",
    record_key: str | None = None,
) -> None:
    """``df.write.format(fmt).mode(mode).save(path)``; for delta
    without the jar, the native log-commit writer."""
    try:
        fmt_name = _require(fmt, df.sparkSession)
    except NotImplementedError:
        if fmt == "delta":
            from sparkstreamingtwitter_presidential_spark.sources.delta import write_delta

            write_delta(df, path, mode=mode)
            return
        if fmt == "iceberg":
            from sparkstreamingtwitter_presidential_spark.sources.iceberg import write_iceberg

            write_iceberg(df, path, mode=mode)
            return
        if fmt == "hudi":
            if record_key is None:
                raise ValueError(
                    "hudi writes need record_key= (Hudi's mandatory "
                    "record key field)"
                )
            from sparkstreamingtwitter_presidential_spark.sources.hudi import write_hudi

            write_hudi(df, path, record_key=record_key, mode=mode)
            return
        raise
    df.write.format(fmt_name).mode(mode).save(path)
