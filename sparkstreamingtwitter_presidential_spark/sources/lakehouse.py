"""Lakehouse-format connectors (Delta / Iceberg / Hudi) — stubbed.

The table-format jars are not on this container's classpath, so these
raise a clear NotImplementedError naming the missing dependency (the
repo-wide policy for absent native deps). The call signatures are the
real ones: in an environment with the jars + catalog conf, each body is
the standard one-liner shown in its docstring.
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


def read_lakehouse(spark: SparkSession, fmt: str, path: str) -> DataFrame:
    """``spark.read.format(fmt).load(path)`` once the jar is present."""
    return spark.read.format(_require(fmt, spark)).load(path)


def write_lakehouse(df: DataFrame, fmt: str, path: str, mode: str = "append") -> None:
    """``df.write.format(fmt).mode(mode).save(path)`` once present."""
    fmt_name = _require(fmt, df.sparkSession)
    df.write.format(fmt_name).mode(mode).save(path)
