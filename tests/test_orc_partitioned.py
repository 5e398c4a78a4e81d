"""ORC interchange and hive-partitioned layout contracts: hostile
content survives the ORC roundtrip (columnar formats have no
NULL-vs-empty ambiguity), and the partitioned read prunes directories
via PartitionFilters, never rows."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sparkstreamingtwitter_presidential_spark.sources.orc import read_orc, write_orc

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("text", StringType()),
        StructField("score", DoubleType()),
    ]
)


def test_orc_roundtrip_hostile_content(spark, tmp_path):
    rows = [
        Row(id=1, text="line1\nline2, with comma", score=0.5),
        Row(id=2, text='embedded "quotes" and ,,, commas', score=None),
        Row(id=3, text="unicode: héllo — 中文 🚀", score=-1.25),
        Row(id=4, text=None, score=1.0),
        Row(id=5, text="", score=2.0),  # empty string stays distinct from NULL
    ]
    p = str(tmp_path / "d")
    write_orc(spark.createDataFrame(rows, SCHEMA), p)
    got = sorted(read_orc(spark, p, SCHEMA).collect(), key=lambda r: r["id"])
    assert [tuple(r) for r in got] == [tuple(r) for r in rows]


def test_orc_n_files_controls_parallelism(spark, tmp_path):
    import glob

    p = str(tmp_path / "d")
    df = spark.range(1000).select(
        F.col("id"), F.lit("t").alias("text"), F.lit(1.0).alias("score")
    )
    write_orc(df, p, n_files=3)
    assert len(glob.glob(f"{p}/part-*.orc")) == 3
    assert read_orc(spark, p).count() == 1000


def test_partitioned_layout_prunes_directories(spark, tmp_path):
    """A partition-column filter must appear as PartitionFilters on the
    scan (directory pruning before any file opens) and the pruned read
    must still return every matching row."""
    p = str(tmp_path / "d")
    df = spark.createDataFrame(
        [Row(id=i, grp=f"g{i % 4}", v=float(i)) for i in range(400)]
    )
    df.write.mode("overwrite").partitionBy("grp").parquet(p)
    back = spark.read.parquet(p).filter(F.col("grp").isin("g1", "g2"))
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "grp" in plan.split("PartitionFilters")[1].split("]")[0]
    got = back.groupBy("grp").count().collect()
    assert {(r["grp"], r["count"]) for r in got} == {("g1", 100), ("g2", 100)}
