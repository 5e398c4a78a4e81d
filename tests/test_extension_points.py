"""Extension-point tests: the sanctioned pandas_udf shape, the builtin
global z-score it's contrasted with, and the lakehouse facade (delta
routes to the native reader for all three formats sans jars)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.functions.extension import global_zscore, zscore
from sparkstreamingtwitter_presidential_spark.sources.lakehouse import read_lakehouse

SF_DIR = "/root/testdata/sf0.001"


def test_pandas_udf_zscore_batch_semantics(spark):
    df = spark.createDataFrame([(float(x),) for x in range(10)], "v double").coalesce(1)
    got = [r.z for r in df.select(zscore("v").alias("z")).collect()]
    mu, sigma = 4.5, math.sqrt(sum((x - 4.5) ** 2 for x in range(10)) / 10)
    want = [(x - mu) / sigma for x in range(10)]
    assert all(abs(g - w) < 1e-9 for g, w in zip(got, want))


def test_global_zscore_builtin_exact(spark):
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    out = global_zscore(c, "c_acctbal")
    stats = out.agg(
        F.round(F.avg("zscore"), 6).alias("mu"),
        F.round(F.stddev_pop("zscore"), 6).alias("sigma"),
    ).collect()[0]
    assert stats.mu == 0.0 and abs(stats.sigma - 1.0) < 1e-6
    assert out.count() == c.count()


def test_lakehouse_stub_raises_with_named_dep(spark):
    # since r7 ALL THREE formats route native without jars; a missing
    # path is a table-level error, never a missing-dependency one
    with pytest.raises(FileNotFoundError, match="not a Hudi table"):
        read_lakehouse(spark, "hudi", "/tmp/nope")


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_lakehouse_routes_to_native_readers(spark, fmt):
    # delta (r3) and iceberg (r6) no longer stub: without the jars they
    # fall back to the native implementations, so a missing path is a
    # table-level error, not a missing-dependency one (roundtrips in
    # tests/test_delta.py and tests/test_iceberg.py)
    with pytest.raises(FileNotFoundError):
        read_lakehouse(spark, fmt, "/tmp/nope")


def test_udtf_extension_point_lateral_join(spark):
    from sparkstreamingtwitter_presidential_spark.functions.extension import (
        SplitSentences,
    )

    assert SplitSentences is not None
    spark.udtf.register("ssp_split_sentences", SplitSentences)
    df = spark.createDataFrame(
        [(1, "one two. three! four?"), (2, None), (3, "  ")],
        "id int, text string",
    )
    out = spark.sql(
        "SELECT d.id, s.idx, s.sentence "
        "FROM {d} d, LATERAL ssp_split_sentences(text) s",
        d=df,
    )
    rows = sorted((r.id, r.idx, r.sentence) for r in out.collect())
    assert rows == [(1, 0, "one two"), (1, 1, "three"), (1, 2, "four")]
