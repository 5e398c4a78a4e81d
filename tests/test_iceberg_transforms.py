"""Non-identity Iceberg partition transforms (spec §Partition
Transforms): day/month/year/hour, bucket[N], truncate[W] — write-side
staging (source columns stay IN the data files), read-side
pass-through, and EXACT file pruning in transform space. Bucket
hashing is pinned to the spec's Appendix B murmur3 test vectors.

Reference parity: the reference engine has no lakehouse surface
(Collector.scala is a DStream collector); this suite covers the
foreign-table read gap called out by the round-8 verdict."""

from __future__ import annotations

import datetime as dt
import struct

import pytest
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
    _bucket_micros_np,
    _bucket_value,
    _murmur3_32,
    _parse_partition_by,
    _parse_transform,
    _partition_fields,
    _transform_python,
    delete_iceberg,
    read_iceberg,
    table_partitions,
    update_iceberg,
    write_iceberg,
)


def _signed(h: int) -> int:
    return h - (1 << 32) if h >= (1 << 31) else h


def test_murmur3_spec_appendix_b_vectors():
    # Iceberg spec Appendix B "32-bit Hash Requirements" public vectors
    assert _signed(_murmur3_32(struct.pack("<q", 34))) == 2017239379
    assert _signed(_murmur3_32("iceberg".encode())) == 1210000089
    days = (dt.date(2017, 11, 16) - dt.date(1970, 1, 1)).days
    assert _signed(_murmur3_32(struct.pack("<q", days))) == -653330422
    micros = int(
        dt.datetime(2017, 11, 16, 22, 31, 8, tzinfo=dt.timezone.utc).timestamp()
    ) * 10**6
    assert _signed(_murmur3_32(struct.pack("<q", micros))) == -2047944441
    # int and long hash identically (both as 8-byte little-endian)
    assert _bucket_value("int", 34, 16) == _bucket_value("long", 34, 16)


def test_bucket_numpy_matches_pure_python():
    import numpy as np

    vals = np.array(
        [0, 1, -1, 34, 2**40, -(2**40), 2**62, -(2**62)], dtype=np.int64
    )
    got = _bucket_micros_np(vals, 1000)
    want = [
        (_murmur3_32(int(v).to_bytes(8, "little", signed=True)) & 0x7FFFFFFF)
        % 1000
        for v in vals
    ]
    assert list(got) == want


def test_transform_python_spec_semantics():
    ts = dt.datetime(2017, 11, 16, 22, 31, 8)
    assert _transform_python(
        {"transform": "day", "param": None, "type": "timestamptz"}, ts
    ) == 17486
    assert _transform_python(
        {"transform": "month", "param": None, "type": "date"},
        dt.date(2017, 11, 16),
    ) == 574
    assert _transform_python(
        {"transform": "year", "param": None, "type": "date"},
        dt.date(2017, 11, 16),
    ) == 47
    assert _transform_python(
        {"transform": "hour", "param": None, "type": "timestamptz"}, ts
    ) == 419686
    # pre-epoch floors toward negative infinity
    assert _transform_python(
        {"transform": "day", "param": None, "type": "timestamptz"},
        dt.datetime(1969, 12, 31, 23, 0, 0),
    ) == -1
    # truncate: python-% (non-negative remainder) per the spec
    tr = {"transform": "truncate", "param": 10, "type": "int"}
    assert _transform_python(tr, -1) == -10
    assert _transform_python(tr, 7) == 0
    assert _transform_python(
        {"transform": "truncate", "param": 3, "type": "string"}, "iceberg"
    ) == "ice"


def test_parse_transform_and_partition_by():
    assert _parse_transform("identity") == ("identity", None)
    assert _parse_transform("bucket[16]") == ("bucket", 16)
    assert _parse_transform("truncate[4]") == ("truncate", 4)
    with pytest.raises(NotImplementedError, match="zorder"):
        _parse_transform("zorder")
    assert _parse_partition_by("ts") == ("ts", "identity", None)
    assert _parse_partition_by("day(ts)") == ("ts", "day", None)
    assert _parse_partition_by("bucket(16, id)") == ("id", "bucket[16]", 16)
    assert _parse_partition_by("truncate(4,name)") == (
        "name",
        "truncate[4]",
        4,
    )


def test_void_and_unknown_transform_refuse():
    meta = {
        "default-spec-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "source-id": 1,
                        "field-id": 1000,
                        "name": "x",
                        "transform": "void",
                    }
                ],
            }
        ],
    }
    schema = {"fields": [{"id": 1, "name": "x", "type": "long"}]}
    with pytest.raises(NotImplementedError, match="void"):
        _partition_fields(meta, schema)
    meta["partition-specs"][0]["fields"][0]["transform"] = "weird[3]"
    with pytest.raises(NotImplementedError, match="weird"):
        _partition_fields(meta, schema)


@pytest.fixture()
def docs_df(spark):
    rows = [
        (
            i,
            f"doc_{i:03d}",
            dt.datetime(2024, 1, 1 + i % 5, 3 + i % 20, 0, 0),
            float(i),
        )
        for i in range(100)
    ]
    return spark.createDataFrame(rows, "id long, name string, ts timestamp, v double")


@pytest.mark.parametrize(
    "spec",
    [
        ["day(ts)"],
        ["month(ts)"],
        ["year(ts)"],
        ["hour(ts)"],
        ["bucket(4, id)"],
        ["bucket(4, name)"],
        ["truncate(6, name)"],
        ["truncate(25, id)"],
        ["day(ts)", "bucket(2, id)"],
    ],
)
def test_transform_roundtrip(spark, tmp_path, docs_df, spec):
    t = str(tmp_path / "t")
    write_iceberg(docs_df, t, partition_by=spec)
    back = read_iceberg(spark, t)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, docs_df.collect())
    )
    # source columns of non-identity transforms are IN the data files
    import pyarrow.parquet as pq

    f = back.inputFiles()[0].replace("file:", "")
    names = set(pq.ParquetFile(f).schema_arrow.names)
    for entry in spec:
        col = _parse_partition_by(entry)[0]
        assert col in names


def test_day_pruning_exact(spark, tmp_path, docs_df):
    t = str(tmp_path / "t")
    write_iceberg(docs_df.repartition(1), t, partition_by=["day(ts)"])
    full = read_iceberg(spark, t)
    assert len(full.inputFiles()) == 5  # one per day
    lo, hi = dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 2, 23, 59, 59)
    pruned = read_iceberg(spark, t, skip_ranges={"ts": (lo, hi)})
    assert len(pruned.inputFiles()) == 1
    want = docs_df.filter(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
    ).count()
    got = pruned.filter(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
    ).count()
    assert got == want > 0


def test_month_pruning_and_open_ends(spark, tmp_path, spark_or_none=None):
    rows = [
        (i, dt.date(2023 + i % 2, 1 + i % 12, 5)) for i in range(48)
    ]
    df = spark.createDataFrame(rows, "id long, d date").repartition(1)
    t = str(tmp_path / "t")
    write_iceberg(df, t, partition_by=["month(d)"])
    pruned = read_iceberg(
        spark, t, skip_ranges={"d": (dt.date(2024, 3, 1), None)}
    )
    assert 0 < len(pruned.inputFiles()) < len(read_iceberg(spark, t).inputFiles())
    want = df.filter("d >= '2024-03-01'").count()
    assert pruned.filter("d >= '2024-03-01'").count() == want


def test_bucket_pruning_equality_only(spark, tmp_path, docs_df):
    t = str(tmp_path / "t")
    write_iceberg(docs_df.repartition(1), t, partition_by=["bucket(4, id)"])
    full_n = len(read_iceberg(spark, t).inputFiles())
    assert full_n == 4
    pruned = read_iceberg(spark, t, skip_ranges={"id": (7, 7)})
    assert len(pruned.inputFiles()) == 1
    assert pruned.filter("id = 7").count() == 1
    # a RANGE proves nothing about hash buckets: all files kept
    ranged = read_iceberg(spark, t, skip_ranges={"id": (7, 9)})
    assert len(ranged.inputFiles()) == full_n


def test_truncate_pruning(spark, tmp_path, docs_df):
    t = str(tmp_path / "t")
    write_iceberg(docs_df.repartition(1), t, partition_by=["truncate(6, name)"])
    pruned = read_iceberg(
        spark, t, skip_ranges={"name": ("doc_010", "doc_019")}
    )
    assert len(pruned.inputFiles()) == 1
    assert (
        pruned.filter("name between 'doc_010' and 'doc_019'").count() == 10
    )


def test_dml_on_transform_table(spark, tmp_path, docs_df):
    t = str(tmp_path / "t")
    write_iceberg(docs_df, t, partition_by=["day(ts)"])
    delete_iceberg(spark, t, "id % 10 = 3")
    got = read_iceberg(spark, t)
    assert got.count() == 90
    assert got.filter("id % 10 = 3").count() == 0
    update_iceberg(spark, t, {"v": "v + 1000"}, "id < 10")
    assert read_iceberg(spark, t).filter("v >= 1000").count() == 9
    # transform SOURCE columns refuse UPDATE like identity partition
    # columns (a silent in-place rewrite would break the tuple)
    with pytest.raises(ValueError, match="partition column"):
        update_iceberg(spark, t, {"ts": "ts + interval 1 day"}, "id = 5")


def test_append_spec_match_and_partitions_table(spark, tmp_path, docs_df):
    t = str(tmp_path / "t")
    write_iceberg(docs_df, t, partition_by=["day(ts)"])
    write_iceberg(docs_df, t, mode="append", partition_by=["day(ts)"])
    with pytest.raises(ValueError, match="does not match"):
        write_iceberg(docs_df, t, mode="append", partition_by=["month(ts)"])
    parts = table_partitions(spark, t)
    # spec_id rides along since the r12-late spec-evolution support
    # (one row per (spec, tuple)); a single-spec table reads all-0
    assert parts.columns == [
        "ts_day", "spec_id", "n_files", "n_rows", "n_bytes",
    ]
    assert parts.count() == 5
    assert {r.spec_id for r in parts.collect()} == {0}
    assert sum(r.n_rows for r in parts.collect()) == 200


def test_null_transform_source_refuses(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1)), (2, None)], "id long, ts timestamp"
    )
    with pytest.raises(ValueError, match="null partition value"):
        write_iceberg(df, str(tmp_path / "t"), partition_by=["day(ts)"])


def test_ntz_timestamp_day_is_wall_clock(spark, tmp_path):
    """Iceberg 'timestamp' (NTZ) transforms apply to the literal wall
    clock; staging must not shift it through the session zone."""
    from pyspark.sql import types as T

    rows = [(1, dt.datetime(2024, 1, 1, 23, 30)), (2, dt.datetime(2024, 1, 2, 0, 30))]
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
        ]
    )
    df = spark.createDataFrame(rows, schema).repartition(1)
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        t = str(tmp_path / "t")
        write_iceberg(df, t, partition_by=["day(ts)"])
        parts = sorted(r.ts_day for r in table_partitions(spark, t).collect())
        epoch = dt.date(1970, 1, 1)
        assert parts == [
            (dt.date(2024, 1, 1) - epoch).days,
            (dt.date(2024, 1, 2) - epoch).days,
        ]
        back = read_iceberg(spark, t)
        assert sorted(map(tuple, back.collect())) == rows
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


# ------------------------------------------------ property tests


from hypothesis import given, settings
from hypothesis import strategies as st

_dt_strategy = st.datetimes(
    min_value=dt.datetime(1969, 1, 1), max_value=dt.datetime(2100, 1, 1)
)


@settings(max_examples=100, deadline=None)
@given(_dt_strategy, _dt_strategy)
def test_temporal_transforms_are_monotonic(a, b):
    """The pruning rule's soundness rests on monotonicity: a <= b must
    imply T(a) <= T(b) for every temporal transform."""
    if a > b:
        a, b = b, a
    for kind in ("day", "month", "year", "hour"):
        pf = {"transform": kind, "param": None, "type": "timestamptz"}
        assert _transform_python(pf, a) <= _transform_python(pf, b)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=-(1 << 40), max_value=1 << 40),
    st.integers(min_value=-(1 << 40), max_value=1 << 40),
    st.integers(min_value=1, max_value=1 << 20),
)
def test_truncate_int_monotonic_and_idempotent(a, b, w):
    pf = {"transform": "truncate", "param": w, "type": "long"}
    ta, tb = _transform_python(pf, a), _transform_python(pf, b)
    if a <= b:
        assert ta <= tb
    assert _transform_python(pf, ta) == ta  # idempotent
    assert ta <= a < ta + w  # floor semantics


@settings(max_examples=80, deadline=None)
@given(
    st.lists(_dt_strategy, min_size=1, max_size=20),
    _dt_strategy,
    _dt_strategy,
)
def test_day_pruning_never_drops_matching_files(file_ts, lo, hi):
    """Soundness of _file_excluded_by_partition in transform space: a
    file whose stored day-ordinal could hold an in-range row is NEVER
    excluded (checked against brute force over the file's value)."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        _file_excluded_by_partition,
    )

    if lo > hi:
        lo, hi = hi, lo
    pf = {
        "name": "ts_day",
        "transform": "day",
        "param": None,
        "type": "timestamptz",
        "source_name": "ts",
        "result_type": "int",
    }
    for ts in file_ts:
        day = _transform_python(pf, ts)
        entry = {"partition": {"ts_day": day}}
        excluded = _file_excluded_by_partition(
            entry, {"ts": (lo, hi)}, [pf]
        )
        # if the file's actual row is inside [lo, hi], exclusion is a
        # wrong-rows bug
        if lo <= ts <= hi:
            assert not excluded
