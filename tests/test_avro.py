"""Native Avro container-file contracts: hostile content survives the
roundtrip byte-exactly, the embedded writer schema maps back to the
same Spark types, blocks/codecs/sync markers follow the public spec
(header parseable standalone), unsupported shapes refuse up front, and
corruption is detected, not misread."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from sparkstreamingtwitter_presidential_spark.sources.avro import (
    MAGIC,
    avro_to_spark_schema,
    read_avro,
    spark_to_avro_schema,
    write_avro,
)

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("text", StringType()),
        StructField("score", DoubleType()),
        StructField("vec", ArrayType(FloatType())),
        StructField("blob", BinaryType()),
        StructField("flag", BooleanType()),
    ]
)

ROWS = [
    Row(id=1, text="line1\nline2, with comma", score=0.5,
        vec=[1.5, -2.25], blob=b"\x00\xff\x01", flag=True),
    Row(id=2, text='embedded "quotes" and ,,, commas', score=None,
        vec=[], blob=None, flag=None),
    Row(id=3, text="unicode: héllo — 中文 🚀", score=-1.25,
        vec=None, blob=b"", flag=False),
    Row(id=4, text=None, score=1.0, vec=[0.0], blob=b"|", flag=True),
    Row(id=5, text="", score=2.0, vec=[-0.5], blob=b"\n", flag=False),
]


def test_avro_roundtrip_hostile_content(spark, tmp_path):
    p = str(tmp_path / "d")
    write_avro(spark.createDataFrame(ROWS, SCHEMA), p)
    got = sorted(read_avro(spark, p, SCHEMA).collect(), key=lambda r: r["id"])
    assert [tuple(r) for r in got] == [tuple(r) for r in ROWS]
    assert os.path.exists(os.path.join(p, "_SUCCESS"))


def test_avro_schema_inference_matches_writer_types(spark, tmp_path):
    p = str(tmp_path / "d")
    write_avro(spark.createDataFrame(ROWS, SCHEMA), p)
    back = read_avro(spark, p)  # no schema pinned: embedded one maps back
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in SCHEMA.fields
    ]
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, ROWS))


def test_avro_schema_mapping_roundtrips():
    assert avro_to_spark_schema(spark_to_avro_schema(SCHEMA)) == SCHEMA


def test_avro_n_files_and_null_codec(spark, tmp_path):
    p = str(tmp_path / "d")
    df = spark.range(1000).select(
        F.col("id"), F.col("id").cast("string").alias("text")
    )
    write_avro(df, p, codec="null", n_files=3)
    assert len(glob.glob(os.path.join(p, "*.avro"))) == 3
    assert read_avro(spark, p).count() == 1000
    with pytest.raises(ValueError):
        write_avro(df, p, codec="snappy")


def test_avro_header_is_spec_shaped(spark, tmp_path):
    p = str(tmp_path / "d")
    write_avro(spark.createDataFrame(ROWS, SCHEMA), p, n_files=1)
    f = glob.glob(os.path.join(p, "*.avro"))[0]
    head = open(f, "rb").read(4)
    assert head == MAGIC  # any spec-conforming reader can take it from here


def test_avro_unsupported_type_refuses_up_front(spark, tmp_path):
    df = spark.createDataFrame(
        [({"a": 1},)],
        StructType([StructField("m", MapType(StringType(), LongType()))]),
    )
    with pytest.raises(NotImplementedError):
        write_avro(df, str(tmp_path / "d"))


def test_avro_corrupt_block_detected(spark, tmp_path):
    p = str(tmp_path / "d")
    write_avro(spark.createDataFrame(ROWS, SCHEMA), p, n_files=1)
    f = glob.glob(os.path.join(p, "*.avro"))[0]
    data = bytearray(open(f, "rb").read())
    data[-1] ^= 0xFF  # flip a sync byte: must be a hard error
    open(f, "wb").write(bytes(data))
    with pytest.raises(Exception, match="sync|corrupt|Py4J|decompress"):
        read_avro(spark, p, SCHEMA).collect()


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_block_split_read_equals_file_read(spark, tmp_path, codec):
    """split_bytes removes the one-task-per-file floor: a single
    multi-block container read as byte-range splits must yield exactly
    the per-file read's rows, across >1 actual input partitions, for
    both codecs (the sync-scan boundary rule is codec-independent)."""
    out = str(tmp_path / f"a_{codec}")
    # ~2000 rows x ~300 bytes -> several 256 KiB blocks in ONE file;
    # hash-derived text stays bulky under deflate (repetitive filler
    # would compress the whole file below one split)
    df = spark.range(2000).select(
        F.col("id"),
        F.concat_ws(
            "",
            *[
                F.sha2(F.concat(F.col("id").cast("string"), F.lit(str(k))), 256)
                for k in range(5)
            ],
        ).alias("text"),
        (F.col("id") * 0.5).alias("score"),
        F.array(F.col("id").cast("float")).alias("vec"),
        F.col("id").cast("string").cast("binary").alias("blob"),
        (F.col("id") % 2 == 0).alias("flag"),
    )
    write_avro(df, out, codec=codec, n_files=1)
    assert len(glob.glob(os.path.join(out, "*.avro"))) == 1

    whole = read_avro(spark, out)
    split = read_avro(spark, out, split_bytes=64 * 1024)
    a = sorted(tuple(r) for r in whole.collect())
    b = sorted(tuple(r) for r in split.collect())
    assert a == b and len(a) == 2000
    # the split read actually fans out over multiple tasks
    n_parts = (
        read_avro(spark, out, split_bytes=64 * 1024)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert n_parts > 1


def test_avro_split_read_empty_and_tiny_ranges(spark, tmp_path):
    """Degenerate splits: ranges entirely inside the header or beyond
    EOF claim nothing; a split_bytes larger than the file equals the
    whole-file read."""
    out = str(tmp_path / "tiny")
    df = spark.createDataFrame(ROWS, SCHEMA)
    write_avro(df, out, n_files=1)
    whole = sorted(tuple(r) for r in read_avro(spark, out).collect())
    big = sorted(
        tuple(r) for r in read_avro(spark, out, split_bytes=1 << 30).collect()
    )
    small = sorted(
        tuple(r) for r in read_avro(spark, out, split_bytes=64).collect()
    )
    assert whole == big == small
    with pytest.raises(ValueError, match="split_bytes"):
        read_avro(spark, out, split_bytes=0)


def test_absent_record_field_nullable_only():
    """The schema-evolution allowance is SCOPED (r8 verdict item 7):
    an absent field serializes null only when its type is a nullable
    union; a missing required field raises instead of silently
    nulling."""
    from sparkstreamingtwitter_presidential_spark.sources.avro import (
        _write_value,
    )

    rec = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "req", "type": "long"},
            {"name": "opt", "type": ["null", "string"]},
        ],
    }
    buf = bytearray()
    _write_value(buf, rec, {"req": 7})  # opt absent -> null branch
    assert bytes(buf) == bytes([14, 0])  # zigzag(7), union idx 0
    with pytest.raises(KeyError, match="required field 'req'"):
        _write_value(bytearray(), rec, {"opt": "x"})
