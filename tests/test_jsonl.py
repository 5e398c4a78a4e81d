"""JSONL source/sink: schema-enforced roundtrips (content that breaks
naive line formats — embedded newlines, pipes, unicode), corrupt-line
quarantine (never silent drops), gzip transparency, and
forward-compatible schema behavior (unknown fields ignored, missing
fields NULL)."""

from __future__ import annotations

import glob
import gzip
import json
import os

from pyspark.sql import Row
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sparkstreamingtwitter_presidential_spark.sources.jsonl import (
    read_jsonl,
    split_quarantine,
    write_jsonl,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("text", StringType()),
        StructField("score", DoubleType()),
    ]
)


def test_roundtrip_hostile_content(spark, tmp_path):
    rows = [
        Row(id=1, text="line1\nline2\ttab", score=0.5),
        Row(id=2, text='pipes | and "quotes" and \\ backslash', score=None),
        Row(id=3, text="unicode: héllo wörld — 中文 🚀", score=-1.25),
    ]
    p = str(tmp_path / "d")
    write_jsonl(spark.createDataFrame(rows, SCHEMA), p)
    got = sorted(read_jsonl(spark, p, SCHEMA).collect(), key=lambda r: r["id"])
    assert [tuple(r) for r in got] == [tuple(r) for r in rows]
    # gzip parts actually written
    assert glob.glob(os.path.join(p, "*.json.gz"))


def test_quarantine_captures_bad_lines(spark, tmp_path):
    p = str(tmp_path / "d")
    os.makedirs(p)
    with open(os.path.join(p, "part-000.json"), "w") as f:
        f.write(json.dumps({"id": 1, "text": "ok", "score": 1.0}) + "\n")
        f.write("{this is not json\n")
        f.write(json.dumps({"id": 2, "text": "also ok", "score": 2.0}) + "\n")
    df = read_jsonl(spark, p, SCHEMA, quarantine=True)
    good, bad = split_quarantine(df)
    assert sorted(r["id"] for r in good.collect()) == [1, 2]
    bad_lines = [r[0] for r in bad.collect()]
    assert bad_lines == ["{this is not json"]  # raw line preserved


def test_schema_is_forward_compatible(spark, tmp_path):
    """Unknown fields in the data are ignored; declared-but-missing
    fields read NULL — additive producer evolution never breaks us."""
    p = str(tmp_path / "d")
    os.makedirs(p)
    with open(os.path.join(p, "part-000.json"), "w") as f:
        f.write(json.dumps({"id": 1, "text": "x", "score": 1.0,
                            "new_field": "ignored"}) + "\n")
        f.write(json.dumps({"id": 2}) + "\n")
    got = {r["id"]: (r["text"], r["score"])
           for r in read_jsonl(spark, p, SCHEMA).collect()}
    assert got == {1: ("x", 1.0), 2: (None, None)}


def test_gzip_external_file_reads_transparently(spark, tmp_path):
    """A hand-gzipped file (the way corpora ship) reads with no extra
    configuration."""
    p = str(tmp_path / "d")
    os.makedirs(p)
    with gzip.open(os.path.join(p, "shard-000.json.gz"), "wt") as f:
        f.write(json.dumps({"id": 7, "text": "gz", "score": 7.0}) + "\n")
    got = read_jsonl(spark, p, SCHEMA).collect()
    assert [tuple(r) for r in got] == [(7, "gz", 7.0)]


def test_n_files_controls_part_count(spark, tmp_path):
    p = str(tmp_path / "d")
    df = spark.createDataFrame(
        [Row(id=i, text=f"t{i}", score=float(i)) for i in range(100)], SCHEMA
    )
    write_jsonl(df, p, n_files=3)
    assert len(glob.glob(os.path.join(p, "part-*.json.gz"))) == 3


def test_quarantine_fork_releases_cache(spark, tmp_path):
    """The context manager yields both sides of the dead-letter fork
    and frees the shared parse cache on exit."""
    import os

    from sparkstreamingtwitter_presidential_spark.sources.jsonl import (
        quarantine_fork,
        read_jsonl,
    )

    p = str(tmp_path / "in")
    os.makedirs(p)
    with open(os.path.join(p, "a.jsonl"), "w") as fh:
        fh.write('{"doc_id": 1, "text": "ok"}\n')
        fh.write("not json at all\n")
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    df = read_jsonl(
        spark,
        p,
        schema=StructType(
            [StructField("doc_id", LongType()), StructField("text", StringType())]
        ),
        quarantine=True,
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    with quarantine_fork(df) as (good, bad):
        assert good.count() == 1 and bad.count() == 1
        assert jsc.getPersistentRDDs().size() > before
    assert jsc.getPersistentRDDs().size() == before
