"""CSV source/sink: quoted-roundtrip fidelity (embedded newlines,
commas, quotes), corrupt-line quarantine, and schema enforcement —
the same contracts as the JSONL twin."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sparkstreamingtwitter_presidential_spark.sources.csv_text import (
    read_csv,
    write_csv,
)
from sparkstreamingtwitter_presidential_spark.sources.jsonl import split_quarantine

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("text", StringType()),
        StructField("score", DoubleType()),
    ]
)


def test_roundtrip_hostile_content(spark, tmp_path):
    rows = [
        Row(id=1, text="line1\nline2, with comma", score=0.5),
        Row(id=2, text='embedded "quotes" and ,,, commas', score=None),
        Row(id=3, text="unicode: héllo — 中文 🚀", score=-1.25),
    ]
    p = str(tmp_path / "d")
    write_csv(spark.createDataFrame(rows, SCHEMA), p)
    got = sorted(read_csv(spark, p, SCHEMA).collect(), key=lambda r: r["id"])
    assert [tuple(r) for r in got] == [tuple(r) for r in rows]


def test_quarantine_captures_bad_lines(spark, tmp_path):
    p = str(tmp_path / "d")
    os.makedirs(p)
    with open(os.path.join(p, "part-000.csv"), "w") as f:
        f.write("id,text,score\n")
        f.write("1,ok,1.0\n")
        f.write("not-a-long,broken,xyz\n")  # id/score unparseable
        f.write("2,also ok,2.0\n")
    df = read_csv(spark, p, SCHEMA, quarantine=True)
    good, bad = split_quarantine(df)
    assert sorted(r["id"] for r in good.collect()) == [1, 2]
    assert [r[0] for r in bad.collect()] == ["not-a-long,broken,xyz"]


def test_docs_table_roundtrips(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.io import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    p = str(tmp_path / "docs")
    write_csv(d, p, n_files=2)
    back = read_csv(spark, p, d.schema)
    assert back.count() == d.count()
    a = {tuple(r) for r in d.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b
