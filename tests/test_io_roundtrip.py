"""SCN1/SNK1 parity: collector output -> pipe-delimited text -> schema
read-back round trip."""

from __future__ import annotations

import datetime
import shutil
import uuid

from sparkstreamingtwitter_presidential_spark import schemas
from sparkstreamingtwitter_presidential_spark.operators.collector import collect_tweets
from sparkstreamingtwitter_presidential_spark.sources.pipe_text import (
    read_pipe_table,
    write_pipe_table,
)

RAW = [
    ("J'aime #Macron, vraiment", (48.85, 2.35), ("fr",),
     datetime.datetime(2017, 4, 23, 10, 0, 0), ["#Macron"]),
    ("sans géo", None, ("fr-CA",),
     datetime.datetime(2017, 4, 23, 11, 0, 0), ["#LePen"]),
]


def test_pipe_text_roundtrip(spark):
    presi = collect_tweets(spark.createDataFrame(RAW, schemas.RAW_TWEETS))
    path = f"/tmp/pipe_table_{uuid.uuid4().hex[:8]}"
    try:
        write_pipe_table(presi, path)
        back = read_pipe_table(spark, path)
        assert [f.name for f in back.schema.fields] == [
            "text", "latitude", "longitude", "created_at",
        ]
        rows = {r.text: r for r in back.collect()}
        geo = rows["J'aime #Macron' vraiment"]
        assert abs(geo.latitude - 48.85) < 1e-5
        assert geo.created_at == datetime.datetime(2017, 4, 23, 10, 0, 0)
        nogeo = rows["sans géo"]
        assert nogeo.latitude is None and nogeo.longitude is None
        assert nogeo.created_at == datetime.datetime(2017, 4, 23, 11, 0, 0)
        # append semantics (SNK1): second write adds rows, overwrites nothing
        write_pipe_table(presi, path)
        assert read_pipe_table(spark, path).count() == 4
    finally:
        shutil.rmtree(path, ignore_errors=True)
