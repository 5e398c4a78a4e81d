"""IDENTITY columns (r12 late): declaration at creation, shuffle-free
generation with highWaterMark maintenance in the same commit, the
GENERATED ALWAYS vs BY DEFAULT contract on appends and DML, negative
steps, and enforcement against foreign tables declaring the metadata
(previously a silent contract violation). Spec: Delta PROTOCOL.md
§Identity Columns (delta.identity.* field metadata, writer version 6).
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.sources.delta import (
    read_delta,
    write_delta,
)

SCHEMA = "s string, v long"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _last_metadata(t):
    md = None
    for n in sorted(glob.glob(os.path.join(t, "_delta_log", "*.json"))):
        with open(n) as fh:
            for ln in fh:
                a = json.loads(ln)
                if "metaData" in a:
                    md = a["metaData"]
    return md


def _id_meta(t, col):
    md = _last_metadata(t)
    schema = json.loads(md["schemaString"])
    f = next(f for f in schema["fields"] if f["name"] == col)
    return f.get("metadata", {})


def test_create_generates_and_records_watermark(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(
        _df(spark, [(c, i) for i, c in enumerate("abcde")]).repartition(3),
        t,
        identity={"rid": {"start": 100, "step": 10}},
    )
    rows = {r.s: r.rid for r in read_delta(spark, t).collect()}
    vals = sorted(rows.values())
    assert vals == [100, 110, 120, 130, 140]  # start + step arithmetic
    meta = _id_meta(t, "rid")
    assert meta["delta.identity.start"] == 100
    assert meta["delta.identity.step"] == 10
    assert meta["delta.identity.highWaterMark"] == 140
    assert meta["delta.identity.allowExplicitInsert"] is False
    # identityColumns' legacy writer version
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json")) as fh:
        pr = next(
            json.loads(ln)["protocol"]
            for ln in fh
            if "protocol" in json.loads(ln)
        )
    assert pr["minWriterVersion"] >= 6


def test_append_continues_from_watermark(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [("a", 1), ("b", 2)]), t,
                identity={"rid": {"start": 1, "step": 1}})
    write_delta(
        _df(spark, [("c", 3), ("d", 4), ("e", 5)]).repartition(2),
        t, mode="append",
    )
    rows = sorted(r.rid for r in read_delta(spark, t).collect())
    assert rows == [1, 2, 3, 4, 5]  # contiguous here; uniqueness is the contract
    assert _id_meta(t, "rid")["delta.identity.highWaterMark"] == 5


def test_generated_always_refuses_explicit_values(spark, tmp_path):
    t = str(tmp_path / "t")
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        write_delta(
            spark.createDataFrame([(1, "a")], "rid long, s string"),
            str(tmp_path / "t0"),
            identity={"rid": {"start": 1, "step": 1}},
        )
    write_delta(_df(spark, [("a", 1)]), t,
                identity={"rid": {"start": 1, "step": 1}})
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        write_delta(
            spark.createDataFrame([(9, "z", 9)], "rid long, s string, v long"),
            t, mode="append",
        )


def test_by_default_accepts_explicit_and_keeps_watermark(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(
        _df(spark, [("a", 1), ("b", 2)]), t,
        identity={"rid": {"start": 1, "step": 1,
                          "allow_explicit_insert": True}},
    )
    hw0 = _id_meta(t, "rid")["delta.identity.highWaterMark"]
    write_delta(
        spark.createDataFrame(
            [(777, "x", 7)], "rid long, s string, v long"
        ),
        t, mode="append",
    )
    # explicit insert accepted; watermark untouched (SYNC boundary)
    assert _id_meta(t, "rid")["delta.identity.highWaterMark"] == hw0
    vals = sorted(r.rid for r in read_delta(spark, t).collect())
    assert vals == [1, 2, 777]
    # a later generating append still mints from the OLD watermark
    write_delta(_df(spark, [("c", 3)]), t, mode="append")
    vals = sorted(r.rid for r in read_delta(spark, t).collect())
    assert vals == [1, 2, 3, 777]


def test_negative_step(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, [("a", 1), ("b", 2)]), t,
                identity={"rid": {"start": 0, "step": -5}})
    assert sorted(r.rid for r in read_delta(spark, t).collect()) == [-5, 0]
    write_delta(_df(spark, [("c", 3)]), t, mode="append")
    assert sorted(r.rid for r in read_delta(spark, t).collect()) == [
        -10, -5, 0,
    ]
    assert _id_meta(t, "rid")["delta.identity.highWaterMark"] == -10


def test_foreign_identity_table_is_enforced(spark, tmp_path):
    """A FOREIGN table declaring delta.identity.* metadata gets the
    same contract: generation on absent columns, refusal on explicit
    values under GENERATED ALWAYS."""
    t = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame([(50, "a", 1)], "rid long, s string, v long"),
        t,
    )
    # forge: stamp identity metadata into the creating metaData
    f0 = os.path.join(t, "_delta_log", f"{0:020d}.json")
    acts = [json.loads(ln) for ln in open(f0) if ln.strip()]
    for a in acts:
        if "metaData" in a:
            sch = json.loads(a["metaData"]["schemaString"])
            for f in sch["fields"]:
                if f["name"] == "rid":
                    f["metadata"] = {
                        "delta.identity.start": 50,
                        "delta.identity.step": 50,
                        "delta.identity.highWaterMark": 50,
                        "delta.identity.allowExplicitInsert": False,
                    }
            a["metaData"]["schemaString"] = json.dumps(sch)
        if "protocol" in a:
            a["protocol"]["minWriterVersion"] = 6
    with open(f0, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in acts) + "\n")

    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        write_delta(
            spark.createDataFrame(
                [(999, "x", 9)], "rid long, s string, v long"
            ),
            t, mode="append",
        )
    write_delta(_df(spark, [("b", 2)]), t, mode="append")
    assert sorted(r.rid for r in read_delta(spark, t).collect()) == [
        50, 100,
    ]


def test_dml_guards(spark, tmp_path):
    from sparkstreamingtwitter_presidential_spark.sources.delta_dml import (
        delete_delta,
        merge_delta,
        update_delta,
    )

    t = str(tmp_path / "t")
    write_delta(_df(spark, [("a", 1), ("b", 2), ("c", 3)]), t,
                identity={"rid": {"start": 1, "step": 1}})
    with pytest.raises(ValueError, match="identity column"):
        update_delta(spark, t, {"rid": "rid + 100"})
    # non-identity updates still work
    update_delta(spark, t, {"v": "v * 10"}, "s = 'a'")
    with pytest.raises(ValueError, match="GENERATED ALWAYS identity"):
        merge_delta(
            spark, t,
            spark.createDataFrame(
                [("a", 99, 1)], "s string, v long, rid long"
            ),
            keys=["s"],
        )
    # deletes never touch identity assignment
    delete_delta(spark, t, "s = 'b'")
    assert sorted(r.rid for r in read_delta(spark, t).collect()) == [1, 3]

    # BY DEFAULT: full-row merge accepted (values are explicit inserts)
    t2 = str(tmp_path / "t2")
    write_delta(_df(spark, [("a", 1)]), t2,
                identity={"rid": {"start": 1, "step": 1,
                                  "allow_explicit_insert": True}})
    merge_delta(
        spark, t2,
        spark.createDataFrame([("z", 9, 500)], "s string, v long, rid long"),
        keys=["s"],
    )
    assert sorted(r.rid for r in read_delta(spark, t2).collect()) == [1, 500]


def test_assignment_plan_is_exchange_free(spark):
    from sparkstreamingtwitter_presidential_spark.sources.delta import (
        _assign_identity_values,
    )

    df = spark.range(0, 1000, 1, 8).withColumn("s", F.lit("x")).drop("id")
    out, hw, frozen = _assign_identity_values(
        df, [("rid", 1, 1, None)]
    )
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # map-only over the frozen frame
        vals = [r.rid for r in out.collect()]
        assert sorted(vals) == list(range(1, 1001))
        assert hw == {"rid": 1000}
    finally:
        frozen.unpersist()
