"""Iceberg format-version 3 reads (r10) and writes (r11): the Puffin
container + deletion-vector-v1 blob codec pinned to the public specs
(zstd footers via pyarrow since r11), snapshot reads applying v3 DVs
via the position-delete anti-join, appends to foreign v3 tables with
lineage bookkeeping, initial-default injection for pre-add files,
honest refusals for what remains (nested/undecodable defaults, v4+),
and the over-budget executor-side decode path."""

from __future__ import annotations

import json
import os
import struct

import pytest

from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
    _load_metadata,
    forge_v3_dv_commit,
    read_iceberg,
    write_iceberg,
)
from sparkstreamingtwitter_presidential_spark.sources.puffin import (
    DV_MAGIC,
    PUFFIN_MAGIC,
    deserialize_dv_blob,
    portable64_deserialize,
    portable64_serialize,
    read_blob,
    read_puffin_footer,
    serialize_dv_blob,
    write_puffin,
)


def test_portable64_roundtrip():
    vals = [0, 1, 5, 1000, 65536, (1 << 32) + 7, (3 << 32) | 0xFFFF]
    assert portable64_deserialize(portable64_serialize(vals)) == sorted(vals)
    assert portable64_deserialize(portable64_serialize([])) == []


def test_dv_blob_layout_and_checks():
    blob = serialize_dv_blob([3, 1, 4, 1, 5])
    # 4B BE length prefix covers magic+vector; magic next
    (n,) = struct.unpack_from(">i", blob, 0)
    assert blob[4:8] == DV_MAGIC and n == len(blob) - 8
    assert deserialize_dv_blob(blob) == [1, 3, 4, 5]
    # corrupt a vector byte -> CRC refuses
    bad = bytearray(blob)
    bad[10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        deserialize_dv_blob(bytes(bad))
    with pytest.raises(ValueError, match="length"):
        deserialize_dv_blob(blob + b"x")


def test_puffin_write_read_roundtrip(tmp_path):
    p = str(tmp_path / "t.puffin")
    payloads = [serialize_dv_blob([1, 2]), serialize_dv_blob([9])]
    metas = write_puffin(
        p,
        [
            {"type": "deletion-vector-v1", "payload": payloads[0],
             "properties": {"referenced-data-file": "a.parquet"}},
            {"type": "deletion-vector-v1", "payload": payloads[1]},
        ],
    )
    with open(p, "rb") as fh:
        assert fh.read(4) == PUFFIN_MAGIC
    footer = read_puffin_footer(p)
    assert [b["type"] for b in footer["blobs"]] == ["deletion-vector-v1"] * 2
    assert footer["blobs"][0]["properties"]["referenced-data-file"] == "a.parquet"
    for m, want in zip(metas, payloads):
        assert read_blob(p, m["offset"], m["length"]) == want
    # manifest-carried offsets equal footer offsets
    assert [m["offset"] for m in metas] == [
        b["offset"] for b in footer["blobs"]
    ]


@pytest.fixture()
def v3_table(spark, tmp_path):
    """Unpartitioned 80-row table in 2 files, upgraded to v3 with DVs
    deleting every id % 4 == 0 row. Returns (path, surviving ids)."""
    import pyarrow.parquet as pq

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(80)], "id long, s string"
    )
    write_iceberg(df.repartition(2), t)
    meta = _load_metadata(t)
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        _entries_and_deletes_for_snapshot,
        _snapshot,
    )

    entries, _ = _entries_and_deletes_for_snapshot(t, _snapshot(meta, None))
    deletes = {}
    for e in entries:
        fp = e["data_file"]["file_path"]
        ids = pq.read_table(fp, columns=["id"]).column("id").to_pylist()
        idxs = [ri for ri, i in enumerate(ids) if i % 4 == 0]
        if idxs:
            deletes[fp] = idxs
    assert len(deletes) == 2
    forge_v3_dv_commit(t, deletes)
    return t, sorted(i for i in range(80) if i % 4 != 0)


def test_v3_dv_read_applies_vectors(spark, v3_table):
    t, want = v3_table
    assert _load_metadata(t)["format-version"] == 3
    got = sorted(r.id for r in read_iceberg(spark, t).collect())
    assert got == want


def test_v3_time_travel_to_v2_snapshot_sees_all(spark, v3_table):
    t, _want = v3_table
    meta = _load_metadata(t)
    first = meta["snapshots"][0]["snapshot-id"]
    assert read_iceberg(spark, t, snapshot_id=first).count() == 80


def test_v3_dv_over_budget_decodes_executor_side(spark, v3_table, monkeypatch):
    t, want = v3_table
    import sparkstreamingtwitter_presidential_spark.sources.iceberg as ice

    monkeypatch.setattr(ice, "_PAIRS_DRIVER_MAX", 1)
    got = sorted(r.id for r in read_iceberg(spark, t).collect())
    assert got == want


def test_v3_append_after_foreign_dv_commit(spark, v3_table):
    """Appends to a (foreign-forged) v3 DV table work since r11: the
    new snapshot records first-row-id, next-row-id advances, and the
    prior vectors keep applying to their referenced files."""
    t, want = v3_table
    df = spark.createDataFrame([(1000, "x")], "id long, s string")
    write_iceberg(df, t, mode="append")
    got = sorted(r.id for r in read_iceberg(spark, t).collect())
    assert got == want + [1000]
    meta = _load_metadata(t)
    assert meta["snapshots"][-1]["first-row-id"] == 0
    assert meta["next-row-id"] == 1


def _latest_meta_path(t):
    md = os.path.join(t, "metadata")
    versions = sorted(
        (int(n[1:].split(".")[0]), n)
        for n in os.listdir(md)
        if n.startswith("v") and n.endswith(".metadata.json")
    )
    return os.path.join(md, versions[-1][1])


def test_v3_initial_default_applies_to_old_files(spark, tmp_path):
    """r11 (r10 verdict stretch item 9): a column added AFTER files
    were written reads its ``initial-default`` for those files — a
    typed constant injection per writing-schema group — while files
    written under the evolved schema read their real values; an
    existing-in-files column with a default reads real values."""
    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        add_column_iceberg,
    )

    t = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, s string"
        ).repartition(1),
        t,
        format_version=3,
    )
    add_column_iceberg(t, "cat", "string")
    latest = _latest_meta_path(t)
    meta = json.load(open(latest))
    cur = next(
        s
        for s in meta["schemas"]
        if s.get("schema-id", 0) == meta["current-schema-id"]
    )
    next(f for f in cur["fields"] if f["name"] == "cat")[
        "initial-default"
    ] = "zz"
    json.dump(meta, open(latest, "w"))
    write_iceberg(
        spark.createDataFrame(
            [(3, "c", "real")], "id long, s string, cat string"
        ),
        t,
        mode="append",
    )
    got = sorted(map(tuple, read_iceberg(spark, t).collect()))
    assert got == [(1, "a", "zz"), (2, "b", "zz"), (3, "c", "real")]


def test_v3_default_refusals_nested_and_undecodable(spark, v3_table):
    t, _want = v3_table
    latest = _latest_meta_path(t)
    orig = open(latest).read()
    # undecodable: a JSON number default on a STRING field
    meta = json.loads(orig)
    for s in meta["schemas"]:
        s["fields"][1]["initial-default"] = 123
    json.dump(meta, open(latest, "w"))
    with pytest.raises(NotImplementedError, match="shape"):
        read_iceberg(spark, t).collect()
    # nested: a default inside a struct field refuses by name
    meta = json.loads(orig)
    for s in meta["schemas"]:
        s["fields"].append(
            {
                "id": 99,
                "name": "st",
                "required": False,
                "type": {
                    "type": "struct",
                    "fields": [
                        {
                            "id": 100,
                            "name": "inner",
                            "required": False,
                            "type": "string",
                            "initial-default": "x",
                        }
                    ],
                },
            }
        )
    json.dump(meta, open(latest, "w"))
    with pytest.raises(NotImplementedError, match="nested"):
        read_iceberg(spark, t).collect()


def test_v4_still_refuses(spark, v3_table):
    t, _want = v3_table
    md = os.path.join(t, "metadata")
    versions = sorted(
        n for n in os.listdir(md) if n.endswith(".metadata.json")
    )
    latest = os.path.join(md, versions[-1])
    meta = json.load(open(latest))
    meta["format-version"] = 4
    json.dump(meta, open(latest, "w"))
    with pytest.raises(NotImplementedError, match="format-version 4"):
        read_iceberg(spark, t).collect()


def test_v3_dv_read_on_partitioned_table(spark, tmp_path):
    """DVs on a PARTITIONED v3 table: the delete manifest's entries
    carry each referenced file's partition tuple (spec), and the read
    applies vectors per partition branch."""
    import pyarrow.parquet as pq

    from sparkstreamingtwitter_presidential_spark.sources.iceberg import (
        _entries_and_deletes_for_snapshot,
        _snapshot,
    )

    t = str(tmp_path / "t")
    rows = [(i, f"g{i % 3}", float(i)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    write_iceberg(df, t, partition_by=["g"])
    meta = _load_metadata(t)
    entries, _ = _entries_and_deletes_for_snapshot(t, _snapshot(meta, None))
    deletes = {}
    for e in entries:
        if (e["data_file"].get("partition") or {}).get("g") != "g1":
            continue  # delete only from partition g1
        fp = e["data_file"]["file_path"]
        ids = pq.read_table(fp, columns=["id"]).column("id").to_pylist()
        idxs = [ri for ri, i in enumerate(ids) if i % 2 == 0]
        if idxs:
            deletes[fp] = idxs
    assert deletes
    forge_v3_dv_commit(t, deletes)
    # g1 even ids are 4, 10, 16, ... (id % 3 == 1 and id % 2 == 0)
    want = sorted(
        r for r in rows if not (r[0] % 3 == 1 and r[0] % 2 == 0)
    )
    got = sorted(map(tuple, read_iceberg(spark, t).collect()))
    assert got == want
    # the DV entries carry the referenced partition tuple
    meta2 = _load_metadata(t)
    _, dels = _entries_and_deletes_for_snapshot(t, _snapshot(meta2, None))
    assert dels and all(
        d["data_file"]["partition"] == {"g": "g1"} for d in dels
    )


# ------------------------------------------------ property tests

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 40) - 1), max_size=300
    )
)
def test_dv_blob_roundtrip_property(vals):
    assert deserialize_dv_blob(serialize_dv_blob(vals)) == sorted(set(vals))


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=(1 << 34) - 1),
            min_size=1,
            max_size=80,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_puffin_multi_blob_roundtrip_property(tmp_path_factory, blobs):
    import uuid as _uuid

    p = str(tmp_path_factory.mktemp("pf") / f"{_uuid.uuid4().hex}.puffin")
    payloads = [serialize_dv_blob(v) for v in blobs]
    metas = write_puffin(
        p,
        [
            {"type": "deletion-vector-v1", "payload": b}
            for b in payloads
        ],
    )
    footer = read_puffin_footer(p)
    assert len(footer["blobs"]) == len(blobs)
    for m, vals in zip(metas, blobs):
        got = deserialize_dv_blob(read_blob(p, m["offset"], m["length"]))
        assert got == sorted(set(vals))


def test_zstd_compressed_footer_reads(tmp_path):
    """A foreign writer's ZSTD-compressed Puffin footer (spec-optional
    flag bit 0) decodes via pyarrow's zstd codec (r11 — previously a
    named refusal): forge the compressed layout by rewriting an
    uncompressed file's footer section, then read it back."""
    import pyarrow as pa

    p = str(tmp_path / "t.puffin")
    payloads = [serialize_dv_blob([1, 2, 7])]
    metas = write_puffin(
        p,
        [
            {
                "type": "deletion-vector-v1",
                "payload": payloads[0],
                "properties": {"referenced-data-file": "a.parquet"},
            }
        ],
    )
    raw = open(p, "rb").read()
    (plain_size,) = struct.unpack_from("<i", raw, len(raw) - 12)
    body_end = len(raw) - 12 - plain_size - 4
    plain = raw[len(raw) - 12 - plain_size : len(raw) - 12]
    comp = pa.Codec("zstd").compress(plain, asbytes=True)
    forged = (
        raw[:body_end]
        + PUFFIN_MAGIC
        + comp
        + struct.pack("<i", len(comp))
        + bytes([0x1, 0, 0, 0])  # flags: footer-compressed bit set
        + PUFFIN_MAGIC
    )
    zp = str(tmp_path / "z.puffin")
    open(zp, "wb").write(forged)
    footer = read_puffin_footer(zp)
    assert [b["type"] for b in footer["blobs"]] == ["deletion-vector-v1"]
    assert footer["blobs"][0]["offset"] == metas[0]["offset"]
    # blob bytes are unaffected by footer compression
    assert read_blob(zp, metas[0]["offset"], metas[0]["length"]) == payloads[0]
    assert deserialize_dv_blob(
        read_blob(zp, metas[0]["offset"], metas[0]["length"])
    ) == [1, 2, 7]


def test_v3_boolean_default_on_int_field_refuses(spark, v3_table):
    """r11 review fix: JSON true/false on an int/long field refuses the
    shape (bool is an int subclass in Python — without the guard the
    default would silently inject 1/0)."""
    t, _want = v3_table
    latest = _latest_meta_path(t)
    meta = json.load(open(latest))
    for s in meta["schemas"]:
        s["fields"][0]["initial-default"] = True  # id is long
    json.dump(meta, open(latest, "w"))
    with pytest.raises(NotImplementedError, match="shape"):
        read_iceberg(spark, t).collect()


def test_v3_struct_initial_default_applies(spark, tmp_path):
    """r12 (r11 verdict item 7): a TOP-LEVEL struct-typed
    ``initial-default`` decodes from the spec's field-id-keyed JSON
    object and injects as a typed struct constant for pre-add files
    (absent keys read null); files written under the evolved schema
    read their real values."""
    t = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, s string"
        ).repartition(1),
        t,
        format_version=3,
    )
    latest = _latest_meta_path(t)
    meta = json.load(open(latest))
    cur_id = meta["current-schema-id"]
    cur = next(
        s for s in meta["schemas"] if s.get("schema-id", 0) == cur_id
    )
    evolved = json.loads(json.dumps(cur))
    evolved["schema-id"] = cur_id + 1
    evolved["fields"].append(
        {
            "id": 50,
            "name": "meta",
            "required": False,
            "type": {
                "type": "struct",
                "fields": [
                    {
                        "id": 51, "name": "src",
                        "required": False, "type": "string",
                    },
                    {
                        "id": 52, "name": "score",
                        "required": False, "type": "double",
                    },
                    {
                        "id": 53, "name": "note",
                        "required": False, "type": "string",
                    },
                ],
            },
            # spec single-value serialization: field-id-keyed object;
            # id 53 absent -> reads null
            "initial-default": {"51": "seed", "52": 0.5},
        }
    )
    meta["schemas"].append(evolved)
    meta["current-schema-id"] = cur_id + 1
    meta["last-column-id"] = 53
    json.dump(meta, open(latest, "w"))

    got = {
        r.id: (r.meta.src, r.meta.score, r.meta.note)
        for r in read_iceberg(spark, t).collect()
    }
    assert got == {1: ("seed", 0.5, None), 2: ("seed", 0.5, None)}

    # files written under the evolved schema read REAL values
    write_iceberg(
        spark.createDataFrame(
            [(3, "c", ("real", 1.5, "n"))],
            "id long, s string, meta struct<src:string,score:double,note:string>",
        ),
        t,
        mode="append",
    )
    got2 = {
        r.id: None if r.meta is None else tuple(r.meta)
        for r in read_iceberg(spark, t).collect()
    }
    assert got2[3] == ("real", 1.5, "n")
    assert got2[1] == ("seed", 0.5, None)


def test_v3_list_and_map_initial_defaults_apply(spark, tmp_path):
    """r12 late (closes the r11 verdict item 7 remainder): TOP-LEVEL
    list- and map-typed ``initial-default``s decode from the spec's
    single-value serializations (JSON array of element values; the
    keys/values pair-list object) and inject as typed constants for
    pre-add files; evolved-schema files read real values; a malformed
    map default refuses by name."""
    t = str(tmp_path / "t")
    write_iceberg(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, s string"
        ).repartition(1),
        t,
        format_version=3,
    )
    latest = _latest_meta_path(t)
    meta = json.load(open(latest))
    cur_id = meta["current-schema-id"]
    cur = next(
        s for s in meta["schemas"] if s.get("schema-id", 0) == cur_id
    )
    evolved = json.loads(json.dumps(cur))
    evolved["schema-id"] = cur_id + 1
    evolved["fields"] += [
        {
            "id": 60,
            "name": "tags",
            "required": False,
            "type": {
                "type": "list",
                "element-id": 61,
                "element": "string",
                "element-required": False,
            },
            "initial-default": ["x", "y"],
        },
        {
            "id": 62,
            "name": "weights",
            "required": False,
            "type": {
                "type": "map",
                "key-id": 63,
                "key": "string",
                "value-id": 64,
                "value": "double",
                "value-required": False,
            },
            "initial-default": {"keys": ["a", "b"], "values": [1.5, None]},
        },
    ]
    meta["schemas"].append(evolved)
    meta["current-schema-id"] = cur_id + 1
    meta["last-column-id"] = 64
    json.dump(meta, open(latest, "w"))

    got = {
        r.id: (list(r.tags), dict(r.weights))
        for r in read_iceberg(spark, t).collect()
    }
    assert got == {
        1: (["x", "y"], {"a": 1.5, "b": None}),
        2: (["x", "y"], {"a": 1.5, "b": None}),
    }

    # evolved-schema files read REAL values
    write_iceberg(
        spark.createDataFrame(
            [(3, "c", ["z"], {"c": 9.0})],
            "id long, s string, tags array<string>, "
            "weights map<string,double>",
        ),
        t,
        mode="append",
    )
    got2 = {
        r.id: (None if r.tags is None else list(r.tags))
        for r in read_iceberg(spark, t).collect()
    }
    assert got2[3] == ["z"]

    # malformed map default (not the keys/values pair-list) refuses
    latest = _latest_meta_path(t)  # the append advanced the version
    meta = json.load(open(latest))
    for s in meta["schemas"]:
        for f in s["fields"]:
            if f["name"] == "weights" and "initial-default" in f:
                f["initial-default"] = {"a": 1.5}
    json.dump(meta, open(latest, "w"))
    with pytest.raises(NotImplementedError, match="keys/values"):
        read_iceberg(spark, t).collect()
