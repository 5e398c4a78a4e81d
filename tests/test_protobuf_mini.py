"""The vendored minimal protobuf runtime (vendor/protobuf_mini):
wire-format golden bytes (hand-assembled per
protobuf.dev/programming-guides/encoding), serialize/parse roundtrips,
proto3 presence semantics (implicit scalars, oneofs, attached child
messages), and descriptor bootstrap over PySpark's real generated
StateMessage_pb2. The END-TO-END differential test is
tests/test_stateful_v2.py — every message there is parsed by the JVM's
real protobuf."""

from __future__ import annotations

import pytest

from sparkstreamingtwitter_presidential_spark.vendor import ensure_protobuf

ensure_protobuf()

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402


def test_golden_wire_bytes_scalar_and_nested():
    # StateCallCommand{stateName="s1"(f1 str), schema="v"(f2 str),
    # ttl=TTLConfig{durationMs=5000 (f1 int64)}(f4 msg)}
    cmd = sm.StateCallCommand(
        stateName="s1", schema="v", ttl=sm.TTLConfig(durationMs=5000)
    )
    # 0a 02 "s1" | 12 01 "v" | 22 03 ( 08 varint(5000)=88 27 )
    assert cmd.SerializeToString().hex() == "0a02733112017622030888 27".replace(
        " ", ""
    )


def test_golden_varint_boundaries():
    # int64 field 2 of TimerInfo; negative -> 10-byte two's complement
    t = sm.TimerInfo(timestampMs=-1)
    assert t.SerializeToString().hex() == "10" + "ff" * 9 + "01"
    t2 = sm.TimerInfo()
    t2.ParseFromString(bytes.fromhex("10" + "ff" * 9 + "01"))
    assert t2.timestampMs == -1
    t3 = sm.TimerInfo(timestampMs=1 << 40)
    back = sm.TimerInfo()
    back.ParseFromString(t3.SerializeToString())
    assert back.timestampMs == 1 << 40


def test_proto3_implicit_presence_skips_defaults():
    # statusCode=0 (default int) must NOT serialize
    r = sm.StateResponse(statusCode=0, errorMessage="", value=b"")
    assert r.SerializeToString() == b""
    r2 = sm.StateResponse(statusCode=2)
    assert r2.SerializeToString() == bytes.fromhex("0802")


def test_oneof_set_clears_siblings_and_whichoneof():
    req = sm.ImplicitGroupingKeyRequest(
        setImplicitKey=sm.SetImplicitKey(key=b"k")
    )
    assert req.WhichOneof("method") == "setImplicitKey"
    req.removeImplicitKey = sm.RemoveImplicitKey()
    assert req.WhichOneof("method") == "removeImplicitKey"
    assert not req.HasField("setImplicitKey")
    # an empty oneof message still serializes (presence, len 0)
    assert req.SerializeToString().hex() == "1200"


def test_attached_child_mutation_marks_parent():
    cmd = sm.StateCallCommand()
    cmd.stateName = "s"
    cmd.ttl.durationMs = 1500  # pyspark's construction pattern
    assert cmd.HasField("ttl")
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.ttl.durationMs == 1500
    # reading without mutating must NOT create presence
    c2 = sm.StateCallCommand(stateName="x")
    _ = c2.ttl.durationMs
    assert not c2.HasField("ttl")
    assert c2.SerializeToString() == bytes.fromhex("0a0178")


def test_repeated_bytes_and_messages_roundtrip():
    r = sm.StateResponseWithListGet(
        statusCode=1, value=[b"a", b"", b"ccc"], requireNextFetch=True
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(r.SerializeToString())
    assert back.value == [b"a", b"", b"ccc"]
    assert back.requireNextFetch is True
    it = sm.StateResponseWithMapIterator(
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ]
    )
    back2 = sm.StateResponseWithMapIterator()
    back2.ParseFromString(it.SerializeToString())
    assert [(p.key, p.value) for p in back2.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]


def test_enum_constants_and_roundtrip():
    assert (sm.PRE_INIT, sm.CREATED, sm.INITIALIZED) == (0, 1, 2)
    assert (sm.DATA_PROCESSED, sm.TIMER_PROCESSED, sm.CLOSED) == (3, 4, 5)
    h = sm.SetHandleState(state=sm.TIMER_PROCESSED)
    back = sm.SetHandleState()
    back.ParseFromString(h.SerializeToString())
    assert back.state == sm.TIMER_PROCESSED


def test_unknown_fields_skipped_on_parse():
    # field 15 varint + field 14 length-delimited, unknown to TTLConfig
    payload = bytes.fromhex("780f" + "7203616263" + "08ac02")
    t = sm.TTLConfig()
    t.ParseFromString(payload)
    assert t.durationMs == 300


def test_proto3_optional_tracks_presence():
    # TimerInfo.key is proto3 `optional` (synthetic oneof)
    t = sm.TimerInfo(timestampMs=5)
    assert not t.HasField("key")
    t.key = b""
    assert t.HasField("key")
    back = sm.TimerInfo()
    back.ParseFromString(t.SerializeToString())
    assert back.HasField("key") and back.key == b""


def test_unknown_kwarg_and_field_refuse():
    with pytest.raises(ValueError, match="no field"):
        sm.TTLConfig(nope=1)
    with pytest.raises(AttributeError):
        _ = sm.TTLConfig().nope


def test_real_package_wins_when_present():
    import google.protobuf as gp

    from sparkstreamingtwitter_presidential_spark.vendor import _MINI_DIR

    kind = ensure_protobuf()
    vendored = (gp.__file__ or "").startswith(_MINI_DIR)
    assert kind == ("vendored" if vendored else "real")


def test_repeated_composite_add_and_roundtrip():
    """Gencode paths append repeated message fields via .add() — the
    r13 verdict noted plain lists would AttributeError there."""
    resp = sm.StateResponseWithTimer()
    t = resp.timer.add()
    t.timestampMs = 7
    resp.timer.add(timestampMs=9)
    assert [x.timestampMs for x in resp.timer] == [7, 9]
    back = sm.StateResponseWithTimer()
    back.ParseFromString(resp.SerializeToString())
    assert [x.timestampMs for x in back.timer] == [7, 9]
    # parsed containers expose .add() too (shared container path)
    back.timer.add(timestampMs=11)
    assert [x.timestampMs for x in back.timer] == [7, 9, 11]
    # assignment re-wraps into the .add()-capable container
    r2 = sm.StateResponseWithTimer()
    r2.timer = list(back.timer)
    r2.timer.add(timestampMs=13)
    assert len(r2.timer) == 4


def test_merge_from_and_singular_wire_merge():
    """MergeFrom concatenation semantics: repeated extends, singular
    scalars overwrite, singular MESSAGES merge field-wise (the wire
    spec's rule for repeated occurrences of a message field)."""
    a = sm.StateCallCommand(stateName="a", ttl=sm.TTLConfig(durationMs=5))
    b = sm.StateCallCommand(schema="v")
    b.MergeFrom(a)
    assert (b.stateName, b.schema, b.ttl.durationMs) == ("a", "v", 5)
    # two wire occurrences of the singular ttl field merge, not replace
    frag1 = sm.StateCallCommand(ttl=sm.TTLConfig(durationMs=3)).SerializeToString()
    frag2 = sm.StateCallCommand(stateName="z").SerializeToString()
    c = sm.StateCallCommand()
    c.ParseFromString(frag1 + frag2)
    assert (c.stateName, c.ttl.durationMs) == ("z", 3)
