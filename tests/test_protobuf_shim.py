"""Mini protobuf runtime (shims/google/protobuf): wire-format and message
semantics exercised against PySpark's REAL generated StateMessage_pb2 —
the module the state API v2 python worker imports. Golden wire bytes are
hand-derived from the public protobuf encoding spec, so a regression here
means JVM interop would break (the live interop itself is pinned by
tests/test_tws.py::test_live_tws_query_equals_batch_groupby)."""

import importlib.util

import pytest

from dataingestion_spark.streaming.tws import ensure_protobuf


@pytest.fixture(scope="module")
def sm():
    assert ensure_protobuf()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def _real_protobuf() -> bool:
    try:
        spec = importlib.util.find_spec("google.protobuf")
    except ModuleNotFoundError:
        return False
    return spec is not None and "shims" not in (spec.origin or "")


def test_golden_wire_bytes_nested_oneof(sm):
    """StateRequest{version=2, statefulProcessorCall{getValueState{
    stateName='counts', ttl{durationMs=5000}}}} — bytes derived by hand:
    08 02 = field1 varint 2; 12 LEN = field2 message; inside: 12 LEN =
    oneof member field2; inside: 0a 06 'counts', 22 03 (ttl field4):
    08 88 27 (varint 5000)."""
    cmd = sm.StateCallCommand()
    cmd.stateName = "counts"
    cmd.ttl.durationMs = 5000
    req = sm.StateRequest(
        version=2, statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd))
    assert req.SerializeToString() == bytes.fromhex(
        "0802120f120d0a06636f756e74732203088827")


def test_roundtrip_scalars_repeated_bool(sm):
    p = sm.ListStatePut(value=[b"a", b"bb"], fetchWithArrow=True)
    wire = p.SerializeToString()
    assert wire == bytes.fromhex("0a01610a0262621001")
    p2 = sm.ListStatePut()
    p2.ParseFromString(wire)
    assert list(p2.value) == [b"a", b"bb"] and p2.fetchWithArrow is True


def test_proto3_defaults_not_serialized(sm):
    assert sm.StateResponse().SerializeToString() == b""
    # default-valued scalar set explicitly: still skipped (not in a oneof)
    r = sm.StateResponse(statusCode=0)
    assert r.SerializeToString() == b""
    # non-default serializes
    assert sm.StateResponse(statusCode=1).SerializeToString() == b"\x08\x01"


def test_negative_int_two_complement(sm):
    r = sm.StateResponse(statusCode=-2)
    wire = r.SerializeToString()
    assert wire == b"\x08" + b"\xfe\xff\xff\xff\xff\xff\xff\xff\xff\x01"
    r2 = sm.StateResponse()
    r2.ParseFromString(wire)
    assert r2.statusCode == -2


def test_oneof_last_set_wins_and_clears(sm):
    r = sm.StateRequest()
    r.statefulProcessorCall.setHandleState.state = sm.CREATED
    assert r.WhichOneof("method") == "statefulProcessorCall"
    r.timerRequest.timerValueRequest.getWatermark.SetInParent()
    assert r.WhichOneof("method") == "timerRequest"
    assert not r.HasField("statefulProcessorCall")


def test_submessage_access_without_set_is_absent(sm):
    c = sm.StateCallCommand(stateName="x")
    _ = c.ttl.durationMs  # read-only peek must not create presence
    assert not c.HasField("ttl")
    assert c.SerializeToString() == b"\x0a\x01x"
    c.ttl.durationMs = 1  # nested write vivifies through the parent chain
    assert c.HasField("ttl")


def test_repeated_message_add_and_parse(sm):
    t = sm.StateResponseWithTimer(statusCode=0)
    t.timer.add(key=b"k1", timestampMs=123)
    t.timer.add(timestampMs=456)
    t2 = sm.StateResponseWithTimer()
    t2.ParseFromString(t.SerializeToString())
    assert [x.timestampMs for x in t2.timer] == [123, 456]
    assert t2.timer[0].key == b"k1"


def test_unknown_fields_skipped(sm):
    # field 99 varint + a valid statusCode — unknown field must be ignored
    wire = b"\x98\x06\x2a" + b"\x08\x07"
    r = sm.StateResponse()
    r.ParseFromString(wire)
    assert r.statusCode == 7


def test_enum_values_exported_like_gencode(sm):
    assert sm.PRE_INIT == 0
    assert sm.CLOSED == 5
    assert sm.HandleState.Name(2) == "INITIALIZED"
    assert sm.HandleState.Value("DATA_PROCESSED") == 3
