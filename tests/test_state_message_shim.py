"""Unit tests for the protobuf wire shim (streaming/state_message_shim.py).

The end-to-end proof is the TWS streaming gate (the JVM's protobuf-java
parses every byte the shim emits); these pin the wire-format corners the
gate would surface only as an opaque crash.
"""

import pytest

from aws_logs_parquet_converter_spark.streaming.state_message_shim import (
    ensure_installed,
)


@pytest.fixture(scope="module")
def sm():
    ensure_installed()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as mod

    return mod


def test_oneof_case_survives_default_value(sm):
    """SetHandleState(state=PRE_INIT) serializes the enum explicitly even
    though PRE_INIT == 0 — and the oneof member wrapping it is present, so
    the JVM's MethodCase dispatch sees SETHANDLESTATE, not METHOD_NOT_SET."""
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.PRE_INIT)
        )
    )
    # field 2 (statefulProcessorCall) LEN { field 1 LEN { field 1 varint 0 } }
    assert req.SerializeToString() == bytes.fromhex("12040a020800")


def test_unset_fields_are_not_serialized(sm):
    assert sm.StateRequest().SerializeToString() == b""
    assert sm.Exists().SerializeToString() == b""


def test_defaults_on_read(sm):
    resp = sm.StateResponse()
    resp.ParseFromString(b"")
    assert (resp.statusCode, resp.errorMessage, resp.value) == (0, "", b"")


def test_negative_int64_ten_byte_varint(sm):
    msg = sm.RegisterTimer(expiryTimestampMs=-1)
    data = msg.SerializeToString()
    # proto3: negatives are 64-bit two's complement -> 10-byte varint
    assert data == bytes([0x08]) + b"\xff" * 9 + b"\x01"
    back = sm.RegisterTimer()
    back.ParseFromString(data)
    assert back.expiryTimestampMs == -1


def test_repeated_bytes_roundtrip(sm):
    msg = sm.ListStatePut(value=[b"a", b"", b"ccc"], fetchWithArrow=True)
    back = sm.ListStatePut()
    back.ParseFromString(msg.SerializeToString())
    assert list(back.value) == [b"a", b"", b"ccc"]
    assert back.fetchWithArrow is True


def test_repeated_message_and_bool(sm):
    inner = [sm.TimerInfo(key=b"k1", timestampMs=7), sm.TimerInfo(key=b"k2", timestampMs=9)]
    msg = sm.StateResponseWithTimer(statusCode=0, timer=inner, requireNextFetch=True)
    back = sm.StateResponseWithTimer()
    back.ParseFromString(msg.SerializeToString())
    assert [(t.key, t.timestampMs) for t in back.timer] == [(b"k1", 7), (b"k2", 9)]
    assert back.requireNextFetch is True


def test_unknown_fields_skipped(sm):
    """Forward compat: a response carrying fields this shim doesn't know
    (varint, len, fixed32, fixed64) parses cleanly around them."""
    known = sm.StateResponseWithLongTypeVal(value=41).SerializeToString()
    unknown = (
        bytes([5 << 3 | 0, 0x05])  # field 5 varint
        + bytes([6 << 3 | 2, 0x02, 0xAB, 0xCD])  # field 6 len-delimited
        + bytes([7 << 3 | 5]) + b"\x01\x02\x03\x04"  # field 7 fixed32
        + bytes([8 << 3 | 1]) + b"\x01\x02\x03\x04\x05\x06\x07\x08"  # fixed64
    )
    back = sm.StateResponseWithLongTypeVal()
    back.ParseFromString(unknown + known)
    assert back.value == 41


def test_utf8_string_roundtrip(sm):
    msg = sm.ParseStringSchema(schema="value STRING, n BIGINT — ünïcode")
    back = sm.ParseStringSchema()
    back.ParseFromString(msg.SerializeToString())
    assert back.schema == "value STRING, n BIGINT — ünïcode"


def test_unknown_attribute_rejected(sm):
    with pytest.raises(AttributeError):
        sm.StateRequest(bogusField=1)
    with pytest.raises(AttributeError):
        sm.StateRequest().bogus
