"""Golden-frame tests pinning the adapter wire formats without grpcio /
flatbuffers (absent from this environment).

The reference wire (adapter/src/grpc.rs:33-104) is a gRPC message holding a
single `bytes flatbuffer` protobuf field whose payload is a FlatBuffers
document. These tests pin:

1. the protobuf envelope bytes (tag 0x0A + varint length + payload),
2. a HAND-ENCODED FlatBuffers table (written out field-by-field from the
   public format spec, independent of our builder) that our reader must
   decode,
3. the builder's own deterministic output as golden hex, so a future
   real-library integration can be diffed byte-for-byte,
4. (gated) cross-validation against the real flatbuffers package if it
   ever appears in the environment.
"""

from __future__ import annotations

import struct

import pytest

from kamu_engine_flink_spark.protocol import fb_wire as W

WATERMARK = "2000-01-05T00:00:00Z"


# ------------------------------------------------------------ protobuf envelope

def test_envelope_golden_bytes():
    assert W.encode_grpc_envelope(b"\xde\xad\xbe\xef") == bytes.fromhex("0a04deadbeef")
    # multi-byte varint length (300 = 0xAC 0x02)
    big = b"x" * 300
    framed = W.encode_grpc_envelope(big)
    assert framed[:3] == bytes.fromhex("0aac02")
    assert W.decode_grpc_envelope(framed) == big


def test_envelope_skips_unknown_fields():
    framed = W.encode_grpc_envelope(b"pay")
    # unknown varint field 2, unknown fixed32 field 3, then the payload
    assert W.decode_grpc_envelope(b"\x10\x05" + b"\x1d\x01\x02\x03\x04" + framed) == b"pay"


def test_envelope_truncated_raises():
    with pytest.raises(ValueError):
        W.decode_grpc_envelope(bytes.fromhex("0a09abcd"))


# ----------------------------------------------------- hand-encoded golden frame

def _hand_encoded_interval_response() -> bytes:
    """A TransformResponse-Success-shaped table written out by hand from
    the public FlatBuffers v1 spec: slot0 int64 start=10, slot1 int64
    end=19, slot2 string watermark. Layout: [u32 root uoffset][pad]
    [vtable: u16 size, u16 table_size, u16 slot rels][i32 soffset][pad]
    [fields][string child]."""
    buf = bytearray()
    buf += struct.pack("<I", 16)          # root uoffset -> table at 16
    buf += b"\x00\x00"                    # pad
    buf += struct.pack("<HH", 10, 28)     # vtable: size 10, table size 28
    buf += struct.pack("<HHH", 8, 16, 24)  # slot rels
    buf += struct.pack("<i", 10)          # soffset: table(16) - vtable(6)
    buf += b"\x00" * 4                    # pad to 8-aligned field
    buf += struct.pack("<q", 10)          # slot0 start
    buf += struct.pack("<q", 19)          # slot1 end
    buf += struct.pack("<I", 4)           # slot2 uoffset -> string at 44
    raw = WATERMARK.encode()
    buf += struct.pack("<I", len(raw)) + raw + b"\x00"
    return bytes(buf)


def test_reader_decodes_hand_encoded_frame():
    buf = _hand_encoded_interval_response()
    t = W.FBTable(buf)
    assert t.scalar(0, "int64") == 10
    assert t.scalar(1, "int64") == 19
    assert t.string(2) == WATERMARK
    # absent slots return defaults, per spec
    assert t.scalar(5, "int64", default=-1) == -1
    assert t.string(7) is None


def test_builder_matches_hand_encoding():
    built = W.FBBuilder(
        {0: ("int64", 10), 1: ("int64", 19), 2: ("string", WATERMARK)}
    ).finish()
    assert built == _hand_encoded_interval_response()


# ------------------------------------------------------------ pinned builder hex

GOLDEN_FLAT_HEX = (
    "1000000000000a001c000800100018000a000000000000000a00000000000000"
    "13000000000000000400000014000000323030302d30312d30355430303a3030"
    "3a30305a00"
)

GOLDEN_NESTED_HEX = (
    "1000000000000a001000040008000c000a000000140000002800000001000000"
    "0800180008001000080000000000000000000000000000002900000000000000"
    "14000000323030302d30312d30355430303a30303a30305a00"
)


def test_builder_golden_hex_stable():
    built = W.FBBuilder(
        {0: ("int64", 10), 1: ("int64", 19), 2: ("string", WATERMARK)}
    ).finish()
    assert built.hex() == GOLDEN_FLAT_HEX


def test_nested_table_golden_and_decode():
    child = W.FBBuilder({0: ("int64", 0), 1: ("int64", 41)}).finish_child()
    parent = W.FBBuilder(
        {0: ("table", child), 1: ("string", WATERMARK), 2: ("bool", True)}
    ).finish()
    assert parent.hex() == GOLDEN_NESTED_HEX
    t = W.FBTable(parent)
    interval = t.table(0)
    assert interval.scalar(0, "int64") == 0
    assert interval.scalar(1, "int64") == 41
    assert t.string(1) == WATERMARK
    assert t.scalar(2, "bool", default=False) is True
    # 8-byte scalars must be naturally aligned in the final buffer
    # (required by the spec for zero-copy readers).
    assert interval._field_pos(0) % 8 == 0


def test_full_wire_frame_roundtrip():
    """The complete gRPC message body as the reference sends it:
    protobuf envelope wrapping the FlatBuffers document."""
    flat = W.FBBuilder(
        {0: ("int64", 10), 1: ("int64", 19), 2: ("string", WATERMARK)}
    ).finish()
    frame = W.encode_grpc_envelope(flat)
    assert frame[0] == 0x0A and frame[1] == len(flat)
    out = W.FBTable(W.decode_grpc_envelope(frame))
    assert (out.scalar(0, "int64"), out.scalar(1, "int64"), out.string(2)) == (
        10, 19, WATERMARK,
    )


# ------------------------------------------------- real-library cross-validation

def test_reader_decodes_official_library_buffer():
    """If the real flatbuffers package ever lands in the environment, our
    reader must decode its output (readers are layout-agnostic: they only
    follow vtables and uoffsets)."""
    flatbuffers = pytest.importorskip("flatbuffers")
    b = flatbuffers.Builder(64)
    s = b.CreateString(WATERMARK)
    b.StartObject(3)
    b.PrependInt64Slot(0, 10, 0)
    b.PrependInt64Slot(1, 19, 0)
    b.PrependUOffsetTRelativeSlot(2, s, 0)
    root = b.EndObject()
    b.Finish(root)
    t = W.FBTable(bytes(b.Output()))
    assert (t.scalar(0, "int64"), t.scalar(1, "int64"), t.string(2)) == (
        10, 19, WATERMARK,
    )
