"""Minimal pure-stdlib FlatBuffers + gRPC-envelope wire codec.

The reference adapter's wire (adapter/src/grpc.rs:33-104) is:

    gRPC message  := protobuf { bytes flatbuffer = 1; }   (engine.proto)
    flatbuffer    := FlatBuffers-encoded ODF engine IR document

Neither grpcio nor flatbuffers is installable in this environment, so this
module pins the two public formats involved without the libraries:

* ``encode_grpc_envelope`` / ``decode_grpc_envelope`` — the protobuf
  wrapper message, a single length-delimited ``bytes`` field (tag 1, wire
  type 2), exactly what ``TransformRequestGRPC { flatbuffer }`` /
  ``TransformResponseGRPC { flatbuffer }`` carry.
* ``FBBuilder`` / ``FBTable`` — the generic FlatBuffers v1 binary format
  (little-endian; u32 root uoffset -> table; table's leading i32 soffset
  back to a vtable of u16 [vtable_size, table_size, per-slot rel offsets];
  strings as forward u32-uoffset -> u32 length + bytes + NUL). Layout here
  is deterministic: ``[root uoffset][pad][vtable][table][children]``.

Binding the ODF-specific field ordering additionally needs the ODF ``.fbs``
schema (generated in the open-data-fabric repo); the codec below is the
schema-independent layer a generated binding would sit on, and
``tests/test_fb_wire.py`` pins its bytes with hand-encoded golden frames so
a future real-library integration can be verified against them byte-for-byte.
"""

from __future__ import annotations

import struct

# ----------------------------------------------------------------- protobuf

_FLATBUFFER_FIELD_TAG = 0x0A  # field 1, wire type 2 (length-delimited)


def _write_varint(value: int) -> bytes:
    out = bytearray()
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    value = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        byte = buf[pos]
        pos += 1
        value |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return value, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def encode_grpc_envelope(flatbuffer: bytes) -> bytes:
    """Protobuf-encode ``{ bytes flatbuffer = 1; }``."""
    return bytes([_FLATBUFFER_FIELD_TAG]) + _write_varint(len(flatbuffer)) + flatbuffer


def decode_grpc_envelope(message: bytes) -> bytes:
    """Extract the ``flatbuffer`` field; unknown fields are skipped like a
    proto3 decoder would, so forward-compatible envelopes still parse."""
    pos = 0
    payload = b""
    while pos < len(message):
        key, pos = _read_varint(message, pos)
        field, wire = key >> 3, key & 0x07
        if wire == 2:
            length, pos = _read_varint(message, pos)
            if pos + length > len(message):
                raise ValueError("truncated length-delimited field")
            if field == 1:
                payload = message[pos : pos + length]
            pos += length
        elif wire == 0:
            _, pos = _read_varint(message, pos)
        elif wire == 5:
            pos += 4
        elif wire == 1:
            pos += 8
        else:
            raise ValueError(f"unsupported protobuf wire type {wire}")
    return payload


# --------------------------------------------------------------- flatbuffers

_SCALAR = {
    "int64": ("<q", 8),
    "uint64": ("<Q", 8),
    "float64": ("<d", 8),
    "int32": ("<i", 4),
    "uint32": ("<I", 4),
    "bool": ("<B", 1),
}


class FBBuilder:
    """Builds one root table with scalar / string / nested-table fields.

    ``fields`` maps slot index -> ("int64"|"uint64"|"float64"|"int32"|
    "uint32"|"bool"|"string"|"table", value); a "table" value is the
    ``(payload, table_off)`` pair returned by a child builder's
    ``finish_child()``. The layout is deterministic (vtable, then table
    with fields by descending alignment, then children in slot order,
    everything naturally aligned), so output bytes are stable and
    golden-testable.
    """

    def __init__(self, fields: dict[int, tuple[str, object]]):
        self.fields = fields

    def finish(self) -> bytes:
        """Full buffer: ``[u32 root uoffset][pad][vtable][table][children]``."""
        payload, table_off = self._build(prefix=4)
        buf = bytearray(payload)
        struct.pack_into("<I", buf, 0, table_off)
        return bytes(buf)

    def finish_child(self) -> tuple[bytes, int]:
        """Nested-table sub-buffer (no root uoffset): ``(payload,
        table_offset_within_payload)``; the table offset is 8-aligned so a
        parent appending at an 8-aligned position keeps scalars aligned."""
        return self._build(prefix=0)

    def _build(self, prefix: int) -> tuple[bytes, int]:
        num_slots = max(self.fields) + 1 if self.fields else 0
        # Inline layout: leading i32 soffset at rel 0, then fields by
        # descending alignment, naturally aligned relative to table start.
        order = sorted(
            self.fields.items(),
            key=lambda kv: (-self._align(kv[1][0]), kv[0]),
        )
        rel = 4
        rel_offsets: dict[int, int] = {}
        for slot, (kind, _) in order:
            a = self._align(kind)
            rel = (rel + a - 1) // a * a
            rel_offsets[slot] = rel
            rel += self._size(kind)
        table_size = (rel + 3) // 4 * 4
        vtable_size = 4 + 2 * num_slots

        # Table start 8-aligned (counting the prefix) so 8-byte scalar
        # rels (all % 8 == 0 by the descending-alignment layout... rel=8
        # for the first) land absolutely aligned.
        table_pos = (prefix + vtable_size + 7) // 8 * 8
        vtable_pos = table_pos - vtable_size

        buf = bytearray(table_pos + table_size)
        struct.pack_into("<H", buf, vtable_pos, vtable_size)
        struct.pack_into("<H", buf, vtable_pos + 2, table_size)
        for slot in range(num_slots):
            struct.pack_into(
                "<H", buf, vtable_pos + 4 + 2 * slot, rel_offsets.get(slot, 0)
            )
        struct.pack_into("<i", buf, table_pos, table_pos - vtable_pos)  # soffset

        # Scalars inline; reference fields get forward uoffsets to children
        # appended past the table, in ascending slot order.
        for slot, (kind, value) in order:
            if kind in _SCALAR:
                fmt, _ = _SCALAR[kind]
                struct.pack_into(
                    fmt, buf, table_pos + rel_offsets[slot],
                    int(value) if kind == "bool" else value,
                )
        for slot, (kind, value) in sorted(self.fields.items()):
            if kind in _SCALAR:
                continue
            abs_pos = table_pos + rel_offsets[slot]
            if kind == "string":
                raw = value.encode("utf-8") if isinstance(value, str) else bytes(value)
                buf.extend(b"\x00" * ((-len(buf)) % 4))
                struct.pack_into("<I", buf, abs_pos, len(buf) - abs_pos)
                buf.extend(struct.pack("<I", len(raw)) + raw + b"\x00")
            elif kind == "table":
                child_payload, child_off = value
                buf.extend(b"\x00" * ((-len(buf)) % 8))
                struct.pack_into("<I", buf, abs_pos, len(buf) + child_off - abs_pos)
                buf.extend(child_payload)
            else:
                raise ValueError(f"unsupported field kind {kind!r}")
        return bytes(buf), table_pos

    @staticmethod
    def _align(kind: str) -> int:
        return _SCALAR[kind][1] if kind in _SCALAR else 4

    @staticmethod
    def _size(kind: str) -> int:
        return _SCALAR[kind][1] if kind in _SCALAR else 4


class FBTable:
    """Reads any spec-conformant FlatBuffers table (not just this
    builder's layout): resolves slots through the vtable, follows forward
    uoffsets for strings, returns defaults for absent slots."""

    def __init__(self, buf: bytes, pos: int | None = None):
        self.buf = buf
        self.pos = struct.unpack_from("<I", buf, 0)[0] if pos is None else pos

    def _field_pos(self, slot: int) -> int | None:
        soffset = struct.unpack_from("<i", self.buf, self.pos)[0]
        vtable = self.pos - soffset
        vtable_size = struct.unpack_from("<H", self.buf, vtable)[0]
        if 4 + 2 * slot >= vtable_size:
            return None
        rel = struct.unpack_from("<H", self.buf, vtable + 4 + 2 * slot)[0]
        return self.pos + rel if rel else None

    def scalar(self, slot: int, kind: str, default=0):
        pos = self._field_pos(slot)
        if pos is None:
            return default
        value = struct.unpack_from(_SCALAR[kind][0], self.buf, pos)[0]
        return bool(value) if kind == "bool" else value

    def string(self, slot: int) -> str | None:
        pos = self._field_pos(slot)
        if pos is None:
            return None
        target = pos + struct.unpack_from("<I", self.buf, pos)[0]
        length = struct.unpack_from("<I", self.buf, target)[0]
        return self.buf[target + 4 : target + 4 + length].decode("utf-8")

    def table(self, slot: int) -> "FBTable | None":
        pos = self._field_pos(slot)
        if pos is None:
            return None
        return FBTable(self.buf, pos + struct.unpack_from("<I", self.buf, pos)[0])
