"""Hand-written, wire-compatible stand-in for the protoc output of
evaluation.proto (see that file for why it is not protoc-generated).

`Package` implements exactly the proto3 encoding of
    message Package { bytes SerializedEntity = 1; }
— field tag 0x0A (field 1, wire type 2 length-delimited), varint length,
payload; an empty/default field serializes to the empty message. Unknown
fields from a newer peer are skipped on parse, as protobuf requires."""

from __future__ import annotations


def _encode_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _decode_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


class Package:
    """proto3 `evaluation.Package`."""

    __slots__ = ("SerializedEntity",)

    def __init__(self, SerializedEntity: bytes = b""):
        self.SerializedEntity = bytes(SerializedEntity)

    def SerializeToString(self) -> bytes:
        if not self.SerializedEntity:
            return b""
        return (b"\x0a" + _encode_varint(len(self.SerializedEntity))
                + self.SerializedEntity)

    @classmethod
    def FromString(cls, data: bytes) -> "Package":
        msg = cls()
        msg.MergeFromString(data)
        return msg

    def MergeFromString(self, data: bytes) -> int:
        pos = 0
        while pos < len(data):
            key, pos = _decode_varint(data, pos)
            field, wire = key >> 3, key & 0x7
            if wire == 2:  # length-delimited
                length, pos = _decode_varint(data, pos)
                chunk, pos = data[pos:pos + length], pos + length
                if len(chunk) != length:
                    raise ValueError("truncated field")
                if field == 1:
                    self.SerializedEntity = bytes(chunk)
            elif wire == 0:  # varint (unknown field)
                _, pos = _decode_varint(data, pos)
            elif wire == 5:  # 32-bit
                pos += 4
            elif wire == 1:  # 64-bit
                pos += 8
            else:
                raise ValueError(f"unsupported wire type {wire}")
        return pos

    def __eq__(self, other):
        return (isinstance(other, Package)
                and self.SerializedEntity == other.SerializedEntity)

    def __repr__(self):
        return f"Package(SerializedEntity={self.SerializedEntity!r})"
