"""Minimal pure-Python FlatBuffers runtime (no third-party deps).

Implements the public FlatBuffers wire format — little-endian scalars,
back-to-front builder, vtable-indirected tables, length-prefixed vectors
and strings, 4-byte file identifier at bytes 4..8 — from the published
format spec. Only the subset the ESS streaming schemas need: scalar
fields, strings, scalar vectors, offset vectors, sub-tables, unions.

Why hand-rolled: the execution container has no ``flatbuffers`` package
and no network; the wire format is small and stable. The reference engine
parses the same layout natively (src/FlatbufferMessage.cpp:41-74 reads
the schema id at bytes 4..8 and dispatches on it).

Complexity note: the builder prepends into one bytearray (O(n) per push);
messages are a few KB, and encode runs only in fixtures/tests. The decode
path (`Table`) is what runs inside Spark workers and is allocation-light.
"""

from __future__ import annotations

import struct

__all__ = ["Builder", "Table", "root_table", "file_identifier"]

_SCALAR_SIZE = {fmt: struct.calcsize("<" + fmt) for fmt in "bBhHiIqQfd"}


class Builder:
    """Back-to-front FlatBuffers builder.

    Offsets returned by ``create_*`` / ``end_table`` are measured from the
    END of the finished buffer (the standard builder convention); they are
    converted to relative uoffsets when referenced.
    """

    def __init__(self) -> None:
        self.buf = bytearray()
        self.minalign = 1
        self._vtable: list[int] | None = None
        self._object_start = 0

    # -- low-level --------------------------------------------------------

    def _offset(self) -> int:
        return len(self.buf)

    def _push(self, data: bytes) -> None:
        self.buf[:0] = data

    def _pad(self, n: int) -> None:
        if n:
            self.buf[:0] = b"\x00" * n

    def _prep(self, align: int, extra: int) -> None:
        """Pad so that after writing ``extra`` bytes the next value is
        ``align``-aligned relative to buffer end (the final buffer is padded
        to ``minalign``, making end-relative alignment absolute)."""
        if align > self.minalign:
            self.minalign = align
        rem = (len(self.buf) + extra) % align
        if rem:
            self._pad(align - rem)

    def _push_scalar(self, fmt: str, value) -> None:
        size = _SCALAR_SIZE[fmt]
        self._prep(size, 0)
        self._push(struct.pack("<" + fmt, value))

    def _push_uoffset(self, target: int) -> None:
        """Push a 4-byte relative offset pointing at ``target``."""
        self._prep(4, 0)
        self._push(struct.pack("<I", (len(self.buf) + 4) - target))

    # -- objects ----------------------------------------------------------

    def create_string(self, s: str) -> int:
        data = s.encode("utf-8") + b"\x00"
        self._prep(4, len(data))
        self._push(data)
        self._push(struct.pack("<I", len(data) - 1))
        return self._offset()

    def create_vector(self, fmt: str, values) -> int:
        values = list(values)
        n = len(values)
        elem = _SCALAR_SIZE[fmt]
        self._prep(4, elem * n)
        self._prep(elem, elem * n)
        if n:
            self._push(struct.pack(f"<{n}{fmt}", *values))
        self._push(struct.pack("<I", n))
        return self._offset()

    def create_offset_vector(self, offsets: list[int]) -> int:
        self._prep(4, 4 * len(offsets))
        for off in reversed(offsets):
            self._push(struct.pack("<I", (len(self.buf) + 4) - off))
        self._push(struct.pack("<I", len(offsets)))
        return self._offset()

    # -- tables -----------------------------------------------------------

    def start_table(self, n_slots: int) -> None:
        self._vtable = [0] * n_slots
        self._object_start = self._offset()

    def add_scalar(self, slot: int, fmt: str, value, default=0) -> None:
        if value is None or value == default:
            return
        self._push_scalar(fmt, value)
        self._vtable[slot] = self._offset()

    def add_offset(self, slot: int, target: int | None) -> None:
        if not target:
            return
        self._push_uoffset(target)
        self._vtable[slot] = self._offset()

    def end_table(self) -> int:
        assert self._vtable is not None, "end_table without start_table"
        # placeholder for the soffset-to-vtable at the table head
        self._prep(4, 0)
        self._push(b"\x00\x00\x00\x00")
        table = self._offset()
        vt = self._vtable
        while vt and vt[-1] == 0:
            vt.pop()
        fields = [(table - off) if off else 0 for off in vt]
        vtable_len = 2 * (len(fields) + 2)
        self._push(
            struct.pack(
                f"<HH{len(fields)}H", vtable_len, table - self._object_start, *fields
            )
        )
        vtable = self._offset()
        # patch the soffset: vtable_pos = table_pos - soffset (end-relative
        # offsets invert the sign)
        struct.pack_into("<i", self.buf, len(self.buf) - table, vtable - table)
        self._vtable = None
        return table

    def finish(self, root: int, file_identifier: str | None = None) -> bytes:
        extra = 8 if file_identifier else 4
        self._prep(self.minalign, extra)
        if file_identifier:
            ident = file_identifier.encode("ascii")
            if len(ident) != 4:
                raise ValueError("file identifier must be 4 bytes")
            self._push(ident)
        self._push(struct.pack("<I", (len(self.buf) + 4) - root))
        return bytes(self.buf)


class Table:
    """vtable-indirected field access over a finished buffer."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos

    def _field(self, slot: int) -> int:
        soffset = struct.unpack_from("<i", self.buf, self.pos)[0]
        vtable = self.pos - soffset
        vtable_len = struct.unpack_from("<H", self.buf, vtable)[0]
        entry = 4 + 2 * slot
        if entry >= vtable_len:
            return 0
        off = struct.unpack_from("<H", self.buf, vtable + entry)[0]
        return self.pos + off if off else 0

    def scalar(self, slot: int, fmt: str, default=0):
        pos = self._field(slot)
        if not pos:
            return default
        return struct.unpack_from("<" + fmt, self.buf, pos)[0]

    def string(self, slot: int) -> str | None:
        pos = self._field(slot)
        if not pos:
            return None
        sp = pos + struct.unpack_from("<I", self.buf, pos)[0]
        n = struct.unpack_from("<I", self.buf, sp)[0]
        return self.buf[sp + 4 : sp + 4 + n].decode("utf-8")

    def vector(self, slot: int, fmt: str) -> list | None:
        pos = self._field(slot)
        if not pos:
            return None
        vp = pos + struct.unpack_from("<I", self.buf, pos)[0]
        n = struct.unpack_from("<I", self.buf, vp)[0]
        return list(struct.unpack_from(f"<{n}{fmt}", self.buf, vp + 4))

    def vector_len(self, slot: int) -> int:
        pos = self._field(slot)
        if not pos:
            return 0
        vp = pos + struct.unpack_from("<I", self.buf, pos)[0]
        return struct.unpack_from("<I", self.buf, vp)[0]

    def table(self, slot: int) -> "Table | None":
        pos = self._field(slot)
        if not pos:
            return None
        return Table(self.buf, pos + struct.unpack_from("<I", self.buf, pos)[0])

    def string_vector(self, slot: int) -> list[str]:
        pos = self._field(slot)
        if not pos:
            return []
        vp = pos + struct.unpack_from("<I", self.buf, pos)[0]
        n = struct.unpack_from("<I", self.buf, vp)[0]
        out = []
        for i in range(n):
            ep = vp + 4 + 4 * i
            sp = ep + struct.unpack_from("<I", self.buf, ep)[0]
            ln = struct.unpack_from("<I", self.buf, sp)[0]
            out.append(self.buf[sp + 4 : sp + 4 + ln].decode("utf-8"))
        return out

    def table_vector(self, slot: int) -> "list[Table]":
        pos = self._field(slot)
        if not pos:
            return []
        vp = pos + struct.unpack_from("<I", self.buf, pos)[0]
        n = struct.unpack_from("<I", self.buf, vp)[0]
        out = []
        for i in range(n):
            ep = vp + 4 + 4 * i
            out.append(Table(self.buf, ep + struct.unpack_from("<I", self.buf, ep)[0]))
        return out


def root_table(buf: bytes) -> Table:
    return Table(buf, struct.unpack_from("<I", buf, 0)[0])


def file_identifier(buf: bytes) -> str:
    """Schema id at bytes 4..8 (reference FlatbufferMessage.cpp:47)."""
    if len(buf) < 8:
        raise ValueError(f"flatbuffer was only {len(buf)} bytes, expected >= 8")
    return bytes(buf[4:8]).decode("ascii", errors="replace")
