"""Minimal pure-Python HDF5 writer/reader (no h5py in the container).

Implements the subset of the public HDF5 File Format Specification the
NeXus pack step needs, in the modern (1.8+) encoding:

- superblock version 2 (Jenkins lookup3 checksummed),
- version-2 object headers (``OHDR``),
- compact "new style" groups: Link Info + Group Info + Link messages,
- contiguous-layout N-D datasets of the fixed-point / IEEE-float types,
- chunked-layout datasets (v1 B-tree chunk index, single level-0 node),
- variable-length UTF-8 string datasets/attributes (global-heap backed,
  h5py-compatible default for str data — HDFOperations.cpp:238-287),
- fixed-length string datasets/attributes (null-terminated, via S dtypes),
- attribute messages (v3), hard links (shared object header address).

The writer exposes an h5py-like facade (``File``, ``require_group``,
``create_dataset``, ``attrs``, ``f[link] = f[target]``) over an in-memory
tree; serialization happens once at ``close()``, bottom-up, so every
object header address is known before anything references it. Hard links
fall out naturally: linking stores the same node object, and the
serializer memoizes node → address.

The reader parses the same subset independently (per spec, not by
reversing the writer) and is used by tests to verify packed files; any
HDF5-1.8+ tool can read these files where one exists.

Reference parity targets: src/NeXusDataset/NeXusDataset.h:22-153 (dataset
creation), src/HDFFile.cpp:129-181 (file metadata), :238-247 (links).
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

MAGIC = b"\x89HDF\r\n\x1a\n"
UNDEF = 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# Jenkins lookup3 (hashlittle) — the checksum HDF5 uses for v2 metadata
# ---------------------------------------------------------------------------

def _rot(x: int, k: int) -> int:
    x &= 0xFFFFFFFF
    return ((x << k) | (x >> (32 - k))) & 0xFFFFFFFF


def jenkins_lookup3(data: bytes, initval: int = 0) -> int:
    length = len(data)
    a = b = c = (0xDEADBEEF + length + initval) & 0xFFFFFFFF
    i = 0
    while length > 12:
        a = (a + int.from_bytes(data[i : i + 4], "little")) & 0xFFFFFFFF
        b = (b + int.from_bytes(data[i + 4 : i + 8], "little")) & 0xFFFFFFFF
        c = (c + int.from_bytes(data[i + 8 : i + 12], "little")) & 0xFFFFFFFF
        # mix
        a = (a - c) & 0xFFFFFFFF; a ^= _rot(c, 4); c = (c + b) & 0xFFFFFFFF
        b = (b - a) & 0xFFFFFFFF; b ^= _rot(a, 6); a = (a + c) & 0xFFFFFFFF
        c = (c - b) & 0xFFFFFFFF; c ^= _rot(b, 8); b = (b + a) & 0xFFFFFFFF
        a = (a - c) & 0xFFFFFFFF; a ^= _rot(c, 16); c = (c + b) & 0xFFFFFFFF
        b = (b - a) & 0xFFFFFFFF; b ^= _rot(a, 19); a = (a + c) & 0xFFFFFFFF
        c = (c - b) & 0xFFFFFFFF; c ^= _rot(b, 4); b = (b + a) & 0xFFFFFFFF
        i += 12
        length -= 12
    tail = data[i:] + b"\x00" * (12 - length)
    if length > 0:
        a = (a + int.from_bytes(tail[0:4], "little")) & 0xFFFFFFFF
        b = (b + int.from_bytes(tail[4:8], "little")) & 0xFFFFFFFF
        c = (c + int.from_bytes(tail[8:12], "little")) & 0xFFFFFFFF
        # final
        c ^= b; c = (c - _rot(b, 14)) & 0xFFFFFFFF
        a ^= c; a = (a - _rot(c, 11)) & 0xFFFFFFFF
        b ^= a; b = (b - _rot(a, 25)) & 0xFFFFFFFF
        c ^= b; c = (c - _rot(b, 16)) & 0xFFFFFFFF
        a ^= c; a = (a - _rot(c, 4)) & 0xFFFFFFFF
        b ^= a; b = (b - _rot(a, 14)) & 0xFFFFFFFF
        c ^= b; c = (c - _rot(b, 24)) & 0xFFFFFFFF
    return c


# ---------------------------------------------------------------------------
# Datatype / dataspace / message encoding
# ---------------------------------------------------------------------------

_FIXED = {  # numpy kind/size → (signed,)
    ("i", 1): True, ("i", 2): True, ("i", 4): True, ("i", 8): True,
    ("u", 1): False, ("u", 2): False, ("u", 4): False, ("u", 8): False,
}
_FLOAT_PROPS = {
    4: (32, 23, 8, 0, 23, 127, 31),
    8: (64, 52, 11, 0, 52, 1023, 63),
}


def _dt_message(dtype: np.dtype) -> bytes:
    """Datatype message body for a little-endian numpy dtype."""
    kind, size = dtype.kind, dtype.itemsize
    if kind == "b":
        kind, size = "u", 1
    if (kind, size) in _FIXED:
        signed = 0x08 if kind == "i" else 0x00
        head = struct.pack("<BBBBI", 0x10, signed, 0, 0, size)
        return head + struct.pack("<HH", 0, 8 * size)
    if kind == "f" and size in _FLOAT_PROPS:
        prec, mant_sz, exp_sz, mant_loc, exp_loc_sz, bias, sign_loc = _FLOAT_PROPS[size]
        exp_loc = mant_sz
        head = struct.pack("<BBBBI", 0x11, 0x20, sign_loc, 0, size)
        return head + struct.pack(
            "<HHBBBBI", 0, prec, exp_loc, exp_sz, mant_loc, mant_sz, bias
        )
    if kind == "S":
        # fixed-length string, null-padded, ASCII/UTF-8
        head = struct.pack("<BBBBI", 0x13, 0x10, 0, 0, size)
        return head
    raise TypeError(f"unsupported dtype for minimal HDF5 writer: {dtype}")


# Sentinel dtype marker for variable-length UTF-8 strings (node data is a
# numpy object array of Python str; file data is 16-byte global-heap IDs).
VLEN_STR = "vlen_str"

# vlen descriptor on disk: uint32 byte length + global heap ID
# (8-byte collection address + 4-byte object index) = 16 bytes.
_VLEN_DESC = struct.Struct("<IQI")


def _dt_message_vlen_str() -> bytes:
    """Class-9 (variable-length) datatype: type=string, null-terminated,
    UTF-8; base type = 1-byte UTF-8 string (libhdf5 convention)."""
    head = struct.pack("<BBBBI", 0x19, 0x01, 0x01, 0, _VLEN_DESC.size)
    return head + _dt_message(np.dtype("S1"))


def _dt_decode(body: bytes):
    ver_class = body[0]
    cls = ver_class & 0x0F
    bits0 = body[1]
    size = struct.unpack_from("<I", body, 4)[0]
    if cls == 0:
        signed = bool(bits0 & 0x08)
        return np.dtype(f"<{'i' if signed else 'u'}{size}")
    if cls == 1:
        return np.dtype(f"<f{size}")
    if cls == 3:
        return np.dtype(f"S{size}")
    if cls == 9 and (bits0 & 0x0F) == 1:
        return VLEN_STR
    raise TypeError(f"unsupported datatype class {cls}")


def _dataspace_message(shape: tuple[int, ...]) -> bytes:
    if shape == ():
        return struct.pack("<BBBB", 2, 0, 0, 0)  # v2 scalar
    return struct.pack("<BBBB", 2, len(shape), 0, 1) + b"".join(
        struct.pack("<Q", d) for d in shape
    )


def _dataspace_decode(body: bytes) -> tuple[int, ...]:
    version = body[0]
    if version == 2:
        rank, _flags, stype = body[1], body[2], body[3]
        if stype == 0:
            return ()
        return tuple(
            struct.unpack_from("<Q", body, 4 + 8 * i)[0] for i in range(rank)
        )
    if version == 1:
        rank, flags = body[1], body[2]
        return tuple(
            struct.unpack_from("<Q", body, 8 + 8 * i)[0] for i in range(rank)
        )
    raise ValueError(f"unsupported dataspace version {version}")


def _fill_message() -> bytes:
    # v3: alloc time = early (1), write time = on alloc (0), fill undefined
    return struct.pack("<BB", 3, 0b00010001)


def _layout_message(addr: int, nbytes: int) -> bytes:
    return struct.pack("<BBQQ", 3, 1, addr if nbytes else UNDEF, nbytes)


def _layout_message_chunked(
    btree_addr: int, chunk_shape: tuple[int, ...], itemsize: int
) -> bytes:
    # v3 layout, class 2 (chunked): dimensionality counts the trailing
    # element-size dimension; chunk dims are 4-byte values.
    dims = (*chunk_shape, itemsize)
    return (
        struct.pack("<BBB", 3, 2, len(dims))
        + struct.pack("<Q", btree_addr)
        + b"".join(struct.pack("<I", d) for d in dims)
    )


def _gcol(strings: list[bytes | tuple[bytes, int]]) -> bytes:
    """Global Heap Collection holding one object per string (index 1..N),
    terminated by the free-space object 0. Collections are at least 4096
    bytes — libhdf5's H5HG_MINSIZE, which the format spec expects — so
    spec-strict readers don't reject the heap; the slack is declared as
    object 0's free space. Entries may be ``(bytes, refcount)`` pairs
    (the pooled-heap dedup path) or plain bytes (refcount 1)."""
    objs = bytearray()
    for i, entry in enumerate(strings, start=1):
        s, refs = entry if isinstance(entry, tuple) else (entry, 1)
        pad = (-len(s)) % 8
        # refcount is a 16-bit field; the pooled heap sets it to the
        # occurrence count, which can exceed 65535 (a shared empty units
        # attr at very large source counts). Clamp: refcounts only drive
        # deletion tracking, which this write-once serializer never does.
        objs += struct.pack("<HHIQ", i, min(refs, 0xFFFF), 0, len(s)) + s + b"\x00" * pad
    used = 16 + len(objs)  # GCOL header + object blocks
    total = max(4096, used + 16)
    total += (-total) % 8
    free = total - used  # >= 16: room for object 0's own header
    objs += struct.pack("<HHIQ", 0, 0, 0, free) + b"\x00" * (free - 16)
    return b"GCOL" + struct.pack("<BBB", 1, 0, 0) + b"\x00" + struct.pack(
        "<Q", total
    ) + bytes(objs)


def _chunk_grid(shape: tuple[int, ...], chunk_shape: tuple[int, ...]):
    """Yield chunk-origin coordinates in row-major order."""
    from itertools import product

    ranges = [range(0, max(d, 1), c) for d, c in zip(shape, chunk_shape)]
    yield from product(*ranges)


def _link_info_message() -> bytes:
    return struct.pack("<BBQQ", 1, 0, UNDEF, UNDEF)


def _group_info_message() -> bytes:
    return struct.pack("<BB", 1, 0)


def _link_message(name: str, header_addr: int) -> bytes:
    raw = name.encode("utf-8")
    if len(raw) < 256:
        return struct.pack("<BBB", 1, 0, len(raw)) + raw + struct.pack("<Q", header_addr)
    return (
        struct.pack("<BBH", 1, 0b01, len(raw)) + raw + struct.pack("<Q", header_addr)
    )


def _coerce_attr(value):
    """Returns (payload, dtype, shape); dtype is VLEN_STR for str values
    (h5py's default for Python strings), a numpy dtype otherwise. Pass
    numpy ``S`` data explicitly for fixed-length strings."""
    if isinstance(value, str):
        return [value], VLEN_STR, ()
    arr = np.asarray(value)
    if arr.dtype.kind == "U" or (
        arr.dtype == object and all(isinstance(v, str) for v in arr.ravel())
    ):
        return [str(v) for v in arr.ravel()], VLEN_STR, arr.shape
    if arr.dtype.kind in ("i", "u", "f", "S", "b"):
        return arr, arr.dtype, arr.shape
    raise TypeError(f"unsupported attribute type {arr.dtype}")


class _VlenHeap:
    """Pooled global-heap collections for ALL the file's vlen strings.

    One GCOL per string (the old _vlen_payload shape) costs the 4096-byte
    collection minimum per attribute — tens of MB of padding at the
    1000-source target. The pool instead packs the file's distinct
    strings into shared collections (~16 KB of content each, still
    ≥4096-padded but paid once per collection), deduplicates repeats
    (refcount = occurrence count), and hands out 16-byte descriptors by
    lookup."""

    def __init__(self, alloc) -> None:
        self._alloc = alloc
        self._map: dict[bytes, tuple[int, int]] = {}

    def build(self, strings: list[str]) -> None:
        counts: dict[bytes, int] = {}
        for s in strings:
            raw = s.encode("utf-8")
            counts[raw] = counts.get(raw, 0) + 1
        fresh = [r for r in counts if r not in self._map]
        batch: list[tuple[bytes, int]] = []
        size = 0

        def flush() -> None:
            nonlocal batch, size
            if not batch:
                return
            addr = self._alloc(_gcol(batch))
            for i, (raw, _n) in enumerate(batch, start=1):
                self._map[raw] = (addr, i)
            batch, size = [], 0

        for raw in fresh:
            need = 16 + len(raw) + ((-len(raw)) % 8)
            if batch and size + need > 16 * 1024:
                flush()
            batch.append((raw, counts[raw]))
            size += need
        flush()

    def desc(self, s: str) -> bytes:
        raw = s.encode("utf-8")
        if raw not in self._map:
            # string not seen by the pre-pass (defensive): pool it now
            self.build([s])
        addr, idx = self._map[raw]
        return _VLEN_DESC.pack(len(raw), addr, idx)

    def payload(self, strings: list[str]) -> bytes:
        return b"".join(self.desc(s) for s in strings)


def _attr_message(name: str, value, heap: "_VlenHeap | None" = None) -> bytes:
    arr, dtype, shape = _coerce_attr(value)
    raw_name = name.encode("utf-8") + b"\x00"
    if dtype == VLEN_STR:
        if heap is None:
            raise TypeError("vlen string attribute requires a heap")
        dt = _dt_message_vlen_str()
        data = heap.payload(arr)
    else:
        nd = np.dtype(dtype)
        if nd.byteorder == ">":
            # the datatype message always declares little-endian — swap the
            # payload like the dataset path does, or the values are garbage
            nd = nd.newbyteorder("<")
        dt = _dt_message(nd)
        data = np.asarray(arr, dtype=nd).tobytes()
    ds = _dataspace_message(tuple(shape))
    return (
        struct.pack("<BBHHHB", 3, 0, len(raw_name), len(dt), len(ds), 1)
        + raw_name
        + dt
        + ds
        + data
    )


def _object_header(messages: list[tuple[int, bytes]]) -> bytes:
    body = b"".join(
        struct.pack("<BHB", mtype, len(mbody), 0) + mbody for mtype, mbody in messages
    )
    # flags 0x02: "size of chunk 0" stored in 4 bytes
    prefix = b"OHDR" + struct.pack("<BB", 2, 0x02) + struct.pack("<I", len(body))
    return prefix + body + struct.pack("<I", jenkins_lookup3(prefix + body))


# ---------------------------------------------------------------------------
# In-memory tree + h5py-like facade
# ---------------------------------------------------------------------------

class _GroupNode:
    __slots__ = ("links", "attrs")

    def __init__(self) -> None:
        self.links: dict[str, object] = {}
        self.attrs: dict[str, object] = {}


class _DatasetNode:
    __slots__ = ("data", "attrs", "chunks")

    def __init__(self, data: np.ndarray, chunks=None) -> None:
        self.data = data
        self.attrs: dict[str, object] = {}
        self.chunks = chunks


class AttributeView:
    def __init__(self, node) -> None:
        self._attrs = node.attrs

    def __setitem__(self, key: str, value) -> None:
        self._attrs[key] = value

    def __getitem__(self, key: str):
        return self._attrs[key]

    def __contains__(self, key: str) -> bool:
        return key in self._attrs

    def get(self, key: str, default=None):
        return self._attrs.get(key, default)

    def setdefault(self, key: str, value):
        return self._attrs.setdefault(key, value)

    def keys(self):
        return self._attrs.keys()

    def items(self):
        return self._attrs.items()


def string_dtype(encoding: str = "utf-8", length=None) -> np.dtype:
    """h5py-compatible vlen-str dtype marker: in this facade plain object
    dtype IS the vlen-string representation (see _coerce_dataset).

    Fixed-length (``length=N``) and non-UTF-8 requests fail loudly —
    silently returning the vlen representation would change the stored
    datatype behind the caller's back (pass numpy ``S``-dtype arrays for
    fixed-length storage instead)."""
    if length is not None:
        raise NotImplementedError(
            "fixed-length string dtypes are not supported by this facade; "
            "pass a numpy 'S%d' array for fixed-length storage" % length
        )
    if encoding not in ("utf-8", "utf8"):
        raise NotImplementedError(
            f"only utf-8 vlen strings are supported, got {encoding!r}"
        )
    return np.dtype(object)


def _coerce_dataset(data) -> np.ndarray:
    """str data becomes variable-length UTF-8 (object arrays of str —
    h5py's default for Python strings); pass numpy ``S`` arrays explicitly
    for fixed-length storage."""
    if isinstance(data, str):
        return np.array(data, dtype=object)
    arr = np.asarray(data)
    if arr.dtype.kind == "U":
        out = np.empty(arr.shape, dtype=object)
        for idx in np.ndindex(arr.shape):
            out[idx] = str(arr[idx])
        return out
    if arr.dtype == object:
        if not all(isinstance(v, str) for v in arr.ravel()):
            raise TypeError("object arrays must contain only str (vlen)")
        return arr
    if arr.dtype.kind == "b":
        arr = arr.astype(np.uint8)
    return arr


class Group:
    def __init__(self, file: "File", node: _GroupNode, path: str) -> None:
        self._file = file
        self._node = node
        self._path = path

    # -- h5py-compatible surface ------------------------------------------

    @property
    def name(self) -> str:
        return self._path or "/"

    @property
    def attrs(self) -> AttributeView:
        return AttributeView(self._node)

    def _resolve(self, path: str, create: bool = False):
        node = self._node if not path.startswith("/") else self._file._root
        parts = [p for p in path.split("/") if p]
        for i, part in enumerate(parts):
            if part not in node.links:
                if not create:
                    raise KeyError(path)
                node.links[part] = _GroupNode()
            node = node.links[part]
            if not isinstance(node, _GroupNode) and i < len(parts) - 1:
                raise KeyError(f"{path}: {part} is not a group")
        return node

    def require_group(self, path: str) -> "Group":
        node = self._resolve(path, create=True)
        if not isinstance(node, _GroupNode):
            raise TypeError(f"{path} exists and is not a group")
        return Group(self._file, node, self._join(path))

    create_group = require_group

    def create_dataset(self, path: str, data=None, chunks=None, dtype=None) -> "Dataset":
        parts = [p for p in path.split("/") if p]
        parent = self._resolve("/".join(parts[:-1]), create=True) if len(parts) > 1 else (
            self._node if not path.startswith("/") else self._file._root
        )
        name = parts[-1]
        if name in parent.links:
            raise ValueError(f"dataset {path} already exists")
        arr = _coerce_dataset(data if data is not None else [])
        if dtype is not None:
            arr = arr.astype(dtype)
        node = _DatasetNode(arr, chunks=chunks)
        parent.links[name] = node
        return Dataset(self._file, node, self._join(path))

    def _join(self, path: str) -> str:
        if path.startswith("/"):
            return path.rstrip("/")
        return f"{self._path}/{path}".rstrip("/")

    def __getitem__(self, path: str):
        node = self._resolve(path)
        full = self._join(path)
        if isinstance(node, _GroupNode):
            return Group(self._file, node, full)
        return Dataset(self._file, node, full)

    def __setitem__(self, path: str, value) -> None:
        """Hard link: the same node under another name (HDFFile.cpp:238)."""
        if not isinstance(value, (Group, Dataset)):
            self.create_dataset(path, data=value)
            return
        parts = [p for p in path.split("/") if p]
        parent = self._resolve("/".join(parts[:-1]), create=True) if len(parts) > 1 else (
            self._node if not path.startswith("/") else self._file._root
        )
        parent.links[parts[-1]] = value._node

    def __contains__(self, path: str) -> bool:
        try:
            self._resolve(path)
            return True
        except KeyError:
            return False

    def __delitem__(self, path: str) -> None:
        """Unlink (h5py ``del f[path]``) — drops the name; the node
        itself survives if hard-linked elsewhere."""
        parts = [p for p in path.split("/") if p]
        if len(parts) > 1:
            # keep the leading slash so _resolve anchors absolute paths
            # at the file root, not the current group
            prefix = "/" if path.startswith("/") else ""
            parent = self._resolve(prefix + "/".join(parts[:-1]))
        else:
            parent = (
                self._node if not path.startswith("/") else self._file._root
            )
        del parent.links[parts[-1]]

    def keys(self):
        return self._node.links.keys()

    def items(self):
        for k in self.keys():
            yield k, self[k]


class Dataset:
    def __init__(self, file: "File", node: _DatasetNode, path: str) -> None:
        self._file = file
        self._node = node
        self._path = path

    @property
    def name(self) -> str:
        return self._path

    @property
    def attrs(self) -> AttributeView:
        return AttributeView(self._node)

    @property
    def shape(self) -> tuple[int, ...]:
        return self._node.data.shape

    @property
    def dtype(self) -> np.dtype:
        return self._node.data.dtype

    def __getitem__(self, key) -> np.ndarray:
        return self._node.data[key]

    def __len__(self) -> int:
        return len(self._node.data)

    def asstr(self):
        data = self._node.data

        class _Str:
            def __getitem__(_self, key):
                picked = data[key]
                if isinstance(picked, bytes):
                    return picked.rstrip(b"\x00").decode("utf-8")
                if isinstance(picked, str):
                    return picked
                if getattr(picked, "dtype", None) == object:
                    return picked
                return np.char.decode(
                    np.char.rstrip(picked, b"\x00"), "utf-8"
                )

        return _Str()


class File(Group):
    """h5py-like writable ('w') / readable ('r') HDF5 file."""

    def __init__(self, path: str | Path, mode: str = "r") -> None:
        self._fspath = Path(path)
        self._mode = mode
        self._root = _GroupNode()
        if mode == "r":
            self._root = _Reader(self._fspath.read_bytes()).root()
        elif mode != "w":
            raise ValueError("mode must be 'r' or 'w'")
        super().__init__(self, self._root, "")

    def close(self) -> None:
        if self._mode == "w":
            self._fspath.write_bytes(_serialize(self._root))
            self._mode = "closed"

    def __enter__(self) -> "File":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


# ---------------------------------------------------------------------------
# Serialization (bottom-up; memoized for hard links)
# ---------------------------------------------------------------------------

def _serialize(root: _GroupNode) -> bytes:
    buf = bytearray(b"\x00" * 48)  # superblock v2 placeholder
    addr_of: dict[int, int] = {}
    in_progress: set[int] = set()
    # hard-link cycles (a group linked into its own subtree — legal HDF5):
    # the link to an in-progress ancestor is written with a placeholder
    # address and patched (plus a header-checksum rewrite) once the
    # ancestor's header lands. (header_addr, body_len, abs_off, target_id)
    pending: list[tuple[int, int, int, int]] = []

    def alloc(data: bytes) -> int:
        addr = len(buf)
        buf.extend(data)
        return addr

    # pooled vlen-string heap: gather every string the tree will write
    # (attrs + object-dtype datasets), pack them into shared collections
    # up front — one 4096-byte-minimum collection per ~16 KB of content,
    # not per attribute
    heap = _VlenHeap(alloc)
    acc: list[str] = []
    seen_nodes: set[int] = set()

    def gather(node) -> None:
        if id(node) in seen_nodes:
            return
        seen_nodes.add(id(node))
        for value in node.attrs.values():
            payload, dtype, _shape = _coerce_attr(value)
            if dtype == VLEN_STR:
                acc.extend(payload)
        if isinstance(node, _DatasetNode):
            if node.data.dtype == object:
                acc.extend(str(s) for s in node.data.ravel())
        else:
            for child in node.links.values():
                gather(child)

    gather(root)
    heap.build(acc)

    def write_chunked(arr: np.ndarray, chunks) -> bytes:
        """Chunk the array (zero-padding partial edge chunks, as HDF5
        stores full-size chunks), alloc each chunk + a v1 B-tree chunk
        index, and return the chunked layout message.

        Nodes hold at most ``BT_MAX`` entries (2K with the libhdf5
        default K=32 for chunk trees); datasets with more chunks get a
        proper multi-level tree — leaves sibling-chained left/right,
        internal keys = the first key of each child subtree — instead of
        one oversized node whose 16-bit entries-used field would
        overflow at 65536 chunks."""
        shape = arr.shape
        if isinstance(chunks, int):
            chunks = (chunks,)
        # dims beyond the given chunk tuple stay unchunked (full extent)
        chunk_shape = (
            tuple(min(max(int(c), 1), d) for c, d in zip(chunks, shape))
            + shape[len(chunks) :]
        )
        entries: list[tuple[tuple[int, ...], int]] = []
        csize = int(np.prod(chunk_shape)) * arr.itemsize
        for origin in _chunk_grid(shape, chunk_shape):
            sl = tuple(
                slice(o, min(o + c, d))
                for o, c, d in zip(origin, chunk_shape, shape)
            )
            block = arr[sl]
            if block.shape != chunk_shape:
                full = np.zeros(chunk_shape, dtype=arr.dtype)
                full[tuple(slice(0, s) for s in block.shape)] = block
                block = full
            entries.append((origin, alloc(np.ascontiguousarray(block).tobytes())))
        rank = len(shape)
        key_size = 8 + 8 * (rank + 1)
        # final key: the grid end (first offset past the last chunk row)
        end = tuple(-(-d // c) * c for d, c in zip(shape, chunk_shape))

        def key(offsets: tuple[int, ...]) -> bytes:
            return struct.pack("<II", csize, 0) + b"".join(
                struct.pack("<Q", o) for o in (*offsets, 0)
            )

        BT_MAX = 64

        def build_level(
            items: list[tuple[tuple[int, ...], int]], level: int
        ) -> list[tuple[tuple[int, ...], int]]:
            """Pack (first_origin, child_addr) items into sibling-linked
            nodes of one level; returns the next level's items."""
            groups = [items[i : i + BT_MAX] for i in range(0, len(items), BT_MAX)]
            # node addresses are knowable up front: alloc is append-only
            # and each node's size is determined by its entry count
            addrs, base = [], len(buf)
            for g in groups:
                addrs.append(base)
                base += 24 + len(g) * (key_size + 8) + key_size
            out: list[tuple[tuple[int, ...], int]] = []
            for i, g in enumerate(groups):
                left = addrs[i - 1] if i > 0 else UNDEF
                right = addrs[i + 1] if i + 1 < len(groups) else UNDEF
                node = b"TREE" + struct.pack("<BBH", 1, level, len(g))
                node += struct.pack("<QQ", left, right)
                for origin, caddr in g:
                    node += key(origin) + struct.pack("<Q", caddr)
                # trailing key: the next sibling's first key, or the grid end
                nxt = groups[i + 1][0][0] if i + 1 < len(groups) else end
                node += key(nxt)
                # alloc is the WRITE — never inside the assert (python -O
                # strips asserts, and with them the node bytes)
                addr = alloc(node)
                assert addr == addrs[i]
                out.append((g[0][0], addrs[i]))
            return out

        items, level = entries, 0
        while True:
            items = build_level(items, level)
            if len(items) == 1:
                btree_addr = items[0][1]
                break
            level += 1
        return _layout_message_chunked(btree_addr, chunk_shape, arr.itemsize)

    def write_node(node) -> int:
        if id(node) in addr_of:
            return addr_of[id(node)]
        messages: list[tuple[int, bytes]] = []
        if isinstance(node, _DatasetNode):
            shape = node.data.shape  # ascontiguousarray promotes 0-d to 1-d
            if node.data.dtype == object:
                # variable-length UTF-8 strings: global heap + descriptors
                messages.append((0x0001, _dataspace_message(shape)))
                messages.append((0x0003, _dt_message_vlen_str()))
                messages.append((0x0005, _fill_message()))
                raw = heap.payload([str(s) for s in node.data.ravel()])
                data_addr = alloc(raw) if raw else UNDEF
                messages.append((0x0008, _layout_message(data_addr, len(raw))))
            else:
                arr = np.ascontiguousarray(node.data)
                if arr.dtype.byteorder == ">":
                    arr = arr.astype(arr.dtype.newbyteorder("<"))
                messages.append((0x0001, _dataspace_message(shape)))
                messages.append((0x0003, _dt_message(arr.dtype)))
                messages.append((0x0005, _fill_message()))
                if node.chunks and arr.size and arr.ndim:
                    messages.append((0x0008, write_chunked(arr, node.chunks)))
                else:
                    raw = arr.tobytes()
                    data_addr = alloc(raw) if raw else UNDEF
                    messages.append(
                        (0x0008, _layout_message(data_addr, len(raw)))
                    )
        else:
            in_progress.add(id(node))
            child_addrs: list[tuple[str, int | None, int]] = [
                (
                    name,
                    None if id(c) in in_progress and id(c) not in addr_of
                    else write_node(c),
                    id(c),
                )
                for name, c in node.links.items()
            ]
            messages.append((0x0002, _link_info_message()))
            messages.append((0x000A, _group_info_message()))
            deferred: list[tuple[int, int]] = []  # (msg index, target id)
            for name, caddr, target in child_addrs:
                if caddr is None:  # link to an in-progress ancestor
                    deferred.append((len(messages), target))
                    caddr = UNDEF
                messages.append((0x0006, _link_message(name, caddr)))
        for name, value in node.attrs.items():
            messages.append((0x000C, _attr_message(name, value, heap)))
        addr = alloc(_object_header(messages))
        addr_of[id(node)] = addr
        in_progress.discard(id(node))
        if not isinstance(node, _DatasetNode) and deferred:
            body_len = sum(4 + len(m) for _, m in messages)
            for msg_idx, target in deferred:
                off = addr + 10 + sum(
                    4 + len(messages[j][1]) for j in range(msg_idx)
                )
                # the link address is the trailing 8 bytes of the body
                off += 4 + len(messages[msg_idx][1]) - 8
                pending.append((addr, body_len, off, target))
        return addr

    root_addr = write_node(root)
    for header_addr, body_len, off, target in pending:
        struct.pack_into("<Q", buf, off, addr_of[target])
    for header_addr, body_len in {(a, b) for a, b, _, _ in pending}:
        end = header_addr + 10 + body_len
        struct.pack_into(
            "<I", buf, end, jenkins_lookup3(bytes(buf[header_addr:end]))
        )
    eof = len(buf)
    sb = MAGIC + struct.pack("<BBBB", 2, 8, 8, 0) + struct.pack(
        "<QQQQ", 0, UNDEF, eof, root_addr
    )
    sb += struct.pack("<I", jenkins_lookup3(sb))
    buf[: len(sb)] = sb
    return bytes(buf)


# ---------------------------------------------------------------------------
# Reader (independent spec-based parse of the written subset)
# ---------------------------------------------------------------------------

class _Reader:
    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        if buf[:8] != MAGIC:
            raise ValueError("not an HDF5 file (bad signature)")
        version = buf[8]
        if version != 2:
            raise ValueError(f"unsupported superblock version {version}")
        stored = struct.unpack_from("<I", buf, 44)[0]
        if stored != jenkins_lookup3(buf[:44]):
            raise ValueError("superblock checksum mismatch")
        self.root_addr = struct.unpack_from("<Q", buf, 36)[0]
        self._nodes: dict[int, object] = {}
        self._gcols: dict[int, dict[int, bytes]] = {}

    def root(self) -> _GroupNode:
        return self._read_object(self.root_addr)

    def _read_object(self, addr: int):
        if addr in self._nodes:
            return self._nodes[addr]
        buf = self.buf
        if buf[addr : addr + 4] != b"OHDR":
            raise ValueError(f"no OHDR at {addr:#x}")
        version, flags = buf[addr + 4], buf[addr + 5]
        if version != 2:
            raise ValueError(f"unsupported object header version {version}")
        size_bytes = 1 << (flags & 0x03)
        pos = addr + 6
        chunk0 = int.from_bytes(buf[pos : pos + size_bytes], "little")
        pos += size_bytes
        end = pos + chunk0
        stored = struct.unpack_from("<I", buf, end)[0]
        if stored != jenkins_lookup3(buf[addr:end]):
            raise ValueError(f"object header checksum mismatch at {addr:#x}")

        links: list[tuple[str, int]] = []
        attrs: dict[str, object] = {}
        shape = dtype = None
        data_addr = data_size = None
        btree_addr = chunk_shape = None
        is_group = False
        while pos < end:
            mtype, msize, _mflags = struct.unpack_from("<BHB", buf, pos)
            body = buf[pos + 4 : pos + 4 + msize]
            pos += 4 + msize
            if mtype == 0x0006:
                links.append(self._parse_link(body))
                is_group = True
            elif mtype in (0x0002, 0x000A):
                is_group = True
            elif mtype == 0x0001:
                shape = _dataspace_decode(body)
            elif mtype == 0x0003:
                dtype = _dt_decode(body)
            elif mtype == 0x0008:
                lver, lclass = body[0], body[1]
                if lclass == 1:
                    data_addr, data_size = struct.unpack_from("<QQ", body, 2)
                elif lclass == 2:
                    ndims = body[2]
                    btree_addr = struct.unpack_from("<Q", body, 3)[0]
                    dims = struct.unpack_from(f"<{ndims}I", body, 11)
                    chunk_shape = dims[:-1]  # last dim is the element size
                else:
                    raise ValueError("only contiguous/chunked layout supported")
            elif mtype == 0x000C:
                name, value = self._parse_attr(body)
                attrs[name] = value

        if is_group or (shape is None and dtype is None):
            node = _GroupNode()
            self._nodes[addr] = node
            node.attrs = attrs
            for name, caddr in links:
                node.links[name] = self._read_object(caddr)
            return node
        if dtype == VLEN_STR:
            count = int(np.prod(shape)) if shape else 1
            if data_addr is None or data_addr == UNDEF or not data_size:
                strs: list[str] = [""] * count
            else:
                strs = [
                    self._vlen_str(buf[data_addr + i * 16 : data_addr + i * 16 + 16])
                    for i in range(min(count, data_size // 16))
                ]
            arr = np.array(strs, dtype=object).reshape(shape)
        elif chunk_shape is not None:
            arr = self._read_chunked(btree_addr, shape, chunk_shape, dtype)
        elif data_addr is None or data_addr == UNDEF or not data_size:
            arr = np.zeros(shape, dtype=dtype)
        else:
            arr = np.frombuffer(
                buf[data_addr : data_addr + data_size], dtype=dtype
            ).reshape(shape)
        node = _DatasetNode(arr)
        node.attrs = attrs
        self._nodes[addr] = node
        return node

    def _read_chunked(self, btree_addr, shape, chunk_shape, dtype) -> np.ndarray:
        """Reassemble a chunked dataset from its v1 B-tree chunk index,
        walking internal (level > 0) nodes down to the chunk leaves."""
        out = np.zeros(shape, dtype=dtype)
        self._walk_chunk_btree(btree_addr, out, shape, chunk_shape, dtype)
        return out

    def _walk_chunk_btree(self, addr, out, shape, chunk_shape, dtype) -> None:
        buf = self.buf
        if buf[addr : addr + 4] != b"TREE":
            raise ValueError(f"no B-tree at {addr:#x}")
        ntype, level, entries = struct.unpack_from("<BBH", buf, addr + 4)
        if ntype != 1:
            raise ValueError("not a chunk B-tree node")
        rank = len(shape)
        pos = addr + 8 + 16  # skip left/right sibling addresses
        key_size = 8 + 8 * (rank + 1)
        n_elems = int(np.prod(chunk_shape))
        for _ in range(entries):
            csize = struct.unpack_from("<I", buf, pos)[0]
            offsets = struct.unpack_from(f"<{rank}Q", buf, pos + 8)
            caddr = struct.unpack_from("<Q", buf, pos + key_size)[0]
            pos += key_size + 8
            if level > 0:
                self._walk_chunk_btree(caddr, out, shape, chunk_shape, dtype)
                continue
            block = np.frombuffer(buf[caddr : caddr + csize], dtype=dtype)[
                :n_elems
            ].reshape(chunk_shape)
            sl = tuple(
                slice(o, min(o + c, d))
                for o, c, d in zip(offsets, chunk_shape, shape)
            )
            out[sl] = block[tuple(slice(0, s.stop - s.start) for s in sl)]

    def _gcol_objects(self, addr: int) -> dict[int, bytes]:
        cached = self._gcols.get(addr)
        if cached is not None:
            return cached
        buf = self.buf
        if buf[addr : addr + 4] != b"GCOL":
            raise ValueError(f"no global heap collection at {addr:#x}")
        size = struct.unpack_from("<Q", buf, addr + 8)[0]
        end, pos = addr + size, addr + 16
        objs: dict[int, bytes] = {}
        while pos + 16 <= end:
            idx, _refs, _res, osize = struct.unpack_from("<HHIQ", buf, pos)
            pos += 16
            if idx == 0:
                break
            objs[idx] = buf[pos : pos + osize]
            pos += osize + ((-osize) % 8)
        self._gcols[addr] = objs
        return objs

    def _vlen_str(self, desc: bytes) -> str:
        length, gaddr, idx = _VLEN_DESC.unpack(desc)
        return self._gcol_objects(gaddr)[idx][:length].decode("utf-8")

    @staticmethod
    def _parse_link(body: bytes) -> tuple[str, int]:
        version, flags = body[0], body[1]
        if version != 1:
            raise ValueError(f"unsupported link message version {version}")
        pos = 2
        if flags & 0x08:  # link type present → only hard (0) supported
            ltype = body[pos]
            pos += 1
            if ltype != 0:
                raise ValueError("only hard links supported")
        if flags & 0x04:
            pos += 8  # creation order
        if flags & 0x10:
            pos += 1  # charset
        nbytes = 1 << (flags & 0x03)
        nlen = int.from_bytes(body[pos : pos + nbytes], "little")
        pos += nbytes
        name = body[pos : pos + nlen].decode("utf-8")
        pos += nlen
        addr = struct.unpack_from("<Q", body, pos)[0]
        return name, addr

    def _parse_attr(self, body: bytes):
        version = body[0]
        if version != 3:
            raise ValueError(f"unsupported attribute version {version}")
        name_size, dt_size, ds_size = struct.unpack_from("<HHH", body, 2)
        pos = 9
        name = body[pos : pos + name_size].rstrip(b"\x00").decode("utf-8")
        pos += name_size
        dtype = _dt_decode(body[pos : pos + dt_size])
        pos += dt_size
        shape = _dataspace_decode(body[pos : pos + ds_size])
        pos += ds_size
        count = int(np.prod(shape)) if shape else 1
        if dtype == VLEN_STR:
            strs = [
                self._vlen_str(body[pos + i * 16 : pos + i * 16 + 16])
                for i in range(count)
            ]
            if shape == ():
                return name, strs[0]
            # object dtype, not str: numpy's fixed-width unicode arrays
            # NUL-pad, so a stored trailing '\x00' CHARACTER is
            # indistinguishable from padding and silently dropped on
            # read-back (hypothesis-found); h5py also returns object
            # arrays for vlen-string attributes
            return name, np.array(strs, dtype=object).reshape(shape)
        arr = np.frombuffer(
            body[pos : pos + count * dtype.itemsize], dtype=dtype
        ).reshape(shape)
        if dtype.kind == "S":
            decoded = np.char.decode(np.char.rstrip(arr, b"\x00"), "utf-8")
            return name, (decoded[()] if shape == () else decoded)
        return name, (arr[()] if shape == () else arr)
