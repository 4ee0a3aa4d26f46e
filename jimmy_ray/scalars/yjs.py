"""Yjs v1 update codec, pure python (published lib0 + Yjs struct format).

The reference opens AFFiNE workspaces with ``pycrdt``
(/root/reference/src/jimmy/formats/affine.py:202-245) — absent here.
The Yjs binary update format is public (the y-protocols / lib0 specs
and the Yjs reference implementation's documented encoding), so this
module implements the honest subset needed to read and write document
snapshots:

- lib0 primitives: varUint, varInt (sign-in-first-byte form),
  varString, varUint8Array and the tagged ``Any`` encoding (127..116),
- struct stream: client count → per-client struct runs → items with
  the info-bit layout (contentRef | origin 0x80 | rightOrigin 0x40 |
  parentSub 0x20), parent-by-root-name or parent-by-ID, and a delete
  set (written empty, skipped on read),
- contents: ContentAny (8), ContentString (4), ContentType (7, type
  refs YArray 0 / YMap 1 / YText 2), ContentDeleted (1) tolerated on
  read; anything else raises at the documented boundary,
- item lengths count UTF-16 code units for strings, like Yjs.

Scope: single-writer snapshots (items integrate in clock order; no
concurrent-origin resolution, no GC fill, no rewrite conflicts) — the
shape an exported workspace file contains.  ``encode_doc`` builds such
a snapshot from plain dicts/lists/strings (``YText`` marks rich-text
strings, stored as chained ContentString items); ``decode_doc``
reconstructs plain python values, so the AFFiNE renderer downstream
needs no pycrdt objects.
"""

from __future__ import annotations

import io
import struct as _struct


class YText(str):
    """Marker: encode this string as a YText type (chained ContentString
    items) instead of a plain Any value."""


# --- lib0 primitives --------------------------------------------------------

def write_var_uint(buf: bytearray, n: int) -> None:
    while n > 0x7F:
        buf.append(0x80 | (n & 0x7F))
        n >>= 7
    buf.append(n)


def read_var_uint(buf: io.BytesIO) -> int:
    n = 0
    shift = 0
    while True:
        b = buf.read(1)[0]
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n
        shift += 7


def write_var_int(buf: bytearray, n: int) -> None:
    is_neg = n < 0
    if is_neg:
        n = -n
    first = (0x40 if is_neg else 0) | (n & 0x3F)
    n >>= 6
    if n > 0:
        first |= 0x80
    buf.append(first)
    while n > 0:
        b = n & 0x7F
        n >>= 7
        if n > 0:
            b |= 0x80
        buf.append(b)


def read_var_int(buf: io.BytesIO) -> int:
    b = buf.read(1)[0]
    sign = -1 if b & 0x40 else 1
    n = b & 0x3F
    shift = 6
    while b & 0x80:
        b = buf.read(1)[0]
        n |= (b & 0x7F) << shift
        shift += 7
    return sign * n


def write_var_string(buf: bytearray, s: str) -> None:
    raw = s.encode("utf-8")
    write_var_uint(buf, len(raw))
    buf += raw


def read_var_string(buf: io.BytesIO) -> str:
    return buf.read(read_var_uint(buf)).decode("utf-8")


def write_any(buf: bytearray, v) -> None:
    if v is None:
        buf.append(126)
    elif v is True:
        buf.append(120)
    elif v is False:
        buf.append(121)
    elif isinstance(v, int):
        if -(1 << 30) <= v < (1 << 30):
            buf.append(125)
            write_var_int(buf, v)
        else:
            buf.append(122)
            buf += v.to_bytes(8, "big", signed=True)
    elif isinstance(v, float):
        buf.append(123)
        buf += _struct.pack(">d", v)
    elif isinstance(v, str):
        buf.append(119)
        write_var_string(buf, v)
    elif isinstance(v, dict):
        buf.append(118)
        write_var_uint(buf, len(v))
        for k, val in v.items():
            write_var_string(buf, k)
            write_any(buf, val)
    elif isinstance(v, (list, tuple)):
        buf.append(117)
        write_var_uint(buf, len(v))
        for val in v:
            write_any(buf, val)
    elif isinstance(v, (bytes, bytearray)):
        buf.append(116)
        write_var_uint(buf, len(v))
        buf += v
    else:
        raise TypeError(f"unsupported Any value {type(v).__name__}")


def read_any(buf: io.BytesIO):
    tag = buf.read(1)[0]
    if tag == 127 or tag == 126:
        return None
    if tag == 125:
        return read_var_int(buf)
    if tag == 124:
        return _struct.unpack(">f", buf.read(4))[0]
    if tag == 123:
        return _struct.unpack(">d", buf.read(8))[0]
    if tag == 122:
        return int.from_bytes(buf.read(8), "big", signed=True)
    if tag == 121:
        return False
    if tag == 120:
        return True
    if tag == 119:
        return read_var_string(buf)
    if tag == 118:
        return {read_var_string(buf): read_any(buf)
                for _ in range(read_var_uint(buf))}
    if tag == 117:
        return [read_any(buf) for _ in range(read_var_uint(buf))]
    if tag == 116:
        return buf.read(read_var_uint(buf))
    raise ValueError(f"unknown Any tag {tag}")


def _utf16_len(s: str) -> int:
    return len(s.encode("utf-16-le")) // 2


# --- struct constants -------------------------------------------------------

_REF_GC = 0
_REF_DELETED = 1
_REF_STRING = 4
_REF_TYPE = 7
_REF_ANY = 8
_TYPE_ARRAY, _TYPE_MAP, _TYPE_TEXT = 0, 1, 2
_BIT_ORIGIN, _BIT_RIGHT, _BIT_SUB = 0x80, 0x40, 0x20

CLIENT = 1  # single-writer snapshots


# --- encoder ----------------------------------------------------------------

class _Item:
    __slots__ = ("clock", "length", "origin", "parent", "parent_sub",
                 "ref", "payload")

    def __init__(self, clock, length, origin, parent, parent_sub, ref,
                 payload):
        self.clock = clock
        self.length = length
        self.origin = origin          # (client, clock) | None
        self.parent = parent          # ("root", name) | ("id", (c, ck)) | None
        self.parent_sub = parent_sub  # map key | None
        self.ref = ref
        self.payload = payload        # str | list (Any values) | int typeref


class _Builder:
    def __init__(self):
        self.items: list[_Item] = []
        self.clock = 0

    def add(self, length, origin, parent, parent_sub, ref, payload):
        item = _Item(self.clock, length, origin, parent, parent_sub, ref,
                     payload)
        self.items.append(item)
        self.clock += length
        return item

    def write_value(self, parent, parent_sub, origin, value):
        """Returns the item whose last clock unit an array sibling
        chains its origin to."""
        if isinstance(value, YText):
            t = self.add(1, origin, parent, parent_sub, _REF_TYPE,
                         _TYPE_TEXT)
            left = None
            tid = ("id", (CLIENT, t.clock))
            # two chunks when possible: exercises item chaining
            chunks = [value[: len(value) // 2], value[len(value) // 2:]]
            for chunk in chunks:
                if not chunk:
                    continue
                left = self.add(_utf16_len(chunk),
                                None if left is None else
                                (CLIENT, left.clock + left.length - 1),
                                None if left is not None else tid,
                                None, _REF_STRING, chunk)
            return t
        if isinstance(value, dict):
            t = self.add(1, origin, parent, parent_sub, _REF_TYPE, _TYPE_MAP)
            tid = ("id", (CLIENT, t.clock))
            for k, v in value.items():
                self.write_value(tid, k, None, v)
            return t
        if isinstance(value, (list, tuple)):
            t = self.add(1, origin, parent, parent_sub, _REF_TYPE,
                         _TYPE_ARRAY)
            tid = ("id", (CLIENT, t.clock))
            left = None
            for v in value:
                left = self.write_value(
                    None if left is not None else tid, None,
                    None if left is None else
                    (CLIENT, left.clock + left.length - 1), v)
            return t
        return self.add(1, origin, parent, parent_sub, _REF_ANY, [value])


def encode_doc(roots: dict[str, object]) -> bytes:
    """Plain python tree → a Yjs v1 update establishing the given root
    types (dict → YMap, list → YArray, YText → text)."""
    b = _Builder()
    for name, value in roots.items():
        if isinstance(value, dict):
            for k, v in value.items():
                b.write_value(("root", name), k, None, v)
        elif isinstance(value, (list, tuple)):
            left = None
            for v in value:
                left = b.write_value(
                    ("root", name) if left is None else None, None,
                    None if left is None else
                    (CLIENT, left.clock + left.length - 1), v)
        else:
            raise TypeError("root values must be dict or list")

    out = bytearray()
    write_var_uint(out, 1)                 # one client
    write_var_uint(out, len(b.items))
    write_var_uint(out, CLIENT)
    write_var_uint(out, 0)                 # start clock
    for item in b.items:
        info = item.ref
        if item.origin is not None:
            info |= _BIT_ORIGIN
        if item.parent_sub is not None:
            info |= _BIT_SUB
        out.append(info)
        if item.origin is not None:
            write_var_uint(out, item.origin[0])
            write_var_uint(out, item.origin[1])
        if item.origin is None:            # no rightOrigin in this subset
            kind, ref = item.parent
            if kind == "root":
                write_var_uint(out, 1)
                write_var_string(out, ref)
            else:
                write_var_uint(out, 0)
                write_var_uint(out, ref[0])
                write_var_uint(out, ref[1])
        if item.parent_sub is not None:
            write_var_string(out, item.parent_sub)
        if item.ref == _REF_STRING:
            write_var_string(out, item.payload)
        elif item.ref == _REF_TYPE:
            write_var_uint(out, item.payload)
        elif item.ref == _REF_ANY:
            write_var_uint(out, len(item.payload))
            for v in item.payload:
                write_any(out, v)
    write_var_uint(out, 0)                 # empty delete set
    return bytes(out)


# --- decoder ----------------------------------------------------------------

class _Node:
    __slots__ = ("kind", "entries", "children")

    def __init__(self, kind):
        self.kind = kind                       # array | map | text
        self.entries: dict[str, list] = {}     # map: key → items
        self.children: list = []               # array/text: ordered items


def decode_doc(payload: bytes) -> dict:
    """Yjs v1 update → plain python tree of the root types it creates.
    Items integrate in clock order (single-writer snapshot subset)."""
    import bisect

    buf = io.BytesIO(payload)
    roots: dict[str, _Node] = {}
    nodes: dict[tuple[int, int], _Node] = {}     # type item id → node
    # per client: sorted (start_clock, length, container, parent_sub)
    # ranges — an origin may point at ANY clock unit inside a
    # multi-unit item
    owner_ranges: dict[int, list[tuple[int, int, _Node, str | None]]] = {}

    def owner_of(ref: tuple[int, int]) -> tuple[_Node, str | None]:
        ranges = owner_ranges.get(ref[0], [])
        idx = bisect.bisect_right(
            ranges, (ref[1], float("inf"), None, None)) - 1
        if idx < 0 or not ranges[idx][0] <= ref[1] < (ranges[idx][0]
                                                     + ranges[idx][1]):
            raise ValueError(f"origin {ref} references a missing item")
        return ranges[idx][2], ranges[idx][3]

    n_clients = read_var_uint(buf)
    for _ in range(n_clients):
        n_structs = read_var_uint(buf)
        client = read_var_uint(buf)
        clock = read_var_uint(buf)
        for _ in range(n_structs):
            info = buf.read(1)[0]
            ref = info & 0x1F
            if ref == _REF_GC:
                clock += read_var_uint(buf)
                continue
            origin = right = None
            parent = parent_sub = None
            if info & _BIT_ORIGIN:
                origin = (read_var_uint(buf), read_var_uint(buf))
            if info & _BIT_RIGHT:
                right = (read_var_uint(buf), read_var_uint(buf))
            # Yjs writes the parent (and the parentSub STRING) only when
            # both origins are absent; an overwrite item carries the
            # 0x20 info bit but NO string — its key is inherited from
            # the origin item at integration time.
            if origin is None and right is None:
                if read_var_uint(buf) == 1:
                    parent = ("root", read_var_string(buf))
                else:
                    parent = ("id", (read_var_uint(buf),
                                     read_var_uint(buf)))
                if info & _BIT_SUB:
                    parent_sub = read_var_string(buf)

            if ref == _REF_STRING:
                value = read_var_string(buf)
                length = _utf16_len(value)
            elif ref == _REF_TYPE:
                typeref = read_var_uint(buf)
                if typeref == _TYPE_ARRAY:
                    value = _Node("array")
                elif typeref == _TYPE_MAP:
                    value = _Node("map")
                elif typeref == _TYPE_TEXT:
                    value = _Node("text")
                else:
                    raise ValueError(f"type ref {typeref} out of subset")
                length = 1
            elif ref == _REF_ANY:
                value = [read_any(buf) for _ in range(read_var_uint(buf))]
                length = len(value)
            elif ref == _REF_DELETED:
                length = read_var_uint(buf)
                value = None
            else:
                raise ValueError(f"content ref {ref} out of subset "
                                 "(GC/Deleted/String/Type/Any supported)")

            item_id = (client, clock)
            # resolve the container node
            if parent is not None:
                if parent[0] == "root":
                    container = roots.setdefault(
                        parent[1],
                        _Node("map" if parent_sub is not None else "array"))
                else:
                    container = nodes[parent[1]]
            elif origin is not None:
                container, inherited_sub = owner_of(origin)
                if parent_sub is None and (info & _BIT_SUB):
                    parent_sub = inherited_sub  # map-key overwrite item
            else:
                raise ValueError("item with rightOrigin only — "
                                 "concurrent edits out of subset")
            owner_ranges.setdefault(client, []).append(
                (clock, length, container, parent_sub))
            if isinstance(value, _Node):
                nodes[item_id] = value
            if value is not None:
                if parent_sub is not None:
                    container.entries.setdefault(parent_sub, []).append(
                        (clock, ref, value))
                else:
                    container.children.append((clock, ref, value))
            clock += length

    # delete set intentionally ignored (snapshots carry none of note)
    def materialize(node: _Node):
        if node.kind == "map":
            out = {}
            for key, entries in node.entries.items():
                _, ref, value = max(entries)       # last write wins
                out[key] = (materialize(value) if isinstance(value, _Node)
                            else value[0] if ref == _REF_ANY and
                            len(value) == 1 else value)
            return out
        items = [v for v in sorted(node.children)]
        if node.kind == "text":
            return "".join(v for _, ref, v in items if ref == _REF_STRING)
        out = []
        for _, ref, value in items:
            if isinstance(value, _Node):
                out.append(materialize(value))
            elif ref == _REF_ANY:
                out.extend(value)
        return out

    return {name: materialize(node) for name, node in roots.items()}
