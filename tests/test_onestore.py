"""MS-ONESTORE reader (sources/onestore.py): roundtrip + the layouts
the paired fixture writer never emits (spec-subset-codec rule)."""

import struct

import pytest

from jimmy_ray.sources import onestore as o

U32 = struct.Struct("<I")
U64 = struct.Struct("<Q")
GUID = bytes(range(16))


def test_writer_reader_roundtrip_and_determinism():
    data = o.synth_one_file(42, "body € text")
    assert o.parse_onestore(data) == [
        {"title": "Page 42", "lines": ["body € text", "tail 42"]},
        {"title": "Notes 42", "lines": ["alpha 42"]},
    ]
    assert data == o.synth_one_file(42, "body € text")


def test_bad_magic_rejected():
    with pytest.raises(o.OneStoreError):
        o.parse_onestore(b"\x00" * 2048)
    good = bytearray(o.synth_one_file(1, "x"))
    good[48] ^= 0xFF  # corrupt guidFileFormat
    with pytest.raises(o.OneStoreError):
        o.parse_onestore(bytes(good))


def _minimal_file(pieces: list[bytes], root_nodes: bytes) -> bytes:
    """Header + 8-aligned pieces + root fragment; returns file bytes.
    Each piece's offset is len-dependent: callers pre-compute them."""
    out = bytearray(1024)
    for piece in pieces:
        while len(out) % 8:
            out.append(0)
        out.extend(piece)
    while len(out) % 8:
        out.append(0)
    root_off = len(out)
    frag = o._fragment(0x10, root_nodes)
    out.extend(frag)
    out[0:16] = o.GUID_FILE_TYPE_ONE
    out[48:64] = o.GUID_FILE_FORMAT
    out[172:184] = U64.pack(root_off) + U32.pack(len(frag))
    return bytes(out)


def _one_page_space(guid: bytes, text: str, *,
                    root_ref2: bool = False,
                    large_ref: bool = False,
                    stp_fmt: int = 0, cb_fmt: int = 0,
                    extra_decl: bytes = b"",
                    pset_override: bytes | None = None):
    """(pieces, manifest-fragment bytes builder) for a single page with
    one rich-text child, with encoding knobs for the crafted layouts."""
    pieces: list[bytes] = []
    offsets: list[tuple[int, int]] = []
    base = 1024

    def put(blob: bytes) -> tuple[int, int]:
        nonlocal base
        base = (base + 7) // 8 * 8
        pieces.append(blob)
        off = (base, len(blob))
        base += len(blob)
        return off

    page_pset = put(o._children_pset([1]))
    text_pset = put(pset_override if pset_override is not None
                    else o._rich_text_pset(text))

    def ref_bytes(stp: int, cb: int) -> bytes:
        s = {0: U64.pack(stp), 1: U32.pack(stp),
             2: struct.pack("<H", stp // 8), 3: U32.pack(stp // 8)}[stp_fmt]
        c = {0: U32.pack(cb), 1: U64.pack(cb),
             2: bytes([ (cb + 7) // 8 ]), 3: struct.pack("<H", (cb + 7) // 8)}[cb_fmt]
        return s + c

    decls = bytearray()
    decls += o._node(o.FND_GLOBAL_ID_TABLE_START2, b"", 0)
    decls += o._node(o.FND_GLOBAL_ID_TABLE_ENTRY, U32.pack(0) + guid, 0)
    decls += o._node(o.FND_GLOBAL_ID_TABLE_END, b"", 0)
    fnd = (o.FND_OBJECT_DECLARATION2_LARGE_REF_COUNT if large_ref
           else o.FND_OBJECT_DECLARATION2_REF_COUNT)
    cref = U32.pack(1) if large_ref else bytes([1])
    for k, (jcid, (stp, cb)) in enumerate(
            [(o.JCID_PAGE_NODE, page_pset),
             (o.JCID_RICH_TEXT_OE_NODE, text_pset)]):
        body = (ref_bytes(stp, cb) + U32.pack(k) + U32.pack(jcid)
                + bytes([1]) + cref)
        decls += o._node(fnd, body, 1, stp_fmt=stp_fmt, cb_fmt=cb_fmt)
    decls += extra_decl
    if root_ref2:
        decls += o._node(o.FND_ROOT_OBJECT_REFERENCE2,
                         U32.pack(0) + U32.pack(1), 0)
    else:
        decls += o._node(o.FND_ROOT_OBJECT_REFERENCE3,
                         o._pack_eguid((guid, 0)) + U32.pack(1), 0)

    rev = bytearray()
    rev += o._node(o.FND_REVISION_MANIFEST_LIST_START,
                   o._pack_eguid((guid, 9)) + U32.pack(0), 0)
    rev += o._node(o.FND_REVISION_MANIFEST_START6,
                   o._pack_eguid((guid, 8)) + o._pack_eguid((bytes(16), 0))
                   + U32.pack(1) + struct.pack("<H", 0), 0)
    rev += bytes(decls)
    rev += o._node(o.FND_REVISION_MANIFEST_END, b"", 0)
    rev_ref = put(o._fragment(0x20, bytes(rev)))

    man = bytearray()
    man += o._node(o.FND_OBJECT_SPACE_MANIFEST_LIST_START,
                   o._pack_eguid((guid, 9)), 0)
    man += o._node(o.FND_REVISION_MANIFEST_LIST_REF,
                   U64.pack(rev_ref[0]) + U32.pack(rev_ref[1]), 2)
    man_ref = put(o._fragment(0x18, bytes(man)))

    root = o._node(o.FND_OBJECT_SPACE_MANIFEST_LIST_REF,
                   U64.pack(man_ref[0]) + U32.pack(man_ref[1])
                   + o._pack_eguid((guid, 9)), 2)
    return pieces, root


@pytest.mark.parametrize("stp_fmt,cb_fmt", [(1, 1), (2, 2), (3, 3), (2, 3)])
def test_compressed_reference_encodings(stp_fmt, cb_fmt):
    # compressed stps address 8-aligned chunks; compressed cbs round the
    # byte count UP to a multiple of 8 — the prop-set parser tolerates
    # the trailing pad because every field is length-prefixed
    pieces, root = _one_page_space(GUID, "enc", stp_fmt=stp_fmt,
                                   cb_fmt=cb_fmt)
    pages = o.parse_onestore(_minimal_file(pieces, root))
    assert pages == [{"title": "", "lines": ["enc"]}]


def test_root_object_reference2_compact_id():
    pieces, root = _one_page_space(GUID, "r2", root_ref2=True)
    assert o.parse_onestore(_minimal_file(pieces, root)) == [
        {"title": "", "lines": ["r2"]}]


def test_large_ref_count_declaration():
    pieces, root = _one_page_space(GUID, "big", large_ref=True)
    assert o.parse_onestore(_minimal_file(pieces, root)) == [
        {"title": "", "lines": ["big"]}]


def test_multi_fragment_list_chain_and_chunk_terminator():
    """Root list split across two fragments joined by nextFragment; the
    first ends with a ChunkTerminatorFND and trailing padding."""
    pieces, root = _one_page_space(GUID, "frag")
    out = bytearray(1024)
    for piece in pieces:
        while len(out) % 8:
            out.append(0)
        out.extend(piece)
    while len(out) % 8:
        out.append(0)
    # second fragment carries the real root node; first only a terminator
    frag2_off_guess = None
    term = o._node(o.FND_CHUNK_TERMINATOR, b"", 0) + b"\x00" * 12
    # frag1 size is independent of frag2's offset; lay frag1 first
    frag1_off = len(out)
    frag1_len = 16 + len(term) + 20
    frag2_off = frag1_off + frag1_len + (8 - (frag1_off + frag1_len) % 8) % 8
    frag2 = o._fragment(0x10, root, seq=1)
    frag1 = o._fragment(0x10, term, next_ref=(frag2_off, len(frag2)))
    out.extend(frag1)
    while len(out) % 8:
        out.append(0)
    assert len(out) == frag2_off
    out.extend(frag2)
    out[0:16] = o.GUID_FILE_TYPE_ONE
    out[48:64] = o.GUID_FILE_FORMAT
    out[172:184] = U64.pack(frag1_off) + U32.pack(frag1_len)
    assert o.parse_onestore(bytes(out)) == [
        {"title": "", "lines": ["frag"]}]


def test_osid_stream_and_scalar_properties_skipped():
    """Prop set with an OSID stream present plus NoData/Bool/scalar
    properties around the text — all parsed, none breaking the render."""
    text = "mixed".encode("utf-16-le")
    pset = bytearray(U32.pack(0))           # OIDs: count 0, OSIDs PRESENT
    pset += U32.pack((1 << 31) | 1)         # OSID stream: 1 entry
    pset += U32.pack(0xDEAD)                # the OSID (skipped)
    pids = [
        0x04001234 | (0x1 << 26),           # NoData  (type forced to 0x1)
        (0x2 << 26) | 0x1235 | (1 << 31),   # Bool true
        (0x3 << 26) | 0x1236,               # 1-byte scalar
        o.PID_RICH_EDIT_TEXT_UNICODE,       # the text
        (0x6 << 26) | 0x1237,               # 8-byte scalar
    ]
    pset += struct.pack("<H", len(pids))
    for pid in pids:
        pset += U32.pack(pid & 0xFFFFFFFF)
    pset += b"\x07"                          # 1-byte scalar payload
    pset += U32.pack(len(text)) + text       # text payload
    pset += U64.pack(0x0102030405060708)     # 8-byte scalar payload
    pieces, root = _one_page_space(GUID, "", pset_override=bytes(pset))
    assert o.parse_onestore(_minimal_file(pieces, root)) == [
        {"title": "", "lines": ["mixed"]}]


def test_unknown_property_type_raises():
    pset = U32.pack(1 << 31) + struct.pack("<H", 1) + U32.pack(0x11 << 26)
    with pytest.raises(o.OneStoreError):
        o._parse_prop_set(pset)


def test_unknown_jcid_children_skipped_not_fatal():
    """An out-of-subset child object (e.g. an image jcid) contributes
    no text but doesn't break the walk."""
    # patch one element jcid in real writer output to an unknown value
    data = bytearray(o.synth_one_file(3, "kept"))
    pos = data.find(U32.pack(o.JCID_OUTLINE_ELEMENT_NODE))
    assert pos > 0
    data[pos:pos + 4] = U32.pack(0x00060011)  # jcidImageNode: unknown
    pages = o.parse_onestore(bytes(data))
    # the element still walks through to its rich text child
    assert pages[0]["lines"] == ["kept", "tail 3"]


def test_title_node_routes_to_title_not_body():
    data = o.synth_one_file(5, "b")
    pages = o.parse_onestore(data)
    assert pages[0]["title"] == "Page 5"
    assert "Page 5" not in pages[0]["lines"]


def test_last_complete_revision_wins():
    """Two revisions in one list: the second one's objects replace the
    first (stores append; readers take the newest complete manifest)."""
    guid = GUID
    pieces: list[bytes] = []
    base = 1024

    def put(blob: bytes):
        nonlocal base
        base = (base + 7) // 8 * 8
        pieces.append(blob)
        off = (base, len(blob))
        base += len(blob)
        return off

    old_pset = put(o._rich_text_pset("old"))
    new_pset = put(o._rich_text_pset("new"))
    page_pset = put(o._children_pset([1]))

    def decl(k, jcid, ref):
        return o._node(
            o.FND_OBJECT_DECLARATION2_REF_COUNT,
            U64.pack(ref[0]) + U32.pack(ref[1]) + U32.pack(k)
            + U32.pack(jcid) + bytes([1, 1]), 1)

    def revision(rid_n, text_ref):
        rev = bytearray()
        rev += o._node(o.FND_REVISION_MANIFEST_START6,
                       o._pack_eguid((guid, rid_n))
                       + o._pack_eguid((bytes(16), 0))
                       + U32.pack(1) + struct.pack("<H", 0), 0)
        rev += o._node(o.FND_GLOBAL_ID_TABLE_START2, b"", 0)
        rev += o._node(o.FND_GLOBAL_ID_TABLE_ENTRY, U32.pack(0) + guid, 0)
        rev += o._node(o.FND_GLOBAL_ID_TABLE_END, b"", 0)
        rev += decl(0, o.JCID_PAGE_NODE, page_pset)
        rev += decl(1, o.JCID_RICH_TEXT_OE_NODE, text_ref)
        rev += o._node(o.FND_ROOT_OBJECT_REFERENCE3,
                       o._pack_eguid((guid, 0)) + U32.pack(1), 0)
        rev += o._node(o.FND_REVISION_MANIFEST_END, b"", 0)
        return bytes(rev)

    rev_list = (o._node(o.FND_REVISION_MANIFEST_LIST_START,
                        o._pack_eguid((guid, 9)) + U32.pack(0), 0)
                + revision(8, old_pset) + revision(7, new_pset))
    rev_ref = put(o._fragment(0x20, rev_list))
    man = (o._node(o.FND_OBJECT_SPACE_MANIFEST_LIST_START,
                   o._pack_eguid((guid, 9)), 0)
           + o._node(o.FND_REVISION_MANIFEST_LIST_REF,
                     U64.pack(rev_ref[0]) + U32.pack(rev_ref[1]), 2))
    man_ref = put(o._fragment(0x18, man))
    root = o._node(o.FND_OBJECT_SPACE_MANIFEST_LIST_REF,
                   U64.pack(man_ref[0]) + U32.pack(man_ref[1])
                   + o._pack_eguid((guid, 9)), 2)
    assert o.parse_onestore(_minimal_file(pieces, root)) == [
        {"title": "", "lines": ["new"]}]
