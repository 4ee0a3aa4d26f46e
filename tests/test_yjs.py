"""Yjs v1 update codec (scalars/yjs.py): lib0 primitives, struct
roundtrips, UTF-16 clock accounting, and the AFFiNE store end-to-end
(reference boundary: formats/affine.py:202-245 via pycrdt)."""

import io

import pytest

from jimmy_ray.scalars import yjs


def test_lib0_varint_roundtrips():
    for n in (0, 1, 0x7F, 0x80, 0x3FFF, 0x4000, 10**12):
        b = bytearray()
        yjs.write_var_uint(b, n)
        assert yjs.read_var_uint(io.BytesIO(bytes(b))) == n
    for n in (0, 1, -1, 63, -63, 64, -64, 8191, -8192, 10**9, -(10**9)):
        b = bytearray()
        yjs.write_var_int(b, n)
        assert yjs.read_var_int(io.BytesIO(bytes(b))) == n


def test_lib0_any_roundtrips():
    values = [None, True, False, 0, -5, 2**40, -(2**40), 2.5, "héllo",
              b"\x00\x01", [1, "a", None], {"k": [True, {"n": 3}]}]
    for v in values:
        b = bytearray()
        yjs.write_any(b, v)
        assert yjs.read_any(io.BytesIO(bytes(b))) == v


def test_doc_roundtrip_nested():
    doc = {
        "meta": {"name": "ws", "pages": [
            {"id": "p1", "tags": ["a"], "n": 1700000000000},
            {"id": "p2", "tags": []}],
            "flag": True, "ratio": 0.5, "none": None},
        "blocks": {"b1": {"sys:children": ["x", "y"],
                          "prop:text": yjs.YText("rich text body"),
                          "prop:checked": False},
                   "b2": {"nested": {"deep": {"k": "v"}}}},
    }
    dec = yjs.decode_doc(yjs.encode_doc(doc))
    assert dec["meta"]["pages"][0]["id"] == "p1"
    assert dec["blocks"]["b1"]["prop:text"] == "rich text body"
    assert dec["blocks"]["b2"]["nested"] == {"deep": {"k": "v"}}
    assert dec["meta"]["none"] is None
    # byte-deterministic for fixtures
    assert yjs.encode_doc(doc) == yjs.encode_doc(doc)


def test_ytext_chunks_and_utf16_lengths():
    # astral chars are 2 UTF-16 units: clock math must still chain
    s = "emoji \U0001F600 café \U0001F680 end"
    dec = yjs.decode_doc(yjs.encode_doc({"m": {"t": yjs.YText(s)}}))
    assert dec["m"]["t"] == s
    # empty and 1-char texts (no second chunk)
    for s in ("", "x"):
        assert yjs.decode_doc(
            yjs.encode_doc({"m": {"t": yjs.YText(s)}}))["m"]["t"] == s


def test_root_array_and_update_surface():
    dec = yjs.decode_doc(yjs.encode_doc({"list": [1, "two", {"k": 3}]}))
    assert dec == {"list": [1, "two", {"k": 3}]}
    # header sanity: 1 client run, client id, start clock 0
    buf = io.BytesIO(yjs.encode_doc({"m": {"a": 1}}))
    assert yjs.read_var_uint(buf) == 1
    yjs.read_var_uint(buf)  # struct count
    assert yjs.read_var_uint(buf) == yjs.CLIENT
    assert yjs.read_var_uint(buf) == 0


def test_out_of_subset_raises():
    with pytest.raises(TypeError):
        yjs.encode_doc({"m": {"bad": object()}})
    with pytest.raises(TypeError):
        yjs.encode_doc({"root": "plain string"})


def test_affine_store_end_to_end():
    from jimmy_ray.sources import affine

    payload = affine.synth_affine_store(12, "hello workspace")
    assert payload == affine.synth_affine_store(12, "hello workspace")
    rows = affine.parse_affine_store(payload)
    want = affine.parse_affine(affine.synth_affine(12, "hello workspace"))
    assert rows == want
    # the store really is a sqlite db of yjs blobs
    import sqlite3
    con = sqlite3.connect(":memory:")
    con.deserialize(payload)
    n, = con.execute("SELECT count(*) FROM snapshots").fetchone()
    assert n == 2  # meta doc + one page doc
    con.close()


def test_map_overwrite_item_inherits_parent_sub():
    """Real Yjs map re-set: new item origin = old item, info bit 0x20
    set, NO parentSub string in the stream (Item.write only emits the
    string when both origins are absent)."""
    out = bytearray()
    yjs.write_var_uint(out, 1)      # one client
    yjs.write_var_uint(out, 2)      # two structs
    yjs.write_var_uint(out, yjs.CLIENT)
    yjs.write_var_uint(out, 0)      # start clock
    # struct 1: root map entry k=1 (parent by root name + parentSub)
    out.append(8 | 0x20)            # ContentAny | parentSub bit
    yjs.write_var_uint(out, 1)      # parent is root name
    yjs.write_var_string(out, "m")
    yjs.write_var_string(out, "k")  # parentSub string (no origins)
    yjs.write_var_uint(out, 1)      # one Any value
    yjs.write_any(out, 1)
    # struct 2: overwrite k=2 (origin = struct 1, bit set, NO string)
    out.append(8 | 0x80 | 0x20)     # ContentAny | origin | parentSub bit
    yjs.write_var_uint(out, yjs.CLIENT)
    yjs.write_var_uint(out, 0)      # origin id = (client, 0)
    yjs.write_var_uint(out, 1)
    yjs.write_any(out, 2)
    yjs.write_var_uint(out, 0)      # empty delete set
    assert yjs.decode_doc(bytes(out)) == {"m": {"k": 2}}
