"""Property tests for the round-4 binary codecs: 7z layouts, SQLCipher
+ the minimal SQLite writer (differential vs sqlite3), Yjs documents,
lib0 Any.  Mirrors the reference's conformance-corpus strategy
(SURVEY.md §5) with generated inputs instead of fixed goldens."""

import io
import sqlite3

from hypothesis import given, settings
from hypothesis import strategies as st

from jimmy_ray.scalars import sqlcipher as sc
from jimmy_ray.scalars import yjs
from jimmy_ray.sources import sevenzip as sz

# --- 7z ---------------------------------------------------------------------

_member_names = st.lists(
    st.text(st.characters(min_codepoint=32, max_codepoint=0x2FFF,
                          exclude_characters="\x7f"),
            min_size=1, max_size=20),
    min_size=1, max_size=5, unique=True)


@settings(max_examples=25, deadline=None)
@given(names=_member_names,
       payload=st.binary(max_size=500),
       compress=st.sampled_from(["copy", "lzma", "lzma2", "bzip2"]),
       solid=st.booleans(),
       password=st.sampled_from([None, "pw"]))
def test_7z_any_layout_roundtrips(names, payload, compress, solid,
                                  password):
    members = [(n, payload + n.encode("utf-8")) for n in names]
    archive = sz.build_7z(members, password=password, compress=compress,
                          cycles_power=6, solid=solid,
                          encrypt_header=password is not None)
    assert sz.parse_7z(archive, password) == members


# --- minimal SQLite writer vs the real sqlite3 reader -----------------------

_cell = st.one_of(st.none(),
                  st.integers(min_value=-(2**62), max_value=2**62),
                  st.text(max_size=120),
                  st.binary(max_size=120))


@settings(max_examples=25, deadline=None)
@given(rows=st.lists(st.tuples(_cell, _cell), max_size=200))
def test_minidb_matches_sqlite_reader(rows):
    rows = [list(r) for r in rows]
    db = sc.build_minidb("t", ["a", "b"], rows)
    con = sqlite3.connect(":memory:")
    try:
        con.deserialize(db)
        got = con.execute("SELECT a, b FROM t ORDER BY rowid").fetchall()
    finally:
        con.close()
    assert got == [tuple(r) for r in rows]


@settings(max_examples=10, deadline=None)
@given(n_rows=st.integers(min_value=0, max_value=400),
       password=st.text(min_size=1, max_size=12))
def test_sqlcipher_roundtrip_any_size(n_rows, password):
    rows = [[i, f"row {i} " * 10] for i in range(n_rows)]
    db = sc.build_minidb("t", ["a", "b"], rows)
    salt = bytes(range(16))
    enc = sc.encrypt_database(db, password, salt, kdf_iter=16)
    assert len(enc) == len(db)
    assert sc.decrypt_database(enc, password, kdf_iter=16) == db


# --- Yjs --------------------------------------------------------------------

_any_value = st.recursive(
    st.one_of(st.none(), st.booleans(),
              st.integers(min_value=-(2**50), max_value=2**50),
              st.floats(allow_nan=False, allow_infinity=False),
              st.text(max_size=40)),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=8), children,
                        max_size=4)),
    max_leaves=12)


@settings(max_examples=25, deadline=None)
@given(v=_any_value)
def test_lib0_any_roundtrips(v):
    buf = bytearray()
    yjs.write_any(buf, v)
    assert yjs.read_any(io.BytesIO(bytes(buf))) == v


_doc_value = st.recursive(
    st.one_of(st.none(), st.booleans(),
              st.integers(min_value=-(2**40), max_value=2**40),
              st.text(max_size=30),
              st.text(max_size=30).map(yjs.YText)),
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(st.text(min_size=1, max_size=6), children,
                        max_size=3)),
    max_leaves=10)


def _norm(o):
    if isinstance(o, dict):
        return {k: _norm(v) for k, v in o.items()}
    if isinstance(o, list):
        return [_norm(v) for v in o]
    return str(o) if isinstance(o, yjs.YText) else o


@settings(max_examples=25, deadline=None)
@given(root=st.dictionaries(st.text(min_size=1, max_size=6),
                            _doc_value, min_size=1, max_size=3))
def test_yjs_doc_roundtrips(root):
    doc = {"root": root}
    assert yjs.decode_doc(yjs.encode_doc(doc)) == _norm(doc)
