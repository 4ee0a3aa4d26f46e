"""SQLCipher v4 page format + minimal SQLite writer: differential vs
stock sqlite3, roundtrips, HMAC auth, and the Signal store end-to-end
(reference boundary: formats/signal.py:14-78 via sigexport)."""

import sqlite3

import pytest

from jimmy_ray.scalars import sqlcipher as sc


def _read_all(db_bytes: bytes, query: str):
    con = sqlite3.connect(":memory:")
    try:
        con.deserialize(db_bytes)
        return con.execute(query).fetchall()
    finally:
        con.close()


def test_minidb_single_leaf_matches_sqlite_reader():
    rows = [[i, f"chat {i % 3}", "x" * (i % 50)] for i in range(20)]
    db = sc.build_minidb("m", ["id INTEGER", "chat TEXT", "data TEXT"], rows)
    assert db[20] == sc.RESERVE and len(db) % sc.PAGE_SIZE == 0
    got = _read_all(db, "SELECT id, chat, data FROM m ORDER BY rowid")
    assert got == [tuple(r) for r in rows]


def test_minidb_multi_leaf_interior_root():
    rows = [[i, f"c{i % 7}", "payload " * 40 + str(i)] for i in range(500)]
    db = sc.build_minidb("m", ["id INTEGER", "chat TEXT", "data TEXT"], rows)
    assert len(db) // sc.PAGE_SIZE > 3  # really multi-page
    got = _read_all(db, "SELECT count(*), sum(id), min(chat) FROM m")
    assert got == [(500, sum(r[0] for r in rows), "c0")]
    # rowid-indexed lookup exercises the interior page's key routing
    got = _read_all(db, "SELECT data FROM m WHERE rowid = 400")
    assert got == [(rows[399][2],)]


def test_minidb_edge_values():
    rows = [[None, "", "ünïcødé ✓"], [-(1 << 40), "big", "x"],
            [(1 << 40), "neg", ""]]
    db = sc.build_minidb("t", ["a INTEGER", "b TEXT", "c TEXT"], rows)
    assert _read_all(db, "SELECT a, b, c FROM t") == [tuple(r) for r in rows]


def test_encrypt_decrypt_roundtrip_and_auth():
    db = sc.build_minidb("t", ["a INTEGER"], [[i] for i in range(300)])
    salt = bytes(range(16))
    enc = sc.encrypt_database(db, "pw", salt, kdf_iter=64)
    assert enc[:16] == salt
    assert b"SQLite format 3" not in enc  # pages actually encrypted
    assert sc.decrypt_database(enc, "pw", kdf_iter=64) == db
    with pytest.raises(ValueError, match="HMAC"):
        sc.decrypt_database(enc, "wrong", kdf_iter=64)
    tampered = bytearray(enc)
    tampered[sc.PAGE_SIZE + 100] ^= 0xFF
    with pytest.raises(ValueError, match="page 2"):
        sc.decrypt_database(bytes(tampered), "pw", kdf_iter=64)


def test_signal_store_end_to_end():
    from jimmy_ray.sources import signal_chats as sig

    payload = sig.synth_signal_store(12, "hello from the store")
    # byte-deterministic (fixture requirement)
    assert payload == sig.synth_signal_store(12, "hello from the store")
    rows = sig.parse_signal_store(payload)
    assert rows == sig.parse_signal(sig.synth_signal_chats(
        12, "hello from the store"))
    with pytest.raises(ValueError, match="HMAC"):
        sig.parse_signal_store(payload, password="wrong")


def test_apkg_container_layer(tmp_path):
    """Anki .apkg: zip wrap + collection extraction preferring anki21
    (reference anki.py:108-112)."""
    import json
    import os
    import zipfile

    from jimmy_ray.sources import anki

    p = tmp_path / "x.apkg"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("collection.anki2", b"old")
        zf.writestr("collection.anki21", b"new")
        zf.writestr("media", json.dumps({}))
    out = anki.open_apkg_collection(str(p))
    try:
        assert open(out, "rb").read() == b"new"
    finally:
        os.unlink(out)
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("media", json.dumps({}))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="no collection"):
        anki.open_apkg_collection(str(p))
