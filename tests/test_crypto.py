"""AES-128-CBC (pure numpy) against published vectors + scheme round trips."""

import numpy as np
import pytest

from jimmy_ray.scalars import aes, crypto


def test_fips197_vectors():
    # FIPS-197 Appendix C.1
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert aes.encrypt_block(pt, key).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    # FIPS-197 Appendix B
    key2 = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    pt2 = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    assert aes.encrypt_block(pt2, key2).hex() == "3925841d02dc09fbdc118597196a0b32"


def test_fips197_aes256_vector():
    # FIPS-197 Appendix C.3 (AES-256) + decrypt round trip
    key = bytes(range(32))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = aes.encrypt_block(pt, key)
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"
    rk = aes.expand_key(key)
    assert rk.shape == (15, 16)
    back = aes.decrypt_blocks(
        np.frombuffer(ct, dtype=np.uint8).reshape(1, 16), rk).tobytes()
    assert back == pt


def test_nist_cbc_vector():
    # NIST SP 800-38A F.2.1 (first block)
    k = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    p = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    ct = aes.cbc_encrypt_many([p], k, [iv])[0]
    assert ct[:16].hex() == "7649abac8119b246cee98e9b12e9197d"


def test_cbc_roundtrip_varied_lengths():
    key = bytes(range(16))
    docs = [b"", b"x", b"a" * 15, b"b" * 16, b"c" * 17, "grüße 你好".encode()]
    ivs = [bytes([i]) * 16 for i in range(len(docs))]
    cts = aes.cbc_encrypt_many(docs, key, ivs)
    assert aes.cbc_decrypt_many(cts, key, ivs) == docs
    # ciphertext is block-aligned and padded
    assert all(len(c) % 16 == 0 and len(c) >= 16 for c in cts)


def test_decrypt_blocks_matches_encrypt_inverse():
    rng = np.random.default_rng(7)
    states = rng.integers(0, 256, (64, 16), dtype=np.uint8)
    rk = aes.expand_key(bytes(range(16)))
    assert np.array_equal(aes.decrypt_blocks(aes.encrypt_blocks(states, rk), rk),
                          states)


def test_evernote_scheme_roundtrip_and_hmac():
    payload = crypto.evernote_encrypt("pw", "secret note".encode(), doc_id=5)
    assert payload[:4] == b"ENC0"
    assert crypto.evernote_decrypt(payload, "pw") == b"secret note"
    # tampering breaks the HMAC (md_lib/evernote.py:33-40)
    bad = payload[:-1] + bytes([payload[-1] ^ 1])
    with pytest.raises(ValueError):
        crypto.evernote_decrypt(bad, "pw")
    with pytest.raises(ValueError):
        crypto.evernote_decrypt(payload, "wrong")


def test_colornote_scheme_roundtrip():
    salt = b"s" * 8
    ct = crypto.colornote_encrypt(salt, "pw", b"colornote body")
    assert crypto.colornote_decrypt(salt, "pw", ct) == b"colornote body"


def test_decrypt_stage_dead_letters_bad_rows(ray_session):
    import pyarrow as pa

    good = crypto.evernote_encrypt("pw", b"ok", 1)
    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([good, b"ENC0" + b"\0" * 80], pa.binary()),
    })
    out = crypto.DecryptStage(password="pw")(batch)
    assert out["text"].to_pylist() == ["ok", ""]
    errs = out["error"].to_pylist()
    assert errs[0] is None and "HMAC" in errs[1]
