"""Differential tests: the repo's pure-python crypto vs the independent
`cryptography` library (OpenSSL-backed).  This breaks the
self-referential loop where our writers and readers could share a
mistake — every cipher primitive under the 7z / PDF / SQLCipher /
ColorNote layers is checked against a real second implementation."""

import hashlib
import secrets

import numpy as np
import pytest

cryptography = pytest.importorskip("cryptography")

from cryptography.hazmat.decrepit.ciphers.algorithms import ARC4  # noqa: E402
from cryptography.hazmat.primitives.ciphers import (  # noqa: E402
    Cipher, algorithms, modes)

from jimmy_ray.scalars import aes  # noqa: E402


def _ossl_aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    return enc.update(data) + enc.finalize()


def _rand(n: int, seed: int) -> bytes:
    return hashlib.shake_256(b"diff%d" % seed).digest(n)


@pytest.mark.parametrize("keylen", [16, 32])
def test_aes_core_matches_openssl(keylen):
    """ECB-level block equality over many random keys/blocks."""
    for seed in range(20):
        key = _rand(keylen, seed)
        blocks = np.frombuffer(_rand(16 * 8, seed + 1000),
                               dtype=np.uint8).reshape(-1, 16)
        rk = aes.expand_key(key)
        ours = aes.encrypt_blocks(blocks.copy(), rk).tobytes()
        enc = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
        theirs = enc.update(blocks.tobytes()) + enc.finalize()
        assert ours == theirs
        back = aes.decrypt_blocks(
            np.frombuffer(ours, dtype=np.uint8).reshape(-1, 16), rk)
        assert back.tobytes() == blocks.tobytes()


def test_sqlcipher_cbc_batch_matches_openssl():
    from jimmy_ray.scalars import sqlcipher as sc

    key = _rand(32, 7)
    items = [(_rand(16, 10 + i), _rand(16 * (3 + i), 20 + i))
             for i in range(6)]
    ours = sc._cbc_encrypt_batch(key, items)
    for (iv, content), ct in zip(items, ours):
        assert ct == _ossl_aes_cbc_encrypt(key, iv, content)


def test_sevenzip_aes_layer_matches_openssl():
    from jimmy_ray.sources import sevenzip as sz

    password = "pw"
    salt, iv = _rand(16, 30), _rand(16, 31)
    data = _rand(160, 32)
    ct = sz.aes_encode(data, salt, iv, password, cycles_power=6)
    key = sz.derive_key(password, salt, 6)
    padded = data + b"\x00" * (-len(data) % 16)
    assert ct == _ossl_aes_cbc_encrypt(key, iv, padded)
    assert sz.aes_decode(ct, sz._aes_props(salt, iv, 6), password,
                         len(data)) == data


def test_pdf_rc4_and_aesv2_match_openssl():
    from jimmy_ray.sources import pdf

    for seed in range(10):
        key = _rand(16, seed)[:(5, 8, 16)[seed % 3]]  # 40/64/128-bit
        data = _rand(50 + seed, seed + 50)
        enc = Cipher(ARC4(key), mode=None).encryptor()
        assert pdf.rc4(key, data) == enc.update(data) + enc.finalize()
    # AESV2 stream layout: IV ‖ CBC(PKCS#7)
    key, iv = _rand(16, 90), _rand(16, 91)
    data = _rand(77, 92)
    ours = pdf._aes_cbc_encrypt(key, iv, data)
    pad = 16 - len(data) % 16
    theirs = iv + _ossl_aes_cbc_encrypt(key, iv, data + bytes([pad]) * pad)
    assert ours == theirs
    assert pdf._aes_cbc_decrypt(key, ours) == data


def test_pbkdf2_layers_match_hashlib_and_openssl():
    """SQLCipher + Evernote KDFs: ours vs cryptography's PBKDF2HMAC."""
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.kdf.pbkdf2 import PBKDF2HMAC

    from jimmy_ray.scalars import sqlcipher as sc

    salt = _rand(16, 100)
    key, hmac_key = sc._keys("pw", salt, 64)
    ossl = PBKDF2HMAC(hashes.SHA512(), 32, salt, 64).derive(b"pw")
    assert key == ossl
    hmac_salt = bytes(b ^ 0x3A for b in salt)
    assert hmac_key == PBKDF2HMAC(hashes.SHA512(), 32, hmac_salt,
                                  2).derive(key)


def test_colornote_and_evernote_schemes_against_openssl():
    from jimmy_ray.scalars import crypto

    payload = crypto.evernote_encrypt("pw", b"<div>secret</div>", 3)
    assert crypto.evernote_decrypt(payload, "pw") == b"<div>secret</div>"
