"""Crypto scalars for encrypted-payload sources (SURVEY.md §2.2 M26, §2.1 S10).

Real AES-128-CBC (pure-numpy, jimmy_ray.scalars.aes, FIPS-197-vector
tested) behind the reference's two schemes:

- **Evernote en-crypt** (/root/reference/src/jimmy/md_lib/evernote.py:19-49):
  payload = b"ENC0" || salt(16) || hmac_salt(16) || iv(16) || ciphertext
  || HMAC-SHA256(head)(32); keys via PBKDF2-HMAC-SHA256(password, salt,
  50000, 16).  KDF results are cached per (password, salt) — payload
  salts are drawn from a bounded pool, so each worker pays PBKDF2 a
  constant number of times, not once per row.
- **ColorNote** (/root/reference/src/jimmy/formats/colornote.py:37-54):
  key = md5(password+salt), iv = md5(key+password+salt), AES-128-CBC.

Fixture encryption derives salts/IVs deterministically from doc_id (no
RNG — the determinism invariant); real payloads carry their own.
"""

from __future__ import annotations

import base64
import functools
import hashlib
import hmac as hmac_mod

import pyarrow as pa

from jimmy_ray.scalars import aes

PBKDF2_ITERS = 50_000
_SALT_POOL = 16  # distinct fixture salts -> bounded KDF work per worker


@functools.lru_cache(maxsize=256)
def _pbkdf2(password: bytes, salt: bytes) -> bytes:
    return hashlib.pbkdf2_hmac("SHA256", password, salt, PBKDF2_ITERS, 16)


def kdf_md5(password: str) -> bytes:
    """ColorNote-style base KDF: md5(password) -> 16-byte key."""
    return hashlib.md5(password.encode("utf-8")).digest()


def _fixture_salt(doc_id: int, label: bytes) -> bytes:
    return hashlib.md5(
        label + str(doc_id % _SALT_POOL).encode()
    ).digest()


def _fixture_iv(doc_id: int) -> bytes:
    return hashlib.md5(b"iv" + str(doc_id).encode()).digest()


# --- Evernote en-crypt scheme ----------------------------------------------

def evernote_encrypt(password: str, plaintext: bytes, doc_id: int) -> bytes:
    pw = password.encode("utf-8")
    salt = _fixture_salt(doc_id, b"salt")
    hmac_salt = _fixture_salt(doc_id, b"hmac")
    iv = _fixture_iv(doc_id)
    key = _pbkdf2(pw, salt)
    ct = aes.cbc_encrypt_many([plaintext], key, [iv])[0]
    head = b"ENC0" + salt + hmac_salt + iv + ct
    hmac_key = _pbkdf2(pw, hmac_salt)
    digest = hmac_mod.new(hmac_key, head, hashlib.sha256).digest()
    return head + digest


def evernote_decrypt(payload: bytes, password: str) -> bytes:
    """Layout + checks per md_lib/evernote.py:19-49."""
    pw = password.encode("utf-8")
    salt = payload[4:20]
    hmac_salt = payload[20:36]
    iv = payload[36:52]
    ct = payload[52:-32]
    hmac_key = _pbkdf2(pw, hmac_salt)
    digest = hmac_mod.new(hmac_key, payload[:-32], hashlib.sha256).digest()
    if not hmac_mod.compare_digest(digest, payload[-32:]):
        raise ValueError("HMAC mismatch (wrong password?)")
    key = _pbkdf2(pw, salt)
    return aes.cbc_decrypt_many([ct], key, [iv])[0]


def evernote_decrypt_b64(data_b64: str, password: str) -> str:
    return evernote_decrypt(base64.b64decode(data_b64), password).decode("utf-8")


# --- ColorNote scheme ------------------------------------------------------

def colornote_decrypt(salt: bytes, password: str, ciphertext: bytes) -> bytes:
    pw = password.encode("utf-8")
    key = hashlib.md5(pw + salt).digest()
    iv = hashlib.md5(key + pw + salt).digest()
    return aes.cbc_decrypt_many([ciphertext], key, [iv])[0]


def colornote_encrypt(salt: bytes, password: str, plaintext: bytes) -> bytes:
    pw = password.encode("utf-8")
    key = hashlib.md5(pw + salt).digest()
    iv = hashlib.md5(key + pw + salt).digest()
    return aes.cbc_encrypt_many([plaintext], key, [iv])[0]


# --- legacy helpers (kept for back-compat in tests) ------------------------

def encrypt(password: str, plaintext: bytes, doc_id: int = 0) -> bytes:
    return evernote_encrypt(password, plaintext, doc_id)


def decrypt(password: str, ciphertext: bytes) -> bytes:
    return evernote_decrypt(ciphertext, password)


class DecryptStage:
    """Actor-pool stage: per-payload Evernote decrypt with batch-vectorized
    AES (all blocks of the batch in one numpy sweep; the KDF cache keys on
    the payload salt).  Failing rows dead-letter instead of crashing."""

    def __init__(self, password: str, payload_column: str = "payload"):
        self.password = password
        self.pw = password.encode("utf-8")
        self.column = payload_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.column].to_pylist()
        cts: list[bytes] = []
        ivs: list[bytes] = []
        keys: list[bytes] = []
        errors: list[str | None] = [None] * len(payloads)
        ok_idx: list[int] = []
        for i, payload in enumerate(payloads):
            try:
                salt, hmac_salt = payload[4:20], payload[20:36]
                hmac_key = _pbkdf2(self.pw, hmac_salt)
                digest = hmac_mod.new(
                    hmac_key, payload[:-32], hashlib.sha256
                ).digest()
                if not hmac_mod.compare_digest(digest, payload[-32:]):
                    raise ValueError("HMAC mismatch")
                cts.append(payload[52:-32])
                ivs.append(payload[36:52])
                keys.append(_pbkdf2(self.pw, salt))
                ok_idx.append(i)
            except Exception as exc:  # noqa: BLE001 - dead-letter semantics
                errors[i] = f"{type(exc).__name__}: {exc}"
        plaintexts = [""] * len(payloads)
        # vectorized decrypt per distinct key (fixture: bounded salt pool)
        by_key: dict[bytes, list[int]] = {}
        for pos, i in enumerate(ok_idx):
            by_key.setdefault(keys[pos], []).append(pos)
        for key, positions in by_key.items():
            outs = aes.cbc_decrypt_many(
                [cts[p] for p in positions], key, [ivs[p] for p in positions]
            )
            for p, out in zip(positions, outs):
                try:
                    plaintexts[ok_idx[p]] = out.decode("utf-8")
                except UnicodeDecodeError as exc:
                    errors[ok_idx[p]] = f"UnicodeDecodeError: {exc}"
        out_cols = {n: batch[n] for n in batch.column_names if n != self.column}
        out_cols["text"] = pa.array(plaintexts, pa.string())
        out_cols["error"] = pa.array(errors, pa.string())
        return pa.table(out_cols)


def decrypt_notes(sf_dir: str, password: str = "fixture-password"):
    """Encrypted corpus round trip: synth-encrypt (Evernote scheme, real
    AES) → DecryptStage.  Oracle: decrypt(encrypt(text)) == text, i.e.
    the identity on documents.text — oracle-checked end-to-end crypto."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def encrypt_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = [
            evernote_encrypt(password, t.encode("utf-8"), i)
            for i, t in zip(ids, batch["text"].to_pylist())
        ]
        return pa.table({"doc_id": batch["doc_id"],
                         "payload": pa.array(payloads, pa.binary())})

    encrypted = ds.map_batches(encrypt_batch, batch_format="pyarrow", batch_size=512)
    return encrypted.map_batches(
        DecryptStage,
        fn_constructor_kwargs={"password": password},
        batch_format="pyarrow",
        batch_size=512,
        concurrency=(1, 4),
    ).select_columns(["doc_id", "text"])
