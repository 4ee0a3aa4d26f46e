"""Crypto scalars for encrypted-payload sources (SURVEY.md §2.2 M26, §2.1 S10).

The reference decrypts ColorNote AES-CBC with an MD5 KDF
(/root/reference/src/jimmy/formats/colornote.py:37-54) and Evernote
AES-128 + PBKDF2 + HMAC (/root/reference/src/jimmy/md_lib/evernote.py:19-49).
No AES library exists in this container, so the cipher here is RC4
(implementable from the public spec in pure Python) with the same shape:
password → KDF (md5, mirroring ColorNote's) → keystream cipher over the
payload, password supplied via stage config.  Swapping RC4 for AES when a
crypto lib exists changes only `_keystream_cipher`.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def kdf_md5(password: str) -> bytes:
    """ColorNote-style KDF: md5(password) -> 16-byte key."""
    return hashlib.md5(password.encode("utf-8")).digest()


def _keystream_cipher(key: bytes, data: bytes) -> bytes:
    """RC4 (public spec): symmetric, so encrypt == decrypt."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) % 256
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, byte in enumerate(data):
        i = (i + 1) % 256
        j = (j + s[i]) % 256
        s[i], s[j] = s[j], s[i]
        out[n] = byte ^ s[(s[i] + s[j]) % 256]
    return bytes(out)


def encrypt(password: str, plaintext: bytes) -> bytes:
    return _keystream_cipher(kdf_md5(password), plaintext)


def decrypt(password: str, ciphertext: bytes) -> bytes:
    return _keystream_cipher(kdf_md5(password), ciphertext)


class DecryptStage:
    """Actor-pool stage: key schedule derived once per actor from the
    password config (the reference passes the password through Config,
    common.py:38).  Failing rows dead-letter instead of crashing."""

    def __init__(self, password: str, payload_column: str = "payload"):
        self.key = kdf_md5(password)
        self.column = payload_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        plaintexts: list[str] = []
        errors: list[str | None] = []
        for payload in batch[self.column].to_pylist():
            try:
                plaintexts.append(
                    _keystream_cipher(self.key, payload).decode("utf-8")
                )
                errors.append(None)
            except Exception as exc:  # noqa: BLE001
                plaintexts.append("")
                errors.append(f"{type(exc).__name__}: {exc}")
        out = {n: batch[n] for n in batch.column_names if n != self.column}
        out["text"] = pa.array(plaintexts, pa.string())
        out["error"] = pa.array(errors, pa.string())
        return pa.table(out)


def decrypt_notes(sf_dir: str, password: str = "fixture-password"):
    """Encrypted corpus round trip: synth-encrypt → DecryptStage.
    Oracle: decrypt(encrypt(text)) == text, i.e. the identity on
    documents.text — oracle-checked end-to-end crypto."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    key = kdf_md5(password)

    def encrypt_batch(batch: pa.Table) -> pa.Table:
        payloads = [
            _keystream_cipher(key, t.encode("utf-8"))
            for t in batch["text"].to_pylist()
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
