"""Pure-numpy AES-128 + CBC + PKCS#7 (FIPS-197, public algorithm).

No crypto library exists in this container, so the cipher is implemented
from the public specification — vectorized for the batch shapes this
engine feeds it:

- **decrypt** is embarrassingly parallel: ``P_i = D(C_i) XOR C_{i-1}``
  has no chain dependency, so every 16-byte block of every document in a
  batch is decrypted in one (N, 16) numpy sweep (14 table lookups + xors
  per round, N = all blocks in the batch).
- **encrypt** chains within a document but not across documents, so CBC
  encryption walks block-index-wise across the whole batch: round j
  encrypts block j of every document simultaneously.

Byte layout follows FIPS-197: state flat index ``i = r + 4*c``.

Used by jimmy_ray.scalars.crypto for the reference's two schemes:
Evernote en-crypt (PBKDF2-SHA256/50000/16 + AES-128-CBC + HMAC-SHA256,
/root/reference/src/jimmy/md_lib/evernote.py:19-49) and ColorNote
(key = md5(pw+salt), iv = md5(key+pw+salt),
/root/reference/src/jimmy/formats/colornote.py:37-54).
"""

from __future__ import annotations

import numpy as np

# --- tables (computed from the spec, not pasted) ---------------------------


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gf_mul(a: int, b: int) -> int:
    out = 0
    for _ in range(8):
        if b & 1:
            out ^= a
        b >>= 1
        a = _xtime(a)
    return out


def _build_sbox() -> tuple[np.ndarray, np.ndarray]:
    # log/alog tables over generator 3, inverse via alog[255 - log[x]]
    alog = [1] * 256
    log = [0] * 256
    for i in range(1, 256):
        alog[i] = _gf_mul(alog[i - 1], 3)
        log[alog[i]] = i
    log[1] = 0
    sbox = np.zeros(256, dtype=np.uint8)
    inv = np.zeros(256, dtype=np.uint8)
    for x in range(256):
        b = 0 if x == 0 else alog[255 - log[x]]
        s = 0x63
        for k in range(8):
            bit = (
                (b >> k) ^ (b >> ((k + 4) % 8)) ^ (b >> ((k + 5) % 8))
                ^ (b >> ((k + 6) % 8)) ^ (b >> ((k + 7) % 8))
            ) & 1
            s ^= bit << k
        sbox[x] = s
    for x in range(256):
        inv[sbox[x]] = x
    return sbox, inv


_SBOX, _INV_SBOX = _build_sbox()
_MUL = {
    c: np.array([_gf_mul(x, c) for x in range(256)], dtype=np.uint8)
    for c in (2, 3, 9, 11, 13, 14)
}
# ShiftRows: new[r + 4c] = old[r + 4*((c + r) % 4)]
_SHIFT = np.array([r + 4 * ((c + r) % 4) for c in range(4) for r in range(4)])
_INV_SHIFT = np.argsort(_SHIFT)
_RCON = [1]
for _ in range(9):
    _RCON.append(_xtime(_RCON[-1]))


def expand_key(key: bytes) -> np.ndarray:
    """AES key schedule -> (Nr+1, 16) uint8 round keys (flat r+4c).
    Nk=4 (AES-128, 11 round keys) or Nk=8 (AES-256, 15 round keys,
    FIPS-197 §5.2 including the extra SubWord at i%8==4)."""
    assert len(key) in (16, 32)
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [int(_SBOX[b]) for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk == 8 and i % nk == 4:
            t = [int(_SBOX[b]) for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    out = np.zeros((nr + 1, 16), dtype=np.uint8)
    for rnd in range(nr + 1):
        for c in range(4):
            for r in range(4):
                out[rnd, r + 4 * c] = w[4 * rnd + c][r]
    return out


def _mix_columns(s: np.ndarray) -> np.ndarray:
    v = s.reshape(-1, 4, 4)  # [n, column, row]
    r0, r1, r2, r3 = v[:, :, 0], v[:, :, 1], v[:, :, 2], v[:, :, 3]
    out = np.empty_like(v)
    out[:, :, 0] = _MUL[2][r0] ^ _MUL[3][r1] ^ r2 ^ r3
    out[:, :, 1] = r0 ^ _MUL[2][r1] ^ _MUL[3][r2] ^ r3
    out[:, :, 2] = r0 ^ r1 ^ _MUL[2][r2] ^ _MUL[3][r3]
    out[:, :, 3] = _MUL[3][r0] ^ r1 ^ r2 ^ _MUL[2][r3]
    return out.reshape(-1, 16)


def _inv_mix_columns(s: np.ndarray) -> np.ndarray:
    v = s.reshape(-1, 4, 4)
    r0, r1, r2, r3 = v[:, :, 0], v[:, :, 1], v[:, :, 2], v[:, :, 3]
    out = np.empty_like(v)
    out[:, :, 0] = _MUL[14][r0] ^ _MUL[11][r1] ^ _MUL[13][r2] ^ _MUL[9][r3]
    out[:, :, 1] = _MUL[9][r0] ^ _MUL[14][r1] ^ _MUL[11][r2] ^ _MUL[13][r3]
    out[:, :, 2] = _MUL[13][r0] ^ _MUL[9][r1] ^ _MUL[14][r2] ^ _MUL[11][r3]
    out[:, :, 3] = _MUL[11][r0] ^ _MUL[13][r1] ^ _MUL[9][r2] ^ _MUL[14][r3]
    return out.reshape(-1, 16)


def encrypt_blocks(states: np.ndarray, round_keys: np.ndarray) -> np.ndarray:
    """(N, 16) uint8 blocks -> AES-encrypted blocks, vectorized; round
    count follows the key schedule (10 for AES-128, 14 for AES-256)."""
    nr = round_keys.shape[0] - 1
    s = states ^ round_keys[0]
    for rnd in range(1, nr):
        s = _SBOX[s][:, _SHIFT]
        s = _mix_columns(s) ^ round_keys[rnd]
    s = _SBOX[s][:, _SHIFT]
    return s ^ round_keys[nr]


def decrypt_blocks(states: np.ndarray, round_keys: np.ndarray) -> np.ndarray:
    nr = round_keys.shape[0] - 1
    s = states ^ round_keys[nr]
    for rnd in range(nr - 1, 0, -1):
        s = _INV_SBOX[s[:, _INV_SHIFT]]
        s = _inv_mix_columns(s ^ round_keys[rnd])
    s = _INV_SBOX[s[:, _INV_SHIFT]]
    return s ^ round_keys[0]


def encrypt_block(block: bytes, key: bytes) -> bytes:
    return encrypt_blocks(
        np.frombuffer(block, dtype=np.uint8).reshape(1, 16), expand_key(key)
    ).tobytes()


def pkcs7_pad(data: bytes) -> bytes:
    n = 16 - len(data) % 16
    return data + bytes([n]) * n


def pkcs7_unpad(data: bytes) -> bytes:
    if not data or len(data) % 16:
        raise ValueError("invalid padded length")
    n = data[-1]
    if not 1 <= n <= 16 or data[-n:] != bytes([n]) * n:
        raise ValueError("invalid PKCS#7 padding")
    return data[:-n]


def cbc_encrypt_many(
    plaintexts: list[bytes], key: bytes, ivs: list[bytes]
) -> list[bytes]:
    """PKCS7-pad + CBC-encrypt each document; vectorized across documents
    block-index-wise (block j of every doc encrypted in one sweep)."""
    rk = expand_key(key)
    padded = [
        np.frombuffer(pkcs7_pad(p), dtype=np.uint8).reshape(-1, 16)
        for p in plaintexts
    ]
    n_blocks = np.array([p.shape[0] for p in padded])
    prev = np.stack([np.frombuffer(iv, dtype=np.uint8) for iv in ivs])
    outs = [np.empty_like(p) for p in padded]
    for j in range(int(n_blocks.max(initial=0))):
        active = np.nonzero(n_blocks > j)[0]
        states = np.stack([padded[i][j] for i in active]) ^ prev[active]
        enc = encrypt_blocks(states, rk)
        for pos, i in enumerate(active):
            outs[i][j] = enc[pos]
        prev[active] = enc
    return [o.tobytes() for o in outs]


def cbc_decrypt_many(
    ciphertexts: list[bytes], key: bytes, ivs: list[bytes]
) -> list[bytes]:
    """CBC-decrypt + unpad each document: every block of the whole batch
    in one vectorized decrypt (no chain dependency on the decrypt side)."""
    rk = expand_key(key)
    blocks = []
    prevs = []
    for ct, iv in zip(ciphertexts, ivs):
        c = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 16)
        blocks.append(c)
        prevs.append(
            np.concatenate([np.frombuffer(iv, dtype=np.uint8).reshape(1, 16),
                            c[:-1]])
        )
    if not blocks:
        return []
    flat = np.concatenate(blocks)
    plain = decrypt_blocks(flat, rk) ^ np.concatenate(prevs)
    out: list[bytes] = []
    pos = 0
    for c in blocks:
        n = c.shape[0]
        out.append(pkcs7_unpad(plain[pos : pos + n].tobytes()))
        pos += n
    return out
