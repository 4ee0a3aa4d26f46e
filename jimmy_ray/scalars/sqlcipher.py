"""SQLCipher database layer, pure python (public format + SQLite spec).

The reference's Signal path drives ``sigexport``, whose core job is
opening Signal Desktop's SQLCipher message store
(/root/reference/src/jimmy/formats/signal.py:14-78).  SQLCipher's
on-disk format is published (design + default parameters on the
project's documentation): a standard SQLite database whose pages are
AES-256-CBC encrypted with a per-page IV and HMAC stored in the page's
reserved region.  v4 defaults implemented here:

- salt = first 16 bytes of the file (replaces ``SQLite format 3\\0``),
- key = PBKDF2-HMAC-SHA512(password, salt, 256 000 rounds, 32 bytes),
- hmac_key = PBKDF2-HMAC-SHA512(key, salt ^ 0x3a, 2 rounds, 32 bytes),
- per page n: ciphertext ‖ IV(16) ‖ HMAC-SHA512(ct ‖ iv ‖ LE32(n))(64)
  packed into the 80-byte reserve tail; page 1's first 16 bytes stay
  the salt and only bytes 16..usable are encrypted,
- decrypt restores the ``SQLite format 3\\0`` magic, yielding a stock
  SQLite file (reserved-space byte 20 = 80 is valid plain SQLite).

AES-256-CBC rides the vectorized core in jimmy_ray.scalars.aes; the KDF
is stdlib ``hashlib.pbkdf2_hmac``.  Both directions exist (the fixture
writer emits real SQLCipher files), and because this environment's
SQLite cannot create databases with reserved page bytes (no
``reserve_bytes`` pragma), ``build_minidb`` writes a minimal
single-table SQLite file from scratch per the public file-format spec —
differential-tested against ``sqlite3``'s own reader.

HMAC failure (wrong password / tamper) raises ValueError before any
page is interpreted.
"""

from __future__ import annotations

import hashlib
import hmac as _hmac
import struct

import numpy as np

from jimmy_ray.scalars import aes

PAGE_SIZE = 4096
RESERVE = 80  # IV(16) + HMAC-SHA512(64)
KDF_ITER = 256_000  # SQLCipher v4 default; fixtures pass a small value
_MAGIC = b"SQLite format 3\x00"


# --- SQLCipher page transform ----------------------------------------------

import functools


@functools.lru_cache(maxsize=1024)
def _keys(password: str, salt: bytes, kdf_iter: int) -> tuple[bytes, bytes]:
    key = hashlib.pbkdf2_hmac("sha512", password.encode("utf-8"),
                              salt, kdf_iter, 32)
    hmac_salt = bytes(b ^ 0x3A for b in salt)
    hmac_key = hashlib.pbkdf2_hmac("sha512", key, hmac_salt, 2, 32)
    return key, hmac_key


def _cbc_encrypt_batch(key: bytes, items: list[tuple[bytes, bytes]]
                       ) -> list[bytes]:
    """CBC-encrypt many (iv, content) streams under one key.  CBC chains
    sequentially *within* a stream but streams are independent, so the
    inner loop runs one vectorized AES step per block INDEX over all
    same-length streams at once (the hot path for fixture synthesis:
    hundreds of pages per map_batches call, not per-block Python)."""
    rk = aes.expand_key(key)
    out: list[bytes] = [b""] * len(items)
    by_len: dict[int, list[int]] = {}
    for i, (_, content) in enumerate(items):
        by_len.setdefault(len(content), []).append(i)
    for length, idxs in by_len.items():
        nb = length // 16
        blocks = np.stack([
            np.frombuffer(items[i][1], dtype=np.uint8).reshape(nb, 16)
            for i in idxs])
        prev = np.stack([np.frombuffer(items[i][0], dtype=np.uint8)
                         for i in idxs])
        enc = np.empty_like(blocks)
        for j in range(nb):
            prev = aes.encrypt_blocks(blocks[:, j, :] ^ prev, rk)
            enc[:, j, :] = prev
        for k, i in enumerate(idxs):
            out[i] = enc[k].tobytes()
    return out


def _cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    rk = aes.expand_key(key)
    blocks = np.frombuffer(data, dtype=np.uint8).reshape(-1, 16)
    prev = np.concatenate([
        np.frombuffer(iv, dtype=np.uint8).reshape(1, 16), blocks[:-1]])
    return (aes.decrypt_blocks(blocks, rk) ^ prev).tobytes()


def encrypt_databases(plains: list[bytes], password: str, salt: bytes,
                      kdf_iter: int = KDF_ITER) -> list[bytes]:
    """Many plain SQLite files → SQLCipher under one (password, salt),
    with the page encryption vectorized across every page of every
    input (the batch path for fixture synthesis).  Per-page IVs derive
    deterministically from salt + input index so fixtures are
    byte-stable (a real writer draws them from os.urandom)."""
    if len(salt) != 16:
        raise ValueError("salt must be 16 bytes")
    for plain in plains:
        if plain[:16] != _MAGIC:
            raise ValueError("not a SQLite database")
        if plain[20] != RESERVE:
            raise ValueError("plaintext database must reserve 80 bytes/page")
    key, hmac_key = _keys(password, salt, kdf_iter)
    usable = PAGE_SIZE - RESERVE

    items: list[tuple[bytes, bytes]] = []
    meta: list[tuple[int, int, bytes]] = []  # (input idx, page no, iv)
    for di, plain in enumerate(plains):
        for n in range(1, len(plain) // PAGE_SIZE + 1):
            page = plain[(n - 1) * PAGE_SIZE:n * PAGE_SIZE]
            content = page[16:usable] if n == 1 else page[:usable]
            iv = hashlib.sha256(
                salt + b"iv" + struct.pack("<II", di, n)).digest()[:16]
            items.append((iv, content))
            meta.append((di, n, iv))
    cts = _cbc_encrypt_batch(key, items)

    outs = [bytearray() for _ in plains]
    for (di, n, iv), ct in zip(meta, cts):
        mac = _hmac.new(hmac_key, ct + iv + struct.pack("<I", n),
                        hashlib.sha512).digest()
        outs[di] += (salt if n == 1 else b"") + ct + iv + mac
    return [bytes(o) for o in outs]


def encrypt_database(plain: bytes, password: str, salt: bytes,
                     kdf_iter: int = KDF_ITER) -> bytes:
    """Single-input convenience over encrypt_databases."""
    return encrypt_databases([plain], password, salt, kdf_iter)[0]


def decrypt_database(payload: bytes, password: str,
                     kdf_iter: int = KDF_ITER) -> bytes:
    """SQLCipher file → plain SQLite bytes (readable by sqlite3).  Every
    page's HMAC is verified before decryption; a wrong password fails
    the page-1 check immediately."""
    if len(payload) % PAGE_SIZE:
        raise ValueError("truncated SQLCipher file")
    salt = payload[:16]
    key, hmac_key = _keys(password, salt, kdf_iter)
    usable = PAGE_SIZE - RESERVE
    out = bytearray()
    for n in range(1, len(payload) // PAGE_SIZE + 1):
        page = payload[(n - 1) * PAGE_SIZE:n * PAGE_SIZE]
        ct = page[16:usable] if n == 1 else page[:usable]
        iv = page[usable:usable + 16]
        mac = page[usable + 16:usable + 80]
        want = _hmac.new(hmac_key, ct + iv + struct.pack("<I", n),
                         hashlib.sha512).digest()
        if not _hmac.compare_digest(mac, want):
            raise ValueError(
                f"HMAC check failed on page {n} (wrong password or "
                "corrupted database)")
        plain = _cbc_decrypt(key, iv, ct)
        out += (_MAGIC + plain if n == 1 else plain) + bytes(RESERVE)
    return bytes(out)


# --- minimal SQLite writer (public file-format spec) ------------------------

def _varint(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = bytearray()
    while n:
        out.append(n & 0x7F)
        n >>= 7
    out.reverse()
    for i in range(len(out) - 1):
        out[i] |= 0x80
    return bytes(out)


def _record(values: list) -> bytes:
    """SQLite record format: serial-type header + bodies."""
    serials = bytearray()
    body = bytearray()
    for v in values:
        if v is None:
            serials += _varint(0)
        elif isinstance(v, int):
            for size, stype in ((1, 1), (2, 2), (3, 3), (4, 4), (6, 5),
                                (8, 6)):
                if -(1 << (size * 8 - 1)) <= v < (1 << (size * 8 - 1)):
                    serials += _varint(stype)
                    body += v.to_bytes(size, "big", signed=True)
                    break
        else:
            raw = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            stype = len(raw) * 2 + (13 if isinstance(v, str) else 12)
            serials += _varint(stype)
            body += raw
    # header length varint counts itself — iterate to the fixpoint
    hl = len(serials) + 1
    while len(_varint(hl)) + len(serials) != hl:
        hl = len(_varint(hl)) + len(serials)
    return _varint(hl) + bytes(serials) + bytes(body)


def _leaf_page(cells: list[bytes], usable: int, page1: bool = False) -> bytes:
    """Table b-tree leaf (type 0x0D); cells grow down from usable."""
    base = 100 if page1 else 0
    buf = bytearray(PAGE_SIZE)
    pos = usable
    ptrs = []
    for cell in cells:
        pos -= len(cell)
        buf[pos:pos + len(cell)] = cell
        ptrs.append(pos)
    hdr = struct.pack(">BHHHB", 0x0D, 0, len(cells), pos, 0)
    buf[base:base + 8] = hdr
    p = base + 8
    for off in ptrs:
        buf[p:p + 2] = struct.pack(">H", off)
        p += 2
    if p > pos:
        raise ValueError("page overflow (cell area met pointer array)")
    return bytes(buf)


def _interior_page(children: list[tuple[int, int]], rightmost: int,
                   usable: int) -> bytes:
    """Table b-tree interior (type 0x05): (child_page, max_rowid) cells."""
    buf = bytearray(PAGE_SIZE)
    pos = usable
    ptrs = []
    for child, rowid in children:
        cell = struct.pack(">I", child) + _varint(rowid)
        pos -= len(cell)
        buf[pos:pos + len(cell)] = cell
        ptrs.append(pos)
    buf[0:12] = struct.pack(">BHHHBI", 0x05, 0, len(children), pos, 0,
                            rightmost)
    p = 12
    for off in ptrs:
        buf[p:p + 2] = struct.pack(">H", off)
        p += 2
    return bytes(buf)


def _table_cell(rowid: int, values: list) -> bytes:
    rec = _record(values)
    return _varint(len(rec)) + _varint(rowid) + rec


def build_minidb(table: str, columns: list[str],
                 rows: list[list]) -> bytes:
    """A complete single-table SQLite database with page_size 4096 and
    80 reserved bytes per page (the SQLCipher layout this environment's
    sqlite3 cannot produce).  No overflow pages: each row's record must
    fit a leaf (raises otherwise)."""
    usable = PAGE_SIZE - RESERVE
    max_cell = usable - 35
    leaf_budget = usable - 8  # page header; pointer array counted per cell

    cells = [_table_cell(i + 1, row) for i, row in enumerate(rows)]
    for c in cells:
        if len(c) > max_cell:
            raise ValueError("row too large for the no-overflow subset")

    leaves: list[list[bytes]] = [[]]
    used = 0
    for c in cells:
        need = len(c) + 2
        if used + need > leaf_budget:
            leaves.append([])
            used = 0
        leaves[-1].append(c)
        used += need

    single = len(leaves) == 1
    root_page = 2
    first_leaf = 2 if single else 3
    n_pages = 1 + (1 if single else 1 + len(leaves))

    sql = f"CREATE TABLE {table} ({', '.join(columns)})"
    master_cell = _table_cell(1, ["table", table, table, root_page, sql])

    header = bytearray(100)
    header[:16] = _MAGIC
    header[16:18] = struct.pack(">H", PAGE_SIZE)
    header[18] = header[19] = 1
    header[20] = RESERVE
    header[21:24] = bytes([64, 32, 32])
    header[24:28] = struct.pack(">I", 1)       # change counter
    header[28:32] = struct.pack(">I", n_pages)
    header[40:44] = struct.pack(">I", 1)       # schema cookie
    header[44:48] = struct.pack(">I", 4)       # schema format
    header[56:60] = struct.pack(">I", 1)       # utf-8
    header[92:96] = struct.pack(">I", 1)       # version-valid-for
    header[96:100] = struct.pack(">I", 3040001)

    page1 = bytearray(_leaf_page([master_cell], usable, page1=True))
    page1[:100] = header

    pages = [bytes(page1)]
    if single:
        pages.append(_leaf_page(leaves[0], usable))
    else:
        rowid_of = []
        count = 0
        for leaf in leaves:
            count += len(leaf)
            rowid_of.append(count)
        children = [(first_leaf + i, rowid_of[i])
                    for i in range(len(leaves) - 1)]
        pages.append(_interior_page(children,
                                    first_leaf + len(leaves) - 1, usable))
        pages.extend(_leaf_page(leaf, usable) for leaf in leaves)
    return b"".join(pages)
