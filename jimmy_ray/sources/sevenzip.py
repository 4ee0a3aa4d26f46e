"""Password-protected 7z archives, pure python (public 7z format spec).

The reference ships its encrypted fixtures as AES-256 7z archives and
opens them with py7zr (test/test_convert.py:262-298); py7zr is absent
here, so this module implements the honest subset from the published
format documentation (7zFormat.txt / 7zC readme):

- signature header + CRC-checked next-header locator,
- variable-length number codec,
- folders as linear simple-coder chains of Copy (00), LZMA1 (030101),
  LZMA2 (21, the modern ``7z a`` default) and BZip2 (040202) — all via
  stdlib raw streams — and AES256SHA256 (06f10701),
- the 7z AES key derivation (SHA-256 over salt ‖ UTF-16-LE password ‖
  LE64 counter for 2^NumCyclesPower rounds) on top of the vectorized
  AES-256 core in jimmy_ray.scalars.aes,
- plaintext headers and encrypted headers (kEncodedHeader, the
  ``7z a -p -mhe=on`` layout where even filenames are encrypted),
- solid folders (kSubStreamsInfo, the ``7z a`` default where many
  files share one compressed folder and the header carries per-member
  split sizes).

Both a reader (``parse_7z``) and a writer (``build_7z``) exist so the
archive layer is oracle-checkable end-to-end without any external tool:
``sevenzip_extract`` routes each document through copy/LZMA chains and
plain/encrypted headers, and every path round-trips to the same text.

Scope boundary: multi-stream folders (BCJ2) and delta filters raise
ValueError — real-world password exports (py7zr default: LZMA+AES
single chain; 7z CLI default: solid LZMA folders) fit the subset.
"""

from __future__ import annotations

import hashlib
import io
import lzma
import zlib

import numpy as np
import pyarrow as pa

from jimmy_ray.scalars import aes

SIGNATURE = b"7z\xbc\xaf\x27\x1c"
K_END, K_HEADER = 0x00, 0x01
K_MAIN_STREAMS, K_FILES_INFO = 0x04, 0x05
K_PACK_INFO, K_UNPACK_INFO, K_SUBSTREAMS = 0x06, 0x07, 0x08
K_SIZE, K_CRC, K_FOLDER, K_UNPACK_SIZES = 0x09, 0x0A, 0x0B, 0x0C
K_NUM_UNPACK_STREAM = 0x0D
K_NAME, K_ENCODED_HEADER = 0x11, 0x17

ID_COPY = b"\x00"
ID_LZMA1 = b"\x03\x01\x01"
ID_LZMA2 = b"\x21"
ID_BZIP2 = b"\x04\x02\x02"
ID_AES256 = b"\x06\xf1\x07\x01"

CYCLES_POWER = 16  # 2^16 SHA-256 rounds, 7-Zip's default KDF cost
_LZMA_DICT = 1 << 16
_LZMA_FILTER = {"id": lzma.FILTER_LZMA1, "dict_size": _LZMA_DICT,
                "lc": 3, "lp": 0, "pb": 2}
_LZMA_PROPS = bytes([(2 * 5 + 0) * 9 + 3]) + _LZMA_DICT.to_bytes(4, "little")


# --- number codec (7zFormat.txt REAL_UINT64) --------------------------------

def write_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = bytearray()
    mask = 0x80
    first = 0
    for i in range(8):
        out.append(n & 0xFF)
        n >>= 8
        first |= mask
        mask >>= 1
        if n < mask and i < 7:
            first |= n
            break
    else:
        return bytes([0xFF]) + bytes(out)
    return bytes([first]) + bytes(out)


def read_number(buf: io.BytesIO) -> int:
    first = buf.read(1)[0]
    mask = 0x80
    value = 0
    for i in range(8):
        if not first & mask:
            value |= (first & (mask - 1)) << (8 * i)
            return value
        value |= buf.read(1)[0] << (8 * i)
        mask >>= 1
    return value


# --- AES coder --------------------------------------------------------------

import functools


@functools.lru_cache(maxsize=4096)
def derive_key(password: str, salt: bytes,
               cycles_power: int = CYCLES_POWER) -> bytes:
    """7z KDF: SHA-256 over salt ‖ UTF-16-LE(password) ‖ LE64(counter),
    2^cycles_power rounds (7zAes.cpp semantics, public).  Cached per
    process: archives reuse keys across members/batches."""
    pw = password.encode("utf-16-le")
    h = hashlib.sha256()
    for counter in range(1 << cycles_power):
        h.update(salt)
        h.update(pw)
        h.update(counter.to_bytes(8, "little"))
    return h.digest()


def _aes_props(salt: bytes, iv: bytes,
               cycles_power: int = CYCLES_POWER) -> bytes:
    assert len(salt) == 16 and len(iv) == 16
    assert cycles_power < 0x3F
    return bytes([cycles_power | 0xC0, 0xFF]) + salt + iv


def _parse_aes_props(props: bytes) -> tuple[int, bytes, bytes]:
    b0 = props[0]
    power = b0 & 0x3F
    salt_size = iv_size = 0
    pos = 1
    if b0 & 0xC0:
        b1 = props[1]
        pos = 2
        salt_size = ((b0 >> 7) & 1) + (b1 >> 4)
        iv_size = ((b0 >> 6) & 1) + (b1 & 0x0F)
    salt = props[pos:pos + salt_size]
    iv = props[pos + salt_size:pos + salt_size + iv_size].ljust(16, b"\x00")
    return power, salt, iv


def aes_decode(data: bytes, props: bytes, password: str,
               unpack_size: int) -> bytes:
    power, salt, iv = _parse_aes_props(props)
    key = derive_key(password, salt, power)
    rk = aes.expand_key(key)
    blocks = np.frombuffer(data, dtype=np.uint8).reshape(-1, 16)
    prev = np.concatenate([
        np.frombuffer(iv, dtype=np.uint8).reshape(1, 16), blocks[:-1]])
    plain = (aes.decrypt_blocks(blocks, rk) ^ prev).tobytes()
    return plain[:unpack_size]


def aes_encode(data: bytes, salt: bytes, iv: bytes, password: str,
               cycles_power: int = CYCLES_POWER) -> bytes:
    key = derive_key(password, salt, cycles_power)
    rk = aes.expand_key(key)
    padded = data + b"\x00" * (-len(data) % 16)
    blocks = np.frombuffer(padded, dtype=np.uint8).reshape(-1, 16)
    out = np.empty_like(blocks)
    prev = np.frombuffer(iv, dtype=np.uint8)
    for j in range(blocks.shape[0]):  # CBC chain over one small stream
        prev = aes.encrypt_blocks((blocks[j] ^ prev).reshape(1, 16), rk)[0]
        out[j] = prev
    return out.tobytes()


# --- folder coding ----------------------------------------------------------

def _lzma_raw_decode(data: bytes, filt: dict, size: int) -> bytes:
    """Raw-stream decode; one call may yield < max_length (internal
    buffering, e.g. AES zero-padding after a solid stream) — drain."""
    dec = lzma.LZMADecompressor(format=lzma.FORMAT_RAW, filters=[filt])
    out = dec.decompress(data, max_length=size)
    while len(out) < size and not dec.eof:
        chunk = dec.decompress(b"", max_length=size - len(out))
        if not chunk:
            break
        out += chunk
    return out


def _decode_folder(coders: list[dict], bind_pairs: list[tuple[int, int]],
                   unpack_sizes: list[int], packed: bytes,
                   password: str | None) -> bytes:
    """Evaluate a linear chain of simple coders (1 in / 1 out each)."""
    out_to_coder = {i: c for i, c in enumerate(coders)}
    bound = {in_idx: out_idx for in_idx, out_idx in bind_pairs}
    consumed_outs = {out for _, out in bind_pairs}
    final_out = next(i for i in range(len(coders)) if i not in consumed_outs)

    def value(out_idx: int) -> bytes:
        coder = out_to_coder[out_idx]
        in_idx = out_idx  # simple coders: global in index == coder index
        data = value(bound[in_idx]) if in_idx in bound else packed
        size = unpack_sizes[out_idx]
        if coder["id"] == ID_COPY:
            return data[:size]
        if coder["id"] == ID_LZMA1:
            props = coder["props"]
            filt = {"id": lzma.FILTER_LZMA1,
                    "dict_size": int.from_bytes(props[1:5], "little"),
                    "lc": props[0] % 9, "lp": (props[0] // 9) % 5,
                    "pb": props[0] // 45}
            return _lzma_raw_decode(data, filt, size)
        if coder["id"] == ID_LZMA2:
            b = coder["props"][0]
            dict_size = (0xFFFFFFFF if b == 40
                         else (2 | (b & 1)) << (b // 2 + 11))
            return _lzma_raw_decode(
                data, {"id": lzma.FILTER_LZMA2, "dict_size": dict_size},
                size)
        if coder["id"] == ID_BZIP2:
            import bz2

            return bz2.decompress(data)[:size]
        if coder["id"] == ID_AES256:
            if password is None:
                raise ValueError("archive is encrypted; password required")
            return aes_decode(data, coder["props"], password, size)
        raise ValueError(f"unsupported 7z coder id {coder['id'].hex()}")

    return value(final_out)


_LZMA2_DICT_CODE = 8  # (2|0) << (8//2 + 11) = 65536 = _LZMA_DICT


def _encode_folder(data: bytes, password: str | None,
                   compress: bool | str, salt: bytes, iv: bytes,
                   cycles_power: int = CYCLES_POWER
                   ) -> tuple[bytes, bytes, list[int]]:
    """data -> (packed bytes, folder definition bytes, out sizes).
    ``compress``: False/"copy", True/"lzma", "lzma2", "bzip2"."""
    coders: list[tuple[bytes, bytes | None]] = []
    sizes: list[int] = []
    codec = {False: "copy", True: "lzma"}.get(compress, compress)
    if codec == "lzma":
        comp = lzma.LZMACompressor(
            format=lzma.FORMAT_RAW,
            filters=[dict(_LZMA_FILTER, mode=lzma.MODE_NORMAL,
                          nice_len=64, mf=lzma.MF_BT4, depth=0)])
        stream = comp.compress(data) + comp.flush()
        coders.append((ID_LZMA1, _LZMA_PROPS))
        sizes.append(len(data))
    elif codec == "lzma2":
        comp = lzma.LZMACompressor(
            format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2, "dict_size": _LZMA_DICT}])
        stream = comp.compress(data) + comp.flush()
        coders.append((ID_LZMA2, bytes([_LZMA2_DICT_CODE])))
        sizes.append(len(data))
    elif codec == "bzip2":
        import bz2

        stream = bz2.compress(data)
        coders.append((ID_BZIP2, None))
        sizes.append(len(data))
    else:
        stream = data
        coders.append((ID_COPY, None))
        sizes.append(len(data))
    if password is not None:
        sizes.append(len(stream))  # AES output feeds the first coder
        stream = aes_encode(stream, salt, iv, password, cycles_power)
        coders.append((ID_AES256, _aes_props(salt, iv, cycles_power)))

    folder = bytearray(write_number(len(coders)))
    for cid, props in coders:
        flags = len(cid) | (0x20 if props else 0)
        folder.append(flags)
        folder += cid
        if props:
            folder += write_number(len(props)) + props
    for out_idx in range(1, len(coders)):  # linear chain bind pairs
        folder += write_number(out_idx - 1) + write_number(out_idx)
    return stream, bytes(folder), sizes


def _parse_folder(buf: io.BytesIO) -> tuple[list[dict], list[tuple[int, int]]]:
    n_coders = read_number(buf)
    coders = []
    total_in = total_out = 0
    for _ in range(n_coders):
        flags = buf.read(1)[0]
        cid = buf.read(flags & 0x0F)
        n_in = n_out = 1
        if flags & 0x10:
            n_in = read_number(buf)
            n_out = read_number(buf)
        props = b""
        if flags & 0x20:
            props = buf.read(read_number(buf))
        if n_in != 1 or n_out != 1:
            raise ValueError("multi-stream 7z coders unsupported")
        total_in += n_in
        total_out += n_out
        coders.append({"id": cid, "props": props})
    bind_pairs = [(read_number(buf), read_number(buf))
                  for _ in range(total_out - 1)]
    n_packed = total_in - len(bind_pairs)
    if n_packed != 1:
        for _ in range(n_packed):
            read_number(buf)
        raise ValueError("multi-pack-stream 7z folders unsupported")
    return coders, bind_pairs


# --- archive writer ---------------------------------------------------------

def _streams_info(pack_pos: int, pack_sizes: list[int],
                  folder_defs: list[bytes],
                  folder_sizes: list[list[int]],
                  substream_sizes: list[list[int]] | None = None) -> bytes:
    out = bytearray([K_PACK_INFO])
    out += write_number(pack_pos) + write_number(len(pack_sizes))
    out.append(K_SIZE)
    for s in pack_sizes:
        out += write_number(s)
    out.append(K_END)
    out.append(K_UNPACK_INFO)
    out.append(K_FOLDER)
    out += write_number(len(folder_defs)) + b"\x00"  # external = 0
    for fd in folder_defs:
        out += fd
    out.append(K_UNPACK_SIZES)
    for sizes in folder_sizes:
        for s in sizes:
            out += write_number(s)
    out.append(K_END)
    if substream_sizes is not None:  # solid layout: files share folders
        out.append(K_SUBSTREAMS)
        out.append(K_NUM_UNPACK_STREAM)
        for sub in substream_sizes:
            out += write_number(len(sub))
        out.append(K_SIZE)  # all but the last size per multi-file folder
        for sub in substream_sizes:
            if len(sub) > 1:
                for s in sub[:-1]:
                    out += write_number(s)
        out.append(K_END)
    out.append(K_END)
    return bytes(out)


def _det_bytes(tag: bytes, n: int) -> bytes:
    """Deterministic per-archive salt/iv material (fixtures must be
    byte-stable across runs; a real writer would draw from os.urandom)."""
    return hashlib.sha256(tag).digest()[:n]


def build_7z(members: list[tuple[str, bytes]], password: str | None = None,
             compress: bool | str = True, encrypt_header: bool = False,
             cycles_power: int = CYCLES_POWER, solid: bool = False) -> bytes:
    """Write an archive: one folder per member — or, with ``solid=True``,
    ALL members concatenated into one folder with kSubStreamsInfo sizes
    (the ``7z a`` default layout) — each folder a Copy|LZMA1 → AES chain
    when a password is given, optionally wrapping the header itself in an
    AES-coded kEncodedHeader stream (-mhe=on layout)."""
    pack = bytearray()
    pack_sizes: list[int] = []
    folder_defs: list[bytes] = []
    folder_sizes: list[list[int]] = []
    substream_sizes: list[list[int]] | None = None
    if solid:
        salt = _det_bytes(b"salt/solid", 16)
        iv = _det_bytes(b"iv/solid", 16)
        blob = b"".join(data for _, data in members)
        stream, fdef, sizes = _encode_folder(blob, password, compress,
                                             salt, iv, cycles_power)
        pack += stream
        pack_sizes.append(len(stream))
        folder_defs.append(fdef)
        folder_sizes.append(sizes)
        substream_sizes = [[len(data) for _, data in members]]
    else:
        for idx, (name, data) in enumerate(members):
            salt = _det_bytes(f"salt/{idx}/{name}".encode(), 16)
            iv = _det_bytes(f"iv/{idx}/{name}".encode(), 16)
            stream, fdef, sizes = _encode_folder(data, password, compress,
                                                 salt, iv, cycles_power)
            pack += stream
            pack_sizes.append(len(stream))
            folder_defs.append(fdef)
            folder_sizes.append(sizes)

    header = bytearray([K_HEADER, K_MAIN_STREAMS])
    header += _streams_info(0, pack_sizes, folder_defs, folder_sizes,
                            substream_sizes)
    header.append(K_FILES_INFO)
    header += write_number(len(members))
    names = b"".join(n.encode("utf-16-le") + b"\x00\x00" for n, _ in members)
    header.append(K_NAME)
    header += write_number(len(names) + 1) + b"\x00" + names
    header.append(K_END)
    header.append(K_END)
    next_header = bytes(header)

    if encrypt_header:
        if password is None:
            raise ValueError("encrypt_header requires a password")
        salt = _det_bytes(b"salt/header", 16)
        iv = _det_bytes(b"iv/header", 16)
        stream, fdef, sizes = _encode_folder(next_header, password,
                                             compress, salt, iv,
                                             cycles_power)
        hdr_pos = len(pack)
        pack += stream
        next_header = bytes([K_ENCODED_HEADER]) + _streams_info(
            hdr_pos, [len(stream)], [fdef], [sizes])

    start = (len(pack).to_bytes(8, "little")
             + len(next_header).to_bytes(8, "little")
             + zlib.crc32(next_header).to_bytes(4, "little"))
    return (SIGNATURE + b"\x00\x04"
            + zlib.crc32(start).to_bytes(4, "little") + start
            + bytes(pack) + next_header)


# --- archive reader ---------------------------------------------------------

def _parse_streams_info(buf: io.BytesIO) -> dict:
    info: dict = {"pack_pos": 0, "pack_sizes": [], "folders": []}
    while True:
        kind = buf.read(1)[0]
        if kind == K_END:
            return info
        if kind == K_PACK_INFO:
            info["pack_pos"] = read_number(buf)
            n = read_number(buf)
            while True:
                sub = buf.read(1)[0]
                if sub == K_END:
                    break
                if sub == K_SIZE:
                    info["pack_sizes"] = [read_number(buf) for _ in range(n)]
                elif sub == K_CRC:
                    _skip_digests(buf, n)
                else:
                    raise ValueError(f"unexpected PackInfo property {sub}")
        elif kind == K_UNPACK_INFO:
            if buf.read(1)[0] != K_FOLDER:
                raise ValueError("expected kFolder")
            n_folders = read_number(buf)
            if buf.read(1)[0] != 0:
                raise ValueError("external folder definitions unsupported")
            parsed = [_parse_folder(buf) for _ in range(n_folders)]
            if buf.read(1)[0] != K_UNPACK_SIZES:
                raise ValueError("expected kCodersUnpackSize")
            folders = []
            for coders, bind_pairs in parsed:
                sizes = [read_number(buf) for _ in range(len(coders))]
                folders.append({"coders": coders, "bind_pairs": bind_pairs,
                                "sizes": sizes})
            info["folders"] = folders
            info["folder_crc_defined"] = [False] * n_folders
            while True:
                sub = buf.read(1)[0]
                if sub == K_END:
                    break
                if sub == K_CRC:
                    info["folder_crc_defined"] = _read_digests(
                        buf, n_folders)
                else:
                    raise ValueError(f"unexpected UnpackInfo property {sub}")
        elif kind == K_SUBSTREAMS:
            n_folders = len(info["folders"])
            counts = [1] * n_folders
            sizes: list[list[int]] | None = None
            while True:
                sub = buf.read(1)[0]
                if sub == K_END:
                    break
                if sub == K_NUM_UNPACK_STREAM:
                    counts = [read_number(buf) for _ in range(n_folders)]
                elif sub == K_SIZE:
                    # per multi-file folder: all sizes but the last
                    # (the last = folder unpack size − the others)
                    sizes = []
                    for fi, c in enumerate(counts):
                        total = _folder_unpack_size(info["folders"][fi])
                        head = [read_number(buf) for _ in range(c - 1)]
                        sizes.append(head + [total - sum(head)])
                elif sub == K_CRC:
                    # digests stored only for streams whose CRC is not
                    # already known: single-stream folders with a
                    # defined folder CRC are excluded (7zFormat.txt)
                    defined = info.get("folder_crc_defined",
                                       [False] * n_folders)
                    unknown = sum(
                        c for fi, c in enumerate(counts)
                        if not (c == 1 and defined[fi]))
                    _skip_digests(buf, unknown)
                else:
                    raise ValueError(
                        f"unexpected SubStreamsInfo property {sub}")
            if sizes is None:
                sizes = [[_folder_unpack_size(info["folders"][fi])]
                         for fi in range(n_folders)]
            info["substreams"] = {"counts": counts, "sizes": sizes}
        else:
            raise ValueError(f"unexpected StreamsInfo property {kind}")


def _folder_unpack_size(folder: dict) -> int:
    """Size of the folder's final output = the one out-stream no bind
    pair consumes (same rule as _decode_folder's final_out)."""
    consumed = {out for _, out in folder["bind_pairs"]}
    final_out = next(i for i in range(len(folder["coders"]))
                     if i not in consumed)
    return folder["sizes"][final_out]


def _read_digests(buf: io.BytesIO, n: int) -> list[bool]:
    """Consume a digests block; return the per-stream defined flags."""
    all_defined = buf.read(1)[0]
    if all_defined:
        flags = [True] * n
    else:
        bits = buf.read((n + 7) // 8)
        flags = [bool(bits[i // 8] & (0x80 >> (i % 8))) for i in range(n)]
    buf.read(4 * sum(flags))
    return flags


def _skip_digests(buf: io.BytesIO, n: int) -> None:
    _read_digests(buf, n)


def _decode_streams(payload: bytes, base: int, info: dict,
                    password: str | None) -> list[bytes]:
    out = []
    pos = base + info["pack_pos"]
    for folder, size in zip(info["folders"], info["pack_sizes"]):
        packed = payload[pos:pos + size]
        pos += size
        out.append(_decode_folder(folder["coders"], folder["bind_pairs"],
                                  folder["sizes"], packed, password))
    return out


def parse_7z(payload: bytes,
             password: str | None = None) -> list[tuple[str, bytes]]:
    """(name, bytes) per member; raises on bad CRCs / wrong password
    (wrong keys surface as garbage coder streams or name decode errors)."""
    if payload[:6] != SIGNATURE:
        raise ValueError("not a 7z archive")
    start = payload[12:32]
    if zlib.crc32(start) != int.from_bytes(payload[8:12], "little"):
        raise ValueError("start header CRC mismatch")
    offset = int.from_bytes(start[:8], "little")
    size = int.from_bytes(start[8:16], "little")
    header = payload[32 + offset:32 + offset + size]
    if zlib.crc32(header) != int.from_bytes(start[16:20], "little"):
        raise ValueError("next header CRC mismatch")

    buf = io.BytesIO(header)
    kind = buf.read(1)[0]
    if kind == K_ENCODED_HEADER:
        info = _parse_streams_info(buf)
        header = _decode_streams(payload, 32, info, password)[0]
        buf = io.BytesIO(header)
        kind = buf.read(1)[0]
    if kind != K_HEADER:
        raise ValueError(f"unexpected header id {kind}")

    streams: list[bytes] = []
    names: list[str] = []
    while True:
        kind = buf.read(1)[0]
        if kind == K_END:
            break
        if kind == K_MAIN_STREAMS:
            info = _parse_streams_info(buf)
            folder_blobs = _decode_streams(payload, 32, info, password)
            sub = info.get("substreams")
            if sub is None:
                streams = folder_blobs
            else:  # solid folders: slice each blob into its members
                streams = []
                for blob, sizes in zip(folder_blobs, sub["sizes"]):
                    pos = 0
                    for s in sizes:
                        streams.append(blob[pos:pos + s])
                        pos += s
        elif kind == K_FILES_INFO:
            n_files = read_number(buf)
            while True:
                prop = buf.read(1)[0]
                if prop == K_END:
                    break
                size = read_number(buf)
                data = buf.read(size)
                if prop == K_NAME:
                    if data[0] != 0:
                        raise ValueError("external names unsupported")
                    raw = data[1:].decode("utf-16-le")
                    names = raw.split("\x00")[:n_files]
        else:
            raise ValueError(f"unexpected header property {kind}")
    if len(names) != len(streams):
        raise ValueError("file count / stream count mismatch")
    return list(zip(names, streams))


# --- pipeline surface -------------------------------------------------------

PASSWORD = "fixture-password"


def synth_7z(doc_id: int, text: str) -> bytes:
    """Per-document encrypted archive exercising every layout: doc_id%4
    cycles the Copy / LZMA1 / LZMA2 / BZip2 chains, doc_id%3==0 adds
    the encrypted-header (-mhe=on) wrapping, doc_id%5==0 packs both
    members into one solid folder (kSubStreamsInfo, the 7z CLI
    default).  cycles_power 10 keeps the fixture KDF cheap; the format
    field carries it, so the reader handles any cost."""
    members = [
        (f"Doc {doc_id}.md", f"# Doc {doc_id}\n\n{text}".encode()),
        ("meta/source.txt", f"export {doc_id}".encode()),
    ]
    return build_7z(members, password=PASSWORD,
                    compress=("copy", "lzma", "lzma2",
                              "bzip2")[doc_id % 4],
                    encrypt_header=doc_id % 3 == 0,
                    cycles_power=10,
                    solid=doc_id % 5 == 0)


def sevenzip_extract(sf_dir: str):
    """documents → per-doc AES-256 7z → parse with password → one row
    per member (the reference's encrypted-fixture prep as a pipeline)."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, names, texts = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for name, data in parse_7z(synth_7z(doc_id, text), PASSWORD):
                ids.append(doc_id)
                names.append(name)
                texts.append(data.decode("utf-8"))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "member": pa.array(names, pa.string()),
            "text": pa.array(texts, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=64)


def sql_sevenzip_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id, member, text FROM (
  SELECT doc_id, 'Doc ' || {i} || '.md' AS member,
         '# Doc ' || {i} || chr(10) || chr(10) || text AS text
  FROM documents
  UNION ALL
  SELECT doc_id, 'meta/source.txt', 'export ' || {i} FROM documents
)
"""
