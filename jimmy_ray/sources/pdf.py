"""Minimal PDF text extraction (S4 real-subset; public PDF spec).

The reference uses the external ``pdf_oxide`` engine
(/root/reference/src/jimmy/converter.py:295-306) — absent here, like
every binary codec.  But *uncompressed* PDF is plain text per the public
spec, so this module implements the honest subset: walk ``stream``
objects, scan ``BT … ET`` text blocks, and decode ``(string) Tj`` /
``[(a) (b)] TJ`` show-text operators with PDF string-escape handling;
``Td``/``TD``/``T*`` line moves emit newlines.

Stream filters (PDF 32000-1 §7.4, public spec):
- ``/FlateDecode`` — stdlib zlib (RFC 1950),
- ``/LZWDecode`` — pure-python variable-width LZW (9→12 bits, clear 256,
  EOD 257, EarlyChange 1), round-trip tested against the fixture encoder,
- ``/ASCIIHexDecode`` / ``/ASCII85Decode`` / ``/RunLengthDecode`` —
  §7.4.2/3/5, including ``/Filter [..]`` arrays applied in order,
- PNG predictors 10-15 (``/DecodeParms /Predictor``) for any filter,
- anything else (DCT, JBIG2) still raises — the remaining stub boundary
  where a real codec engine slots in.

Encrypted PDFs (§7.6, the standard security handler): ``/Encrypt``
dictionaries with ``/V 1``/``/V 2`` (RC4 40-128 bit) and ``/V 4``
``/CFM /AESV2`` (AES-128-CBC over the vectorized AES core in
jimmy_ray.scalars.aes) decrypt with the documented Algorithms 2-7 —
padded-password MD5 key derivation, 50+19 round rev-3 hardening,
per-object keys (obj/gen salt, ``sAlT`` suffix for AES).  The /U entry
authenticates the password before any stream is touched.  Both
directions exist (the fixture writer emits real encrypted PDFs), so the
encrypted paths are oracle-checked end-to-end.

Cross-reference streams (PDF 1.5, §7.5.8): ``parse_xref_stream`` walks
``startxref`` → the /Type /XRef stream (decoding /W-packed columns
through the filter + predictor pipeline, following /Prev chains), and
``extract_pdf_text`` uses the recovered object offsets to visit content
streams in object order, falling back to a whole-file scan for classic
xref-table PDFs.  Compressed-object streams (/ObjStm, type-2 entries)
are ignored for text: the spec forbids stream objects inside them.

The fixture synthesizes a minimal single-page PDF per document — four
variants (raw, Flate, LZW, xref-stream) yielding identical text — so
``pdf_extract`` is a fully oracle-checked PDF→text pipeline across all
filter paths.
"""

from __future__ import annotations

import math as _math
import re
import struct
import zlib

import pyarrow as pa

# dict matchers tolerate one nesting level (e.g. /DecodeParms << ... >>)
_DICT_BODY = rb"((?:[^<>]|<<[^<>]*>>)*)"
_TEXT_BLOCK_RE = re.compile(rb"BT(.*?)ET", re.S)
_OP_RE = re.compile(
    rb"\((?P<str>(?:\\.|[^\\()])*)\)\s*Tj"      # (..) Tj
    rb"|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ"       # [..] TJ
    rb"|(?P<nl>T\*|-?[\d.]+\s+-?[\d.]+\s+T[dD])",      # T*, x y Td/TD
    re.S,
)
_ARR_STR_RE = re.compile(rb"\((?:\\.|[^\\()])*\)", re.S)
_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        ch = raw[i : i + 1]
        if ch == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt.isdigit():  # octal escape \ddd
                j = i + 1
                while j < len(raw) and j < i + 4 and raw[j : j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            out += _ESCAPES.get(nxt, nxt)
            i += 2
            continue
        out += ch
        i += 1
    return out.decode("utf-8", errors="replace")


# --- LZWDecode (PDF 32000-1 §7.4.4; TIFF-style early change = 1) -----------

def lzw_decode(data: bytes) -> bytes:
    """Variable-width LZW: codes start at 9 bits, clear=256, EOD=257;
    width bumps at table sizes 511/1023/2047 (EarlyChange 1, the PDF
    default)."""
    table: list[bytes] = []
    out = bytearray()
    prev = b""
    width = 9
    buf = 0
    nbits = 0

    def reset() -> None:
        nonlocal table, prev, width
        table = [bytes([c]) for c in range(256)] + [b"", b""]
        prev = b""
        width = 9

    reset()
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (buf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                reset()
                continue
            if code == 257:
                return bytes(out)
            if not prev:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:  # KwKwK case: code == len(table)
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            n = len(table)
            if n == 511:
                width = 10
            elif n == 1023:
                width = 11
            elif n == 2047:
                width = 12
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    """Matching encoder (used by the fixture synthesizer): emits clear,
    bumps width at table sizes 512/1024/2048 (one entry ahead of the
    decoder — the early-change handshake), clears before overflow."""
    out = bytearray()
    buf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([c]): c for c in range(256)}
    next_code = 258
    width = 9
    emit(256, width)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code in (512, 1024, 2048):
            width += 1
        elif next_code == 4096:
            emit(256, width)
            table = {bytes([c]): c for c in range(256)}
            next_code = 258
            width = 9
        w = bytes([byte])
    if w:
        emit(table[w], width)
    emit(257, width)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


# --- ASCIIHex / ASCII85 / RunLength (§7.4.2, §7.4.3, §7.4.5) ---------------

def asciihex_decode(data: bytes) -> bytes:
    body = data.split(b">")[0]
    body = bytes(body.translate(None, b" \t\r\n\f\v"))
    if len(body) % 2:  # odd count: spec appends a trailing 0
        body += b"0"
    return bytes.fromhex(body.decode("ascii"))


def ascii85_decode(data: bytes) -> bytes:
    import base64

    body = data.split(b"~>")[0]
    return base64.a85decode(body, adobe=False,
                            ignorechars=b" \t\r\n\f\v")


def runlength_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        if n == 128:  # EOD
            break
        if n < 128:
            out += data[i + 1:i + 2 + n]
            i += 2 + n
        else:
            out += data[i + 1:i + 2] * (257 - n)
            i += 2
    return bytes(out)


def runlength_encode(data: bytes) -> bytes:
    """Fixture-side encoder: repeat runs ≥3 as (257-len, byte), literals
    chunked at 128."""
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while (i + run < len(data) and run < 128
               and data[i + run] == data[i]):
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i
        while j < len(data) and j - i < 128:
            if (j + 2 < len(data) and data[j] == data[j + 1] == data[j + 2]):
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    out.append(128)
    return bytes(out)


# --- PNG predictors (/DecodeParms /Predictor >= 10; RFC 2083 filters) ------

def png_predictor_decode(data: bytes, columns: int, colors: int = 1) -> bytes:
    row_len = columns * colors
    out = bytearray()
    prev = bytearray(row_len)
    i = 0
    while i < len(data):
        ft = data[i]
        row = bytearray(data[i + 1:i + 1 + row_len])
        i += 1 + row_len
        if ft == 1:  # Sub
            for j in range(colors, row_len):
                row[j] = (row[j] + row[j - colors]) & 0xFF
        elif ft == 2:  # Up
            for j in range(row_len):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(row_len):
                left = row[j - colors] if j >= colors else 0
                row[j] = (row[j] + (left + prev[j]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(row_len):
                a = row[j - colors] if j >= colors else 0
                b = prev[j]
                c = prev[j - colors] if j >= colors else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        out += row
        prev = row
    return bytes(out)


_INT_KEY_RE_T = rb"/%s\s+(\d+)"


def _dict_int(d: bytes, key: bytes, default: int | None = None) -> int | None:
    m = re.search(_INT_KEY_RE_T % key, d)
    return int(m.group(1)) if m else default


_FILTER_NAME_RE = re.compile(
    rb"/(FlateDecode|LZWDecode|ASCIIHexDecode|ASCII85Decode"
    rb"|RunLengthDecode|DCTDecode|JBIG2Decode|JPXDecode|CCITTFaxDecode)")

def decode_stream(stream_dict: bytes, body: bytes) -> bytes:
    """Apply the /Filter chain (single name or array, in order) plus the
    /DecodeParms predictor to a stream body."""
    import zlib

    if b"/Filter" not in stream_dict:
        return body
    names = _FILTER_NAME_RE.findall(stream_dict)
    for name in names:
        if name == b"FlateDecode":
            body = zlib.decompress(body)
        elif name == b"LZWDecode":
            body = lzw_decode(body)
        elif name == b"ASCIIHexDecode":
            body = asciihex_decode(body)
        elif name == b"ASCII85Decode":
            body = ascii85_decode(body)
        elif name == b"RunLengthDecode":
            body = runlength_decode(body)
        else:
            raise NotImplementedError(
                f"unsupported PDF stream filter {name.decode()} (image "
                "codecs need a codec library; converter.py:295-306 covers "
                "them via pdf_oxide)"
            )
    pred = _dict_int(stream_dict, b"Predictor", 1)
    if pred >= 10:
        columns = _dict_int(stream_dict, b"Columns", 1)
        colors = _dict_int(stream_dict, b"Colors", 1)
        body = png_predictor_decode(body, columns, colors)
    elif pred != 1:
        raise NotImplementedError(f"TIFF predictor {pred} not supported")
    return body


# --- encryption: standard security handler (§7.6.2-3, Algorithms 1-7) -------

_PW_PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A")


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (public domain stream cipher; PDF §7.6.2)."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray()
    i = j = 0
    for c in data:
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out.append(c ^ S[(S[i] + S[j]) & 0xFF])
    return bytes(out)


def _pad_password(pw: str) -> bytes:
    raw = pw.encode("latin-1", errors="replace")[:32]
    return raw + _PW_PAD[:32 - len(raw)]


def _aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """AESV2 stream layout: 16-byte IV ‖ ciphertext, PKCS#7 padded."""
    import numpy as np

    from jimmy_ray.scalars import aes

    iv, ct = data[:16], data[16:]
    rk = aes.expand_key(key)
    blocks = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 16)
    prev = np.concatenate([
        np.frombuffer(iv, dtype=np.uint8).reshape(1, 16), blocks[:-1]])
    plain = (aes.decrypt_blocks(blocks, rk) ^ prev).tobytes()
    return plain[:-plain[-1]] if plain else plain


def _aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    import numpy as np

    from jimmy_ray.scalars import aes

    pad = 16 - len(data) % 16
    padded = data + bytes([pad]) * pad
    rk = aes.expand_key(key)
    blocks = np.frombuffer(padded, dtype=np.uint8).reshape(-1, 16)
    out = np.empty_like(blocks)
    prev = np.frombuffer(iv, dtype=np.uint8)
    for j in range(blocks.shape[0]):
        prev = aes.encrypt_blocks((blocks[j] ^ prev).reshape(1, 16), rk)[0]
        out[j] = prev
    return iv + out.tobytes()


def _std_file_key(user_pw: str, o_entry: bytes, p: int, file_id: bytes,
                  rev: int, keylen: int) -> bytes:
    """Algorithm 2: the file encryption key from the user password."""
    import hashlib

    h = hashlib.md5(_pad_password(user_pw) + o_entry
                    + (p & 0xFFFFFFFF).to_bytes(4, "little") + file_id)
    d = h.digest()
    if rev >= 3:
        for _ in range(50):
            d = hashlib.md5(d[:keylen]).digest()
    return d[:keylen]


def _std_o_entry(owner_pw: str, user_pw: str, rev: int,
                 keylen: int) -> bytes:
    """Algorithm 3: the /O entry."""
    import hashlib

    d = hashlib.md5(_pad_password(owner_pw)).digest()
    if rev >= 3:
        for _ in range(50):
            d = hashlib.md5(d).digest()
    key = d[:keylen]
    o = rc4(key, _pad_password(user_pw))
    if rev >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def _std_u_entry(file_key: bytes, file_id: bytes, rev: int) -> bytes:
    """Algorithm 4 (rev 2) / Algorithm 5 (rev ≥3): the /U entry."""
    import hashlib

    if rev == 2:
        return rc4(file_key, _PW_PAD)
    u = rc4(file_key, hashlib.md5(_PW_PAD + file_id).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in file_key), u)
    return u + b"\x00" * 16


_HEX_STR_RE_T = rb"/%s\s*<([0-9A-Fa-f\s]*)>"
_LIT_STR_RE_T = rb"/%s\s*\(((?:\\.|[^\\()])*)\)"


def _dict_string(d: bytes, key: bytes) -> bytes | None:
    """A PDF string value (hex or literal-with-escapes) as raw bytes."""
    m = re.search(_HEX_STR_RE_T % key, d)
    if m:
        body = bytes(m.group(1).translate(None, b" \t\r\n"))
        if len(body) % 2:
            body += b"0"
        return bytes.fromhex(body.decode("ascii"))
    m = re.search(_LIT_STR_RE_T % key, d, re.S)
    if m:
        out = bytearray()
        raw = m.group(1)
        i = 0
        while i < len(raw):
            if raw[i:i + 1] == b"\\" and i + 1 < len(raw):
                nxt = raw[i + 1:i + 2]
                if nxt.isdigit():
                    j = i + 1
                    while j < len(raw) and j < i + 4 and raw[j:j + 1].isdigit():
                        j += 1
                    out.append(int(raw[i + 1:j], 8) & 0xFF)
                    i = j
                    continue
                out += _ESCAPES.get(nxt, nxt)
                i += 2
                continue
            out.append(raw[i])
            i += 1
        return bytes(out)
    return None


class StdSecurityHandler:
    """Decrypts strings/streams of a standard-security-handler PDF.

    Supports /V 1-2 (RC4, 40-128 bit keys) and /V 4 with /CFM /AESV2
    (AES-128-CBC).  Raises ValueError when the password fails the /U
    check (Algorithm 6) or the handler revision is out of subset.
    """

    def __init__(self, enc_dict: bytes, file_id: bytes, password: str = ""):
        if b"/Standard" not in enc_dict:
            raise NotImplementedError("only the standard security handler "
                                      "is supported")
        self.v = _dict_int(enc_dict, b"V", 0)
        self.rev = _dict_int(enc_dict, b"R", 2)
        if self.v not in (1, 2, 4) or self.rev not in (2, 3, 4):
            raise NotImplementedError(f"encryption V={self.v} R={self.rev} "
                                      "out of subset (V5/R6 is AES-256)")
        bits = _dict_int(enc_dict, b"Length", 40)
        if bits >= 40:  # /Length in bits at the top level, bytes in /CF
            self.keylen = bits // 8
        else:
            self.keylen = bits
        self.aes = b"/AESV2" in enc_dict
        o = _dict_string(enc_dict, b"O")
        u = _dict_string(enc_dict, b"U")
        p_m = re.search(rb"/P\s+(-?\d+)", enc_dict)
        if o is None or u is None or p_m is None:
            raise ValueError("encrypt dict missing /O, /U or /P")
        p = int(p_m.group(1))
        self.key = _std_file_key(password, o, p, file_id,
                                 self.rev, self.keylen)
        want = _std_u_entry(self.key, file_id, self.rev)
        got = u
        n = 16 if self.rev >= 3 else 32
        if want[:n] != got[:n]:
            raise ValueError("PDF password authentication failed (/U check)")

    def object_key(self, num: int, gen: int) -> bytes:
        import hashlib

        salt = b"sAlT" if self.aes else b""
        d = hashlib.md5(self.key + num.to_bytes(3, "little")
                        + gen.to_bytes(2, "little") + salt).digest()
        return d[:min(self.keylen + 5, 16)]

    def decrypt(self, num: int, gen: int, data: bytes) -> bytes:
        k = self.object_key(num, gen)
        if self.aes:
            return _aes_cbc_decrypt(k, data)
        return rc4(k, data)

    def encrypt(self, num: int, gen: int, data: bytes,
                iv: bytes = b"") -> bytes:
        k = self.object_key(num, gen)
        if self.aes:
            return _aes_cbc_encrypt(k, iv or bytes(16), data)
        return rc4(k, data)


# --- cross-reference streams (PDF 1.5; §7.5.8) ------------------------------

_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)\s*%%EOF", re.S)
_OBJ_AT_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\s*<<" + _DICT_BODY
                        + rb">>\s*(?:stream\r?\n)?", re.S)


def _stream_at(payload: bytes, offset: int,
               crypt: StdSecurityHandler | None = None
               ) -> tuple[bytes, bytes] | None:
    """(dict, decoded body) for the indirect stream object at offset,
    sliced by /Length (exact — compressed bytes may contain 'endstream').
    ``crypt`` decrypts the body first (never the xref stream — §7.5.8.2
    forbids encrypting it)."""
    m = _OBJ_AT_RE.match(payload, offset)
    if not m:
        return None
    d = m.group(3)
    length = _dict_int(d, b"Length")
    if length is None:
        return None
    start = m.end()
    body = payload[start:start + length]
    if crypt is not None and b"/XRef" not in d:
        body = crypt.decrypt(int(m.group(1)), int(m.group(2)), body)
    return d, decode_stream(d, body)


def parse_xref_stream(payload: bytes) -> dict[int, tuple[int, int, int]] | None:
    """obj_num → (type, field2, field3) from the xref stream chain, or
    None when the PDF uses a classic xref table.  type 1 → field2 is the
    byte offset; type 2 → object lives in an /ObjStm (no stream objects
    there per spec, so irrelevant for text); type 0 → free."""
    m = None
    for m in _STARTXREF_RE.finditer(payload):
        pass  # last startxref wins (incremental updates)
    if m is None:
        return None
    entries: dict[int, tuple[int, int, int]] = {}
    offset = int(m.group(1))
    seen: set[int] = set()
    while offset not in seen:
        seen.add(offset)
        got = _stream_at(payload, offset)
        if got is None:
            return None if not entries else entries
        d, body = got
        if b"/XRef" not in d:
            return None if not entries else entries
        wm = re.search(rb"/W\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s*\]", d)
        if not wm:
            return entries
        w1, w2, w3 = (int(wm.group(i)) for i in (1, 2, 3))
        size = _dict_int(d, b"Size", 0)
        im = re.search(rb"/Index\s*\[([\d\s]+)\]", d)
        nums = [int(x) for x in im.group(1).split()] if im else [0, size]
        row = w1 + w2 + w3
        pos = 0
        for start, count in zip(nums[::2], nums[1::2]):
            for obj in range(start, start + count):
                if pos + row > len(body):
                    break
                f1 = int.from_bytes(body[pos:pos + w1], "big") if w1 else 1
                f2 = int.from_bytes(body[pos + w1:pos + w1 + w2], "big")
                f3 = int.from_bytes(body[pos + w1 + w2:pos + row], "big")
                pos += row
                entries.setdefault(obj, (f1, f2, f3))
        prev = _dict_int(d, b"Prev")
        if prev is None:
            break
        offset = prev
    return entries


def pdf_escape(text: str) -> str:
    return (
        text.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    )


def _scan_text_blocks(body: bytes, lines: list[str]) -> None:
    for block in _TEXT_BLOCK_RE.finditer(body):
        current = ""
        for op in _OP_RE.finditer(block.group(1)):
            if op.group("str") is not None:
                current += _unescape(op.group("str"))
            elif op.group("arr") is not None:
                for s in _ARR_STR_RE.findall(op.group("arr")):
                    current += _unescape(s[1:-1])
            elif op.group("nl") and op.group("nl").endswith((b"Td", b"TD", b"T*")):
                if current:
                    lines.append(current)
                    current = ""
        if current:
            lines.append(current)


_ENCRYPT_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R")
_ID_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f]*)>")
_OBJ_STREAM_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\s*<<" + _DICT_BODY
                            + rb">>\s*stream\r?\n", re.S)


def _scan_dict(payload: bytes, pos: int) -> bytes | None:
    """Balanced ``<< … >>`` scan from payload[pos:], skipping hex and
    literal strings (the regex dict matcher can't nest past one level;
    encrypt dicts carry both hex strings and a /CF sub-sub-dict)."""
    while pos < len(payload) and payload[pos:pos + 1].isspace():
        pos += 1
    if payload[pos:pos + 2] != b"<<":
        return None
    depth = 0
    i = pos
    while i < len(payload):
        two = payload[i:i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return payload[pos + 2:i - 2]
        elif payload[i:i + 1] == b"<":  # hex string
            j = payload.find(b">", i + 1)
            i = j + 1 if j >= 0 else len(payload)
        elif payload[i:i + 1] == b"(":  # literal string
            i += 1
            while i < len(payload) and payload[i:i + 1] != b")":
                i += 2 if payload[i:i + 1] == b"\\" else 1
            i += 1
        else:
            i += 1
    return None


def _security_handler(payload: bytes,
                      password: str) -> StdSecurityHandler | None:
    """Build the handler from the trailer's /Encrypt reference, or None
    for unencrypted files."""
    em = None
    for em in _ENCRYPT_REF_RE.finditer(payload):
        pass  # last trailer wins (incremental updates)
    if em is None:
        return None
    num, gen = int(em.group(1)), int(em.group(2))
    om = re.search(rb"(?<![0-9])%d\s+%d\s+obj" % (num, gen), payload)
    enc_dict = _scan_dict(payload, om.end()) if om else None
    if enc_dict is None:
        raise ValueError("/Encrypt object not found")
    idm = _ID_RE.search(payload)
    file_id = bytes.fromhex(idm.group(1).decode()) if idm else b""
    return StdSecurityHandler(enc_dict, file_id, password)


def extract_pdf_text(payload: bytes, password: str = "") -> str:
    """Stream text extraction: when the PDF carries an xref stream
    (PDF 1.5), visit type-1 objects at their recovered offsets in object
    order (exact /Length slicing); otherwise scan the whole file for
    stream objects.  Encrypted files authenticate ``password`` against
    /U and decrypt per-object; Flate/LZW/ASCIIHex/ASCII85/RunLength
    (+ PNG predictors) decode; image codecs raise at the documented
    boundary."""
    lines: list[str] = []
    crypt = _security_handler(payload, password)
    xref = parse_xref_stream(payload)
    if xref:
        for obj in sorted(xref):
            typ, f2, _ = xref[obj]
            if typ != 1:
                continue
            got = _stream_at(payload, f2, crypt)
            if got is None:
                continue
            d, body = got
            if b"/XRef" in d:
                continue
            if b"/Subtype" in d and b"/Image" in d:
                continue  # image XObjects: no text; extract_pdf_images
            _scan_text_blocks(body, lines)
    else:
        for m in _OBJ_STREAM_RE.finditer(payload):
            d = m.group(3)
            if b"/Subtype" in d and b"/Image" in d:
                continue  # image XObjects: no text; extract_pdf_images
            length = _dict_int(d, b"Length")
            body = None
            if length is not None:
                tail = payload[m.end() + length:m.end() + length + 16]
                if tail.lstrip().startswith(b"endstream"):
                    body = payload[m.end():m.end() + length]
            if body is None:  # broken /Length: scan (real writers do this)
                end = payload.find(b"endstream", m.end())
                body = payload[m.end():end].rstrip(b"\r\n")
            if crypt is not None:
                body = crypt.decrypt(int(m.group(1)), int(m.group(2)), body)
            _scan_text_blocks(decode_stream(d, body), lines)
    return "\n".join(lines)


def extract_pdf_images(payload: bytes, password: str = "") -> list[dict]:
    """Image XObjects → decoded feature rows.

    Scans stream objects whose dict carries ``/Subtype /Image``.
    ``DCTDecode`` bodies decode through the from-scratch baseline JPEG
    codec (jimmy_ray.codecs.jpeg) and ``JBIG2Decode`` bodies through the
    from-scratch generic-region JBIG2 codec (jimmy_ray.codecs.jbig2) —
    the reference gets both via pdf_oxide, converter.py:295-306;
    Flate/LZW/… chains ahead of the image codec are applied first.
    JPX/CCITT, MMR- or symbol-coded JBIG2 and non-baseline JPEG modes
    stay a documented boundary: the row is returned with
    ``decoded=False`` instead of raising, so one exotic image never
    poisons a document (SURVEY §2.9 row-level fault isolation)."""
    from jimmy_ray.codecs import jpeg

    crypt = _security_handler(payload, password)
    rows: list[dict] = []
    for m in _OBJ_STREAM_RE.finditer(payload):
        d = m.group(3)
        if b"/Subtype" not in d or b"/Image" not in d:
            continue
        length = _dict_int(d, b"Length")
        body = None
        if length is not None:
            tail = payload[m.end() + length:m.end() + length + 16]
            if tail.lstrip().startswith(b"endstream"):
                body = payload[m.end():m.end() + length]
        if body is None:
            end = payload.find(b"endstream", m.end())
            body = payload[m.end():end].rstrip(b"\r\n")
        if crypt is not None:
            body = crypt.decrypt(int(m.group(1)), int(m.group(2)), body)
        row = {
            "obj": int(m.group(1)),
            "width": _dict_int(d, b"Width", 0),
            "height": _dict_int(d, b"Height", 0),
            "n_bytes": len(body),
            "channels": 0,
            "mean_luma_milli": 0,
            "black_px": 0,
            "decoded": False,
        }
        try:
            if b"/DCTDecode" in d:
                # apply any pre-codec filters (e.g. [/FlateDecode
                # /DCTDecode] chains), then the JPEG codec
                pre = d.replace(b"/DCTDecode", b"")
                if _FILTER_NAME_RE.search(pre):
                    body = decode_stream(pre, body)
                img = jpeg.decode(body)
            elif b"/JBIG2Decode" in d:
                from jimmy_ray.codecs import jbig2

                pre = d.replace(b"/JBIG2Decode", b"")
                if _FILTER_NAME_RE.search(pre):
                    body = decode_stream(pre, body)
                # self-contained embedded streams only; /JBIG2Globals
                # symbol dictionaries raise inside decode() → row stays
                # decoded=False
                import numpy as np

                bitmap = jbig2.decode(body)  # 1 = black
                img = np.where(bitmap, 0, 255).astype(np.uint8)
            else:
                body = decode_stream(d, body)
                bpc = _dict_int(d, b"BitsPerComponent", 8)
                if bpc != 8:
                    raise NotImplementedError(f"{bpc}-bit raw image")
                import numpy as np

                h, w = row["height"], row["width"]
                n = len(body) // max(1, h * w)
                img = np.frombuffer(
                    body[:h * w * n], dtype=np.uint8).reshape(h, w, n)
                if n == 1:
                    img = img[:, :, 0]
        except (NotImplementedError, ValueError, KeyError, IndexError,
                struct.error, zlib.error):
            # row-level fault isolation: malformed/hostile image streams
            # surface as decoded=False rows, never batch failures — the
            # codecs raise struct.error / KeyError / IndexError on
            # truncated or inconsistent byte streams, not just ValueError
            rows.append(row)
            continue
        luma = img if img.ndim == 2 else (
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
        row.update({
            "width": int(img.shape[1]),
            "height": int(img.shape[0]),
            "channels": 1 if img.ndim == 2 else int(img.shape[2]),
            # half-away-from-zero, matching DuckDB round() (CLAUDE.md
            # rounding rule) — Python round() is half-to-even
            "mean_luma_milli": int(_math.floor(
                float(luma.mean()) * 1000 + 0.5)),
            "black_px": int((luma == 0).sum()),
            "decoded": True,
        })
        rows.append(row)
    return rows


FIXTURE_PDF_PASSWORD = ""  # empty user password, the common real case
_FIXTURE_FILE_ID = b"\xde\xad\xbe\xef" * 4


def synth_pdf(doc_id: int, text: str, flate: bool = False,
              variant: str | None = None) -> bytes:
    """Single-page fixture PDF.  variant ∈ {raw, flate, lzw, a85, rle,
    rc4, aes, xref}; all extract to identical text (xref = PDF 1.5:
    Flate content + a Flate/Predictor-12 cross-reference stream with
    real byte offsets; a85 = a [/ASCII85Decode /FlateDecode] filter
    chain; rc4/aes = standard-security-handler encryption, RC4-128 /
    AESV2, empty user password)."""
    import hashlib
    import zlib

    if variant is None:
        variant = "flate" if flate else "raw"
    content = (
        f"BT /F1 12 Tf 72 720 Td (Doc {doc_id}) Tj "
        f"0 -14 Td ({pdf_escape(text)}) Tj "
        f"0 -14 Td [(tail ) ({doc_id})] TJ ET"
    ).encode("utf-8")
    if variant in ("flate", "xref", "rc4", "aes"):
        content = zlib.compress(content, 6)
        filt = b"/Filter /FlateDecode "
    elif variant == "lzw":
        content = lzw_encode(content)
        filt = b"/Filter /LZWDecode "
    elif variant == "a85":
        import base64

        content = base64.a85encode(zlib.compress(content, 6)) + b"~>"
        filt = b"/Filter [/ASCII85Decode /FlateDecode] "
    elif variant == "rle":
        content = runlength_encode(content)
        filt = b"/Filter /RunLengthDecode "
    else:
        filt = b""

    trailer_extra = b""
    encrypt_obj = b""
    if variant in ("rc4", "aes"):
        rev = 3 if variant == "rc4" else 4
        keylen = 16
        o = _std_o_entry("owner", FIXTURE_PDF_PASSWORD, rev, keylen)
        p = -44
        key = _std_file_key(FIXTURE_PDF_PASSWORD, o, p, _FIXTURE_FILE_ID,
                            rev, keylen)
        u = _std_u_entry(key, _FIXTURE_FILE_ID, rev)
        if variant == "rc4":
            enc_dict = (b"<< /Filter /Standard /V 2 /R 3 /Length 128 "
                        b"/P -44 /O <%s> /U <%s> >>"
                        % (o.hex().encode(), u.hex().encode()))
        else:
            enc_dict = (b"<< /Filter /Standard /V 4 /R 4 /Length 128 "
                        b"/P -44 /O <%s> /U <%s> "
                        b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
                        b"/StmF /StdCF /StrF /StdCF >>"
                        % (o.hex().encode(), u.hex().encode()))
        handler = StdSecurityHandler(enc_dict, _FIXTURE_FILE_ID,
                                     FIXTURE_PDF_PASSWORD)
        iv = hashlib.sha256(b"pdf-iv/%d" % doc_id).digest()[:16]
        content = handler.encrypt(4, 0, content, iv)
        encrypt_obj = b"\n6 0 obj " + enc_dict + b" endobj"
        trailer_extra = (b" /Encrypt 6 0 R /ID [<%s> <%s>]"
                         % ((_FIXTURE_FILE_ID.hex().encode(),) * 2))

    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
        b"4 0 obj << " + filt + b"/Length %d >>\nstream\n" % len(content)
        + content + b"\nendstream endobj",
    ]
    if variant != "xref":
        return (b"%PDF-1.4\n" + b"\n".join(objs) + encrypt_obj
                + b"\ntrailer << /Root 1 0 R" + trailer_extra
                + b" >>\n%%EOF")

    # PDF 1.5: cross-reference stream with real offsets, W [1 2 1],
    # PNG Up predictor (the layout real writers emit)
    header = b"%PDF-1.5\n"
    offsets = []
    pos = len(header)
    for o in objs:
        offsets.append(pos)
        pos += len(o) + 1  # joined with \n
    xref_off = pos
    rows = [(0, 0, 255)]  # obj 0: free list head
    rows += [(1, off, 0) for off in offsets]
    rows.append((1, xref_off, 0))  # obj 5: the xref stream itself
    raw = b"".join(
        bytes([t]) + f2.to_bytes(2, "big") + bytes([f3 & 0xFF])
        for t, f2, f3 in rows
    )
    # predictor 12 (PNG Up): row_out = row - prev_row, filter byte 2
    cols = 4
    pred = bytearray()
    prev = bytes(cols)
    for i in range(0, len(raw), cols):
        row = raw[i:i + cols]
        pred.append(2)
        pred += bytes((a - b) & 0xFF for a, b in zip(row, prev))
        prev = row
    body = zlib.compress(bytes(pred), 6)
    xref_obj = (
        b"5 0 obj << /Type /XRef /Size 6 /Root 1 0 R /W [1 2 1] "
        b"/Index [0 6] /Length %d /Filter /FlateDecode "
        b"/DecodeParms << /Predictor 12 /Columns 4 >> >>\nstream\n"
        % len(body) + body + b"\nendstream endobj"
    )
    return (header + b"\n".join(objs) + b"\n" + xref_obj
            + b"\nstartxref\n%d\n%%%%EOF" % xref_off)


def pdf_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    variants = ("raw", "flate", "lzw", "xref", "a85", "rle", "rc4", "aes")

    def fn(batch: pa.Table) -> pa.Table:
        # doc_id % 8 routes across all eight decode paths (raw, Flate,
        # LZW, xref-stream, ASCII85+Flate chain, RunLength, RC4-128
        # encrypted, AESV2 encrypted); extracted text is identical in
        # each, so the SQL mirror is unchanged and the oracle covers
        # every branch
        texts = [
            extract_pdf_text(synth_pdf(i, t, variant=variants[i % 8]))
            for i, t in zip(batch["doc_id"].to_pylist(),
                            batch["text"].to_pylist())
        ]
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pa.array(texts, pa.string())})

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=256)


def sql_pdf_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id,
  'Doc ' || {i} || chr(10) || text || chr(10) || 'tail ' || {i} AS text
FROM documents
"""


def synth_pdf_with_images(doc_id: int, text: str) -> bytes:
    """Single-page PDF embedding one solid-gray baseline-JPEG image
    XObject.  Solid blocks survive DCT quantization exactly when the
    gray level is 128 ± an even offset (DC = (v-128)·8 is divisible by
    the luma quantizer 16 after /8 scaling), so the decoded mean luma is
    integer-exact and SQL-mirrorable while still exercising the real
    Huffman + IDCT path end-to-end."""
    import numpy as np

    from jimmy_ray.codecs import jpeg

    v = 128 + 2 * (doc_id % 50)
    w = 5 + doc_id % 20
    h = 4 + doc_id % 15
    jp = jpeg.encode(np.full((h, w), v, np.uint8))
    content = (f"BT /F1 12 Tf 72 720 Td (Doc {doc_id}: "
               f"{pdf_escape(text[:40])}) Tj ET").encode("utf-8")
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Resources "
        b"<< /XObject << /Im0 4 0 R >> >> /Contents 5 0 R >> endobj",
        b"4 0 obj << /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /DCTDecode "
        b"/Length %d >>\nstream\n" % (w, h, len(jp))
        + jp + b"\nendstream endobj",
        b"5 0 obj << /Length %d >>\nstream\n" % len(content)
        + content + b"\nendstream endobj",
    ]
    return (b"%PDF-1.4\n" + b"\n".join(objs)
            + b"\ntrailer << /Root 1 0 R /Size 6 >>\n%%EOF")


def pdf_image_features(sf_dir: str):
    """Per-document embedded-image decode: (doc_id, width, height,
    channels, mean_luma_milli, decoded) through the real JPEG codec."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        rows = []
        for i, t in zip(ids, batch["text"].to_pylist()):
            imgs = extract_pdf_images(synth_pdf_with_images(i, t))
            rows.append(imgs[0])
        import pyarrow as _pa

        return _pa.table({
            "doc_id": batch["doc_id"],
            "width": _pa.array([r["width"] for r in rows], _pa.int64()),
            "height": _pa.array([r["height"] for r in rows], _pa.int64()),
            "channels": _pa.array([r["channels"] for r in rows],
                                  _pa.int64()),
            "mean_luma_milli": _pa.array(
                [r["mean_luma_milli"] for r in rows], _pa.int64()),
            "decoded": _pa.array([r["decoded"] for r in rows],
                                 _pa.bool_()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=256)


def sql_pdf_image_features() -> str:
    return """
SELECT doc_id,
  CAST(5 + doc_id % 20 AS BIGINT) AS width,
  CAST(4 + doc_id % 15 AS BIGINT) AS height,
  CAST(1 AS BIGINT) AS channels,
  CAST((128 + 2 * (doc_id % 50)) * 1000 AS BIGINT) AS mean_luma_milli,
  TRUE AS decoded
FROM documents
"""


def synth_pdf_with_jbig2(doc_id: int) -> bytes:
    """Single-page fixture PDF embedding one JBIG2-coded bilevel image
    XObject.  The pattern sets pixel k (raster order) iff
    ``(k + doc_id) % 3 == 0`` — an exactly SQL-expressible black-pixel
    count — while ``doc_id`` routes across every arithmetic decode
    path: GBTEMPLATE = doc_id % 4, TPGDON = (doc_id // 4) % 2.  The
    decoded bitmap is identical in all eight variants, so one SQL
    mirror covers each branch (same routing trick as pdf_extract)."""
    import numpy as np

    from jimmy_ray.codecs import jbig2

    w = 6 + doc_id % 17
    h = 5 + doc_id % 13
    k = np.arange(h * w, dtype=np.int64)
    img = (((k + doc_id) % 3) == 0).astype(np.uint8).reshape(h, w)
    body = jbig2.encode(img, template=doc_id % 4,
                        tpgdon=bool((doc_id // 4) % 2))
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Resources "
        b"<< /XObject << /Im0 4 0 R >> >> >> endobj",
        b"4 0 obj << /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
        b"/Filter /JBIG2Decode /Length %d >>\nstream\n" % (w, h, len(body))
        + body + b"\nendstream endobj",
    ]
    return (b"%PDF-1.4\n" + b"\n".join(objs)
            + b"\ntrailer << /Root 1 0 R /Size 5 >>\n%%EOF")


def pdf_jbig2_features(sf_dir: str):
    """Per-document JBIG2 image decode: (doc_id, width, height,
    black_px, decoded) through the real MQ-arithmetic generic-region
    codec (black_px counts decoded 1-pixels = mean-luma analogue for
    bilevel masks)."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        rows = []
        for i in batch["doc_id"].to_pylist():
            r = extract_pdf_images(synth_pdf_with_jbig2(i))[0]
            rows.append((r["width"], r["height"], r["black_px"],
                         r["decoded"]))
        return pa.table({
            "doc_id": batch["doc_id"],
            "width": pa.array([r[0] for r in rows], pa.int64()),
            "height": pa.array([r[1] for r in rows], pa.int64()),
            "black_px": pa.array([r[2] for r in rows], pa.int64()),
            "decoded": pa.array([r[3] for r in rows], pa.bool_()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=256)


def sql_pdf_jbig2_features() -> str:
    # black pixels = |{k in [0, w*h) : (k + doc_id) % 3 == 0}|
    #              = (w*h - first_k + 2) // 3, first_k = (3 - d%3) % 3
    return """
SELECT doc_id,
  CAST(6 + doc_id % 17 AS BIGINT) AS width,
  CAST(5 + doc_id % 13 AS BIGINT) AS height,
  CAST(((6 + doc_id % 17) * (5 + doc_id % 13)
        - ((3 - doc_id % 3) % 3) + 2) // 3 AS BIGINT) AS black_px,
  TRUE AS decoded
FROM documents
"""
