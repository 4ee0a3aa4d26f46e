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
- PNG predictors 10-15 (``/DecodeParms /Predictor``) for either filter,
- anything else (DCT, JBIG2, crypt filters) still raises — the remaining
  stub boundary where a real codec engine slots in.

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

import re

import pyarrow as pa

# dict matchers tolerate one nesting level (e.g. /DecodeParms << ... >>)
_DICT_BODY = rb"((?:[^<>]|<<[^<>]*>>)*)"
_STREAM_RE = re.compile(rb"<<" + _DICT_BODY + rb">>\s*stream\r?\n(.*?)endstream",
                        re.S)
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


def decode_stream(stream_dict: bytes, body: bytes) -> bytes:
    """Apply /Filter (+ /DecodeParms predictor) to a stream body."""
    import zlib

    if b"/Filter" not in stream_dict:
        return body
    if b"/FlateDecode" in stream_dict:
        body = zlib.decompress(body)
    elif b"/LZWDecode" in stream_dict:
        body = lzw_decode(body)
    else:
        raise NotImplementedError(
            "unsupported PDF stream filter (DCT/JBIG2/crypt need a codec "
            "library; converter.py:295-306 covers them via pdf_oxide)"
        )
    pred = _dict_int(stream_dict, b"Predictor", 1)
    if pred >= 10:
        columns = _dict_int(stream_dict, b"Columns", 1)
        colors = _dict_int(stream_dict, b"Colors", 1)
        body = png_predictor_decode(body, columns, colors)
    elif pred != 1:
        raise NotImplementedError(f"TIFF predictor {pred} not supported")
    return body


# --- cross-reference streams (PDF 1.5; §7.5.8) ------------------------------

_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)\s*%%EOF", re.S)
_OBJ_AT_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\s*<<" + _DICT_BODY
                        + rb">>\s*(?:stream\r?\n)?", re.S)


def _stream_at(payload: bytes, offset: int) -> tuple[bytes, bytes] | None:
    """(dict, decoded body) for the indirect stream object at offset,
    sliced by /Length (exact — compressed bytes may contain 'endstream')."""
    m = _OBJ_AT_RE.match(payload, offset)
    if not m:
        return None
    d = m.group(3)
    length = _dict_int(d, b"Length")
    if length is None:
        return None
    start = m.end()
    return d, decode_stream(d, payload[start:start + length])


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


def extract_pdf_text(payload: bytes) -> str:
    """Stream text extraction: when the PDF carries an xref stream
    (PDF 1.5), visit type-1 objects at their recovered offsets in object
    order (exact /Length slicing); otherwise scan the whole file for
    stream objects.  Flate/LZW (+ PNG predictors) decode; other filters
    raise at the documented codec boundary."""
    lines: list[str] = []
    xref = parse_xref_stream(payload)
    if xref:
        for obj in sorted(xref):
            typ, f2, _ = xref[obj]
            if typ != 1:
                continue
            got = _stream_at(payload, f2)
            if got is None:
                continue
            d, body = got
            if b"/XRef" in d:
                continue
            _scan_text_blocks(body, lines)
    else:
        for m in _STREAM_RE.finditer(payload):
            _scan_text_blocks(decode_stream(m.group(1), m.group(2)), lines)
    return "\n".join(lines)


def synth_pdf(doc_id: int, text: str, flate: bool = False,
              variant: str | None = None) -> bytes:
    """Single-page fixture PDF.  variant ∈ {raw, flate, lzw, xref}; all
    four extract to identical text (xref = PDF 1.5: Flate content + a
    Flate/Predictor-12 cross-reference stream with real byte offsets)."""
    import zlib

    if variant is None:
        variant = "flate" if flate else "raw"
    content = (
        f"BT /F1 12 Tf 72 720 Td (Doc {doc_id}) Tj "
        f"0 -14 Td ({pdf_escape(text)}) Tj "
        f"0 -14 Td [(tail ) ({doc_id})] TJ ET"
    ).encode("utf-8")
    if variant in ("flate", "xref"):
        content = zlib.compress(content, 6)
        filt = b"/Filter /FlateDecode "
    elif variant == "lzw":
        content = lzw_encode(content)
        filt = b"/Filter /LZWDecode "
    else:
        filt = b""
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
        b"4 0 obj << " + filt + b"/Length %d >>\nstream\n" % len(content)
        + content + b"\nendstream endobj",
    ]
    if variant != "xref":
        return (b"%PDF-1.4\n" + b"\n".join(objs)
                + b"\ntrailer << /Root 1 0 R >>\n%%EOF")

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

    variants = ("raw", "flate", "lzw", "xref")

    def fn(batch: pa.Table) -> pa.Table:
        # doc_id % 4 routes across all four decode paths (raw, Flate,
        # LZW, xref-stream); extracted text is identical in each, so the
        # SQL mirror is unchanged and the oracle covers every branch
        texts = [
            extract_pdf_text(synth_pdf(i, t, variant=variants[i % 4]))
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
