"""Minimal PDF text extraction (S4 real-subset; public PDF spec).

The reference uses the external ``pdf_oxide`` engine
(/root/reference/src/jimmy/converter.py:295-306) — absent here, like
every binary codec.  But *uncompressed* PDF is plain text per the public
spec, so this module implements the honest subset: walk ``stream``
objects, scan ``BT … ET`` text blocks, and decode ``(string) Tj`` /
``[(a) (b)] TJ`` show-text operators with PDF string-escape handling;
``Td``/``TD``/``T*`` line moves emit newlines.  ``/FlateDecode``
streams — which is what virtually every real-world PDF uses — inflate
via stdlib ``zlib`` (RFC 1950, public spec); any *other* ``/Filter``
still raises (the remaining stub boundary — a real engine slots in
behind the same stage interface).

The fixture synthesizes a minimal single-page PDF per document, so
``pdf_extract`` is a fully oracle-checked PDF→text pipeline.
"""

from __future__ import annotations

import re

import pyarrow as pa

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
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


def pdf_escape(text: str) -> str:
    return (
        text.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    )


def extract_pdf_text(payload: bytes) -> str:
    """Stream text extraction; FlateDecode inflates via zlib, any other
    /Filter raises (converter.py:295-306 covers them via pdf_oxide)."""
    import zlib

    lines: list[str] = []
    for m in _STREAM_RE.finditer(payload):
        stream_dict, body = m.group(1), m.group(2)
        if b"/Filter" in stream_dict:
            if b"/FlateDecode" not in stream_dict:
                raise NotImplementedError(
                    "non-Flate PDF stream filters need a codec library"
                )
            body = zlib.decompress(body)
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
    return "\n".join(lines)


def synth_pdf(doc_id: int, text: str, flate: bool = False) -> bytes:
    import zlib

    content = (
        f"BT /F1 12 Tf 72 720 Td (Doc {doc_id}) Tj "
        f"0 -14 Td ({pdf_escape(text)}) Tj "
        f"0 -14 Td [(tail ) ({doc_id})] TJ ET"
    ).encode("utf-8")
    if flate:
        content = zlib.compress(content, 6)
        filt = b"/Filter /FlateDecode "
    else:
        filt = b""
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
        b"4 0 obj << " + filt + b"/Length %d >>\nstream\n" % len(content)
        + content + b"\nendstream endobj",
    ]
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"


def pdf_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        # even doc_ids exercise the FlateDecode path, odd ones the raw
        # path; extracted text is identical either way, so the SQL mirror
        # is unchanged and the oracle covers both branches
        texts = [
            extract_pdf_text(synth_pdf(i, t, flate=(i % 2 == 0)))
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
