"""WARC (ISO 28500) reader: the web-crawl container format.

The engine's flagship corpus is Common-Crawl-shaped pages; the on-disk
format those crawls actually ship is WARC — so the archive layer gets a
real reader.  Subset per the public spec:

- record grammar: ``WARC/1.0`` version line, named headers,
  ``Content-Length``-sliced payload, CRLF CRLF record delimiter,
- record types: ``response`` parsed (HTTP status line + headers +
  body), ``warcinfo`` / ``request`` / ``metadata`` skipped,
- the standard storage layout where EACH RECORD is its own gzip member
  and members are concatenated (``.warc.gz``) — stdlib zlib walks the
  member chain; plain ``.warc`` accepted too,
- response bodies route through the shared HTML→Markdown path.

The fixture writer emits both layouts (gzip members on even doc_ids)
rendering the golden template the SQL mirror derives from.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

_CRLF = b"\r\n"


def _gzip_member(data: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + 15)
    return co.compress(data) + co.flush()


def split_gzip_members(payload: bytes) -> bytes:
    """Decompress a chain of concatenated gzip members (the .warc.gz
    layout); returns the concatenated plaintext."""
    out = bytearray()
    pos = 0
    while pos < len(payload):
        dec = zlib.decompressobj(16 + 15)
        out += dec.decompress(payload[pos:])
        consumed = len(payload) - pos - len(dec.unused_data)
        if consumed <= 0:
            raise ValueError("corrupt gzip member chain")
        pos += consumed
    return bytes(out)


def parse_warc(payload: bytes, strict: bool = True) -> list[dict]:
    """One dict per WARC record: headers + raw block.  Accepts plain
    and gzip-member layouts (sniffed by magic).

    ``strict=False`` is the real-crawl mode: a record whose version
    line, headers or Content-Length are corrupt is emitted as a
    dead-letter dict (``{"error": ..., "offset": ...}``) and the
    scanner resyncs at the next ``\\r\\n\\r\\nWARC/`` boundary instead of
    aborting the whole shard — the row-level fault-isolation rule
    (SURVEY §2.9) applied to the container layer."""
    if payload[:2] == b"\x1f\x8b":
        payload = split_gzip_members(payload)
    records = []
    pos = 0
    while pos < len(payload):
        try:
            if payload[pos:pos + 5] != b"WARC/":
                raise ValueError(f"expected WARC version line at {pos}")
            head_end = payload.index(_CRLF + _CRLF, pos)
            head_lines = payload[pos:head_end].split(_CRLF)
            headers: dict[str, str] = {}
            for line in head_lines[1:]:
                k, _, v = line.decode("utf-8").partition(":")
                headers[k.strip().lower()] = v.strip()
            length = int(headers["content-length"])
            block_start = head_end + 4
            records.append({
                "version": head_lines[0].decode(),
                "headers": headers,
                "block": payload[block_start:block_start + length],
            })
            pos = block_start + length
        except (ValueError, KeyError, UnicodeDecodeError) as exc:
            if strict:
                raise
            records.append({"error": str(exc)[:200], "offset": pos,
                            "headers": {}, "block": b""})
            nxt = payload.find(_CRLF + _CRLF + b"WARC/", pos)
            if nxt < 0:
                break
            pos = nxt + 4
        while payload[pos:pos + 2] == _CRLF:
            pos += 2
    return records


def parse_http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """(status, headers, body) from an HTTP response block."""
    head_end = block.index(_CRLF + _CRLF)
    lines = block[:head_end].split(_CRLF)
    status = int(lines[0].split()[1])
    headers = {}
    for line in lines[1:]:
        k, _, v = line.decode("latin-1").partition(":")
        headers[k.strip().lower()] = v.strip()
    return status, headers, block[head_end + 4:]


def warc_responses_to_rows(payload: bytes) -> list[dict]:
    """response records → (uri, status, markdown text) rows; other
    record types skipped (warcinfo/request/metadata)."""
    from jimmy_ray.html.extract import html_to_markdown

    rows = []
    for rec in parse_warc(payload):
        if rec["headers"].get("warc-type") != "response":
            continue
        status, http_headers, body = parse_http_response(rec["block"])
        text = ""
        if "text/html" in http_headers.get("content-type", ""):
            text = html_to_markdown(body)
        rows.append({
            "uri": rec["headers"].get("warc-target-uri", ""),
            "status": status,
            "text": text,
        })
    return rows


# --- fixture ----------------------------------------------------------------

def _record(rtype: str, uri: str, block: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + f"Content-Length: {len(block)}\r\n\r\n"
    ).encode()
    return head + block + _CRLF + _CRLF


def synth_warc(doc_id: int, text: str) -> bytes:
    """warcinfo + request + response (+ a non-HTML response) per doc;
    even doc_ids use the per-record-gzip-member .warc.gz layout."""
    uri = f"https://crawl.test/doc/{doc_id}"
    html = (f"<html><body><h1>Doc {doc_id}</h1>"
            f"<p>{text}</p></body></html>").encode()
    http = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n\r\n" + html)
    records = [
        _record("warcinfo", "", b"software: fixture\r\n"),
        _record("request", uri, b"GET /doc HTTP/1.1\r\n\r\n"),
        _record("response", uri, http),
        _record("response", uri + "/data",
                b"HTTP/1.1 200 OK\r\nContent-Type: application/json"
                b"\r\n\r\n{}"),
    ]
    if doc_id % 2 == 0:
        return b"".join(_gzip_member(r) for r in records)
    return b"".join(records)


WARC_GOLDEN_TEMPLATE = "# Doc {id}\n\n{text}"


def warc_extract(sf_dir: str):
    """documents → per-doc WARC (both layouts) → response rows with
    HTML routed through the shared extraction path."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, uris, statuses, texts = [], [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            for row in warc_responses_to_rows(synth_warc(d, t)):
                ids.append(d)
                uris.append(row["uri"])
                statuses.append(row["status"])
                texts.append(row["text"])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "uri": pa.array(uris, pa.string()),
            "status": pa.array(statuses, pa.int64()),
            "text": pa.array(texts, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=256)


def sql_warc_extract() -> str:
    from jimmy_ray.sources.fixturetpl import sql_golden

    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id, uri, status, text FROM (
  SELECT doc_id, 'https://crawl.test/doc/' || {i} AS uri,
         CAST(200 AS BIGINT) AS status,
         {sql_golden(WARC_GOLDEN_TEMPLATE)} AS text
  FROM documents
  UNION ALL
  SELECT doc_id, 'https://crawl.test/doc/' || {i} || '/data',
         CAST(200 AS BIGINT), ''
  FROM documents
)
"""


# --- WET (extracted-text conversion records) ---------------------------------

def wet_conversions_to_rows(payload: bytes) -> list[dict]:
    """WET sidecar files carry ``WARC-Type: conversion`` records whose
    block is the extracted plain text (text/plain) — the Common Crawl
    *.warc.wet.gz derivative.  Same record grammar, no HTTP layer."""
    rows = []
    for rec in parse_warc(payload):
        if rec["headers"].get("warc-type") != "conversion":
            continue
        rows.append({
            "uri": rec["headers"].get("warc-target-uri", ""),
            "refers_to": rec["headers"].get("warc-refers-to", ""),
            "text": rec["block"].decode("utf-8"),
        })
    return rows


def synth_wet(doc_id: int, text: str) -> bytes:
    uri = f"https://crawl.test/doc/{doc_id}"
    body = f"Doc {doc_id}\n{text}".encode()
    records = [
        _record("warcinfo", "", b"software: fixture-wet\r\n"),
        _record_with(
            "conversion", uri, body,
            extra=f"WARC-Refers-To: <urn:uuid:{doc_id:032d}>\r\n"
                  "Content-Type: text/plain\r\n"),
        _record_with("conversion", uri + "/p2",
                     f"part two {doc_id}".encode(),
                     extra="Content-Type: text/plain\r\n"),
    ]
    if doc_id % 2 == 0:
        return b"".join(_gzip_member(r) for r in records)
    return b"".join(records)


def _record_with(rtype: str, uri: str, block: bytes,
                 extra: str = "") -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + extra
        + f"Content-Length: {len(block)}\r\n\r\n"
    ).encode()
    return head + block + _CRLF + _CRLF


def wet_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, uris, refs, texts = [], [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            for row in wet_conversions_to_rows(synth_wet(d, t)):
                ids.append(d)
                uris.append(row["uri"])
                refs.append(row["refers_to"])
                texts.append(row["text"])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "uri": pa.array(uris, pa.string()),
            "refers_to": pa.array(refs, pa.string()),
            "text": pa.array(texts, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=256)


def sql_wet_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id, uri, refers_to, text FROM (
  SELECT doc_id, 'https://crawl.test/doc/' || {i} AS uri,
         '<urn:uuid:' || lpad({i}, 32, '0') || '>' AS refers_to,
         'Doc ' || {i} || chr(10) || text AS text
  FROM documents
  UNION ALL
  SELECT doc_id, 'https://crawl.test/doc/' || {i} || '/p2', '',
         'part two ' || {i}
  FROM documents
)
"""


# --- CDX-J crawl index (SURT keys) --------------------------------------------

def surt_key(url: str) -> str:
    """Sort-friendly URI Reordering Transform: host labels reversed and
    comma-joined, default ports dropped, ``)`` separator, path kept
    case-sensitively, query params sorted — the key Common Crawl's CDX
    index sorts by."""
    from urllib.parse import urlsplit

    parts = urlsplit(url)
    host = (parts.hostname or "").lower()
    if host.startswith("www."):
        host = host[4:]
    key = ",".join(reversed(host.split(".")))
    port = parts.port
    if port and not ((parts.scheme == "http" and port == 80)
                     or (parts.scheme == "https" and port == 443)):
        key += f":{port}"
    key += ")" + parts.path
    if parts.query:
        key += "?" + "&".join(sorted(p for p in parts.query.split("&") if p))
    return key


def parse_cdxj(payload: bytes) -> list[dict]:
    """CDX-J lines: ``<urlkey> <timestamp> <json>`` — one dict per line
    with the json fields flattened in."""
    import json

    rows = []
    for line in payload.decode("utf-8").splitlines():
        if not line.strip():
            continue
        urlkey, _, rest = line.partition(" ")
        ts, _, blob = rest.partition(" ")
        row = {"urlkey": urlkey, "ts": int(ts)}
        row.update(json.loads(blob))
        rows.append(row)
    return rows


def synth_cdxj(doc_id: int) -> bytes:
    """CDX-J index lines for the URL-tier fixtures (webtext.synth_url),
    written in SURT order as a real index shard would be."""
    import json

    from jimmy_ray.functions.webtext import N_URL_VARIANTS, synth_url

    lines = []
    for v in range(N_URL_VARIANTS):
        url = synth_url(doc_id, v)
        lines.append((surt_key(url), 20240101000000 + v,
                      json.dumps({"url": url, "status": "200"},
                                 sort_keys=True)))
    lines.sort()
    return "\n".join(f"{k} {ts} {blob}" for k, ts, blob in lines).encode()


def cdx_index(sf_dir: str):
    """documents → CDX-J shard per doc → parsed index rows."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, keys, tss, urls = [], [], [], []
        for d in batch["doc_id"].to_pylist():
            for row in parse_cdxj(synth_cdxj(d)):
                ids.append(d)
                keys.append(row["urlkey"])
                tss.append(row["ts"])
                urls.append(row["url"])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "urlkey": pa.array(keys, pa.string()),
            "ts": pa.array(tss, pa.int64()),
            "url": pa.array(urls, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=1024)


def sql_cdx_index() -> str:
    k = "CAST(doc_id % 50 AS VARCHAR)"
    i = "CAST(doc_id AS VARCHAR)"
    url = (
        "CASE v WHEN 0 THEN 'https://WWW.Example' || {k} || '.COM:443/Path'"
        " || {i} || '/?utm_source=feed&b=2&a=1#frag' "
        "WHEN 1 THEN 'https://www.example' || {k} || '.com/Path' || {i}"
        " || '/?a=1&b=2' "
        "ELSE 'http://example' || {k} || '.com:80/other' || {i} END"
    ).format(k=k, i=i)
    urlkey = (
        "CASE v WHEN 2 THEN 'com,example' || {k} || ')/other' || {i} "
        "ELSE 'com,example' || {k} || ')/Path' || {i} || "
        "'/?' || (CASE v WHEN 0 THEN 'a=1&b=2&utm_source=feed' "
        "ELSE 'a=1&b=2' END) END"
    ).format(k=k, i=i)
    return f"""
WITH variants AS (SELECT * FROM (VALUES (0), (1), (2)) AS t(v))
SELECT doc_id, {urlkey} AS urlkey,
       CAST(20240101000000 + v AS BIGINT) AS ts,
       {url} AS url
FROM documents CROSS JOIN variants
"""


# --- WAT (metadata-envelope records) ------------------------------------------

def wat_links_to_rows(payload: bytes) -> list[dict]:
    """WAT sidecar files carry ``WARC-Type: metadata`` records whose
    block is a JSON envelope (the Common Crawl *.warc.wat.gz layout:
    ``Envelope`` → ``WARC-Header-Metadata`` + ``Payload-Metadata`` →
    ``HTTP-Response-Metadata`` → ``HTML-Metadata`` → ``Head``/``Links``).
    One output row per outlink, title carried on every row."""
    import json

    rows = []
    for rec in parse_warc(payload):
        if rec["headers"].get("warc-type") != "metadata":
            continue
        env = json.loads(rec["block"].decode("utf-8"))["Envelope"]
        uri = env["WARC-Header-Metadata"].get("WARC-Target-URI", "")
        html_meta = (env.get("Payload-Metadata", {})
                     .get("HTTP-Response-Metadata", {})
                     .get("HTML-Metadata", {}))
        title = html_meta.get("Head", {}).get("Title", "")
        for link in html_meta.get("Links", []):
            rows.append({"uri": uri, "title": title,
                         "path": link.get("path", ""),
                         "link_url": link.get("url", "")})
    return rows


def synth_wat(doc_id: int) -> bytes:
    """warcinfo + one metadata envelope per doc (title + an A@/href and
    an IMG@/src outlink); even doc_ids use the gzip-member layout."""
    import json

    i = doc_id
    uri = f"https://crawl.test/doc/{i}"
    envelope = {
        "Envelope": {
            "WARC-Header-Metadata": {"WARC-Target-URI": uri,
                                     "WARC-Type": "response"},
            "Payload-Metadata": {
                "HTTP-Response-Metadata": {
                    "HTML-Metadata": {
                        "Head": {"Title": f"Doc {i}"},
                        "Links": [
                            {"path": "A@/href",
                             "url": f"https://example{i % 50}.com/out/{i}"},
                            {"path": "IMG@/src",
                             "url": f"https://cdn.test/img/{i}.png"},
                        ],
                    }
                }
            },
        }
    }
    blob = json.dumps(envelope, sort_keys=True).encode()
    records = [
        _record("warcinfo", "", b"software: fixture-wat\r\n"),
        _record_with("metadata", uri, blob,
                     extra="Content-Type: application/json\r\n"),
    ]
    if doc_id % 2 == 0:
        return b"".join(_gzip_member(r) for r in records)
    return b"".join(records)


def wat_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, uris, titles, paths, links = [], [], [], [], []
        for d in batch["doc_id"].to_pylist():
            for row in wat_links_to_rows(synth_wat(d)):
                ids.append(d)
                uris.append(row["uri"])
                titles.append(row["title"])
                paths.append(row["path"])
                links.append(row["link_url"])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "uri": pa.array(uris, pa.string()),
            "title": pa.array(titles, pa.string()),
            "path": pa.array(paths, pa.string()),
            "link_url": pa.array(links, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=1024)


def sql_wat_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    k = "CAST(doc_id % 50 AS VARCHAR)"
    return f"""
SELECT doc_id, 'https://crawl.test/doc/' || {i} AS uri,
       'Doc ' || {i} AS title, path, link_url FROM (
  SELECT doc_id, 'A@/href' AS path,
         'https://example' || {k} || '.com/out/' || {i} AS link_url
  FROM documents
  UNION ALL
  SELECT doc_id, 'IMG@/src',
         'https://cdn.test/img/' || {i} || '.png'
  FROM documents
)
"""
