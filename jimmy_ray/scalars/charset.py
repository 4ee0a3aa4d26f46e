"""Charset sniffing + transcoding: the decode step before any text op.

Real crawls are a charset zoo; every downstream operator assumes
clean unicode.  This implements the published WHATWG/HTML-spec
detection subset in the spec's precedence order:

1. byte-order mark (UTF-8 / UTF-16 LE / UTF-16 BE) — overrides
   everything, including a lying ``<meta>``,
2. ``charset=`` parameter on the HTTP ``Content-Type`` header,
3. a ``<meta charset=...>`` / ``<meta http-equiv="Content-Type">``
   declaration **within the first 1024 bytes** (the spec's prescan
   window — a declaration past the window is ignored),
4. fallback ``windows-1252`` (the spec default for unlabeled content).

Encoding labels map to codecs per the WHATWG Encoding Standard's
label table subset — notably ``iso-8859-1``/``latin1`` are ALIASES OF
``windows-1252`` (0x80-0x9F are the cp1252 printables, e.g. the euro
sign), and ``utf8`` → ``utf-8``.

Scale shape: stateless per-document map (module-level compiled
regexes, no exchange) — the same batch shape as extraction.
"""

from __future__ import annotations

import re

import pyarrow as pa

# WHATWG label table subset: label (lowercased) → python codec
_LABELS = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "utf-16": "utf-16-le", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
    "iso-8859-1": "windows-1252", "latin1": "windows-1252",
    "l1": "windows-1252", "ascii": "windows-1252",
    "us-ascii": "windows-1252", "windows-1252": "windows-1252",
    "cp1252": "windows-1252", "x-cp1252": "windows-1252",
}
PRESCAN_WINDOW = 1024

_HTTP_CHARSET_RE = re.compile(r"charset=[\"']?([A-Za-z0-9_.:-]+)", re.I)
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)", re.I)


def normalize_label(label: str) -> str | None:
    return _LABELS.get(label.strip().lower())


def sniff_charset(content_type: str, body: bytes) -> tuple[str, str]:
    """(codec, source) per the precedence above; source is one of
    ``bom`` / ``http`` / ``meta`` / ``default``."""
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8", "bom"
    if body[:2] == b"\xff\xfe":
        return "utf-16-le", "bom"
    if body[:2] == b"\xfe\xff":
        return "utf-16-be", "bom"
    m = _HTTP_CHARSET_RE.search(content_type or "")
    if m:
        codec = normalize_label(m.group(1))
        if codec:
            return codec, "http"
    m = _META_CHARSET_RE.search(body[:PRESCAN_WINDOW])
    if m:
        codec = normalize_label(m.group(1).decode("ascii"))
        if codec:
            return codec, "meta"
    return "windows-1252", "default"


def decode_html(content_type: str, body: bytes) -> tuple[str, str, str]:
    """(decoded text, codec, source); the BOM char is stripped."""
    codec, source = sniff_charset(content_type, body)
    if source == "bom":
        body = body[3:] if codec == "utf-8" else body[2:]
    return body.decode(codec), codec, source


# --- fixtures (4 variants/doc, one per detection source) ---------------------

N_CHARSET_VARIANTS = 4

# decoded-paragraph marker per variant: cp1252-only chars on the 1252
# variants (the euro sign is 0x80 — encodable in cp1252, NOT latin-1,
# so v2 proves the WHATWG iso-8859-1 → windows-1252 label mapping)
_MARKERS = {0: " é ✓", 1: " ✓",
            2: " é €", 3: " é"}
CHARSET_GOLDEN_TEMPLATES = {
    v: "# Doc {id}\n\n{text}" + m for v, m in _MARKERS.items()}
_EXPECT = {0: ("utf-8", "meta"), 1: ("utf-16-le", "bom"),
           2: ("windows-1252", "http"), 3: ("windows-1252", "default")}


def synth_charset_page(doc_id: int, text: str,
                       variant: int) -> tuple[str, bytes]:
    """(http content-type, encoded body) per variant."""
    i = doc_id
    html = (f"<html><head>{{head}}</head><body><h1>Doc {i}</h1>"
            f"<p>{text}{_MARKERS[variant]}</p></body></html>")
    if variant == 0:
        return ("text/html",
                html.format(head='<meta charset="utf-8">').encode("utf-8"))
    if variant == 1:
        # BOM wins over the lying meta
        body = html.format(head='<meta charset="utf-8">')
        return "text/html", b"\xff\xfe" + body.encode("utf-16-le")
    if variant == 2:
        return ("text/html; charset=ISO-8859-1",
                html.format(head="").encode("windows-1252"))
    # v3: meta pushed past the prescan window by a head comment → default
    pad = "<!-- " + "x" * PRESCAN_WINDOW + " -->"
    body = html.format(head=pad + '<meta charset="utf-8">')
    return "text/html", body.encode("windows-1252")


def charset_decode(sf_dir: str):
    """documents → 4 encoded page variants → sniff + decode + extract."""
    import ray.data as rd

    from jimmy_ray.html.extract import html_to_markdown

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, variants, charsets, srcs, texts = [], [], [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            for v in range(N_CHARSET_VARIANTS):
                ct, body = synth_charset_page(d, t, v)
                decoded, codec, source = decode_html(ct, body)
                ids.append(d)
                variants.append(v)
                charsets.append(codec)
                srcs.append(source)
                texts.append(html_to_markdown(decoded))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "variant": pa.array(variants, pa.int64()),
            "charset": pa.array(charsets, pa.string()),
            "src": pa.array(srcs, pa.string()),
            "text": pa.array(texts, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


def sql_charset_decode() -> str:
    from jimmy_ray.sources.fixturetpl import sql_golden

    arms = "\n  UNION ALL\n".join(
        f"SELECT doc_id, CAST({v} AS BIGINT) AS variant, "
        f"'{_EXPECT[v][0]}' AS charset, '{_EXPECT[v][1]}' AS src, "
        f"{sql_golden(CHARSET_GOLDEN_TEMPLATES[v])} AS text FROM documents"
        for v in range(N_CHARSET_VARIANTS))
    return f"SELECT * FROM (\n  {arms}\n)"


# --- post-decode unicode normalization ----------------------------------------

import unicodedata as _ud  # noqa: E402

# C0 (minus \t\n) + DEL + C1: the control range corpus cleanup deletes
_CTRL_RE = re.compile(
    "[\x00-\x08\x0b-\x1f\x7f-\x9f]")
_MULTISPACE_RE = re.compile(" +")


def normalize_text(text: str) -> str:
    """The standard corpus text-cleanup pipeline, in a fixed order:
    NFC normalization -> delete control chars (keep \\n and \\t) ->
    tabs to spaces -> collapse space runs -> strip the (single,
    post-collapse) space at line ends.  Every step is mirrored in
    DuckDB (nfc_normalize + RE2, which has no lookaheads — hence the
    plain-replace formulation), so the oracle is an independent second
    NFC implementation."""
    t = _ud.normalize("NFC", text)
    t = _CTRL_RE.sub("", t)
    t = t.replace("\t", " ")
    t = _MULTISPACE_RE.sub(" ", t)
    t = t.replace(" \n", "\n")
    return t[:-1] if t.endswith(" ") else t


def synth_messy_text(doc_id: int, text: str) -> str:
    """A precomposed accent, a BEL, a C1 NEL, a tab and space runs
    (the SQL raw expression builds e+U+0301 instead; NFC composes
    both to the same codepoint)."""
    i = doc_id
    return (f"Café {i}:\t{text}\x07   extra  spaces \n"
            f"line\x85 two {i}  ")


def normalize_corpus(sf_dir: str):
    """documents -> messy unicode -> normalize_text (stateless map)."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = [normalize_text(synth_messy_text(d, t))
                 for d, t in zip(batch["doc_id"].to_pylist(),
                                 batch["text"].to_pylist())]
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pa.array(texts, pa.string())})

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def sql_normalize_corpus() -> str:
    """The SAME pipeline applied by DuckDB to the SAME messy input,
    NFC included — an independent second implementation, not a
    precomputed golden."""
    i = "CAST(doc_id AS VARCHAR)"
    raw = (f"'Cafe' || chr(769) || ' ' || {i} || ':' || chr(9) || text"
           f" || chr(7) || '   extra  spaces ' || chr(10) || 'line'"
           f" || chr(133) || ' two ' || {i} || '  '")
    ctrl = r"[\x{0000}-\x{0008}\x{000B}-\x{001F}\x{007F}-\x{009F}]"
    return f"""
SELECT doc_id,
  CASE WHEN cleaned LIKE '% ' THEN substr(cleaned, 1, length(cleaned) - 1)
       ELSE cleaned END AS text
FROM (
  SELECT doc_id, replace(regexp_replace(replace(regexp_replace(
           nfc_normalize({raw}),
           '{ctrl}', '', 'g'),
           chr(9), ' '),
           ' +', ' ', 'g'),
           ' ' || chr(10), chr(10)) AS cleaned
  FROM documents
)
"""


def normalize_batch(batch: pa.Table) -> pa.Table:
    """Pages-schema stage: (url, text, ...) -> (url, normalized text)."""
    texts = [normalize_text(t) for t in batch["text"].to_pylist()]
    return pa.table({"url": batch["url"],
                     "text": pa.array(texts, pa.string())})
