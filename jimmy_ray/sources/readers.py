"""Source registry: format name → Ray Data reader (SURVEY.md §2.1).

The reference dispatches 40+ export formats by extension through
FORMAT_REGISTRY (/root/reference/src/jimmy/variables.py:10-52) and a
default recursive file walker (converter.py:239-387).  The engine's
input is tabular, so sources reduce to: (a) the Ray Data readers for
the on-disk formats, and (b) a per-row format-dispatch stage for rows
that carry heterogeneous payloads (the default-converter analogue — a
``format`` column selects the parser inside one map_batches).
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

SOURCE_REGISTRY: dict[str, Callable] = {}


def source(name: str):
    def deco(fn):
        SOURCE_REGISTRY[name] = fn
        return fn

    return deco


@source("parquet")
def read_parquet(paths, **kwargs):
    import ray.data as rd

    return rd.read_parquet(paths, **kwargs)


@source("json")
def read_json(paths, **kwargs):
    import ray.data as rd

    return rd.read_json(paths, **kwargs)


@source("csv")
def read_csv(paths, **kwargs):
    import ray.data as rd

    return rd.read_csv(paths, **kwargs)


@source("text")
def read_text(paths, **kwargs):
    """One row per line (the folder-of-markdown family, SURVEY S11)."""
    import ray.data as rd

    return rd.read_text(paths, **kwargs)


@source("binary")
def read_binary(paths, **kwargs):
    """(bytes, path) rows — the archive/binary-blob family (SURVEY S6/S10)."""
    import ray.data as rd

    return rd.read_binary_files(paths, include_paths=True, **kwargs)


@source("sqlite")
def read_sqlite(path, query: str = "SELECT * FROM notes", **kwargs):
    """SQLite-backed source (SURVEY S7: Anki/AFFiNE/QOwnNotes pattern —
    /root/reference/src/jimmy/formats/anki.py:108-157): the driver reads
    the database (sqlite connections don't shard) and hands the rows to
    Ray as an Arrow table; per-row conversion continues distributed."""
    import sqlite3

    import pyarrow as _pa
    import ray.data as rd

    con = sqlite3.connect(path)
    try:
        cur = con.execute(query)
        names = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()
    columns = {n: [r[i] for r in rows] for i, n in enumerate(names)}
    return rd.from_arrow(_pa.table(columns))


def sqlite_notes(sf_dir: str):
    """S7 end-to-end: documents → deterministic sqlite db → read back
    through the sqlite source → notes rows."""
    import os
    import sqlite3

    import pyarrow.parquet as pq

    tag = os.path.basename(os.path.normpath(sf_dir))
    db = f"/tmp/jimmy_ray_sqlite_{tag}.db"
    if not os.path.exists(db):
        docs = pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
        tmp = db + f".tmp.{os.getpid()}"
        con = sqlite3.connect(tmp)
        con.execute("CREATE TABLE notes (doc_id INTEGER, title TEXT, body TEXT)")
        con.executemany(
            "INSERT INTO notes VALUES (?, ?, ?)",
            [(d, f"Doc {d}", t) for d, t in
             zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())],
        )
        con.commit()
        con.close()
        os.replace(tmp, db)
    return read_sqlite(db, "SELECT doc_id, title, body FROM notes")


def open_source(fmt: str, paths, **kwargs):
    reader = SOURCE_REGISTRY.get(fmt)
    if reader is None:
        raise KeyError(f"unknown source format {fmt!r}; have {sorted(SOURCE_REGISTRY)}")
    return reader(paths, **kwargs)


# --- per-row format dispatch (default-converter analogue) ------------------

# extension → logical format, mirrors the accepted-extension sets of
# variables.py:10-52 (subset relevant to byte payloads in a lakehouse)
EXTENSION_FORMATS = {
    ".md": "markdown", ".mdown": "markdown", ".markdown": "markdown",
    ".txt": "text",
    ".html": "html", ".htm": "html", ".xhtml": "html",
    ".json": "json",
    ".xml": "xml",
    ".eml": "eml",
    ".enex": "enex",
    ".pdf": "pdf",
    ".t2t": "t2t",
    ".tid": "tiddlywiki",
    ".docx": "docx",
    ".odt": "odt",
    ".rtf": "rtf",
    ".adoc": "asciidoc", ".asciidoc": "asciidoc",
    ".fountain": "fountain",
    ".epub": "epub",
    ".opml": "opml",
    ".org": "org",
    ".rst": "rst", ".rest": "rst",
    ".tex": "latex",
    ".doku": "dokuwiki",
    ".textile": "textile",
}


def detect_format(path: str) -> str:
    dot = path.rfind(".")
    ext = path[dot:].lower() if dot >= 0 else ""
    return EXTENSION_FORMATS.get(ext, "binary")


class FormatDispatchStage:
    """map_batches stage: route each row's payload through the parser for
    its ``format`` column (converter-per-extension, converter.py:243-316).

    Parsers registered per format; unknown formats fall back to the
    default (payload passed through, error column set) — row-level fault
    isolation per SURVEY.md §2.9.
    """

    def __init__(self, parsers: dict[str, Callable[[bytes], str]] | None = None):
        from jimmy_ray.html import extract as hx
        from jimmy_ray.md import wikitext as wt

        def _txt(fn):
            return lambda b: fn(b.decode("utf-8", errors="replace"))

        self.parsers: dict[str, Callable[[bytes], str]] = {
            "html": lambda b: hx.html_to_markdown(b),
            "markdown": lambda b: b.decode("utf-8", errors="replace"),
            "text": lambda b: b.decode("utf-8", errors="replace"),
            # wiki-markup family (SURVEY §2.2 M5-M9)
            "tiddlywiki": _txt(wt.tiddlywiki_to_md),
            "zim": _txt(wt.zim_to_md),
            "zettelkasten": _txt(wt.bbcode_to_md),
            "roam": _txt(wt.roam_to_md),
            "colornote": _txt(wt.colornote_to_md),
            # round-2 payload parsers (each the module's pure-fn core)
            "enex": lambda b: __import__(
                "jimmy_ray.md.enex", fromlist=["x"]
            ).enex_body_to_md(b.decode("utf-8", errors="replace"))[0],
            "pdf": lambda b: __import__(
                "jimmy_ray.sources.pdf", fromlist=["x"]
            ).extract_pdf_text(b),
            "t2t": _txt(__import__(
                "jimmy_ray.sources.journals", fromlist=["x"]
            ).t2t_to_md),
            "lexical": _txt(__import__(
                "jimmy_ray.md.lexical", fromlist=["x"]
            ).super_to_markdown),
            # round-4 word-processor readers (pandoc-gap formats served
            # natively; sources/wordproc.py)
            "docx": lambda b: __import__(
                "jimmy_ray.sources.wordproc", fromlist=["x"]
            ).docx_to_markdown(b),
            "odt": lambda b: __import__(
                "jimmy_ray.sources.wordproc", fromlist=["x"]
            ).odt_to_markdown(b),
            "rtf": lambda b: __import__(
                "jimmy_ray.sources.wordproc", fromlist=["x"]
            ).rtf_to_markdown(b),
            "asciidoc": _txt(__import__(
                "jimmy_ray.sources.lightmarkup", fromlist=["x"]
            ).asciidoc_to_md),
            "mediawiki": _txt(__import__(
                "jimmy_ray.sources.lightmarkup", fromlist=["x"]
            ).mediawiki_to_md),
            "fountain": _txt(__import__(
                "jimmy_ray.sources.lightmarkup", fromlist=["x"]
            ).fountain_to_md),
            "epub": lambda b: __import__(
                "jimmy_ray.sources.epub", fromlist=["x"]
            ).epub_to_markdown(b),
            "opml": lambda b: __import__(
                "jimmy_ray.sources.epub", fromlist=["x"]
            ).opml_to_markdown(b),
            "org": _txt(__import__(
                "jimmy_ray.sources.texmarkup", fromlist=["x"]
            ).org_to_md),
            "rst": _txt(__import__(
                "jimmy_ray.sources.texmarkup", fromlist=["x"]
            ).rst_to_md),
            "latex": _txt(__import__(
                "jimmy_ray.sources.texmarkup", fromlist=["x"]
            ).latex_to_md),
            "dokuwiki": _txt(__import__(
                "jimmy_ray.sources.lightmarkup", fromlist=["x"]
            ).dokuwiki_to_md),
            "textile": _txt(__import__(
                "jimmy_ray.sources.lightmarkup", fromlist=["x"]
            ).textile_to_md),
        }
        if parsers:
            self.parsers.update(parsers)

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch["format"].to_pylist()
        payloads = batch["payload"].to_pylist()
        texts: list[str] = []
        errors: list[str | None] = []
        for fmt, payload in zip(fmts, payloads):
            parser = self.parsers.get(fmt)
            if parser is None:
                texts.append("")
                errors.append(f"no parser for format {fmt!r}")
                continue
            try:
                texts.append(parser(payload))
                errors.append(None)
            except Exception as exc:  # noqa: BLE001 dead-letter semantics
                texts.append("")
                errors.append(f"{type(exc).__name__}: {exc}")
        out = {name: batch[name] for name in batch.column_names
               if name != "payload"}
        out["text"] = pa.array(texts, pa.string())
        out["error"] = pa.array(errors, pa.string())
        return pa.table(out)
