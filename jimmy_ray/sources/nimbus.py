"""Nimbus Note export reader: zip-of-note.html containers (S8/S9).

Behavior port of /root/reference/src/jimmy/formats/nimbus_note.py:

- each note is a zip holding ``note.html`` + an ``assets/`` folder
  (:74-90); title comes from ``<title>``, filename stem as fallback
- HTML → markdown through the five nimbus app filters
  (html_filter.py:231-383 → jimmy_ray.html.appfilters)
- link pass (:21-71): duplicated ``https:https://`` prefixes collapse in
  the body; ``nimbusnote://`` links become note links (fuzzy best-match
  against the export's title map in a second pass, :139-144);
  ``assets/...`` links that exist in the zip become resources;
  wrong-suffix references recover via stem matching
  (common.try_other_suffixes, common.py:205-217)
- unreferenced assets are appended as resources, ``theme.css`` skipped
  (:119-126)

The fixture synthesizes one note-zip per document exercising every
branch, with a DuckDB SQL mirror.
"""

from __future__ import annotations

import difflib
import io
import zipfile
from urllib.parse import unquote

import pyarrow as pa

from jimmy_ray.html.extract import extract_title, html_to_markdown_filtered
from jimmy_ray.md.links import get_markdown_links

_NIMBUS_FILTERS = [
    "nimbus_add_mark",
    "nimbus_add_note_links",
    "nimbus_streamline_lists",
    "nimbus_streamline_tables",
    "nimbus_strip_images",
]


def _try_other_suffixes(url: str, members: set[str]) -> str | None:
    """common.py:205-217 over zip members instead of a directory."""
    folder, _, name = url.rpartition("/")
    stem = name.rsplit(".", 1)[0]
    candidates = sorted(
        m for m in members
        if m.rpartition("/")[0] == folder and m != url
    )
    for cand in candidates:  # case sensitive first
        if cand.rpartition("/")[2].rsplit(".", 1)[0] == stem:
            return cand
    for cand in candidates:
        if cand.rpartition("/")[2].rsplit(".", 1)[0].lower() == stem.lower():
            return cand
    return None


# --- fixture synthesis ------------------------------------------------------

def synth_nimbus_zip(doc_id: int, text: str) -> bytes:
    html = (
        "<html><head><title>Doc {i} nimbus</title></head><body>"
        "<div>{text}</div>"
        '<div><span class="nn-marker">hot</span> take</div>'
        '<div><span class="mention-link" data-mention-name="Doc {i} nimbus notes">'
        "@mention</span></div>"
        '<div><a href="https:https://example.com/x{i}">dup</a></div>'
        '<div><img src="assets/img{i}.png" alt="pic" /></div>'
        '<div><a href="assets/data{i}.txt">report</a></div>'
        '<div>sized<span class="file-size">12 kB</span>'
        '<svg><path d="m0 0"/></svg></div>'
        '<ul><li class="list-item-number indent-0">one</li>'
        '<li class="list-item-number indent-1">sub</li></ul>'
        "</body></html>"
    ).format(i=doc_id, text=text)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("note.html", html)
        zf.writestr(f"assets/img{doc_id}.png", b"png")
        zf.writestr(f"assets/data{doc_id}.md", b"actual suffix differs")
        zf.writestr(f"assets/orphan{doc_id}.dat", b"unreferenced")
        zf.writestr("assets/theme.css", b"css")
    return buf.getvalue()


# --- container parse (reference semantics) ----------------------------------

def parse_nimbus_zip(payload: bytes, fallback_title: str) -> dict:
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        members = set(zf.namelist())
        if "note.html" not in members:
            raise ValueError("export structure not implemented (no note.html)")
        note_html = zf.read("note.html").decode("utf-8")

    title = extract_title(note_html) or fallback_title
    body = html_to_markdown_filtered(note_html, _NIMBUS_FILTERS).strip()

    note_links: list[str] = []
    resources: list[str] = []
    for link in get_markdown_links(body):
        if link.is_web_link or link.is_mail_link:
            continue
        if link.url.startswith("https:https://"):
            body = body.replace(link.url, link.url[len("https:"):])
            continue
        if "nimbusweb.me" in link.url:
            continue  # internal, no test data in the reference either
        if link.url.startswith("nimbusnote://"):
            note_links.append(unquote(link.url[len("nimbusnote://"):]))
        elif link.url.startswith("#"):
            continue
        elif link.url in members:
            resources.append(link.url.rpartition("/")[2])
        elif (other := _try_other_suffixes(link.url, members)) is not None:
            resources.append(other.rpartition("/")[2])

    linked = set(resources)
    for member in sorted(members):
        folder, _, name = member.rpartition("/")
        if folder != "assets" or name == "theme.css":
            continue
        if name not in linked:
            resources.append(name)

    return {"title": title, "body": body,
            "note_links": note_links, "resources": resources}


def improve_note_links(raw_links: list[str], title_map: dict) -> list[str]:
    """Second pass (:139-144): fuzzy best-match each stored link name
    against the export's title map (common.get_best_match)."""
    out = []
    for name in raw_links:
        if not title_map:
            continue
        ratios = [difflib.SequenceMatcher(None, name, t).ratio()
                  for t in title_map.values()]
        best = max(ratios)
        if best >= 0.6:
            out.append(list(title_map)[ratios.index(best)])
    return out


def nimbus_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, titles, bodies, links, res = [], [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            row = parse_nimbus_zip(synth_nimbus_zip(doc_id, text),
                                   f"note{doc_id}")
            # each fixture zip is its own export: the title map contains
            # this note, and the distorted mention resolves to it
            resolved = improve_note_links(
                row["note_links"], {row["title"]: row["title"]}
            )
            ids.append(doc_id)
            titles.append(row["title"])
            bodies.append(row["body"])
            links.append(",".join(resolved))
            res.append(",".join(row["resources"]))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "title": pa.array(titles, pa.string()),
            "body": pa.array(bodies, pa.string()),
            "note_links": pa.array(links, pa.string()),
            "resources": pa.array(res, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=256)


def sql_nimbus_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    nl = "chr(10) || chr(10)"
    return f"""
SELECT doc_id,
  'Doc ' || {i} || ' nimbus' AS title,
  text || {nl}
    || '==hot== take' || {nl}
    || '[Doc ' || {i} || ' nimbus notes](nimbusnote://Doc%20' || {i}
    || '%20nimbus%20notes)' || {nl}
    || '[dup](https://example.com/x' || {i} || ')' || {nl}
    || '![pic](assets/img' || {i} || '.png)' || {nl}
    || '[report](assets/data' || {i} || '.txt)' || {nl}
    || 'sized' || {nl}
    || '1. one' || chr(10) || '  1. sub' AS body,
  'Doc ' || {i} || ' nimbus' AS note_links,
  'img' || {i} || '.png,data' || {i} || '.md,orphan' || {i} || '.dat'
    AS resources
FROM documents
"""
