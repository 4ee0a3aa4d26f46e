"""OneNote section reader (post-one2html HTML folder shape).

Behavior port of /root/reference/src/jimmy/formats/onenote.py:14-105.
The reference shells out to the ``one2html`` binary to turn ``.one``
sections into an HTML folder tree — that binary is the env-blocked
boundary (same class as pandoc; the ST1 subprocess-pool pattern would
carry it if the binary appeared).  Everything downstream is real logic
and is ported over the HTML tree shape:

- folders are sections (one level, nested folders ignored), ``.html``
  files are pages; title from ``<title>`` with filename-stem fallback
- the first ``<div>`` carries export metadata and is stripped
- link classification (:26-50): ``onedrive.live.com`` links parse the
  ``wd=target(...)`` query into ``section/page`` note links;
  ``onenote:`` links parse path stem + fragment; local ``.html`` links
  are note links, other existing local files are resources

The fixture synthesizes one section tree per document with a SQL mirror.
"""

from __future__ import annotations

from urllib.parse import parse_qs, unquote, urlparse

import pyarrow as pa

from jimmy_ray.html.extract import extract_title, html_to_markdown_filtered
from jimmy_ray.md.links import get_markdown_links


def classify_links(body: str, note_stem: str,
                   local_files: set[str]) -> tuple[list[str], list[str]]:
    """onenote.py:21-50 → (note_links, resources)."""
    note_links: list[str] = []
    resources: list[str] = []
    for link in get_markdown_links(body):
        link_url = unquote(link.url)
        if link_url.startswith("https://onedrive.live.com/"):
            # onenote.py:29-33 verbatim — including the reference quirk
            # that a trailing ')' of the target(...) wrapper stays on the
            # page name (their slice only removes the opening half)
            wd_string = parse_qs(urlparse(link.url).query)["wd"][0]
            parts = wd_string[len("target("):].split("|")
            section = parts[0][: -len(".one")]
            page = parts[1].split("/", maxsplit=1)[-1]
            note_links.append(f"{section}/{page}")
        elif link.is_web_link or link.is_mail_link:
            continue
        elif link_url.startswith("onenote:"):
            # this engine's MarkdownLink splits the fragment out of .url,
            # so the page comes from link.fragment (onenote.py:37-40
            # reads it off urlparse().fragment — same value)
            section = urlparse(link_url).path.rpartition("/")[2]
            section = section.rsplit(".", 1)[0]
            page = link.fragment.split("&")[0]
            note_links.append(f"{section}/{page}")
        elif link_url in local_files:
            if not link_url.endswith(".html"):
                resources.append(link_url)
            else:
                target_stem = link_url.rpartition("/")[2][: -len(".html")]
                note_links.append(f"{note_stem}/{target_stem}")
    return note_links, resources


def synth_onenote_tree(doc_id: int, text: str) -> dict[str, str]:
    """Section folder of page HTMLs + a sibling attachment file."""
    sec = f"Section {doc_id % 5}"
    page = (
        "<html><head><title>Page {i}</title></head><body>"
        "<div>exported-by-one2html metadata</div>"
        "<div>{text}</div>"
        '<div><a href="https://onedrive.live.com/view.aspx?'
        "wd=target%28Work.one%7Cabc%2FMeeting%20{i}%29\">od</a></div>"
        '<div><a href="onenote:Plans.one#Goals{i}&amp;x=1">on</a></div>'
        '<div><a href="other{i}.html">sibling</a></div>'
        '<div><a href="scan{i}.pdf">scan</a></div>'
        "</body></html>"
    ).format(i=doc_id, text=text)
    other = ("<html><head><title>Other {i}</title></head>"
             "<body><div>m</div><div>other body {i}</div></body></html>"
             ).format(i=doc_id)
    return {
        f"{sec}/Page {doc_id}.html": page,
        f"{sec}/other{doc_id}.html": other,
        f"{sec}/scan{doc_id}.pdf": "%PDF-fake",
        f"{sec}/nested/skipme.html": "nested folders are ignored",
        "toc.onetoc2.txt": "non-html at top level: ignored",
    }


def parse_onenote(files: dict[str, str]) -> list[dict]:
    rows = []
    for path in sorted(files):
        parts = path.split("/")
        if len(parts) != 2 or not path.endswith(".html"):
            continue  # one section level; nested folders / non-html skipped
        section, name = parts
        html = files[path]
        stem = name[: -len(".html")]
        title = extract_title(html) or stem
        # strip the metadata first-div before rendering
        meta_start = html.find("<div>")
        meta_end = html.find("</div>", meta_start)
        stripped = html[:meta_start] + html[meta_end + len("</div>"):]
        body = html_to_markdown_filtered(stripped, [])
        local = {p.split("/", 1)[1] for p in files
                 if p.startswith(f"{section}/") and p.count("/") == 1}
        note_links, resources = classify_links(body, stem, local)
        rows.append({
            "section": section,
            "title": title,
            "body": body,
            "note_links": ",".join(note_links),
            "resources": ",".join(resources),
        })
    return rows


def onenote_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in (
            "doc_id", "section", "title", "body", "note_links", "resources")}
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for row in parse_onenote(synth_onenote_tree(doc_id, text)):
                cols["doc_id"].append(doc_id)
                for k, v in row.items():
                    cols[k].append(v)
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            **{k: pa.array(cols[k], pa.string())
               for k in cols if k != "doc_id"},
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=256)


def sql_onenote_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    nl = "chr(10) || chr(10)"
    return f"""
SELECT doc_id,
  'Section ' || CAST(doc_id % 5 AS VARCHAR) AS section,
  'Other ' || {i} AS title,
  'other body ' || {i} AS body,
  '' AS note_links,
  '' AS resources
FROM documents
UNION ALL
SELECT doc_id,
  'Section ' || CAST(doc_id % 5 AS VARCHAR) AS section,
  'Page ' || {i} AS title,
  text || {nl}
    || '[od](https://onedrive.live.com/view.aspx?'
    || 'wd=target%28Work.one%7Cabc%2FMeeting%20' || {i} || '%29)' || {nl}
    || '[on](onenote:Plans.one#Goals' || {i} || '&x=1)' || {nl}
    || '[sibling](other' || {i} || '.html)' || {nl}
    || '[scan](scan' || {i} || '.pdf)' AS body,
  'Work/Meeting ' || {i} || '),Plans/Goals' || {i}
    || ',Page ' || {i} || '/other' || {i} AS note_links,
  'scan' || {i} || '.pdf' AS resources
FROM documents
ORDER BY doc_id, title
"""
