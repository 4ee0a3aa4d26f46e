"""XML note formats round 2: Tomboy-ng markup walk, Diaro table joins (S9).

- Tomboy-ng (/root/reference/src/jimmy/formats/tomboy_ng.py:10-56):
  namespaced ``note-content`` whose child elements carry the formatting
  (bold/large/huge → ``**``, highlight → ``==``, italic → ``*``,
  monospace → backticks, strikeout/underline, list/list-item bullets,
  ``internal`` wikilinks), with the ``tail`` text interleaving the
  reference preserves.
- Diaro (formats/diaro.py:20-131): one XML of ``<table name=...>`` rows
  where entries reference folders/tags/locations by uid — three id-map
  joins (folder title, comma-separated tag ids, location lat/lon) plus
  date-prefixed titles.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa

# --- Tomboy-ng -------------------------------------------------------------

TOMBOY_NS = "http://beatniksoftware.com/tomboy"


def synth_tomboy(doc_id: int, text: str) -> bytes:
    return (
        f'<note xmlns="{TOMBOY_NS}" version="0.3">'
        f"<title>Doc {doc_id}</title>"
        "<text><note-content>"
        f"intro <bold>b{doc_id}</bold> mid <italic>i{doc_id}</italic> "
        f"<highlight>h{doc_id}</highlight> <monospace>m{doc_id}</monospace> "
        f"<strikeout>s{doc_id}</strikeout> "
        f"<list><list-item>item A</list-item>"
        f"<list-item>item {doc_id}</list-item></list>"
        f"<internal>Doc {doc_id - 1}</internal> tail {text}"
        "</note-content></text></note>"
    ).encode("utf-8")


def parse_tomboy_content(node) -> tuple[str, list[str]]:
    """tomboy_ng.py:10-56 semantics (tag-suffix dispatch, tail weaving)."""
    links: list[str] = []
    parts: list[str] = [node.text] if node.text else []
    for idx, child in enumerate(node):
        tag = child.tag
        txt = child.text or ""
        if tag.endswith(("bold", "large", "huge")):
            parts.append(f"**{txt}**")
        elif tag.endswith("highlight"):
            parts.append(f"=={txt}==")
        elif tag.endswith("italic"):
            parts.append(f"*{txt}*")
        elif tag.endswith("list"):
            for item in child:
                if item.tag.endswith("list-item"):
                    parts.append(f"- {item.text}")
        elif tag.endswith("monospace"):
            parts.append(f"`{txt}`")
        elif tag.endswith("strikeout"):
            parts.append(f"~~{txt}~~")
        elif tag.endswith("underline"):
            if idx != 0:  # first underline is the repeated title
                parts.append(f"++{txt}++")
        elif tag.endswith("small"):
            parts.append(txt)
        elif tag.endswith("internal"):
            parts.append(f"[[{txt}]]")
            links.append(txt)
        if child.tail:
            parts.append(child.tail)
    if node.tail:
        parts.append(node.tail)
    return "".join(parts).strip(), links


def tomboy_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, titles, bodies, links = [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            root = ET.fromstring(synth_tomboy(doc_id, text))
            title = root.findtext(f"{{{TOMBOY_NS}}}title", "")
            content = root.find(
                f"{{{TOMBOY_NS}}}text/{{{TOMBOY_NS}}}note-content")
            body, note_links = parse_tomboy_content(content)
            ids.append(doc_id)
            titles.append(title)
            bodies.append(body)
            links.append(",".join(note_links))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "title": pa.array(titles, pa.string()),
            "body": pa.array(bodies, pa.string()),
            "note_links": pa.array(links, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


def sql_tomboy_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    body = (
        f"'intro **b' || {i} || '** mid *i' || {i} || '* ==h' || {i} || "
        f"'== `m' || {i} || '` ~~s' || {i} || '~~ - item A- item ' || {i} "
        f"|| '[[Doc ' || CAST(doc_id - 1 AS VARCHAR) || ']] tail ' || text"
    )
    return f"""
SELECT doc_id, 'Doc ' || {i} AS title, {body} AS body,
       'Doc ' || CAST(doc_id - 1 AS VARCHAR) AS note_links
FROM documents
"""


# --- Diaro -----------------------------------------------------------------

DIARO_EPOCH_MS = 1_700_000_000_000


def synth_diaro(doc_id: int, text: str) -> bytes:
    folder = doc_id % 4
    tag_rows = "".join(
        f"<r><uid>t{g}</uid><title>dtag{g}</title></r>" for g in range(3)
    )
    return (
        "<data>"
        "<table name='diaro_folders'>"
        f"<r><uid>f{folder}</uid><title>Folder {folder}</title></r>"
        "</table>"
        f"<table name='diaro_tags'>{tag_rows}</table>"
        "<table name='diaro_locations'>"
        f"<r><uid>loc{doc_id}</uid><lat>10.5</lat><lng>-20.25</lng></r>"
        "</table>"
        "<table name='diaro_entries'><r>"
        f"<uid>e{doc_id}</uid>"
        f"<date>{DIARO_EPOCH_MS + doc_id * 1000}</date>"
        f"<title>Entry {doc_id}</title>"
        f"<text>{text}</text>"
        f"<folder_uid>f{folder}</folder_uid>"
        f"<location_uid>loc{doc_id}</location_uid>"
        f"<tags>t{doc_id % 3}, t{(doc_id + 1) % 3}</tags>"
        "</r></table></data>"
    ).encode("utf-8")


def parse_diaro(payload: bytes) -> list[dict]:
    """diaro.py:20-131 semantics: build uid maps, then join per entry."""
    import datetime as _dt

    root = ET.fromstring(payload)

    def rows(table_name):
        t = root.find(f"./table[@name='{table_name}']")
        return [] if t is None else t.findall("r")

    folders = {r.findtext("uid"): r.findtext("title") for r in rows("diaro_folders")}
    tags = {r.findtext("uid"): r.findtext("title") for r in rows("diaro_tags")}
    locations = {
        r.findtext("uid"): (r.findtext("lat"), r.findtext("lng"))
        for r in rows("diaro_locations")
    }
    out: list[dict] = []
    for r in rows("diaro_entries"):
        ts_ms = int(r.findtext("date"))
        date = _dt.datetime.fromtimestamp(ts_ms // 1000, _dt.timezone.utc)
        title = f"{date.strftime('%Y-%m-%d')} {r.findtext('title', '')}".strip()
        tag_titles = [
            tags[t.strip()] for t in (r.findtext("tags") or "").split(",")
            if t.strip() and t.strip() in tags
        ]
        lat, lng = locations.get(r.findtext("location_uid"), ("", ""))
        out.append({
            "title": title,
            "body": r.findtext("text") or "",
            "notebook": folders.get(r.findtext("folder_uid"), ""),
            "tags": ",".join(tag_titles),
            "lat": lat,
            "lng": lng,
        })
    return out


def diaro_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in (
            "doc_id", "title", "body", "notebook", "tags", "lat", "lng")}
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for row in parse_diaro(synth_diaro(doc_id, text)):
                cols["doc_id"].append(doc_id)
                for k in ("title", "body", "notebook", "tags", "lat", "lng"):
                    cols[k].append(row[k])
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            **{k: pa.array(cols[k], pa.string())
               for k in ("title", "body", "notebook", "tags", "lat", "lng")},
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


def sql_diaro_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    from jimmy_ray.scalars.dates import sql_utc_strftime

    date = sql_utc_strftime(f"({DIARO_EPOCH_MS} + doc_id * 1000) // 1000",
                            "%Y-%m-%d")
    return f"""
SELECT doc_id,
  {date} || ' Entry ' || {i} AS title,
  text AS body,
  'Folder ' || CAST(doc_id % 4 AS VARCHAR) AS notebook,
  'dtag' || CAST(doc_id % 3 AS VARCHAR) || ',dtag'
    || CAST((doc_id + 1) % 3 AS VARCHAR) AS tags,
  '10.5' AS lat, '-20.25' AS lng
FROM documents
"""
