"""Archive-shaped readers: Zettelkasten zkn3, Bear/Textbundle (S9/S11).

- Zettelkasten (/root/reference/src/jimmy/formats/zettelkasten.py:61-136):
  a ``.zkn3`` zip carrying ``keywordFile.xml`` (tag-id → name map) and
  ``zknFile.xml`` (zettel elements whose BBCode content converts via
  ``bbcode_to_md``; keyword ids resolve through the map — the J3 tag
  id-join).
- Textbundle / Bear (formats/textbundle.py:47-121): folders of
  ``*.textbundle/{text.md, info.json}``; title = bundle stem, first-line
  header split, Bear's stray ``\\#`` unescape, inline ``#`` tags, and
  pinned/trashed/archived pseudo-tags from the ``net.shinyfrog.bear``
  metadata block.
"""

from __future__ import annotations

import io
import json
import xml.etree.ElementTree as ET
import zipfile

import pyarrow as pa

from jimmy_ray.md.tags import get_inline_tags
from jimmy_ray.md.text import split_title_from_body
from jimmy_ray.md.wikitext import bbcode_to_md

# --- Zettelkasten zkn3 ------------------------------------------------------


def synth_zkn3(doc_id: int, text: str) -> bytes:
    keywords = "".join(
        f'<entry f="{g}">ztag{g}</entry>' for g in range(5)
    )
    zettel = (
        "<zettel>"
        f"<title>Doc {doc_id}</title>"
        f"<content>[f]bold {doc_id}[/f] {text}</content>"
        f"<author>author{doc_id % 3}</author>"
        f"<keywords>{doc_id % 5},{(doc_id + 1) % 5}</keywords>"
        "</zettel>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("keywordFile.xml", f"<keywords>{keywords}</keywords>")
        zf.writestr("zknFile.xml", f"<zkn>{zettel}</zkn>")
    return buf.getvalue()


def parse_zkn3(payload: bytes) -> list[dict]:
    """zettelkasten.py:61-136 semantics on one archive."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        kw_root = ET.fromstring(zf.read("keywordFile.xml"))
        zkn_root = ET.fromstring(zf.read("zknFile.xml"))
    tag_map = {
        e.attrib["f"]: e.text for e in kw_root.findall("entry")
        if e.attrib.get("f") is not None
    }
    out: list[dict] = []
    for idx, zettel in enumerate(zkn_root.findall("zettel"), start=1):
        title = zettel.findtext("title", "")
        body = bbcode_to_md(zettel.findtext("content", "") or "")
        author = zettel.findtext("author", "")
        tags = []
        kw = zettel.findtext("keywords", "")
        if kw:
            tags = [tag_map.get(t, t) for t in kw.split(",")]
        out.append({
            "zettel_id": idx,
            "title": title,
            "body": body,
            "author": author,
            "tags": ",".join(tags),
        })
    return out


def zettelkasten_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in (
            "doc_id", "title", "body", "author", "tags")}
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for row in parse_zkn3(synth_zkn3(doc_id, text)):
                cols["doc_id"].append(doc_id)
                for k in ("title", "body", "author", "tags"):
                    cols[k].append(row[k])
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            **{k: pa.array(cols[k], pa.string())
               for k in ("title", "body", "author", "tags")},
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=256)


def sql_zettelkasten_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id,
  'Doc ' || {i} AS title,
  '**bold ' || {i} || '** ' || text AS body,
  'author' || CAST(doc_id % 3 AS VARCHAR) AS author,
  'ztag' || CAST(doc_id % 5 AS VARCHAR) || ',ztag'
    || CAST((doc_id + 1) % 5 AS VARCHAR) AS tags
FROM documents
"""


# --- Textbundle / Bear -------------------------------------------------------


def synth_textbundle(doc_id: int, text: str) -> bytes:
    info = {
        "version": 2,
        "type": "net.daringfireball.markdown",
        "net.shinyfrog.bear": {
            "creationDate": "2024-01-01T00:00:00Z",
            "pinned": 1 if doc_id % 4 == 0 else 0,
            "trashed": 1 if doc_id % 10 == 1 else 0,
            "archived": 0,
        },
    }
    md = (
        f"# Doc {doc_id}\n\n{text} \\#notatag #btag{doc_id % 3} end"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(f"Doc {doc_id}.textbundle/text.md", md)
        zf.writestr(f"Doc {doc_id}.textbundle/info.json", json.dumps(info))
        zf.writestr(f"Doc {doc_id}.textbundle/assets/a.png", b"x")
    return buf.getvalue()


def parse_textbundle(payload: bytes) -> list[dict]:
    """textbundle.py:47-121 semantics on one bundle zip."""
    out: list[dict] = []
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        bundles: dict[str, dict[str, bytes]] = {}
        for name in zf.namelist():
            parts = name.split("/")
            if len(parts) < 2 or not parts[0].endswith(".textbundle"):
                continue
            bundles.setdefault(parts[0], {})[ "/".join(parts[1:])] = zf.read(name)
    for bundle, files in sorted(bundles.items()):
        md_name = next((n for n in files if n.endswith(".md")
                        and "/" not in n), None)
        if md_name is None:
            continue
        metadata = json.loads(files.get("info.json", b"{}"))
        title = bundle[: -len(".textbundle")]
        _, body = split_title_from_body(files[md_name].decode("utf-8"))
        body = body.replace("\\#", "#")  # bear escaping quirk
        tags = get_inline_tags(body, ["#"])
        bear = metadata.get("net.shinyfrog.bear", {})
        for key in ("pinned", "trashed", "archived"):
            if bool(int(bear.get(key, 0))):
                tags.append(f"bear-{key}")
        out.append({
            "title": title,
            "body": body,
            "tags": ",".join(tags),
            "created": bear.get("creationDate", ""),
        })
    return out


def textbundle_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in (
            "doc_id", "title", "body", "tags", "created")}
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for row in parse_textbundle(synth_textbundle(doc_id, text)):
                cols["doc_id"].append(doc_id)
                for k in ("title", "body", "tags", "created"):
                    cols[k].append(row[k])
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            **{k: pa.array(cols[k], pa.string())
               for k in ("title", "body", "tags", "created")},
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=256)


def sql_textbundle_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id,
  'Doc ' || {i} AS title,
  text || ' #notatag #btag' || CAST(doc_id % 3 AS VARCHAR) || ' end' AS body,
  'btag' || CAST(doc_id % 3 AS VARCHAR) || ',notatag'
    || (CASE WHEN doc_id % 4 = 0 THEN ',bear-pinned' ELSE '' END)
    || (CASE WHEN doc_id % 10 = 1 THEN ',bear-trashed' ELSE '' END) AS tags,
  '2024-01-01T00:00:00Z' AS created
FROM documents
"""
