"""AFFiNE block-document reader over a real Yjs workspace store.

Behavior port of /root/reference/src/jimmy/formats/affine.py:13-199.
The reference applies the yjs CRDT updates with ``pycrdt``; since
round 4 that decode is REAL here — ``jimmy_ray.scalars.yjs`` implements
the published Yjs v1 update format (lib0 varints, item info bits,
ContentAny/String/Type, single-writer snapshot integration), and the
fixture ships the real container layout: a SQLite ``snapshots`` table
holding one update per doc (workspace meta + per-page block docs,
affine.py:202-245's input shape).  The block renderer downstream is
the same ported logic:

- root = the ``affine:page`` block; recursion over ``sys:children``
- paragraphs (``text`` / ``h1``-``h6``), lists (bulleted / numbered /
  todo, 4-space depth indent that increments only through list blocks)
- latex → ``$...$``, image → ``![id](id)``, bookmark / embed-youtube →
  links, embed-synced-doc → note link on ``prop:pageId``
- tables: ``prop:columns…order`` / row ``.order`` keys sorted into a
  grid, ``prop:cells.<row>:<col>`` values placed, empty header row
- database / surface / frame placeholders exactly as the reference
- page tags joined via tag ids; created/updated from page metadata

The fixture synthesizes one decoded workspace per document (page +
blocks exercising every flavour) with a DuckDB SQL mirror.
"""

from __future__ import annotations

import json

import pyarrow as pa

from jimmy_ray.md.links import make_link

EPOCH_MS = 1_700_000_000_000


def convert_table(block: dict) -> str:
    """affine.py:13-40: order keys → grid → pipe table (empty header)."""
    column_order: dict[str, float] = {}
    row_order: dict[str, float] = {}
    for key, value in block.items():
        if key.endswith(".order"):
            if key.startswith("prop:columns"):
                column_order[key.split(".")[1]] = value
            else:
                row_order[key.split(".")[1]] = value
    column_order = {k: i for i, k in enumerate(
        sorted(column_order, key=column_order.get))}
    row_order = {k: i for i, k in enumerate(
        sorted(row_order, key=row_order.get))}

    table = [["" for _ in column_order] for _ in row_order]
    for key, value in block.items():
        if key.startswith("prop:cells"):
            row, col = key.split(".")[1].split(":")
            table[row_order[row]][column_order[col]] = str(value)

    lines = ["| " + " | ".join([""] * len(column_order)) + " |",
             "| " + " | ".join(["---"] * len(column_order)) + " |"]
    for row in table:
        lines.append("| " + " | ".join(row) + " |")
    return "\n".join(lines)


def extract_blocks(blocks: dict, block_id: str, depth: int = 0
                   ) -> tuple[list[str], list[str]]:
    """affine.py:120-199 recursive renderer → (lines, note_link ids)."""
    block = blocks.get(block_id, {})
    flavour = block.get("sys:flavour")
    btype = block.get("prop:type")
    lines: list[str] = []
    note_links: list[str] = []
    if flavour == "affine:database":
        lines.append(f'Affine Database "{block["prop:title"]}"')
    elif flavour == "affine:embed-synced-doc":
        page_id = str(block.get("prop:pageId", ""))
        note_links.append(page_id)
        lines.append(make_link("note_link", page_id))
    elif flavour in ("affine:bookmark", "affine:embed-youtube"):
        lines.append(make_link(str(block.get("prop:title", "")),
                               str(block.get("prop:url", ""))))
    elif flavour == "affine:edgeless-text":
        pass
    elif flavour == "affine:frame":
        text = str(block.get("prop:title", ""))
        if (description := block.get("prop:description")) is not None:
            text += f": {description}"
        lines.append(text)
    elif flavour == "affine:image":
        image_id = block.get("prop:sourceId")
        lines.append(f"![{image_id}]({image_id})")
    elif flavour == "affine:latex":
        lines.append(f"${block.get('prop:latex', '')}$")
    elif flavour == "affine:list":
        text = block.get("prop:text", "")
        if btype == "bulleted":
            lines.append("    " * depth + f"- {text}")
        elif btype == "numbered":
            lines.append("    " * depth + f"1. {text}")
        elif btype == "todo":
            checked = block.get("prop:checked", False)
            lines.append("    " * depth
                         + f"- [{'x' if checked else ' '}] {text}")
    elif flavour == "affine:note":
        pass
    elif flavour == "affine:page":
        lines.append(f"# {block['prop:title']}")
    elif flavour == "affine:paragraph":
        if btype in ("h1", "h2", "h3", "h4", "h5", "h6"):
            lines.append(f"{'#' * int(btype[-1])} {block.get('prop:text', '')}")
        elif btype == "text":
            lines.append(str(block.get("prop:text", "")))
    elif flavour == "affine:surface":
        if block["prop:elements"].get("value", {}):
            lines.append("Affine Surface")
    elif flavour == "affine:table":
        lines.append(convert_table(block))

    for child_id in block.get("sys:children", []):
        depth_increment = int(flavour == "affine:list")
        child_lines, child_links = extract_blocks(
            blocks, child_id, depth=depth + depth_increment)
        lines.extend(child_lines)
        note_links.extend(child_links)
    return lines, note_links


def synth_affine(doc_id: int, text: str) -> str:
    """Decoded workspace: page metadata + block map + tag table."""
    blocks = {
        "root": {"sys:flavour": "affine:page",
                 "prop:title": f"Affine {doc_id}",
                 "sys:children": ["n1"]},
        "n1": {"sys:flavour": "affine:note",
               "sys:children": ["p1", "h1", "l1", "lx", "im", "bm",
                                "sd", "tb", "sf"]},
        "p1": {"sys:flavour": "affine:paragraph", "prop:type": "text",
               "prop:text": text},
        "h1": {"sys:flavour": "affine:paragraph", "prop:type": "h2",
               "prop:text": f"Section {doc_id}"},
        "l1": {"sys:flavour": "affine:list", "prop:type": "bulleted",
               "prop:text": "top", "sys:children": ["l2"]},
        "l2": {"sys:flavour": "affine:list", "prop:type": "todo",
               "prop:checked": doc_id % 2 == 0, "prop:text": "nested"},
        "lx": {"sys:flavour": "affine:latex",
               "prop:latex": f"x^{doc_id % 9}"},
        "im": {"sys:flavour": "affine:image",
               "prop:sourceId": f"blob{doc_id}"},
        "bm": {"sys:flavour": "affine:bookmark",
               "prop:title": f"Site {doc_id}",
               "prop:url": f"https://a.example/{doc_id}"},
        "sd": {"sys:flavour": "affine:embed-synced-doc",
               "prop:pageId": f"page-{doc_id + 1}"},
        "tb": {"sys:flavour": "affine:table",
               "prop:columns.cA.order": "a1", "prop:columns.cB.order": "a2",
               "prop:rows.r1.order": "b1", "prop:rows.r2.order": "b2",
               "prop:cells.r1:cA": f"v{doc_id}", "prop:cells.r1:cB": "w",
               "prop:cells.r2:cA": "x", "prop:cells.r2:cB": "y"},
        "sf": {"sys:flavour": "affine:surface",
               "prop:elements": {"value": {}}},  # empty: dropped
    }
    return json.dumps({
        "pages": [{"id": f"page-{doc_id}", "title": f"Affine {doc_id}",
                   "tags": [f"t{doc_id % 3}", "t-missing"],
                   "createDate": EPOCH_MS + doc_id * 1000,
                   "updatedAt": EPOCH_MS + doc_id * 1000 + 500}],
        "blocks": {f"page-{doc_id}": blocks},
        "tags": {f"t{k}": f"atag{k}" for k in range(3)},
    })


def parse_affine(raw: str) -> list[dict]:
    data = json.loads(raw)
    all_tags = data.get("tags", {})
    rows = []
    for page in data.get("pages", []):
        page_id = page.get("id")
        blocks = data["blocks"].get(page_id)
        if blocks is None:
            continue
        root = None
        for bid, bdata in blocks.items():
            if bdata.get("sys:flavour") == "affine:page":
                root = bid
                break
        if root is None:
            continue
        lines, note_links = extract_blocks(blocks, root)
        rows.append({
            "page_id": page_id,
            "title": page.get("title", page_id),
            "body": "\n\n".join(lines),
            "tags": ",".join(all_tags[t] for t in page.get("tags", [])
                             if t in all_tags),
            "note_links": ",".join(note_links),
            "created_ms": page.get("createDate"),
            "updated_ms": page.get("updatedAt"),
        })
    return rows


# --- real workspace container (Yjs updates in a snapshots db) --------------

def synth_affine_store(doc_id: int, text: str) -> bytes:
    """The real .affine layout (affine.py:202-245's input): a SQLite
    ``snapshots(doc_id, data)`` table whose rows are Yjs v1 updates —
    one workspace meta doc (root ``meta`` map: name, pages, tag table)
    and one block doc per page (root ``blocks`` map), encoded by the
    pure-python codec in jimmy_ray.scalars.yjs."""
    import json as _json

    from jimmy_ray.scalars import sqlcipher, yjs

    data = _json.loads(synth_affine(doc_id, text))

    def enrich(block: dict) -> dict:
        return {k: yjs.YText(v) if k in ("prop:text", "prop:title")
                and isinstance(v, str) else v for k, v in block.items()}

    meta_doc = yjs.encode_doc({"meta": {
        "name": f"workspace-{doc_id}",
        "pages": data["pages"],
        "tags": data["tags"],
    }})
    rows = [["meta", meta_doc]]
    for page_id, blocks in data["blocks"].items():
        rows.append([page_id, yjs.encode_doc(
            {"blocks": {bid: enrich(b) for bid, b in blocks.items()}})])
    return sqlcipher.build_minidb("snapshots",
                                  ["doc_id TEXT", "data BLOB"], rows)


def parse_affine_store(payload: bytes) -> list[dict]:
    """Open the snapshots db, apply each Yjs update, find the workspace
    meta (the doc exposing a ``meta`` root, affine.py:219-227), then
    render each page's block doc — the pycrdt step served natively."""
    import sqlite3

    from jimmy_ray.scalars import yjs

    con = sqlite3.connect(":memory:")
    try:
        con.deserialize(payload)
        snapshots = con.execute(
            "SELECT doc_id, data FROM snapshots ORDER BY rowid").fetchall()
    finally:
        con.close()
    docs = {doc_id: yjs.decode_doc(raw) for doc_id, raw in snapshots}
    meta = next((d["meta"] for d in docs.values() if "meta" in d), None)
    if meta is None:
        raise ValueError("no workspace meta found in AFFiNE store")
    all_tags = meta.get("tags", {})
    rows = []
    for page in meta.get("pages", []):
        page_id = page.get("id")
        blocks = docs.get(page_id, {}).get("blocks")
        if blocks is None:
            continue
        root = next((bid for bid, b in blocks.items()
                     if b.get("sys:flavour") == "affine:page"), None)
        if root is None:
            continue
        lines, note_links = extract_blocks(blocks, root)
        rows.append({
            "page_id": page_id,
            "title": page.get("title", page_id),
            "body": "\n\n".join(lines),
            "tags": ",".join(all_tags[t] for t in page.get("tags", [])
                             if t in all_tags),
            "note_links": ",".join(note_links),
            "created_ms": page.get("createDate"),
            "updated_ms": page.get("updatedAt"),
        })
    return rows


def affine_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in (
            "doc_id", "page_id", "title", "body", "tags", "note_links",
            "created_ms", "updated_ms")}
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for row in parse_affine_store(synth_affine_store(doc_id, text)):
                cols["doc_id"].append(doc_id)
                for k, v in row.items():
                    cols[k].append(v)
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "page_id": pa.array(cols["page_id"], pa.string()),
            "title": pa.array(cols["title"], pa.string()),
            "body": pa.array(cols["body"], pa.string()),
            "tags": pa.array(cols["tags"], pa.string()),
            "note_links": pa.array(cols["note_links"], pa.string()),
            "created_ms": pa.array(cols["created_ms"], pa.int64()),
            "updated_ms": pa.array(cols["updated_ms"], pa.int64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


def sql_affine_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    nl = "chr(10) || chr(10)"
    table_md = (
        "'|  |  |' || chr(10) || '| --- | --- |' || chr(10) || "
        f"'| v' || {i} || ' | w |' || chr(10) || '| x | y |'"
    )
    return f"""
SELECT doc_id,
  'page-' || {i} AS page_id,
  'Affine ' || {i} AS title,
  '# Affine ' || {i} || {nl}
    || text || {nl}
    || '## Section ' || {i} || {nl}
    || '- top' || {nl}
    || '    - ' || (CASE WHEN doc_id % 2 = 0 THEN '[x]' ELSE '[ ]' END)
    || ' nested' || {nl}
    || '$x^' || CAST(doc_id % 9 AS VARCHAR) || '$' || {nl}
    || '![blob' || {i} || '](blob' || {i} || ')' || {nl}
    || '[Site ' || {i} || '](https://a.example/' || {i} || ')' || {nl}
    || '[note_link](page-' || CAST(doc_id + 1 AS VARCHAR) || ')' || {nl}
    || {table_md} AS body,
  'atag' || CAST(doc_id % 3 AS VARCHAR) AS tags,
  'page-' || CAST(doc_id + 1 AS VARCHAR) AS note_links,
  CAST({EPOCH_MS} + doc_id * 1000 AS BIGINT) AS created_ms,
  CAST({EPOCH_MS} + doc_id * 1000 + 500 AS BIGINT) AS updated_ms
FROM documents
"""
