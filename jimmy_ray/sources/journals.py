"""Journal-shaped readers: RedNotebook YAML months, Roam outline JSON (S8).

- RedNotebook (/root/reference/src/jimmy/formats/rednotebook.py:57-100):
  each month is a YAML file mapping day-number → ``{"text": txt2tags}``,
  exploded 1:N into date-titled notes (the A2 month→day explode); the
  reference converts txt2tags via pandoc — here a minimal t2t→markdown
  scalar covers the constructs the fixtures use (bold/italic/code/
  heading/verbatim), documented as the pandoc-free subset.
- Roam Research (/root/reference/src/jimmy/formats/roam_research.py:
  61-114): pages carry recursive ``children`` outlines; blocks render as
  4-space-indented bullets, ``heading`` blocks reset the level, TODO /
  DONE markers become checkboxes via ``roam_to_md``, inline ``#`` tags
  are collected from the rendered body.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

from jimmy_ray.md.tags import get_inline_tags
from jimmy_ray.md.wikitext import roam_to_md

# --- RedNotebook -----------------------------------------------------------

_T2T_ITALIC_RE = re.compile(r"//(.+?)//")
_T2T_CODE_RE = re.compile(r"``(.+?)``")
_T2T_HEAD_RE = re.compile(r"^= (.*?) =$", re.MULTILINE)


def t2t_to_md(text: str) -> str:
    """Minimal txt2tags → Markdown (bold passes through; the reference
    sends t2t to pandoc, rednotebook.py:78-80)."""
    text = _T2T_HEAD_RE.sub(r"# \1", text)
    text = _T2T_ITALIC_RE.sub(r"*\1*", text)
    return _T2T_CODE_RE.sub(r"`\1`", text)


def synth_month_yaml(doc_id: int, text: str) -> tuple[str, str]:
    """(month 'YYYY-MM', yaml body) — 2 day entries when doc_id%3==0."""
    import yaml

    month = f"2024-{1 + doc_id % 12:02d}"
    day0 = 1 + doc_id % 27
    entries = {
        day0: {"text": f"= Day {doc_id} =\n//intro// {text} #rn{doc_id % 3}"}
    }
    if doc_id % 3 == 0:
        entries[day0 + 1] = {"text": f"``code {doc_id}`` extra"}
    return month, yaml.safe_dump(entries)


def parse_month(month: str, yaml_text: str) -> list[dict]:
    import yaml

    out = []
    for day, data in sorted(yaml.safe_load(yaml_text).items()):
        body = t2t_to_md(data["text"])
        out.append({
            "title": f"{month}-{int(day):02d}",
            "body": body,
            "tags": ",".join(get_inline_tags(body, ["#"])),
        })
    return out


def rednotebook_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, titles, bodies, tags = [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            month, payload = synth_month_yaml(doc_id, text)
            for row in parse_month(month, payload):
                ids.append(doc_id)
                titles.append(row["title"])
                bodies.append(row["body"])
                tags.append(row["tags"])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "title": pa.array(titles, pa.string()),
            "body": pa.array(bodies, pa.string()),
            "tags": pa.array(tags, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


def sql_rednotebook_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    month = "lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0')"
    d0 = "lpad(CAST(1 + doc_id % 27 AS VARCHAR), 2, '0')"
    d1 = "lpad(CAST(2 + doc_id % 27 AS VARCHAR), 2, '0')"
    day0_body = (
        f"'# Day ' || {i} || chr(10) || '*intro* ' || text || ' #rn' "
        f"|| CAST(doc_id % 3 AS VARCHAR)"
    )
    return f"""
SELECT doc_id, '2024-' || {month} || '-' || {d0} AS title,
       {day0_body} AS body,
       'rn' || CAST(doc_id % 3 AS VARCHAR) AS tags
FROM documents
UNION ALL
SELECT doc_id, '2024-' || {month} || '-' || {d1} AS title,
       '`code ' || {i} || '` extra' AS body, '' AS tags
FROM documents WHERE doc_id % 3 = 0
"""


# --- Roam Research ---------------------------------------------------------

def synth_roam_page(doc_id: int, text: str) -> str:
    return json.dumps({
        "title": f"Doc {doc_id}",
        "uid": f"p{doc_id}",
        "create-time": 1_700_000_000_000 + doc_id,
        "children": [
            {"string": f"point a {doc_id}", "uid": f"b{doc_id}a",
             "children": [{"string": f"sub {text}", "uid": f"b{doc_id}s"}]},
            {"string": f"Head {doc_id}", "heading": 2, "uid": f"b{doc_id}h"},
            {"string": f"{{{{[[TODO]]}}}} task #roam{doc_id % 3}",
             "uid": f"b{doc_id}t"},
        ],
    })


def _walk_children(children: list, level: int = 0) -> tuple[list[str], list[str]]:
    """roam_research.py:61-90 outline rendering semantics."""
    lines: list[str] = []
    uids: list[str] = []
    for child in children:
        string_ = child["string"]
        uids.append(child["uid"])
        if (heading := child.get("heading")) is not None:
            prefix = "#" * heading + " "
            level = -1
        elif string_.strip() == "---":
            prefix = ""
            level = -1
        else:
            prefix = " " * 4 * level + "- "
        lines.append(prefix + string_)
        sub_lines, sub_uids = _walk_children(child.get("children", []),
                                             level + 1)
        lines.extend(sub_lines)
        uids.extend(sub_uids)
    return lines, uids


def parse_roam_page(raw: str) -> dict:
    page = json.loads(raw)
    lines, uids = _walk_children(page.get("children", []))
    body = roam_to_md("\n".join(lines))
    return {
        "title": page["title"].strip(),
        "body": body,
        "tags": ",".join(get_inline_tags(body, ["#"])),
        "n_blocks": len(uids),
    }


def roam_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        rows = [
            parse_roam_page(synth_roam_page(i, t))
            for i, t in zip(batch["doc_id"].to_pylist(),
                            batch["text"].to_pylist())
        ]
        return pa.table({
            "doc_id": batch["doc_id"],
            "title": pa.array([r["title"] for r in rows], pa.string()),
            "body": pa.array([r["body"] for r in rows], pa.string()),
            "tags": pa.array([r["tags"] for r in rows], pa.string()),
            "n_blocks": pa.array([r["n_blocks"] for r in rows], pa.int64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


def sql_roam_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    body = (
        f"'- point a ' || {i} || chr(10) || "
        f"'    - sub ' || text || chr(10) || "
        f"'## Head ' || {i} || chr(10) || "
        f"'- [ ] task #roam' || CAST(doc_id % 3 AS VARCHAR)"
    )
    return f"""
SELECT doc_id, 'Doc ' || {i} AS title, {body} AS body,
       'roam' || CAST(doc_id % 3 AS VARCHAR) AS tags,
       CAST(4 AS BIGINT) AS n_blocks
FROM documents
"""
