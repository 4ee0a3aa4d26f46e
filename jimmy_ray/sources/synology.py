"""Synology Note Station ``.nsx`` container reader (S9/ST4/J4 exemplar).

Behavior port of /root/reference/src/jimmy/formats/synology_note_station.py:
the nsx zip carries ``config.json`` (notebook + note id lists), one JSON
file per notebook/note, and ``file_<md5>`` attachment blobs:

- trash skip: notes whose ``parent_id`` ends in ``#00000000`` are
  dropped (:123-125)
- notebook parent join: ``parent_id`` → notebook title, falling back to
  the root notebook when unknown (:30-35)
- md5/ref resource matching (:98-117): attachments are discoverable only
  by the md5 embedded in the ``file_<md5>`` member name (thumbnails
  ``file_thumb*`` ignored, :184-190); a note attachment with a ``ref``
  registers that ref for link-time matching, one without becomes a
  direct resource
- ``notestation://`` body links resolve by best title-similarity match
  over the container's note titles (difflib ratio ≥ 0.6, common.py:373-399)
- relative links on clipped pages rebase onto the note's ``source_url``
  (:60-69) and rewrite the body in place
- content HTML → markdown through the synology app filters
  (html_filter.py:490-562 → jimmy_ray.html.appfilters)

The fixture synthesizes one nsx per document (two live notes + one
trashed, a referenced and an unreferenced attachment, a thumbnail, a
cross-note link and a relative clipped link) with a DuckDB SQL mirror.
"""

from __future__ import annotations

import difflib
import io
import json
import zipfile
from urllib.parse import urlparse

import pyarrow as pa

from jimmy_ray.html.extract import html_to_markdown_filtered
from jimmy_ray.md.links import get_markdown_links

_SYNO_FILTERS = ["synology_fix_checklists", "synology_fix_img_src"]
EPOCH_S = 1_700_000_000


def get_best_match(title: str, note_id_title_map: dict) -> str | None:
    """common.py:373-399: best difflib ratio over the title map, None
    below the 0.6 experience threshold."""
    if not note_id_title_map:
        return None
    ratios = [
        difflib.SequenceMatcher(None, title, ref).ratio()
        for ref in note_id_title_map.values()
    ]
    best = max(ratios)
    if best < 0.6:
        return None
    return list(note_id_title_map)[ratios.index(best)]


# --- fixture synthesis ------------------------------------------------------

def synth_nsx(doc_id: int, text: str) -> bytes:
    nb_id = f"nb_{doc_id % 3}"
    ts = EPOCH_S + doc_id
    notes = {
        f"note_{doc_id}_0": {
            "title": f"Doc {doc_id} alpha",
            "parent_id": nb_id,
            "ctime": ts,
            "mtime": ts + 60,
            "tag": [f"s{doc_id % 4}"],
            "content": (
                f"<div>{text}</div>"
                f'<div><a href="notestation://remote/self/1026_K{doc_id}">'
                f"Doc {doc_id} beta</a></div>"
                '<img class="syno-notestation-image-object" '
                'src="webman/3rdparty/NoteStation/images/transparent.gif" '
                f'ref="ref{doc_id}" />'
            ),
            "attachment": {
                "a1": {"md5": f"m{doc_id}a", "name": f"att{doc_id}.png",
                       "ref": f"ref{doc_id}"},
            },
        },
        f"note_{doc_id}_1": {
            "title": f"Doc {doc_id} beta",
            "parent_id": "nb_unknown",  # -> root fallback
            "ctime": ts + 1,
            "mtime": ts + 61,
            "tag": [],
            "content": ('<div>beta body</div>'
                        '<div><a href="/sub/page.html">rel</a></div>'),
            "source_url": "https://clip.example.com/orig.html",
            "attachment": {
                "a2": {"md5": f"m{doc_id}b", "name": f"extra{doc_id}.bin"},
            },
        },
        f"note_{doc_id}_2": {
            "title": "trashed",
            "parent_id": "recycle_#00000000",
            "ctime": ts, "mtime": ts,
            "content": "<div>gone</div>",
        },
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("config.json", json.dumps({
            "notebook": [nb_id], "note": sorted(notes),
        }))
        zf.writestr(nb_id, json.dumps({"title": f"Notebook {doc_id % 3}"}))
        for note_id, note in notes.items():
            zf.writestr(note_id, json.dumps(note))
        zf.writestr(f"file_{doc_id}_m{doc_id}a", b"png bytes")
        zf.writestr(f"file_{doc_id}_m{doc_id}b", b"bin bytes")
        zf.writestr(f"file_thumb_{doc_id}_m{doc_id}a", b"thumb noise")
    return buf.getvalue()


# --- container parse (reference semantics) ----------------------------------

def parse_nsx(payload: bytes) -> list[dict]:
    """One nsx container → note rows (title, notebook, body, tags,
    note_links, resources, created_s, updated_s), sorted by note id."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        names = set(zf.namelist())
        config = json.loads(zf.read("config.json"))
        if "note" not in config:
            raise ValueError("no 'note' key: not a Note Station export")

        notebooks = {
            nb_id: json.loads(zf.read(nb_id))["title"]
            for nb_id in config.get("notebook", []) if nb_id in names
        }

        # md5-keyed attachment files (synology_note_station.py:184-190):
        # the hash comes from the member name, never the content
        available: list[dict] = []
        for name in sorted(names):
            stem = name.rsplit("/", 1)[-1]
            if stem.startswith("file_thumb"):
                continue
            if stem.startswith("file_"):
                available.append({"filename": name,
                                  "md5": stem.split("_")[-1],
                                  "refs": [], "titles": []})

        raw_notes = {
            note_id: json.loads(zf.read(note_id))
            for note_id in config["note"] if note_id in names
        }

    live = {
        nid: n for nid, n in raw_notes.items()
        if n["parent_id"].rsplit("_")[-1] != "#00000000"
    }
    note_id_title_map = {nid: n["title"] for nid, n in live.items()}

    rows: list[dict] = []
    for note_id in sorted(live):
        note = live[note_id]

        # attachment pass: ref'd attachments register for link matching,
        # unreferenced ones are direct resources (:98-117)
        resources: list[str] = []
        for att in (note.get("attachment") or {}).values():
            for res in available:
                if att["md5"] == res["md5"]:
                    if (ref := att.get("ref")) is not None:
                        res["refs"].append(ref)
                        res["titles"].append(att["name"])
                    else:
                        resources.append(att["name"])
                    break

        body = ""
        note_links: list[str] = []
        if (content := note.get("content")) is not None:
            body = html_to_markdown_filtered(content, _SYNO_FILTERS)
            source_url = note.get("source_url")
            for link in get_markdown_links(body):
                if link.is_web_link or link.is_mail_link:
                    continue
                if link.url.startswith("#"):
                    continue
                if link.url.startswith("notestation://"):
                    target = get_best_match(link.text, note_id_title_map)
                    if target is not None:
                        note_links.append(target)
                elif source_url is not None and (
                    "/" in link.url or "?" in link.url
                ):
                    new_url = urlparse(source_url)._replace(path=link.url)
                    rebased = str(link).replace(link.url, new_url.geturl())
                    body = body.replace(str(link), rebased)
                else:
                    matched = [r for r in available if link.url in r["refs"]]
                    if len(matched) != 1:
                        continue
                    for res_title in matched[0]["titles"]:
                        resources.append(link.text or res_title)

        rows.append({
            "note_id": note_id,
            "title": note["title"],
            "notebook": notebooks.get(note["parent_id"], ""),
            "body": body,
            "tags": ",".join(note.get("tag", [])),
            "note_links": ",".join(note_links),
            "resources": ",".join(resources),
            "created_s": note["ctime"],
            "updated_s": note["mtime"],
        })
    return rows


def synology_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {
            "doc_id": [], "note_id": [], "title": [], "notebook": [],
            "body": [], "tags": [], "note_links": [], "resources": [],
            "created_s": [], "updated_s": [],
        }
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for row in parse_nsx(synth_nsx(doc_id, text)):
                cols["doc_id"].append(doc_id)
                for k, v in row.items():
                    cols[k].append(v)
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "note_id": pa.array(cols["note_id"], pa.string()),
            "title": pa.array(cols["title"], pa.string()),
            "notebook": pa.array(cols["notebook"], pa.string()),
            "body": pa.array(cols["body"], pa.string()),
            "tags": pa.array(cols["tags"], pa.string()),
            "note_links": pa.array(cols["note_links"], pa.string()),
            "resources": pa.array(cols["resources"], pa.string()),
            "created_s": pa.array(cols["created_s"], pa.int64()),
            "updated_s": pa.array(cols["updated_s"], pa.int64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=256)


def sql_synology_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    ts = f"({EPOCH_S} + doc_id)"
    return f"""
SELECT doc_id,
  'note_' || {i} || '_0' AS note_id,
  'Doc ' || {i} || ' alpha' AS title,
  'Notebook ' || CAST(doc_id % 3 AS VARCHAR) AS notebook,
  text || chr(10) || chr(10)
    || '[Doc ' || {i} || ' beta](notestation://remote/self/1026_K' || {i}
    || ')' || chr(10) || chr(10) || '![](ref' || {i} || ')' AS body,
  's' || CAST(doc_id % 4 AS VARCHAR) AS tags,
  'note_' || {i} || '_1' AS note_links,
  'att' || {i} || '.png' AS resources,
  CAST({ts} AS BIGINT) AS created_s,
  CAST({ts} + 60 AS BIGINT) AS updated_s
FROM documents
UNION ALL
SELECT doc_id,
  'note_' || {i} || '_1' AS note_id,
  'Doc ' || {i} || ' beta' AS title,
  '' AS notebook,
  'beta body' || chr(10) || chr(10)
    || '[rel](https://clip.example.com/sub/page.html)' AS body,
  '' AS tags,
  '' AS note_links,
  'extra' || {i} || '.bin' AS resources,
  CAST({ts} + 1 AS BIGINT) AS created_s,
  CAST({ts} + 61 AS BIGINT) AS updated_s
FROM documents
ORDER BY doc_id, note_id
"""
