"""Container/export readers: Notion zip-of-zips, Facebook posts (S8).

- Notion (/root/reference/src/jimmy/formats/notion.py:20-47): an export
  is either a zip of zips (usual) or a flat zip (user already extracted
  the outer layer); both explode to the same member rows, ``__MACOSX``
  droppings removed.  Mixed zip/non-zip content is an error row.
- Facebook (/root/reference/src/jimmy/formats/facebook.py:10-16,69-120):
  posts arrays with the latin1/utf8 mojibake fix, ``data`` sub-records
  carrying ``post`` bodies and ``update_timestamp`` overrides, titled
  posts (other profiles) and empty posts skipped, title =
  ``YYYY-MM-DD: body[:80]``.

Both fixtures derive deterministically from ``documents`` with DuckDB
SQL mirrors.  The zip explode is a 1:N flat map over binary rows — the
Ray shape for any archive container (same as the S6 XML explode).
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import zipfile

import pyarrow as pa

FB_EPOCH_S = 1_700_000_000


# --- Notion ----------------------------------------------------------------

def _zip_bytes(members: list[tuple[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members:
            zf.writestr(name, data)
    return buf.getvalue()


def synth_notion_zip(doc_id: int, text: str) -> bytes:
    """Zip-of-zips for most docs; flat zip for doc_id%3==0 (the 'user
    already extracted the outer layer' branch)."""
    inner_members = [
        (f"page {doc_id}-{j}.md",
         f"# Page {doc_id}-{j}\n\n{text}".encode("utf-8"))
        for j in range(2)
    ]
    junk = ("__MACOSX/junk", b"resource fork noise")
    if doc_id % 3 == 0:
        return _zip_bytes(inner_members + [junk])
    halves = [inner_members[:1], inner_members[1:] + [junk]]
    return _zip_bytes([
        (f"part-{k}.zip", _zip_bytes(half)) for k, half in enumerate(halves)
    ])


def explode_notion_zip(payload: bytes) -> list[tuple[str, str]]:
    """(member_name, content) rows per notion.py:20-47 semantics."""
    out: list[tuple[str, str]] = []
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        names = zf.namelist()
        is_zip = [n.endswith(".zip") for n in names]
        if all(is_zip):
            for nested_name in names:
                with zipfile.ZipFile(io.BytesIO(zf.read(nested_name))) as nz:
                    for member in nz.namelist():
                        if member.startswith("__MACOSX/"):
                            continue
                        out.append((member, nz.read(member).decode("utf-8")))
        elif not any(is_zip):
            for member in names:
                if member.startswith("__MACOSX/"):
                    continue
                out.append((member, zf.read(member).decode("utf-8")))
        else:
            raise ValueError("unexpected file formats inside zip")
    return sorted(out)


def notion_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, members, contents = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for member, content in explode_notion_zip(
                synth_notion_zip(doc_id, text)
            ):
                ids.append(doc_id)
                members.append(member)
                contents.append(content)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "member": pa.array(members, pa.string()),
            "content": pa.array(contents, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=256)


def sql_notion_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    j = "CAST(j AS VARCHAR)"
    return f"""
SELECT doc_id,
  'page ' || {i} || '-' || {j} || '.md' AS member,
  '# Page ' || {i} || '-' || {j} || chr(10) || chr(10) || text AS content
FROM documents, (VALUES (0), (1)) AS t(j)
"""


# --- Facebook --------------------------------------------------------------

def fix_encoding_error(value: str) -> str:
    """facebook.py:10-12: exports double-encode unicode as latin1."""
    return value.encode("latin1").decode("utf8")


def synth_facebook_posts(doc_id: int, text: str) -> str:
    ts = FB_EPOCH_S + doc_id * 3600
    mojibake = text.encode("utf8").decode("latin1")
    posts: list[dict] = [{
        "timestamp": ts,
        "data": [{"post": mojibake}, {"update_timestamp": ts + 60}],
        "tags": [{"name": f"fb{doc_id % 3}"}],
    }]
    if doc_id % 5 == 0:
        posts.append({  # other-profile post: has a title -> skipped
            "timestamp": ts + 1, "title": "Other Profile",
            "data": [{"post": "skip me"}],
        })
        posts.append({  # empty body -> skipped
            "timestamp": ts + 2, "data": [],
        })
    return json.dumps(posts)


def parse_facebook_posts(raw: str) -> list[dict]:
    """facebook.py:69-120 semantics on one posts file."""
    rows: list[dict] = []
    for post in json.loads(raw):
        created_s = post["timestamp"]
        updated_s = created_s
        body = ""
        for datum in post.get("data", []):
            for key, value in datum.items():
                if key == "update_timestamp":
                    updated_s = value
                elif key == "post":
                    body = fix_encoding_error(value)
        if post.get("title") is not None:
            continue  # posts in other profiles
        if not body:
            continue
        date_str = _dt.datetime.fromtimestamp(
            created_s, _dt.timezone.utc
        ).strftime("%Y-%m-%d")
        rows.append({
            "title": f"{date_str}: {body[:80]}",
            "body": body,
            "tags": ",".join(t["name"] for t in post.get("tags", [])),
            "created_ms": created_s * 1000,
            "updated_ms": updated_s * 1000,
        })
    return rows


def facebook_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, titles, bodies, tags, created, updated = [], [], [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for row in parse_facebook_posts(synth_facebook_posts(doc_id, text)):
                ids.append(doc_id)
                titles.append(row["title"])
                bodies.append(row["body"])
                tags.append(row["tags"])
                created.append(row["created_ms"])
                updated.append(row["updated_ms"])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "title": pa.array(titles, pa.string()),
            "body": pa.array(bodies, pa.string()),
            "tags": pa.array(tags, pa.string()),
            "created_ms": pa.array(created, pa.int64()),
            "updated_ms": pa.array(updated, pa.int64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


def sql_facebook_extract() -> str:
    from jimmy_ray.scalars.dates import sql_utc_strftime

    ts = f"({FB_EPOCH_S} + doc_id * 3600)"
    return f"""
SELECT doc_id,
  {sql_utc_strftime(ts, "%Y-%m-%d")} || ': ' || substr(text, 1, 80)
    AS title,
  text AS body,
  'fb' || CAST(doc_id % 3 AS VARCHAR) AS tags,
  CAST({ts} * 1000 AS BIGINT) AS created_ms,
  CAST(({ts} + 60) * 1000 AS BIGINT) AS updated_ms
FROM documents
"""
