"""WordPress WXR reader: namespaced XML + markup body conversion (S9).

The reference's two-pass move (/root/reference/src/jimmy/formats/
wordpress.py:87-104): collect the document's namespace declarations via
``iterparse(events=["start-ns"])`` first, then resolve ``wp:``/``dc:``/
``content:`` qualified lookups against that map while walking channel
items; nav/menu/global-style post types are skipped, sticky posts gain a
pseudo-tag, ``content:encoded`` HTML runs through the markdown
extractor (wordpress.py:105-131).

Ray-shaped: each row carries one export's XML bytes — namespace
collection and the item walk happen per row inside map_batches.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET

import pyarrow as pa

SKIP_TYPES = ("nav_menu_item", "wp_global_styles", "wp_navigation")


def synth_wxr(doc_id: int, text: str) -> bytes:
    import html as html_mod

    i = doc_id
    body = html_mod.escape(f"<p><b>post</b> {html_mod.escape(text)}</p>")
    sticky = 1 if i % 4 == 0 else 0
    skip_item = (
        "<item><title>menu</title>"
        "<wp:post_type>nav_menu_item</wp:post_type></item>"
        if i % 6 == 0 else ""
    )
    return (
        '<rss xmlns:wp="http://wordpress.org/export/1.2/" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/" '
        'xmlns:content="http://purl.org/rss/1.0/modules/content/">'
        f"<channel><title>Blog {i % 10}</title>"
        f"<item><title>Doc {i}</title>"
        f"<guid>https://blog.test/?p={i}</guid>"
        "<wp:post_type>post</wp:post_type>"
        f"<wp:is_sticky>{sticky}</wp:is_sticky>"
        f"<category>c{i % 3}</category><category>shared</category>"
        f"<dc:creator>author{i % 3}</dc:creator>"
        f"<wp:post_date_gmt>2024-01-01 00:00:00</wp:post_date_gmt>"
        f"<content:encoded>{body}</content:encoded>"
        f"</item>{skip_item}</channel></rss>"
    ).encode("utf-8")


def parse_wxr(payload: bytes) -> list[dict]:
    """wordpress.py:87-131 semantics on one export."""
    from jimmy_ray.html.extract import html_to_markdown

    namespaces = {
        node[0]: node[1]
        for _, node in ET.iterparse(io.BytesIO(payload), events=["start-ns"])
    }
    root = ET.parse(io.BytesIO(payload)).getroot()
    out: list[dict] = []
    for channel in root.findall("channel"):
        notebook = channel.findtext("title", "")
        for item in channel.findall("item"):
            post_type = item.findtext("wp:post_type", "", namespaces)
            if post_type in SKIP_TYPES:
                continue
            tags = [c.text for c in item.findall("category")
                    if c.text is not None]
            if bool(int(item.findtext("wp:is_sticky", "0", namespaces))):
                tags.append("sticky")
            content = item.findtext("content:encoded", "", namespaces)
            out.append({
                "notebook": notebook,
                "title": item.findtext("title", ""),
                "guid": item.findtext("guid", ""),
                "author": item.findtext("dc:creator", "", namespaces),
                "created": item.findtext("wp:post_date_gmt", "", namespaces),
                "tags": ",".join(tags),
                "body": html_to_markdown(content) if content else "",
            })
    return out


def wordpress_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in (
            "doc_id", "notebook", "title", "guid", "author", "tags", "body")}
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for row in parse_wxr(synth_wxr(doc_id, text)):
                cols["doc_id"].append(doc_id)
                for k in ("notebook", "title", "guid", "author", "tags",
                          "body"):
                    cols[k].append(row[k])
        return pa.table({
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            **{k: pa.array(cols[k], pa.string())
               for k in ("notebook", "title", "guid", "author", "tags",
                         "body")},
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=256)


def sql_wordpress_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    return f"""
SELECT doc_id,
  'Blog ' || CAST(doc_id % 10 AS VARCHAR) AS notebook,
  'Doc ' || {i} AS title,
  'https://blog.test/?p=' || {i} AS guid,
  'author' || CAST(doc_id % 3 AS VARCHAR) AS author,
  'c' || CAST(doc_id % 3 AS VARCHAR) || ',shared'
    || (CASE WHEN doc_id % 4 = 0 THEN ',sticky' ELSE '' END) AS tags,
  '**post** ' || text AS body
FROM documents
"""
