"""Web syndication readers: RSS 2.0, Atom, sitemap XML (public specs).

Webtext-axis companions to the WARC/URL tier: crawl frontiers are
seeded from sitemaps and feeds, so the engine reads all three:

- RSS 2.0: ``rss/channel/item`` with title/link/pubDate and
  CDATA-wrapped ``description`` HTML routed through the shared
  HTML→Markdown path,
- Atom: ``feed/entry`` with title, ``link[@href]``, updated, and
  ``content[@type='html']`` escaped-HTML bodies (unescaped, then the
  shared path),
- sitemap: ``urlset/url`` with loc/lastmod/changefreq/priority
  (priority parsed to integer milli-units so the oracle is exact).

Fixtures render the golden templates the SQL mirrors derive from; the
feed bodies reuse the documents text so parity covers the HTML path.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, unescape

import pyarrow as pa

_ATOM = "http://www.w3.org/2005/Atom"
_SM = "http://www.sitemaps.org/schemas/sitemap/0.9"


def parse_rss(payload: bytes) -> list[dict]:
    from jimmy_ray.html.extract import html_to_markdown

    root = ET.fromstring(payload)
    rows = []
    for item in root.findall("channel/item"):
        desc = item.findtext("description", "")
        rows.append({
            "title": item.findtext("title", ""),
            "link": item.findtext("link", ""),
            "published": item.findtext("pubDate", ""),
            "text": html_to_markdown(desc.encode("utf-8")),
        })
    return rows


def parse_atom(payload: bytes) -> list[dict]:
    from jimmy_ray.html.extract import html_to_markdown

    root = ET.fromstring(payload)
    rows = []
    for entry in root.findall(f"{{{_ATOM}}}entry"):
        link = entry.find(f"{{{_ATOM}}}link")
        content = entry.find(f"{{{_ATOM}}}content")
        body = content.text or "" if content is not None else ""
        if content is not None and content.get("type") == "html":
            body = unescape(body)  # spec: html content is escaped text
        rows.append({
            "title": entry.findtext(f"{{{_ATOM}}}title", ""),
            "link": link.get("href", "") if link is not None else "",
            "published": entry.findtext(f"{{{_ATOM}}}updated", ""),
            "text": html_to_markdown(body.encode("utf-8")),
        })
    return rows


def parse_sitemap(payload: bytes) -> list[dict]:
    root = ET.fromstring(payload)
    rows = []
    for url in root.findall(f"{{{_SM}}}url"):
        prio = url.findtext(f"{{{_SM}}}priority")
        rows.append({
            "loc": url.findtext(f"{{{_SM}}}loc", ""),
            "lastmod": url.findtext(f"{{{_SM}}}lastmod", ""),
            "changefreq": url.findtext(f"{{{_SM}}}changefreq", ""),
            # integer milli-units: exact across Ray and DuckDB
            "priority_milli": (int(round(float(prio) * 1000))
                               if prio else None),
        })
    return rows


# --- fixtures ---------------------------------------------------------------

def synth_feed(doc_id: int, text: str) -> bytes:
    """RSS 2.0 for odd doc_ids, Atom for even — two entries each, the
    second with inline HTML emphasis exercising the shared path."""
    i = doc_id
    body1 = f"<h1>Doc {i}</h1><p>{escape(text)}</p>"
    body2 = f"<p>update <b>{i}</b></p>"
    if i % 2 == 1:
        items = "".join(
            f"<item><title>Post {i}-{j}</title>"
            f"<link>https://feed.test/{i}/{j}</link>"
            f"<pubDate>Mon, 01 Jan 2024 00:00:0{j} GMT</pubDate>"
            f"<description><![CDATA[{b}]]></description></item>"
            for j, b in ((0, body1), (1, body2)))
        return (f'<rss version="2.0"><channel><title>F{i}</title>'
                f"{items}</channel></rss>").encode()
    entries = "".join(
        f"<entry><title>Post {i}-{j}</title>"
        f'<link href="https://feed.test/{i}/{j}"/>'
        f"<updated>2024-01-01T00:00:0{j}Z</updated>"
        f'<content type="html">{escape(b)}</content></entry>'
        for j, b in ((0, body1), (1, body2)))
    return (f'<feed xmlns="{_ATOM}"><title>F{i}</title>'
            f"{entries}</feed>").encode()


def synth_sitemap(doc_id: int, text: str) -> bytes:
    i = doc_id
    urls = "".join(
        f"<url><loc>https://crawl.test/doc/{i}/{j}</loc>"
        f"<lastmod>2024-01-0{j + 1}</lastmod>"
        f"<changefreq>daily</changefreq>"
        f"<priority>0.{(i + j) % 10}</priority></url>"
        for j in range(2))
    return f'<urlset xmlns="{_SM}">{urls}</urlset>'.encode()


# --- queries ----------------------------------------------------------------

def feed_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, kinds, titles, links, pubs, texts = [], [], [], [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            payload = synth_feed(d, t)
            kind = "rss" if d % 2 == 1 else "atom"
            rows = (parse_rss if kind == "rss" else parse_atom)(payload)
            for row in rows:
                ids.append(d)
                kinds.append(kind)
                titles.append(row["title"])
                links.append(row["link"])
                pubs.append(row["published"])
                texts.append(row["text"])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "title": pa.array(titles, pa.string()),
            "link": pa.array(links, pa.string()),
            "published": pa.array(pubs, pa.string()),
            "text": pa.array(texts, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


def sql_feed_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    j = "CAST(j AS VARCHAR)"
    pub = (f"CASE WHEN doc_id % 2 = 1 THEN "
           f"'Mon, 01 Jan 2024 00:00:0' || {j} || ' GMT' "
           f"ELSE '2024-01-01T00:00:0' || {j} || 'Z' END")
    text = (f"CASE WHEN j = 0 THEN '# Doc ' || {i} || chr(10) || chr(10)"
            f" || text ELSE 'update **' || {i} || '**' END")
    return f"""
SELECT doc_id,
  CASE WHEN doc_id % 2 = 1 THEN 'rss' ELSE 'atom' END AS kind,
  'Post ' || {i} || '-' || {j} AS title,
  'https://feed.test/' || {i} || '/' || {j} AS link,
  {pub} AS published,
  {text} AS text
FROM documents CROSS JOIN (VALUES (0), (1)) AS t(j)
"""


def sitemap_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, locs, mods, freqs, prios = [], [], [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            for row in parse_sitemap(synth_sitemap(d, t)):
                ids.append(d)
                locs.append(row["loc"])
                mods.append(row["lastmod"])
                freqs.append(row["changefreq"])
                prios.append(row["priority_milli"])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "loc": pa.array(locs, pa.string()),
            "lastmod": pa.array(mods, pa.string()),
            "changefreq": pa.array(freqs, pa.string()),
            "priority_milli": pa.array(prios, pa.int64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=1024)


def sql_sitemap_extract() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    j = "CAST(j AS VARCHAR)"
    return f"""
SELECT doc_id,
  'https://crawl.test/doc/' || {i} || '/' || {j} AS loc,
  '2024-01-0' || CAST(j + 1 AS VARCHAR) AS lastmod,
  'daily' AS changefreq,
  CAST(((doc_id + j) % 10) * 100 AS BIGINT) AS priority_milli
FROM documents CROSS JOIN (VALUES (0), (1)) AS t(j)
"""
