"""Main-content extraction: strip page chrome, keep the article.

The classic web-corpus curation step between "fetch" and "dedup"
(readability/boilerpipe-style, the published heuristics): drop the
semantic boilerplate containers outright, then score the remaining
top-level blocks by LINK DENSITY (anchor text chars / total text
chars) and drop the navigation-shaped ones.  Runs on the repo's own
DOM (html/extract.py parse_dom) and renders survivors through the
shared Markdown path, so the output composes with every downstream
operator (dedup, text stats, chunking).

Rules (deterministic, fixture-mirrored):
- kill list: <nav> <header> <footer> <aside> <script> <style> <form>,
  anywhere in the tree,
- a top-level block whose link density ≥ 0.5 (and that has any text)
  is navigation, dropped,
- everything else renders via the default filter chain.

Scale shape: stateless per-document map — the same batch_size-512
per-document-parse stage as extraction; no exchange.
"""

from __future__ import annotations

import pyarrow as pa

from jimmy_ray.html.extract import (
    _find, _render_blocks, apply_default_filters, parse_dom,
)

KILL_TAGS = frozenset(
    {"nav", "header", "footer", "aside", "script", "style", "form"})
MAX_LINK_DENSITY = 0.5


def _text_stats(node) -> tuple[int, int]:
    """(total text chars, chars inside <a>) — whitespace excluded."""
    total = linked = 0
    stack = [(node, False)]
    while stack:
        cur, in_a = stack.pop()
        for child in cur.children:
            if isinstance(child, str):
                n = sum(1 for c in child if not c.isspace())
                total += n
                if in_a:
                    linked += n
            else:
                stack.append((child, in_a or child.tag == "a"))
    return total, linked


def _kill_boilerplate(node) -> None:
    node.children = [
        c for c in node.children
        if isinstance(c, str) or c.tag not in KILL_TAGS
    ]
    for child in node.children:
        if not isinstance(child, str):
            _kill_boilerplate(child)


def main_content_markdown(html: bytes | str) -> str:
    """Full HTML document → Markdown of the main content only."""
    root = parse_dom(html)
    _kill_boilerplate(root)
    body = _find(root, "body") or root
    kept = []
    for child in body.children:
        if not isinstance(child, str):
            total, linked = _text_stats(child)
            if total > 0 and linked / total >= MAX_LINK_DENSITY:
                continue
        kept.append(child)
    body.children = kept
    apply_default_filters(root)
    out: list[str] = []
    _render_blocks(body.children, out)
    return "\n\n".join(out).strip()


# --- fixture (chrome-wrapped article) + query --------------------------------

MAIN_GOLDEN_TEMPLATE = (
    "# Doc {id}\n"
    "\n"
    "{text}\n"
    "\n"
    "More {id} with a [ref {id}](https://example.com/r/{id}) inside a"
    " longer paragraph of ordinary words."
)


def synth_chrome_page(doc_id: int, text: str) -> str:
    import html as html_mod

    i = doc_id
    t = html_mod.escape(text)
    return (
        f"<html><head><title>Doc {i}</title></head><body>"
        '<nav><a href="/">Home</a> <a href="/about">About</a></nav>'
        f"<header><h1>SiteName {i}</h1></header>"
        f'<div class="menu"><a href="/a">alpha {i}</a> '
        f'<a href="/b">beta {i}</a> <a href="/c">gamma {i}</a></div>'
        f'<div class="content"><h1>Doc {i}</h1><p>{t}</p>'
        f'<p>More {i} with a <a href="https://example.com/r/{i}">ref {i}'
        "</a> inside a longer paragraph of ordinary words.</p></div>"
        f"<aside>related links {i}</aside>"
        f"<footer>&copy; example {i}</footer>"
        "</body></html>"
    )


def main_content_extract(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = [main_content_markdown(synth_chrome_page(d, t))
                 for d, t in zip(batch["doc_id"].to_pylist(),
                                 batch["text"].to_pylist())]
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pa.array(texts, pa.string())})

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=512)


def sql_main_content_extract() -> str:
    from jimmy_ray.sources.fixturetpl import sql_golden_query

    return sql_golden_query(MAIN_GOLDEN_TEMPLATE)


def main_content_batch(batch: pa.Table) -> pa.Table:
    """Pages-schema stage: (url, html, ...) -> (url, text)."""
    texts = [main_content_markdown(h) for h in batch["html"].to_pylist()]
    return pa.table({"url": batch["url"],
                     "text": pa.array(texts, pa.string())})
