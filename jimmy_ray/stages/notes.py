"""Note-pipeline stages: links/tags edge tables, title split, safe paths,
glob filters, frontmatter, and the link-resolution join (SURVEY.md §2).

This is the Ray-shaped version of jimmy's phases 3-5
(/root/reference/src/jimmy/main.py:112-188): the notes dataset replaces
the in-memory Notebook forest, the links/tags edge tables replace
per-note lists, and the link-resolution broadcast join (J1) replaces the
PathDeterminer ``note_id_map`` dict probe
(/root/reference/src/jimmy/writer.py:91-109,214-266).
"""

from __future__ import annotations

import fnmatch

import pandas as pd
import pyarrow as pa

from jimmy_ray.md import links as md_links
from jimmy_ray.md import tags as md_tags
from jimmy_ray.md import text as md_text
from jimmy_ray.scalars import frontmatter as fm
from jimmy_ray.scalars import paths as md_paths


def _extracted_pages(sf_dir: str):
    from jimmy_ray.pipelines import flagship

    return flagship.extracted(sf_dir)


# --- edge-table extraction (M12/M14) ---------------------------------------

def links_batch(batch: pa.Table) -> pa.Table:
    """Explode per-page markdown links into the links edge table (J1 input;
    mirrors imf.NoteLink, intermediate_format.py:79-93)."""
    src_urls: list[str] = []
    texts: list[str] = []
    urls: list[str] = []
    fragments: list[str] = []
    is_image: list[bool] = []
    is_wiki: list[bool] = []
    for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
        for link in md_links.get_markdown_links(text):
            src_urls.append(url)
            texts.append(link.text)
            urls.append(link.url)
            fragments.append(link.fragment)
            is_image.append(link.is_image)
            is_wiki.append(link.is_wikilink)
    return pa.table(
        {
            "src_url": pa.array(src_urls, pa.string()),
            "text": pa.array(texts, pa.string()),
            "url": pa.array(urls, pa.string()),
            "fragment": pa.array(fragments, pa.string()),
            "is_image": pa.array(is_image, pa.bool_()),
            "is_wikilink": pa.array(is_wiki, pa.bool_()),
        }
    )


def tags_batch(batch: pa.Table) -> pa.Table:
    """Explode inline #tags into the note_tags edge table (M14)."""
    urls: list[str] = []
    tags: list[str] = []
    for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
        for tag in md_tags.get_inline_tags(text):
            urls.append(url)
            tags.append(tag)
    return pa.table({"url": pa.array(urls, pa.string()),
                     "tag": pa.array(tags, pa.string())})


def extract_links(sf_dir: str):
    return _extracted_pages(sf_dir).map_batches(
        links_batch, batch_format="pyarrow", batch_size=512
    )


def inline_tags(sf_dir: str):
    return _extracted_pages(sf_dir).map_batches(
        tags_batch, batch_format="pyarrow", batch_size=512
    )


# --- per-note scalars as stages (M15/M16/M18) ------------------------------

def split_title_body(sf_dir: str):
    def fn(batch: pa.Table) -> pa.Table:
        titles, bodies = [], []
        for text in batch["text"].to_pylist():
            t, b = md_text.split_title_from_body(text)
            titles.append(t)
            bodies.append(b)
        return pa.table({"url": batch["url"],
                         "note_title": pa.array(titles, pa.string()),
                         "body": pa.array(bodies, pa.string())})

    return _extracted_pages(sf_dir).map_batches(fn, batch_format="pyarrow")


def header_slugs(sf_dir: str):
    def fn(batch: pa.Table) -> pa.Table:
        slugs = [md_text.to_markdown_header_id(t) for t in batch["title"].to_pylist()]
        return pa.table({"url": batch["url"], "slug": pa.array(slugs, pa.string())})

    return _extracted_pages(sf_dir).map_batches(fn, batch_format="pyarrow")


def safe_paths(sf_dir: str):
    """Sink-key sanitation (M18): deterministic via url-keyed fallback."""

    def fn(batch: pa.Table) -> pa.Table:
        names = [
            md_paths.safe_path(t, key=u)
            for t, u in zip(batch["title"].to_pylist(), batch["url"].to_pylist())
        ]
        return pa.table({"url": batch["url"],
                         "safe_name": pa.array(names, pa.string())})

    return _extracted_pages(sf_dir).map_batches(fn, batch_format="pyarrow")


# --- glob filters (F1/F2, filters.py:8-41) ---------------------------------

def filter_notes(sf_dir: str, include: tuple[str, ...] = ("Doc 1*",)):
    """Include-by-title glob filter; globs compile to a vectorized regex."""
    import re

    pattern = re.compile("|".join(fnmatch.translate(g) for g in include))

    def fn(batch: pa.Table) -> pa.Table:
        keep = [bool(pattern.match(t)) for t in batch["title"].to_pylist()]
        return batch.filter(pa.array(keep)).select(["url", "title"])

    return _extracted_pages(sf_dir).map_batches(fn, batch_format="pyarrow")


# --- frontmatter stage (M20) ----------------------------------------------

def frontmatter_obsidian(sf_dir: str):
    """Apply obsidian frontmatter from extracted inline tags (tag-carrying
    pages only)."""

    def fn(batch: pa.Table) -> pa.Table:
        urls_out, bodies_out = [], []
        for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
            tags = md_tags.get_inline_tags(text)
            if not tags:
                continue
            urls_out.append(url)
            bodies_out.append(fm.apply_frontmatter(text, "obsidian", tags=tags))
        return pa.table({"url": pa.array(urls_out, pa.string()),
                         "fm_body": pa.array(bodies_out, pa.string())})

    return _extracted_pages(sf_dir).map_batches(fn, batch_format="pyarrow")


def frontmatter_futo(sf_dir: str):
    """Futo header-tag-block dialect (M20, intermediate_format.py:235-247)."""

    def fn(batch: pa.Table) -> pa.Table:
        urls_out, bodies_out = [], []
        for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
            tags = md_tags.get_inline_tags(text)
            if not tags:
                continue
            urls_out.append(url)
            bodies_out.append(fm.apply_frontmatter(text, "futo", tags=tags))
        return pa.table({"url": pa.array(urls_out, pa.string()),
                         "fm_body": pa.array(bodies_out, pa.string())})

    return _extracted_pages(sf_dir).map_batches(fn, batch_format="pyarrow")


def template_apply(sf_dir: str, template: str = "{title} [{lang}]\n\n{body}"):
    """User-template formatting (M21, intermediate_format.py:214-227):
    note fields flow into a {field} template; missing fields -> null."""

    def fn(batch: pa.Table) -> pa.Table:
        urls, bodies = [], []
        for url, lang, text in zip(
            batch["url"].to_pylist(), batch["lang"].to_pylist(),
            batch["text"].to_pylist(),
        ):
            title, body = md_text.split_title_from_body(text)
            urls.append(url)
            bodies.append(
                fm.apply_template(template, title=title or None,
                                  lang=lang, body=body)
            )
        return pa.table({"url": pa.array(urls, pa.string()),
                         "templated": pa.array(bodies, pa.string())})

    return _extracted_pages(sf_dir).map_batches(fn, batch_format="pyarrow")


def filter_tags(sf_dir: str, exclude: tuple[str, ...] = ("common",)):
    """Tag exclude filter (F3, filters.py:44-59) over the exploded tags."""
    import fnmatch as _fn
    import re as _re

    pattern = _re.compile("|".join(_fn.translate(g) for g in exclude))

    def fn(batch: pa.Table) -> pa.Table:
        keep = [not pattern.match(t) for t in batch["tag"].to_pylist()]
        return batch.filter(pa.array(keep))

    return inline_tags(sf_dir).map_batches(fn, batch_format="pyarrow")


# --- link resolution join (J1) ---------------------------------------------

def link_resolution(sf_dir: str):
    """Resolve wikilinks against the note-title map (broadcast join).

    The map side (title -> url of the h1-titled note page, ties broken by
    min url) is small — built once and captured by the stage closure
    (ray.put-equivalent broadcast; at a larger map scale this becomes a
    partitioned hash join on original_id, SURVEY.md §2.4 J1).  Broken
    targets keep the reference's fallback form
    ``[text](broken-link <id>)`` (writer.py:245-255).
    """
    pages = _extracted_pages(sf_dir)

    # map side: pages whose markdown starts with an h1 title
    def note_map_partial(batch: pa.Table) -> pa.Table:
        urls, titles = [], []
        for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
            title, _ = md_text.split_title_from_body(text)
            if title:
                urls.append(url)
                titles.append(title)
        return pa.table({"title": pa.array(titles, pa.string()),
                         "url": pa.array(urls, pa.string())})

    from ray.data.aggregate import Min

    map_df = (
        pages.map_batches(note_map_partial, batch_format="pyarrow")
        .groupby("title")
        .aggregate(Min("url", alias_name="target_url"))
        .to_pandas()
    )
    note_id_map = dict(zip(map_df["title"], map_df["target_url"]))

    def resolve(batch: pa.Table) -> pa.Table:
        urls_out, bodies_out = [], []
        for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
            wikilinks = [l for l in md_links.get_markdown_links(text) if l.is_wikilink]
            if not wikilinks:
                continue
            body = text
            for link in wikilinks:
                original = md_links.make_wikilink(
                    link.text, link.url, link.is_embedded, link.fragment
                )
                link_text = link.text or link.url
                target = note_id_map.get(link.url)
                if target is None:
                    replacement = f"[{link_text}](broken-link {link.url})"
                else:
                    replacement = md_links.make_link(
                        link_text, target,
                        fragment=md_text.to_markdown_header_id(link.fragment),
                    )
                body = body.replace(original, replacement)
            body = md_links.remove_void_links(body)
            urls_out.append(url)
            bodies_out.append(body)
        return pa.table({"url": pa.array(urls_out, pa.string()),
                         "resolved_body": pa.array(bodies_out, pa.string())})

    return pages.map_batches(resolve, batch_format="pyarrow")


# --- notebook tree (SURVEY §1.2 path column, J2, F5, §2.7) -----------------

def notebook_tree(sf_dir: str):
    """Flattened notebook-tree rollup: every note carries an ancestry path
    (trees don't shard — a path column groups identically, SURVEY §1.2);
    skip rules drop untitled notes (F5 analogue of trash/deleted skips,
    formats/synology_note_station.py:123-125); empty notebooks disappear
    from the rollup exactly like remove_empty_notebooks
    (converter.py:135-158).  Output: (path_str, n_notes)."""
    import numpy as np

    from ray.data.aggregate import Sum

    pages = _extracted_pages(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        titles = batch["title"].to_pylist()
        counts: dict[str, int] = {}
        for url, title in zip(urls, titles):
            if not title:  # skip rule: untitled/trash notes
                continue
            parts = url.split("/")
            source = parts[3]
            doc_id = int(parts[4])
            path = f"{source}/nb{doc_id % 10}"
            counts[path] = counts.get(path, 0) + 1
        return pa.table({"path_str": pa.array(list(counts), pa.string()),
                         "p_n": pa.array(list(counts.values()), pa.int64())})

    return (
        pages.map_batches(partial, batch_format="pyarrow", batch_size=1024)
        .groupby("path_str")
        .aggregate(Sum("p_n", alias_name="n_notes"))
    )


# --- event-time scalar stage (M23) -----------------------------------------

def event_ts_ms(sf_dir: str):
    import ray.data as rd

    from jimmy_ray.scalars import dates

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({"event_id": batch["event_id"],
                         "ts_ms": dates.timestamp_col_to_ms(batch["ts"])})

    return ds.map_batches(fn, batch_format="pyarrow")


def filter_notes_by_tag(sf_dir: str, include: tuple[str, ...] = ("tag1*",),
                        exclude: tuple[str, ...] = ("tag19*",)):
    """Note-level include/exclude by tag glob (F2, filters.py:24-37):
    a note survives if ANY of its tags matches an include glob and NONE
    matches an exclude glob — a semi-join then anti-join against the
    exploded tag table, folded per note inside one vectorized pass."""
    import fnmatch as _fn
    import re as _re

    import pandas as pd

    inc = _re.compile("|".join(_fn.translate(g) for g in include))
    exc = _re.compile("|".join(_fn.translate(g) for g in exclude))

    from jimmy_ray.functions.dedup import fnv64

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__b"] = batch["url"].map(lambda u: fnv64(u) % 64).astype("int64")
        return batch

    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        batch["inc"] = batch["tag"].map(lambda t: bool(inc.match(t)))
        batch["exc"] = batch["tag"].map(lambda t: bool(exc.match(t)))
        g = batch.groupby("url", as_index=False).agg(
            any_inc=("inc", "any"), any_exc=("exc", "any")
        )
        keep = g[g["any_inc"] & ~g["any_exc"]]
        return keep[["url"]]

    # Ray re-batches rows, so a note's tags can span map_batches batches —
    # the ANY/NONE fold must see all tags of a url at once.  Coarse
    # hash-bucket by url (64 groups) then fold locally per bucket: every
    # url's tags colocate, and the groupby stays low-cardinality
    # (CLAUDE.md pair_grouped lesson).
    return (
        inline_tags(sf_dir)
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(fold, batch_format="pandas")
    )
