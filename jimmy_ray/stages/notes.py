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
    """Include-by-title glob filter, fully vectorized: the fnmatch
    regexes run through Arrow's re2 kernel (``\\Z`` → re2's ``\\z``,
    same anchor semantics — equivalence asserted in tests)."""
    import pyarrow.compute as pc

    pattern = "^(?:" + "|".join(
        fnmatch.translate(g) for g in include
    ).replace("\\Z", "\\z") + ")"

    def fn(batch: pa.Table) -> pa.Table:
        keep = pc.match_substring_regex(batch["title"], pattern)
        return batch.filter(keep).select(["url", "title"])

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

    import pyarrow.compute as pc

    pattern = "^(?:" + "|".join(
        _fn.translate(g) for g in exclude
    ).replace("\\Z", "\\z") + ")"

    def fn(batch: pa.Table) -> pa.Table:
        keep = pc.invert(pc.match_substring_regex(batch["tag"], pattern))
        return batch.filter(keep)

    return inline_tags(sf_dir).map_batches(fn, batch_format="pyarrow")


# --- link resolution join (J1) ---------------------------------------------

def _note_map_partial(batch: pa.Table) -> pa.Table:
    """Map side: pages whose markdown starts with an h1 title."""
    urls, titles = [], []
    for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
        title, _ = md_text.split_title_from_body(text)
        if title:
            urls.append(url)
            titles.append(title)
    return pa.table({"title": pa.array(titles, pa.string()),
                     "url": pa.array(urls, pa.string())})


def _edge_replacement(link_text: str | None, target_title: str,
                      fragment: str, is_embedded: bool,
                      target_url: str | None) -> tuple[str, str]:
    """(original wikilink string, markdown replacement) for one edge —
    the per-link body of the reference's PathDeterminer probe
    (writer.py:214-266, broken fallback :245-255)."""
    original = md_links.make_wikilink(
        link_text, target_title, is_embedded, fragment
    )
    text = link_text or target_title
    if target_url is None:
        replacement = f"[{text}](broken-link {target_title})"
    else:
        replacement = md_links.make_link(
            text, target_url,
            fragment=md_text.to_markdown_header_id(fragment),
        )
    return original, replacement


def link_resolution(sf_dir: str, strategy: str = "join",
                    num_partitions: int = 8):
    """Resolve wikilinks against the note-title map (J1).

    ``strategy="join"`` (default, the scale path): the wikilink edge
    table hash-joins (left-outer) against the distributed title→url map,
    per-edge replacements are folded per source page with the
    coarse-bucket pattern, and a second hash join brings the page body to
    its replacement list — no driver-side map, peak state = one bucket.

    ``strategy="broadcast"`` (small-map fast path, the reference's
    literal shape): the title→url map is collected once on the driver and
    captured by the resolve closure, mirroring PathDeterminer's
    ``note_id_map`` dict probe (writer.py:62,91-109).  Correct while the
    titled-note count fits in one heap; the join path is the default
    because at 10^12 pages it is not.

    Both paths: ties on title break by min url, broken targets keep the
    reference's fallback ``[text](broken-link <id>)`` (writer.py:245-255),
    replacements apply in document link order, void links are scrubbed
    after.  tests/test_api_sources.py asserts join ≡ broadcast.
    """
    if strategy == "broadcast":
        return _link_resolution_broadcast(sf_dir)
    return _link_resolution_join(sf_dir, num_partitions)


def _title_map_ds(pages):
    """Distributed title -> min(url) map (coarse-bucket fold: titles are
    high-cardinality, so bucket first and fold locally per bucket)."""
    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__b"] = (
            pd.util.hash_array(batch["title"].to_numpy(dtype=object)) % 64
        ).astype("int64")
        return batch

    def local_min(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("title", as_index=False)["url"].min()
        out.columns = ["title", "target_url"]
        return out

    return (
        pages.map_batches(_note_map_partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(local_min, batch_format="pandas")
    )


def _link_resolution_join(sf_dir: str, num_partitions: int):
    pages = _extracted_pages(sf_dir)
    title_map = _title_map_ds(pages)

    # wikilink edge table: one row per (page, wikilink), position-indexed
    # so replacements apply in document order exactly like the broadcast
    # closure
    def edges_batch(batch: pa.Table) -> pa.Table:
        src, pos, texts, targets, frags, emb = [], [], [], [], [], []
        for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
            i = 0
            for link in md_links.get_markdown_links(text):
                if not link.is_wikilink:
                    continue
                src.append(url)
                pos.append(i)
                texts.append(link.text)
                targets.append(link.url)
                frags.append(link.fragment)
                emb.append(link.is_embedded)
                i += 1
        return pa.table({
            "src_url": pa.array(src, pa.string()),
            "pos": pa.array(pos, pa.int64()),
            "link_text": pa.array(texts, pa.string()),
            "target_title": pa.array(targets, pa.string()),
            "fragment": pa.array(frags, pa.string()),
            "is_embedded": pa.array(emb, pa.bool_()),
        })

    edges = pages.map_batches(edges_batch, batch_format="pyarrow")

    resolved_edges = edges.join(
        title_map.select_columns(["title", "target_url"]),
        join_type="left_outer", num_partitions=num_partitions,
        on=("target_title",), right_on=("title",),
    )

    def make_repl(batch: pd.DataFrame) -> pd.DataFrame:
        origs, repls = [], []
        for lt, tt, fr, emb, tu in zip(
            batch["link_text"], batch["target_title"], batch["fragment"],
            batch["is_embedded"], batch["target_url"],
        ):
            o, r = _edge_replacement(
                lt, tt, fr, bool(emb), None if pd.isna(tu) else tu
            )
            origs.append(o)
            repls.append(r)
        out = batch[["src_url", "pos"]].copy()
        out["original"] = origs
        out["replacement"] = repls
        out["__b"] = (
            pd.util.hash_array(out["src_url"].to_numpy(dtype=object)) % 64
        ).astype("int64")
        return out

    # fold replacements per page inside coarse url buckets, in link order;
    # the (original, replacement) pair list is JSON-encoded into one string
    # column because Arrow's hash join carries no list-typed payloads
    import json

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["src_url", "pos"], kind="stable")
        agg = g.groupby("src_url").apply(
            lambda rows: json.dumps(
                list(zip(rows["original"], rows["replacement"]))),
            include_groups=False,
        ).reset_index()
        agg.columns = ["src_url", "repl_json"]
        return agg

    per_page = (
        resolved_edges.map_batches(make_repl, batch_format="pandas")
        .groupby("__b")
        .map_groups(collect, batch_format="pandas")
    )

    # bring the body to its replacement list (pages without wikilinks drop
    # out here, matching the broadcast path's output)
    joined = pages.join(
        per_page, join_type="inner", num_partitions=num_partitions,
        on=("url",), right_on=("src_url",),
    )

    def apply(batch: pd.DataFrame) -> pd.DataFrame:
        urls_out, bodies_out = [], []
        for url, text, repl_json in zip(
            batch["url"], batch["text"], batch["repl_json"],
        ):
            body = text
            for o, r in json.loads(repl_json):
                body = body.replace(o, r)
            urls_out.append(url)
            bodies_out.append(md_links.remove_void_links(body))
        return pd.DataFrame({"url": urls_out, "resolved_body": bodies_out})

    return joined.map_batches(apply, batch_format="pandas")


def _link_resolution_broadcast(sf_dir: str):
    pages = _extracted_pages(sf_dir)

    from ray.data.aggregate import Min

    map_df = (
        pages.map_batches(_note_map_partial, batch_format="pyarrow")
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
                original, replacement = _edge_replacement(
                    link.text, link.url, link.fragment, link.is_embedded,
                    note_id_map.get(link.url),
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

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["__b"] = (
            pd.util.hash_array(batch["url"].to_numpy(dtype=object)) % 64
        ).astype("int64")
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
