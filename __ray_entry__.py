"""Driver contract for the graft builder (Ray Data target).

queries() pairs each implemented operator (SURVEY.md §2) with a DuckDB
oracle in oracle_sql().  The pages table is synthesized deterministically
from `documents` (jimmy_ray.data.synth), and every derivation has an SQL
mirror, so the oracle recomputes golden values independently.  Ray is
initialised by the driver — nothing here calls ray.init()/shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from jimmy_ray.data import synth
from jimmy_ray.geo import core as geo_core
from jimmy_ray.geo import polygon as poly_mod

SF0001 = "/root/testdata/sf0.001"

# shared SQL fragments ------------------------------------------------------
_K = synth.SQL_KEY
_PAGES_CTE = (
    f"WITH {synth.SQL_VARIANTS_CTE}, pages AS (\n"
    f"  SELECT doc_id, v, {_K} AS k, {synth.sql_page_url()} AS url,\n"
    f"         {synth.sql_page_ts()} AS warc_ts, lang,\n"
    f"         {synth.sql_golden_markdown()} AS text\n"
    f"  FROM documents CROSS JOIN variants\n"
    f")"
)
_TITLE_SQL = (
    f"CASE WHEN ({_K}) % 101 = 0 THEN "
    f"(CASE (({_K}) // 101) % 4 WHEN 0 THEN 'CON' WHEN 1 THEN 'a/b:c*x' "
    f"WHEN 2 THEN repeat('g', 200) ELSE '' END) "
    f"ELSE 'Doc ' || CAST(doc_id AS VARCHAR) END"
)
_LAT_SQL, _LON_SQL = synth.sql_geo_exprs()
_POINTS_CTE = (
    f"WITH {synth.SQL_VARIANTS_CTE}, pts AS (\n"
    f"  SELECT {synth.sql_page_url()} AS url, {_LAT_SQL} AS lat_e6, {_LON_SQL} AS lon_e6\n"
    f"  FROM documents CROSS JOIN variants WHERE {synth.sql_has_geo()}\n"
    f")"
)
_POINTS_LANG_CTE = (
    f"WITH {synth.SQL_VARIANTS_CTE}, pts AS (\n"
    f"  SELECT lang, {_LAT_SQL} AS lat_e6, {_LON_SQL} AS lon_e6\n"
    f"  FROM documents CROSS JOIN variants WHERE {synth.sql_has_geo()}\n"
    f")"
)
_POINTS_SOURCE_CTE = (
    f"WITH {synth.SQL_VARIANTS_CTE}, pts AS (\n"
    f"  SELECT source, {_LAT_SQL} AS lat_e6, {_LON_SQL} AS lon_e6\n"
    f"  FROM documents CROSS JOIN variants WHERE {synth.sql_has_geo()}\n"
    f")"
)


def entry() -> Any:
    """Flagship pipeline on sf0.001: extract → geocode → cell index →
    spatial join → per-polygon counts."""
    from jimmy_ray.pipelines import flagship

    return flagship.flagship_result(SF0001)


# The correctness driver samples the FIRST 50 entries of queries() each
# round.  The window is computed from the committed CORRECTNESS_r*.json
# ledger so it self-rotates every round (VERDICT r4 #1): queries that have
# never had a driver row come first, then everything else in declaration
# order.  _WINDOW_DEMOTE breaks ties when more than 50 queries have never
# been sampled — demoted names are the ones whose certification we are
# willing to defer (they keep local-harness parity coverage either way).
_WINDOW_SIZE = 50
_WINDOW_DEMOTE = (
    # two of the sixteen native word-processor/markup siblings; fourteen
    # same-shaped readers certify the shared template machinery
    "creole_extract",
    "vimwiki_extract",
    # round-5 additions: must not evict the staged round-4 backlog from
    # the 50-query window (they have local parity coverage regardless)
    "pdf_image_features",
    "djot_extract",
    "typst_extract",
    "endnote_extract",
    "pdf_jbig2_features",
    "mhtml_extract",
)


def _driver_window() -> list[str]:
    """First-50 query window, derived from the CORRECTNESS ledger."""
    import glob
    import json
    import os

    base = os.path.dirname(os.path.abspath(__file__))
    sampled: set[str] = set()
    for path in sorted(glob.glob(os.path.join(base, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if isinstance(rows, dict):
            sampled.update(rows.keys())
    names = list(_all_queries())
    never = [n for n in names if n not in sampled and n not in _WINDOW_DEMOTE]
    demoted = [n for n in names if n not in sampled and n in _WINDOW_DEMOTE]
    seen = [n for n in names if n in sampled]
    return (never + demoted + seen)[:_WINDOW_SIZE]


def queries() -> dict[str, Callable[[str], Any]]:
    base = _all_queries()
    ordered = {k: base[k] for k in _driver_window()}
    ordered.update((k, v) for k, v in base.items() if k not in ordered)
    return ordered


def _all_queries() -> dict[str, Callable[[str], Any]]:
    from jimmy_ray.functions import dedup, simsearch, textstats
    from jimmy_ray.pipelines import flagship, relational
    from jimmy_ray.stages import multimodal, notes, windows

    return {
        # jimmy extraction parity (SURVEY §2.2 M1-M3, byte-identity oracle)
        "extract_text": lambda sf: flagship.extracted(sf).select_columns(
            ["url", "title", "text"]
        ),
        # ST1 persistent-subprocess converter pool (convert.py:99 pandoc shape)
        "subprocess_extract": lambda sf: __import__(
            "jimmy_ray.stages.subproc", fromlist=["x"]
        ).subprocess_extract(sf),
        # streamline_tables normalization (M3; html_filter.py:568-673)
        "table_extract": lambda sf: __import__(
            "jimmy_ray.stages.extract", fromlist=["x"]
        ).table_extract(sf),
        # geocode (M23-analogue scalar parse; intermediate_format.py:183-185)
        "geocode": flagship.geo_points,
        # geocell + tile assignment (north-rule cell index, ST6/A4)
        "tile_assignment": flagship.tile_assignments,
        # point-in-polygon joins (J8): broadcast + salted-shuffle variants
        "spatial_join": flagship.spatial_join,
        "spatial_join_shuffle": lambda sf: __import__(
            "jimmy_ray.stages.spatial", fromlist=["spatial_join_shuffle"]
        ).spatial_join_shuffle(flagship.geo_points(sf)),
        "spatial_join_native": lambda sf: __import__(
            "jimmy_ray.stages.spatial", fromlist=["spatial_join_native"]
        ).spatial_join_native(flagship.geo_points(sf)),
        # kNN (J9): bounded per-batch top-k + merge
        "knn": flagship.knn,
        # tile aggregation (A4) + raster materialization
        "tile_counts": flagship.tile_counts,
        "raster_tiles": lambda sf: __import__(
            "jimmy_ray.stages.spatial", fromlist=["x"]
        ).raster_tiles_exploded(flagship.geo_points(sf)),
        # genuine hex + S2 cell indexes (float projections: rows-only check)
        "hexcell_index": lambda sf: flagship.geo_points(sf).map_batches(
            __import__("jimmy_ray.stages.spatial", fromlist=["x"]).hex_s2_index_batch,
            batch_format="pyarrow", batch_size=4096,
        ).select_columns(["url", "hex_r7", "hex_r8", "hex_r9"]),
        "s2_cells": lambda sf: flagship.geo_points(sf).map_batches(
            __import__("jimmy_ray.stages.spatial", fromlist=["x"]).hex_s2_index_batch,
            batch_format="pyarrow", batch_size=4096,
        ).select_columns(["url", "s2_l10", "s2_l14", "s2_token_l10"]),
        # kNN with hex k-ring pruning (approximate scale path: rows-only)
        "knn_hex_pruned": lambda sf: __import__(
            "jimmy_ray.stages.spatial", fromlist=["x"]
        ).knn_hex_pruned(
            flagship.geo_points(sf),
            __import__("jimmy_ray.data.synth", fromlist=["x"]).query_points(50),
        ),
        # generic relational operators (A1-A3, J1-J4 analogues on TPC-H tables)
        "q_lineitem_agg": relational.lineitem_agg,
        "q_orders_join": relational.orders_join,
        "q_lineitem_orders_join": relational.lineitem_orders_join,
        "q_top_orders": relational.top_orders,
        # as-of join (Ray Data lacks one): hash-bucket colocation +
        # vectorized per-bucket merge_asof
        "asof_join": relational.asof_join_events_orders,
        "range_join": relational.range_join_events_orders,
        # text analysis (training-data tier)
        "text_stats": lambda sf: __import__(
            "ray.data", fromlist=["read_parquet"]
        ).read_parquet(f"{sf}/documents.parquet").map_batches(
            textstats.text_stats_batch, batch_format="pyarrow"
        ),
        "lang_id": lambda sf: __import__(
            "ray.data", fromlist=["read_parquet"]
        ).read_parquet(f"{sf}/documents.parquet").map_batches(
            textstats.lang_id_batch, batch_format="pyarrow"
        ),
        # composed curation chain: quality gate -> lang gate -> exact dedup
        "curate_corpus": textstats.curate_corpus,
        # Gopher-style repetition quality signals (per-doc map)
        "repetition_stats": textstats.repetition_stats,
        # BPE-ish pre-tokenizer counts (training-cost metric)
        "bpe_token_count": textstats.bpe_token_count,
        # mixture construction + hygiene (sampling / PII / decontamination)
        "stratified_sample": lambda sf: __import__(
            "jimmy_ray.functions.mixtures", fromlist=["x"]
        ).stratified_sample(sf),
        "pii_scrub": lambda sf: __import__(
            "jimmy_ray.functions.mixtures", fromlist=["x"]
        ).pii_scrub(sf),
        "decontaminate": lambda sf: __import__(
            "jimmy_ray.functions.mixtures", fromlist=["x"]
        ).decontaminate(sf),
        "chunk_documents": lambda sf: __import__(
            "jimmy_ray.functions.mixtures", fromlist=["x"]
        ).chunk_documents(sf),
        # paragraph-level boilerplate removal (2-pass broadcast set)
        "paragraph_dedup": lambda sf: __import__(
            "jimmy_ray.functions.paradedup", fromlist=["x"]
        ).paragraph_dedup(sf),
        # dedup family (A3 exact + near-dup scale ops)
        "doc_dedup_exact": dedup.exact_dedup,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "minhash_dedup": dedup.minhash_dedup_pairs,
        # connected-components clustering over the pair graph (dedup endgame)
        "dedup_clusters": dedup.dedup_clusters,
        # end-to-end near-dedup: pairs -> components -> keep-one -> filter
        "near_dedup_corpus": dedup.near_dedup_corpus,
        "simhash_dedup": dedup.simhash_dedup_pairs,
        # similarity search over embeddings
        "ann_topk": simsearch.ann_topk,
        "embedding_ann_lsh": simsearch.ann_topk_lsh,
        "embedding_ann_ivf": simsearch.ann_topk_ivf,
        # integer projection (a, b): the expected pair set is the replica
        # pairs, but the replicas carry N(0, 0.01) noise so LSH recall is
        # probabilistic (~1.3e-4 miss per pair) — rows-only check + the
        # recall accuracy tests, never an exact SQL mirror
        "embedding_dup_pairs": lambda sf: __import__(
            "jimmy_ray.functions.simsearch", fromlist=["x"]
        ).embedding_dup_pairs(sf).map_batches(
            lambda t: t.select(["a", "b"]), batch_format="pyarrow"),
        "embedding_dedup_corpus": simsearch.embedding_dedup_corpus,
        # mergeable sketches (approximate; no SQL oracle by design)
        "approx_distinct_tokens": lambda sf: __import__(
            "jimmy_ray.functions.sketches", fromlist=["x"]
        ).approx_distinct_tokens(sf),
        "heavy_hitter_tokens": lambda sf: __import__(
            "jimmy_ray.functions.sketches", fromlist=["x"]
        ).heavy_hitter_tokens(sf),
        "doc_length_quantiles": lambda sf: __import__(
            "jimmy_ray.functions.sketches", fromlist=["x"]
        ).doc_length_quantiles(sf),
        # multimodal plumbing (stubbed codec, real Ray-side pipeline)
        "multimodal_features": multimodal.media_features,
        # real image-decode tier (pure-numpy PPM: decode + channel sums)
        "image_features": multimodal.image_features,
        # real audio decode (RIFF PCM16) + video frame sampling
        "audio_features": multimodal.audio_features,
        "video_frame_sample": multimodal.video_frame_sample,
        # note-pipeline stages (M12-M22, F1/F2, J1)
        "extract_links": notes.extract_links,
        "inline_tags": notes.inline_tags,
        "split_title_body": notes.split_title_body,
        "header_slugs": notes.header_slugs,
        "safe_paths": notes.safe_paths,
        "filter_notes": notes.filter_notes,
        "frontmatter_obsidian": notes.frontmatter_obsidian,
        "frontmatter_futo": notes.frontmatter_futo,
        "template_apply": notes.template_apply,
        "filter_tags": notes.filter_tags,
        "filter_notes_by_tag": notes.filter_notes_by_tag,
        "link_resolution": notes.link_resolution,
        "notebook_tree": notes.notebook_tree,
        "word_count": textstats.word_count,
        "label_centroids": textstats.label_centroids,
        "event_ts_ms": notes.event_ts_ms,
        # MIME / XML-container / encrypted sources (S5, S6/S9, S10, M25-M26)
        "eml_extract": lambda sf: __import__(
            "jimmy_ray.sources.eml", fromlist=["x"]
        ).eml_extract(sf),
        # MHTML web archives route through the same MIME walk
        # (converter.py:265-267 "eml" | "mht" | "mhtml")
        "mhtml_extract": lambda sf: __import__(
            "jimmy_ray.sources.eml", fromlist=["x"]
        ).mhtml_extract(sf),
        "xml_notes_extract": lambda sf: __import__(
            "jimmy_ray.sources.xmlnotes", fromlist=["x"]
        ).xml_notes_extract(sf),
        # ENEX rich-content state machine + inline AES en-crypt (M4/M26)
        "enex_extract": lambda sf: __import__(
            "jimmy_ray.sources.enex", fromlist=["x"]
        ).enex_extract(sf),
        # S8 JSON-export readers (google_keep.py / telegram.py / day_one.py)
        "google_keep_extract": lambda sf: __import__(
            "jimmy_ray.sources.json_exports", fromlist=["x"]
        ).google_keep_extract(sf),
        "telegram_extract": lambda sf: __import__(
            "jimmy_ray.sources.json_exports", fromlist=["x"]
        ).telegram_extract(sf),
        "dayone_extract": lambda sf: __import__(
            "jimmy_ray.sources.json_exports", fromlist=["x"]
        ).dayone_extract(sf),
        # Standard Notes references-invert join + super/Lexical routing
        "standard_notes_extract": lambda sf: __import__(
            "jimmy_ray.sources.standard_notes", fromlist=["x"]
        ).standard_notes_extract(sf),
        # Notion zip-of-zips container explode + Facebook posts (S8)
        "notion_extract": lambda sf: __import__(
            "jimmy_ray.sources.containers", fromlist=["x"]
        ).notion_extract(sf),
        "facebook_extract": lambda sf: __import__(
            "jimmy_ray.sources.containers", fromlist=["x"]
        ).facebook_extract(sf),
        # UpNote gzipped-JSONL two-pass backup (upnote.py:104-180)
        "upnote_extract": lambda sf: __import__(
            "jimmy_ray.sources.upnote", fromlist=["x"]
        ).upnote_extract(sf),
        # Tomboy markup walk + Diaro uid-joined tables (S9 round 2)
        "tomboy_extract": lambda sf: __import__(
            "jimmy_ray.sources.xmlnotes2", fromlist=["x"]
        ).tomboy_extract(sf),
        "diaro_extract": lambda sf: __import__(
            "jimmy_ray.sources.xmlnotes2", fromlist=["x"]
        ).diaro_extract(sf),
        # flat-JSON trio: Simplenote / Drafts / jrnl (S8 long-tail close)
        "simplenote_extract": lambda sf: __import__(
            "jimmy_ray.sources.flatjson", fromlist=["x"]
        ).simplenote_extract(sf),
        "drafts_extract": lambda sf: __import__(
            "jimmy_ray.sources.flatjson", fromlist=["x"]
        ).drafts_extract(sf),
        "jrnl_extract": lambda sf: __import__(
            "jimmy_ray.sources.flatjson", fromlist=["x"]
        ).jrnl_extract(sf),
        # Synology Note Station nsx container (S9: trash skip, notebook
        # parent join, md5/ref resource match, fuzzy notestation:// links)
        "synology_extract": lambda sf: __import__(
            "jimmy_ray.sources.synology", fromlist=["x"]
        ).synology_extract(sf),
        # Nimbus Note zip-of-note.html container (S8: app filters, dup
        # https fix, fuzzy nimbusnote:// links, asset/suffix recovery)
        "nimbus_extract": lambda sf: __import__(
            "jimmy_ray.sources.nimbus", fromlist=["x"]
        ).nimbus_extract(sf),
        # S8 long-tail sweep: Cacher / Clipto / Turtl / Reflect (JSON)
        # and Dynalist / Zoho / Google Docs takeout / Anytype (folders)
        "cacher_extract": lambda sf: __import__(
            "jimmy_ray.sources.flatjson2", fromlist=["x"]
        ).cacher_extract(sf),
        "clipto_extract": lambda sf: __import__(
            "jimmy_ray.sources.flatjson2", fromlist=["x"]
        ).clipto_extract(sf),
        "turtl_extract": lambda sf: __import__(
            "jimmy_ray.sources.flatjson2", fromlist=["x"]
        ).turtl_extract(sf),
        "reflect_extract": lambda sf: __import__(
            "jimmy_ray.sources.flatjson2", fromlist=["x"]
        ).reflect_extract(sf),
        "dynalist_extract": lambda sf: __import__(
            "jimmy_ray.sources.folders", fromlist=["x"]
        ).dynalist_extract(sf),
        "zoho_extract": lambda sf: __import__(
            "jimmy_ray.sources.folders", fromlist=["x"]
        ).zoho_extract(sf),
        "google_docs_extract": lambda sf: __import__(
            "jimmy_ray.sources.folders", fromlist=["x"]
        ).google_docs_extract(sf),
        "anytype_extract": lambda sf: __import__(
            "jimmy_ray.sources.folders", fromlist=["x"]
        ).anytype_extract(sf),
        # app-specific folder-of-markdown semantics (verdict r2 #10)
        "obsidian_extract": lambda sf: __import__(
            "jimmy_ray.sources.markdown_folders", fromlist=["x"]
        ).obsidian_extract(sf),
        "qownnotes_extract": lambda sf: __import__(
            "jimmy_ray.sources.markdown_folders", fromlist=["x"]
        ).qownnotes_extract(sf),
        # env-blocked-decoder formats, conversion semantics ported over
        # the decoded shapes (sigexport / pycrdt / one2html boundaries)
        "signal_extract": lambda sf: __import__(
            "jimmy_ray.sources.signal_chats", fromlist=["x"]
        ).signal_extract(sf),
        "affine_extract": lambda sf: __import__(
            "jimmy_ray.sources.affine", fromlist=["x"]
        ).affine_extract(sf),
        "onenote_extract": lambda sf: __import__(
            "jimmy_ray.sources.onenote", fromlist=["x"]
        ).onenote_extract(sf),
        # zkn3 zip (tag-id join) + Bear/textbundle bundles (S9/S11)
        "zettelkasten_extract": lambda sf: __import__(
            "jimmy_ray.sources.archives", fromlist=["x"]
        ).zettelkasten_extract(sf),
        "textbundle_extract": lambda sf: __import__(
            "jimmy_ray.sources.archives", fromlist=["x"]
        ).textbundle_extract(sf),
        # RedNotebook YAML month->day explode + Roam outline walker (S8)
        "rednotebook_extract": lambda sf: __import__(
            "jimmy_ray.sources.journals", fromlist=["x"]
        ).rednotebook_extract(sf),
        "roam_extract": lambda sf: __import__(
            "jimmy_ray.sources.journals", fromlist=["x"]
        ).roam_extract(sf),
        # PDF text extraction, uncompressed subset (S4; converter.py:295)
        "pdf_extract": lambda sf: __import__(
            "jimmy_ray.sources.pdf", fromlist=["x"]
        ).pdf_extract(sf),
        # embedded-image decode through the from-scratch baseline JPEG
        # codec (DCTDecode; solid-gray fixture keeps the mean integer-
        # exact, see sources/pdf.py:synth_pdf_with_images)
        "pdf_image_features": lambda sf: __import__(
            "jimmy_ray.sources.pdf", fromlist=["x"]
        ).pdf_image_features(sf),
        # JBIG2Decode image XObjects through the from-scratch MQ-coder
        # generic-region codec; doc_id routes across GBTEMPLATE 0-3 ×
        # TPGDON (sources/pdf.py:synth_pdf_with_jbig2)
        "pdf_jbig2_features": lambda sf: __import__(
            "jimmy_ray.sources.pdf", fromlist=["x"]
        ).pdf_jbig2_features(sf),
        # password-protected 7z archives: AES-256 KDF + Copy/LZMA chains
        # + encrypted headers (test_convert.py:262-298 prep layer)
        "sevenzip_extract": lambda sf: __import__(
            "jimmy_ray.sources.sevenzip", fromlist=["x"]
        ).sevenzip_extract(sf),
        "container_dispatch": lambda sf: __import__(
            "jimmy_ray.sources.container_dispatch", fromlist=["x"]
        ).container_dispatch(sf),
        "docx_extract": lambda sf: __import__(
            "jimmy_ray.sources.wordproc", fromlist=["x"]
        ).docx_extract(sf),
        "odt_extract": lambda sf: __import__(
            "jimmy_ray.sources.wordproc", fromlist=["x"]
        ).odt_extract(sf),
        "rtf_extract": lambda sf: __import__(
            "jimmy_ray.sources.wordproc", fromlist=["x"]
        ).rtf_extract(sf),
        "asciidoc_extract": lambda sf: __import__(
            "jimmy_ray.sources.lightmarkup", fromlist=["x"]
        ).asciidoc_extract(sf),
        "mediawiki_extract": lambda sf: __import__(
            "jimmy_ray.sources.lightmarkup", fromlist=["x"]
        ).mediawiki_extract(sf),
        "epub_extract": lambda sf: __import__(
            "jimmy_ray.sources.epub", fromlist=["x"]
        ).epub_extract(sf),
        "opml_extract": lambda sf: __import__(
            "jimmy_ray.sources.epub", fromlist=["x"]
        ).opml_extract(sf),
        "org_extract": lambda sf: __import__(
            "jimmy_ray.sources.texmarkup", fromlist=["x"]
        ).org_extract(sf),
        "rst_extract": lambda sf: __import__(
            "jimmy_ray.sources.texmarkup", fromlist=["x"]
        ).rst_extract(sf),
        "latex_extract": lambda sf: __import__(
            "jimmy_ray.sources.texmarkup", fromlist=["x"]
        ).latex_extract(sf),
        "dokuwiki_extract": lambda sf: __import__(
            "jimmy_ray.sources.lightmarkup", fromlist=["x"]
        ).dokuwiki_extract(sf),
        "textile_extract": lambda sf: __import__(
            "jimmy_ray.sources.lightmarkup", fromlist=["x"]
        ).textile_extract(sf),
        "creole_extract": lambda sf: __import__(
            "jimmy_ray.sources.markup_tail", fromlist=["x"]
        ).creole_extract(sf),
        "vimwiki_extract": lambda sf: __import__(
            "jimmy_ray.sources.markup_tail", fromlist=["x"]
        ).vimwiki_extract(sf),
        "docbook_extract": lambda sf: __import__(
            "jimmy_ray.sources.markup_tail", fromlist=["x"]
        ).docbook_extract(sf),
        # final pandoc-gap tier (S2 long tail closed): Djot, Typst,
        # EndNote XML native subset converters
        "djot_extract": lambda sf: __import__(
            "jimmy_ray.sources.pandoc_tail", fromlist=["x"]
        ).djot_extract(sf),
        "typst_extract": lambda sf: __import__(
            "jimmy_ray.sources.pandoc_tail", fromlist=["x"]
        ).typst_extract(sf),
        "endnote_extract": lambda sf: __import__(
            "jimmy_ray.sources.pandoc_tail", fromlist=["x"]
        ).endnote_extract(sf),
        "url_canonicalize": lambda sf: __import__(
            "jimmy_ray.functions.webtext", fromlist=["x"]
        ).url_canonicalize(sf),
        "url_dedup": lambda sf: __import__(
            "jimmy_ray.functions.webtext", fromlist=["x"]
        ).url_dedup(sf),
        "domain_stats": lambda sf: __import__(
            "jimmy_ray.functions.webtext", fromlist=["x"]
        ).domain_stats(sf),
        "warc_extract": lambda sf: __import__(
            "jimmy_ray.sources.warc", fromlist=["x"]
        ).warc_extract(sf),
        "feed_extract": lambda sf: __import__(
            "jimmy_ray.sources.feeds", fromlist=["x"]
        ).feed_extract(sf),
        "sitemap_extract": lambda sf: __import__(
            "jimmy_ray.sources.feeds", fromlist=["x"]
        ).sitemap_extract(sf),
        # WET conversion-record sidecar (Common Crawl *.warc.wet derivative)
        "wet_extract": lambda sf: __import__(
            "jimmy_ray.sources.warc", fromlist=["x"]
        ).wet_extract(sf),
        # CDX-J crawl index with SURT keys (the CC index shard format)
        "cdx_index": lambda sf: __import__(
            "jimmy_ray.sources.warc", fromlist=["x"]
        ).cdx_index(sf),
        # WAT metadata-envelope sidecar (titles + outlinks per capture)
        "wat_extract": lambda sf: __import__(
            "jimmy_ray.sources.warc", fromlist=["x"]
        ).wat_extract(sf),
        # WHATWG charset sniff (BOM > http > meta-in-1024 > cp1252) + decode
        "charset_decode": lambda sf: __import__(
            "jimmy_ray.scalars.charset", fromlist=["x"]
        ).charset_decode(sf),
        # main-content extraction (boilerplate removal by link density)
        "main_content_extract": lambda sf: __import__(
            "jimmy_ray.html.maincontent", fromlist=["x"]
        ).main_content_extract(sf),
        # C4 cleaning rules (line terminal-punct/word-count/javascript,
        # page lorem/brace/min-sentences)
        "c4_filters": lambda sf: __import__(
            "jimmy_ray.functions.c4", fromlist=["x"]
        ).c4_filters(sf),
        # C4 three-sentence-span dedup (first occurrence wins)
        "span_dedup": lambda sf: __import__(
            "jimmy_ray.functions.c4", fromlist=["x"]
        ).span_dedup(sf),
        # per-target inlink anchor rollup (top anchor by frequency)
        "anchor_text_agg": lambda sf: __import__(
            "jimmy_ray.functions.webgraph", fromlist=["x"]
        ).anchor_text_agg(sf),
        # redirect-chain resolution by pointer doubling (log rounds)
        "redirect_resolve": lambda sf: __import__(
            "jimmy_ray.functions.webgraph", fromlist=["x"]
        ).redirect_resolve(sf),
        # per-url recrawl churn (lag-window over captures by ts)
        "snapshot_drift": lambda sf: __import__(
            "jimmy_ray.functions.webtext", fromlist=["x"]
        ).snapshot_drift(sf),
        # per-tile language rollup (geo x webtext composition)
        "tile_language_mix": lambda sf: __import__(
            "jimmy_ray.stages.geoagg", fromlist=["x"]
        ).tile_language_mix(sf),
        # crawl scheduler: robots x pagerank x churn composition
        "crawl_schedule": lambda sf: __import__(
            "jimmy_ray.pipelines.crawl", fromlist=["x"]
        ).crawl_schedule(sf),
        # WARC -> charset -> main-content -> C4 in one streaming chain
        "crawl_text_pipeline": lambda sf: __import__(
            "jimmy_ray.pipelines.crawl", fromlist=["x"]
        ).crawl_text_pipeline(sf),
        # host-politeness waves: per-domain top-k ranking (<=4/wave)
        "fetch_waves": lambda sf: __import__(
            "jimmy_ray.pipelines.crawl", fromlist=["x"]
        ).fetch_waves(sf),
        # unicode cleanup: NFC + control strip + whitespace collapse
        "normalize_corpus": lambda sf: __import__(
            "jimmy_ray.scalars.charset", fromlist=["x"]
        ).normalize_corpus(sf),
        # inverted index over the REAL text column (term -> postings)
        "inverted_index": lambda sf: __import__(
            "jimmy_ray.functions.textindex", fromlist=["x"]
        ).inverted_index(sf),
        # per-doc characteristic terms (integer tf/df rank, top 3)
        "top_terms_per_doc": lambda sf: __import__(
            "jimmy_ray.functions.textindex", fromlist=["x"]
        ).top_terms_per_doc(sf),
        # top-k retrieval vs the index (integer idf weight, knn shape)
        "term_search_topk": lambda sf: __import__(
            "jimmy_ray.functions.textindex", fromlist=["x"]
        ).term_search_topk(sf),
        # per-source spatial spread (count, distinct tiles, int bbox)
        "source_geo_footprint": lambda sf: __import__(
            "jimmy_ray.stages.geoagg", fromlist=["x"]
        ).source_geo_footprint(sf),
        # collocation mining: top bigrams by integer lift (PMI cousin)
        "collocations": lambda sf: __import__(
            "jimmy_ray.functions.textindex", fromlist=["x"]
        ).collocations(sf),
        # sitemap-vs-crawl coverage report (distributed anti-joins)
        "frontier_gap": lambda sf: __import__(
            "jimmy_ray.functions.webtext", fromlist=["x"]
        ).frontier_gap(sf),
        # triangle count (canonical-orientation wedge join)
        "triangle_count": lambda sf: __import__(
            "jimmy_ray.functions.webgraph", fromlist=["x"]
        ).triangle_count(sf),
        # HITS hubs/authorities (integer, 2 synchronous iterations)
        "hits_scores": lambda sf: __import__(
            "jimmy_ray.functions.webgraph", fromlist=["x"]
        ).hits(sf),
        # friends-of-friends: distinct 2-hop reach per node
        "two_hop_reach": lambda sf: __import__(
            "jimmy_ray.functions.webgraph", fromlist=["x"]
        ).two_hop_reach(sf),
        # crawler-trap detection: url path-template rollup
        "url_template_mining": lambda sf: __import__(
            "jimmy_ray.functions.webtext", fromlist=["x"]
        ).url_template_mining(sf),
        # MS-ONESTORE binary decode (.one revision store → page rows)
        "onestore_extract": lambda sf: __import__(
            "jimmy_ray.sources.onestore", fromlist=["x"]
        ).onestore_extract(sf),
        # recrawl collapse: newest capture per url (webtext tier)
        "latest_snapshot": lambda sf: __import__(
            "jimmy_ray.functions.webtext", fromlist=["x"]
        ).latest_snapshot(sf),
        # RFC 9309 robots.txt parse + crawl-permission filter
        "robots_filter": lambda sf: __import__(
            "jimmy_ray.functions.robots", fromlist=["x"]
        ).robots_filter(sf),
        # link-graph degree rollup + integer fixed-point PageRank
        "link_graph_degrees": lambda sf: __import__(
            "jimmy_ray.functions.webgraph", fromlist=["x"]
        ).link_graph_degrees(sf),
        "pagerank": lambda sf: __import__(
            "jimmy_ray.functions.webgraph", fromlist=["x"]
        ).pagerank(sf),
        # Joplin JEX tar container with id-linked items (joplin.py:100-180)
        "joplin_extract": lambda sf: __import__(
            "jimmy_ray.sources.joplin", fromlist=["x"]
        ).joplin_extract(sf),
        # ColorNote encrypted chunk stream (AES + framing, colornote.py:126)
        "colornote_extract": lambda sf: __import__(
            "jimmy_ray.sources.colornote", fromlist=["x"]
        ).colornote_extract(sf),
        # Anki collection sqlite: models/decks JSON + \\x1f field split (S7)
        "anki_extract": lambda sf: __import__(
            "jimmy_ray.sources.anki", fromlist=["x"]
        ).anki_extract(sf),
        # WordPress WXR: namespaced XML + markup body conversion (S9)
        "wordpress_extract": lambda sf: __import__(
            "jimmy_ray.sources.wordpress", fromlist=["x"]
        ).wordpress_extract(sf),
        "decrypt_notes": lambda sf: __import__(
            "jimmy_ray.scalars.crypto", fromlist=["x"]
        ).decrypt_notes(sf),
        "sqlite_notes": lambda sf: __import__(
            "jimmy_ray.sources.readers", fromlist=["x"]
        ).sqlite_notes(sf),
        # resource sink: md5 dedup + deterministic unique names (A3, §2.7)
        "resource_sink_names": lambda sf: __import__(
            "jimmy_ray.stages.resources", fromlist=["x"]
        ).resource_sink_names(sf),
        # J7 filename-recovery probe ladder (common.py:205-219,505-519)
        "filename_recovery": lambda sf: __import__(
            "jimmy_ray.stages.filerecovery", fromlist=["x"]
        ).filename_recovery(sf),
        # fuzzy title matching (J5; difflib — rows-only) + A1 counters
        "fuzzy_title_match": lambda sf: __import__(
            "jimmy_ray.stages.fuzzy", fromlist=["x"]
        ).fuzzy_title_match(sf),
        "import_stats": lambda sf: __import__(
            "jimmy_ray.stages.fuzzy", fromlist=["x"]
        ).import_stats(sf),
        # wiki-markup converter family through format dispatch (M5-M9, S1)
        "wikitext_extract": lambda sf: __import__(
            "jimmy_ray.pipelines.wikitext_pipeline", fromlist=["x"]
        ).wikitext_extract(sf),
        "lexical_extract": lambda sf: __import__(
            "jimmy_ray.pipelines.wikitext_pipeline", fromlist=["x"]
        ).lexical_extract(sf),
        # stream-shaped windows over the events log (A2 / guide pattern)
        # geo aggregate tier: zonal stats + density grid clustering
        "polygon_stats": lambda sf: __import__(
            "jimmy_ray.stages.geoagg", fromlist=["x"]
        ).polygon_stats(sf),
        "grid_cluster": lambda sf: __import__(
            "jimmy_ray.stages.geoagg", fromlist=["x"]
        ).grid_cluster(sf),
        "tumbling_window": windows.tumbling_window,
        "session_window": windows.session_window,
        "sliding_window": windows.sliding_window,
    }


def oracle_sql() -> dict[str, str]:
    from jimmy_ray.functions import dedup, simsearch, textstats
    from jimmy_ray.pipelines import relational
    from jimmy_ray.stages import multimodal, windows

    edges = poly_mod.sql_polygon_edges()
    crossing = poly_mod.sql_pip_crossing("pts.lon_e6", "pts.lat_e6")
    qp_values = synth.sql_query_points_values()
    hav = geo_core.sql_haversine_m("qp.qlat", "qp.qlon", "pts.lat_e6", "pts.lon_e6")

    spatial_join_sql = (
        f"{_POINTS_CTE},\n"
        f"edges(polygon_id, x1, y1, x2, y2) AS (VALUES\n    {edges})\n"
        f"SELECT pts.url AS url, edges.polygon_id AS polygon_id\n"
        f"FROM pts, edges\n"
        f"GROUP BY pts.url, edges.polygon_id\n"
        f"HAVING SUM({crossing}) % 2 = 1"
    )

    return {
        "extract_text": (
            f"{_PAGES_CTE} SELECT url, {_TITLE_SQL} AS title, text FROM pages"
        ),
        "table_extract": (
            f"SELECT doc_id, {synth.sql_table_markdown()} AS text FROM documents"
        ),
        "subprocess_extract": f"{_PAGES_CTE} SELECT url, text FROM pages",
        "geocode": f"{_POINTS_CTE} SELECT url, lat_e6, lon_e6 FROM pts",
        "tile_assignment": (
            f"{_POINTS_CTE} SELECT url, lat_e6, lon_e6,\n"
            + ",\n".join(
                f"  {geo_core.sql_geocell_id('lat_e6', 'lon_e6', r)} AS cell_r{r}"
                for r in geo_core.GEOCELL_RESOLUTIONS
            )
            + ",\n"
            + ",\n".join(
                f"  {geo_core.sql_tile_id('lat_e6', 'lon_e6', z)} AS tile_z{z}"
                for z in geo_core.TILE_ZOOMS
            )
            + "\nFROM pts"
        ),
        "spatial_join": spatial_join_sql,
        "spatial_join_shuffle": spatial_join_sql,
        "spatial_join_native": spatial_join_sql,
        "knn": (
            f"{_POINTS_CTE},\n"
            f"qp(qid, qlat, qlon, k) AS (VALUES {qp_values}),\n"
            f"d AS (SELECT qp.qid, pts.url, qp.k, {hav} AS dist FROM qp, pts),\n"
            f"r AS (SELECT qid, url, k, round(dist, 3) AS dist_m,\n"
            f"      row_number() OVER (PARTITION BY qid ORDER BY dist, url) AS rn\n"
            f"      FROM d)\n"
            f'SELECT qid, url, CAST(rn AS BIGINT) AS "rank", dist_m FROM r WHERE rn <= k'
        ),
        "tile_counts": (
            f"{_POINTS_CTE} SELECT "
            f"{geo_core.sql_tile_id('lat_e6', 'lon_e6', 10)} AS tile_z10, "
            f"CAST(COUNT(*) AS BIGINT) AS n_pages FROM pts GROUP BY 1"
        ),
        "raster_tiles": (
            f"{_POINTS_CTE} SELECT "
            f"{geo_core.sql_tile_id('lat_e6', 'lon_e6', 10)} AS tile_z10, "
            + __import__("jimmy_ray.stages.spatial", fromlist=["x"])
            .sql_raster_subcell("lat_e6", "lon_e6")
            + " AS subcell, CAST(COUNT(*) AS BIGINT) AS n_points "
            "FROM pts GROUP BY 1, 2"
        ),
        "q_lineitem_agg": (
            "SELECT l_returnflag, l_linestatus, "
            "SUM(l_quantity) AS sum_qty, "
            "CAST(SUM(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)"
            " AS sum_price_cents, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "q_orders_join": (
            "SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "CAST(SUM(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT)"
            " AS total_cents "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "GROUP BY n.n_name"
        ),
        "q_lineitem_orders_join": (
            "SELECT o.o_orderpriority, "
            "CAST(SUM(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0) "
            "AS BIGINT)) AS BIGINT) AS revenue_cents, "
            "CAST(COUNT(*) AS BIGINT) AS n_items "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "GROUP BY o.o_orderpriority"
        ),
        "q_top_orders": (
            "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
        ),
        "asof_join": relational.sql_asof_join_events_orders(),
        "range_join": relational.sql_range_join_events_orders(),
        "extract_links": (
            f"{_PAGES_CTE}\n"
            "SELECT src_url, text, url, fragment, is_image, is_wikilink FROM (\n"
            "  SELECT p.url AS src_url, 'site ' || i AS text,\n"
            "         'https://example.com/' || i AS url, '' AS fragment,\n"
            "         FALSE AS is_image, FALSE AS is_wikilink\n"
            "  FROM (SELECT url, CAST(doc_id AS VARCHAR) AS i FROM pages WHERE v = 6) p\n"
            "  UNION ALL\n"
            "  SELECT p.url, 'pic ' || i, 'img_' || i || '.png', '', TRUE, FALSE\n"
            "  FROM (SELECT url, CAST(doc_id AS VARCHAR) AS i FROM pages WHERE v = 6) p\n"
            "  UNION ALL\n"
            "  SELECT p.url, 'https://frame.example/' || i,\n"
            "         'https://frame.example/' || i, '', FALSE, FALSE\n"
            "  FROM (SELECT url, CAST(doc_id AS VARCHAR) AS i FROM pages WHERE v = 6) p\n"
            "  UNION ALL\n"
            "  SELECT p.url, 'wiki ' || i, 'Doc ' || p9, '', FALSE, TRUE\n"
            "  FROM (SELECT url, CAST(doc_id AS VARCHAR) AS i,\n"
            "               CAST(doc_id - 1 AS VARCHAR) AS p9\n"
            "        FROM pages WHERE v = 8) p\n"
            ")"
        ),
        "inline_tags": (
            f"{_PAGES_CTE}\n"
            "SELECT url, tag FROM (\n"
            "  SELECT url, 'common' AS tag FROM pages WHERE v = 8\n"
            "  UNION ALL\n"
            "  SELECT url, 'tag' || CAST(doc_id AS VARCHAR) FROM pages WHERE v = 8)"
        ),
        "split_title_body": (
            f"{_PAGES_CTE}\n"
            "SELECT url,\n"
            "  CASE WHEN v = 1 THEN 'Doc ' || CAST(doc_id AS VARCHAR) ELSE '' END\n"
            "    AS note_title,\n"
            "  CASE WHEN v = 1 THEN\n"
            "    ltrim(substr(text, strpos(text, chr(10)) + 1), ' ' || chr(10))\n"
            "  ELSE text END AS body\n"
            "FROM pages"
        ),
        "header_slugs": (
            f"{_PAGES_CTE}\n"
            "SELECT url, CASE WHEN (k % 101) = 0 THEN\n"
            "  CASE ((k // 101) % 4) WHEN 0 THEN 'con' WHEN 1 THEN 'abcx'\n"
            "       WHEN 2 THEN repeat('g', 200) ELSE '' END\n"
            "  ELSE 'doc-' || CAST(doc_id AS VARCHAR) END AS slug\n"
            "FROM pages"
        ),
        "safe_paths": (
            f"{_PAGES_CTE}\n"
            "SELECT url, CASE WHEN (k % 101) = 0 THEN\n"
            "  CASE ((k // 101) % 4) WHEN 0 THEN 'CON_' WHEN 1 THEN 'a_b_c_x'\n"
            "       WHEN 2 THEN repeat('g', 50)\n"
            "       ELSE 'unnamed_' || md5(url) END\n"
            "  ELSE 'Doc ' || CAST(doc_id AS VARCHAR) END AS safe_name\n"
            "FROM pages"
        ),
        "filter_notes": (
            f"{_PAGES_CTE}\n"
            f"SELECT url, {_TITLE_SQL} AS title FROM pages\n"
            f"WHERE {_TITLE_SQL} LIKE 'Doc 1%'"
        ),
        "frontmatter_obsidian": (
            f"{_PAGES_CTE}\n"
            "SELECT url, '---' || chr(10) || 'tags:' || chr(10) || '- common'\n"
            "  || chr(10) || '- tag' || CAST(doc_id AS VARCHAR) || chr(10)\n"
            "  || '---' || chr(10) || chr(10) || text AS fm_body\n"
            "FROM pages WHERE v = 8"
        ),
        "frontmatter_futo": (
            f"{_PAGES_CTE}\n"
            "SELECT url, '#common #tag' || CAST(doc_id AS VARCHAR)\n"
            "  || chr(10) || chr(10) || text AS fm_body\n"
            "FROM pages WHERE v = 8"
        ),
        "template_apply": (
            f"{_PAGES_CTE}\n"
            "SELECT url,\n"
            "  (CASE WHEN v = 1 THEN 'Doc ' || CAST(doc_id AS VARCHAR)\n"
            "        ELSE 'null' END)\n"
            "  || ' [' || lang || ']' || chr(10) || chr(10) ||\n"
            "  (CASE WHEN v = 1 THEN\n"
            "     ltrim(substr(text, strpos(text, chr(10)) + 1), ' ' || chr(10))\n"
            "   ELSE text END) AS templated\n"
            "FROM pages"
        ),
        "filter_tags": (
            f"{_PAGES_CTE}\n"
            "SELECT url, 'tag' || CAST(doc_id AS VARCHAR) AS tag\n"
            "FROM pages WHERE v = 8"
        ),
        "filter_notes_by_tag": (
            f"{_PAGES_CTE}\n"
            "SELECT url FROM pages WHERE v = 8\n"
            "AND CAST(doc_id AS VARCHAR) LIKE '1%'\n"
            "AND CAST(doc_id AS VARCHAR) NOT LIKE '19%'"
        ),
        "notebook_tree": (
            f"{_PAGES_CTE}\n"
            "SELECT source || '/nb' || CAST(doc_id % 10 AS VARCHAR) AS path_str,\n"
            "       CAST(COUNT(*) AS BIGINT) AS n_notes\n"
            f"FROM pages JOIN documents USING (doc_id)\n"
            f"WHERE ({_TITLE_SQL}) != '' GROUP BY 1"
        ),
        "word_count": textstats.sql_word_count(),
        "label_centroids": textstats.sql_label_centroids(),
        "link_resolution": (
            f"{_PAGES_CTE}\n"
            "SELECT p8.url AS url,\n"
            "  replace(p8.text,\n"
            "    '[[Doc ' || CAST(p8.doc_id - 1 AS VARCHAR) || '|wiki '\n"
            "      || CAST(p8.doc_id AS VARCHAR) || ']]',\n"
            "    CASE WHEN p1.url IS NULL THEN\n"
            "      '[wiki ' || CAST(p8.doc_id AS VARCHAR) || '](broken-link Doc '\n"
            "        || CAST(p8.doc_id - 1 AS VARCHAR) || ')'\n"
            "    ELSE '[wiki ' || CAST(p8.doc_id AS VARCHAR) || '](' || p1.url || ')'\n"
            "    END) AS resolved_body\n"
            "FROM (SELECT * FROM pages WHERE v = 8) p8\n"
            "LEFT JOIN (SELECT * FROM pages WHERE v = 1) p1\n"
            "  ON p1.doc_id = p8.doc_id - 1"
        ),
        "event_ts_ms": "SELECT event_id, epoch_ms(ts) AS ts_ms FROM events",
        "polygon_stats": __import__(
            "jimmy_ray.stages.geoagg", fromlist=["x"]
        ).sql_polygon_stats(_POINTS_CTE),
        "grid_cluster": __import__(
            "jimmy_ray.stages.geoagg", fromlist=["x"]
        ).sql_grid_cluster(_POINTS_CTE),
        "eml_extract": __import__(
            "jimmy_ray.sources.eml", fromlist=["x"]
        ).sql_eml_extract(),
        "mhtml_extract": __import__(
            "jimmy_ray.sources.eml", fromlist=["x"]
        ).sql_mhtml_extract(),
        "xml_notes_extract": __import__(
            "jimmy_ray.sources.xmlnotes", fromlist=["x"]
        ).sql_xml_notes_extract(),
        "enex_extract": __import__(
            "jimmy_ray.sources.enex", fromlist=["x"]
        ).sql_enex_extract(),
        "google_keep_extract": __import__(
            "jimmy_ray.sources.json_exports", fromlist=["x"]
        ).sql_google_keep_extract(),
        "telegram_extract": __import__(
            "jimmy_ray.sources.json_exports", fromlist=["x"]
        ).sql_telegram_extract(),
        "dayone_extract": __import__(
            "jimmy_ray.sources.json_exports", fromlist=["x"]
        ).sql_dayone_extract(),
        "standard_notes_extract": __import__(
            "jimmy_ray.sources.standard_notes", fromlist=["x"]
        ).sql_standard_notes_extract(),
        "notion_extract": __import__(
            "jimmy_ray.sources.containers", fromlist=["x"]
        ).sql_notion_extract(),
        "facebook_extract": __import__(
            "jimmy_ray.sources.containers", fromlist=["x"]
        ).sql_facebook_extract(),
        "upnote_extract": __import__(
            "jimmy_ray.sources.upnote", fromlist=["x"]
        ).sql_upnote_extract(),
        "tomboy_extract": __import__(
            "jimmy_ray.sources.xmlnotes2", fromlist=["x"]
        ).sql_tomboy_extract(),
        "diaro_extract": __import__(
            "jimmy_ray.sources.xmlnotes2", fromlist=["x"]
        ).sql_diaro_extract(),
        "simplenote_extract": __import__(
            "jimmy_ray.sources.flatjson", fromlist=["x"]
        ).sql_simplenote_extract(),
        "drafts_extract": __import__(
            "jimmy_ray.sources.flatjson", fromlist=["x"]
        ).sql_drafts_extract(),
        "jrnl_extract": __import__(
            "jimmy_ray.sources.flatjson", fromlist=["x"]
        ).sql_jrnl_extract(),
        "synology_extract": __import__(
            "jimmy_ray.sources.synology", fromlist=["x"]
        ).sql_synology_extract(),
        "nimbus_extract": __import__(
            "jimmy_ray.sources.nimbus", fromlist=["x"]
        ).sql_nimbus_extract(),
        "cacher_extract": __import__(
            "jimmy_ray.sources.flatjson2", fromlist=["x"]
        ).sql_cacher_extract(),
        "clipto_extract": __import__(
            "jimmy_ray.sources.flatjson2", fromlist=["x"]
        ).sql_clipto_extract(),
        "turtl_extract": __import__(
            "jimmy_ray.sources.flatjson2", fromlist=["x"]
        ).sql_turtl_extract(),
        "reflect_extract": __import__(
            "jimmy_ray.sources.flatjson2", fromlist=["x"]
        ).sql_reflect_extract(),
        "dynalist_extract": __import__(
            "jimmy_ray.sources.folders", fromlist=["x"]
        ).sql_dynalist_extract(),
        "zoho_extract": __import__(
            "jimmy_ray.sources.folders", fromlist=["x"]
        ).sql_zoho_extract(),
        "google_docs_extract": __import__(
            "jimmy_ray.sources.folders", fromlist=["x"]
        ).sql_google_docs_extract(),
        "anytype_extract": __import__(
            "jimmy_ray.sources.folders", fromlist=["x"]
        ).sql_anytype_extract(),
        "obsidian_extract": __import__(
            "jimmy_ray.sources.markdown_folders", fromlist=["x"]
        ).sql_obsidian_extract(),
        "qownnotes_extract": __import__(
            "jimmy_ray.sources.markdown_folders", fromlist=["x"]
        ).sql_qownnotes_extract(),
        "signal_extract": __import__(
            "jimmy_ray.sources.signal_chats", fromlist=["x"]
        ).sql_signal_extract(),
        "affine_extract": __import__(
            "jimmy_ray.sources.affine", fromlist=["x"]
        ).sql_affine_extract(),
        "onenote_extract": __import__(
            "jimmy_ray.sources.onenote", fromlist=["x"]
        ).sql_onenote_extract(),
        "zettelkasten_extract": __import__(
            "jimmy_ray.sources.archives", fromlist=["x"]
        ).sql_zettelkasten_extract(),
        "textbundle_extract": __import__(
            "jimmy_ray.sources.archives", fromlist=["x"]
        ).sql_textbundle_extract(),
        "rednotebook_extract": __import__(
            "jimmy_ray.sources.journals", fromlist=["x"]
        ).sql_rednotebook_extract(),
        "roam_extract": __import__(
            "jimmy_ray.sources.journals", fromlist=["x"]
        ).sql_roam_extract(),
        "pdf_extract": __import__(
            "jimmy_ray.sources.pdf", fromlist=["x"]
        ).sql_pdf_extract(),
        "pdf_image_features": __import__(
            "jimmy_ray.sources.pdf", fromlist=["x"]
        ).sql_pdf_image_features(),
        "pdf_jbig2_features": __import__(
            "jimmy_ray.sources.pdf", fromlist=["x"]
        ).sql_pdf_jbig2_features(),
        "sevenzip_extract": __import__(
            "jimmy_ray.sources.sevenzip", fromlist=["x"]
        ).sql_sevenzip_extract(),
        "container_dispatch": __import__(
            "jimmy_ray.sources.container_dispatch", fromlist=["x"]
        ).sql_container_dispatch(),
        "docx_extract": __import__(
            "jimmy_ray.sources.wordproc", fromlist=["x"]
        ).sql_docx_extract(),
        "odt_extract": __import__(
            "jimmy_ray.sources.wordproc", fromlist=["x"]
        ).sql_odt_extract(),
        "rtf_extract": __import__(
            "jimmy_ray.sources.wordproc", fromlist=["x"]
        ).sql_rtf_extract(),
        "asciidoc_extract": __import__(
            "jimmy_ray.sources.lightmarkup", fromlist=["x"]
        ).sql_asciidoc_extract(),
        "mediawiki_extract": __import__(
            "jimmy_ray.sources.lightmarkup", fromlist=["x"]
        ).sql_mediawiki_extract(),
        "epub_extract": __import__(
            "jimmy_ray.sources.epub", fromlist=["x"]
        ).sql_epub_extract(),
        "opml_extract": __import__(
            "jimmy_ray.sources.epub", fromlist=["x"]
        ).sql_opml_extract(),
        "org_extract": __import__(
            "jimmy_ray.sources.texmarkup", fromlist=["x"]
        ).sql_org_extract(),
        "rst_extract": __import__(
            "jimmy_ray.sources.texmarkup", fromlist=["x"]
        ).sql_rst_extract(),
        "latex_extract": __import__(
            "jimmy_ray.sources.texmarkup", fromlist=["x"]
        ).sql_latex_extract(),
        "dokuwiki_extract": __import__(
            "jimmy_ray.sources.lightmarkup", fromlist=["x"]
        ).sql_dokuwiki_extract(),
        "textile_extract": __import__(
            "jimmy_ray.sources.lightmarkup", fromlist=["x"]
        ).sql_textile_extract(),
        "creole_extract": __import__(
            "jimmy_ray.sources.markup_tail", fromlist=["x"]
        ).sql_creole_extract(),
        "vimwiki_extract": __import__(
            "jimmy_ray.sources.markup_tail", fromlist=["x"]
        ).sql_vimwiki_extract(),
        "docbook_extract": __import__(
            "jimmy_ray.sources.markup_tail", fromlist=["x"]
        ).sql_docbook_extract(),
        "djot_extract": __import__(
            "jimmy_ray.sources.pandoc_tail", fromlist=["x"]
        ).sql_djot_extract(),
        "typst_extract": __import__(
            "jimmy_ray.sources.pandoc_tail", fromlist=["x"]
        ).sql_typst_extract(),
        "endnote_extract": __import__(
            "jimmy_ray.sources.pandoc_tail", fromlist=["x"]
        ).sql_endnote_extract(),
        "url_canonicalize": __import__(
            "jimmy_ray.functions.webtext", fromlist=["x"]
        ).sql_url_canonicalize(),
        "url_dedup": __import__(
            "jimmy_ray.functions.webtext", fromlist=["x"]
        ).sql_url_dedup(),
        "domain_stats": __import__(
            "jimmy_ray.functions.webtext", fromlist=["x"]
        ).sql_domain_stats(),
        "warc_extract": __import__(
            "jimmy_ray.sources.warc", fromlist=["x"]
        ).sql_warc_extract(),
        "feed_extract": __import__(
            "jimmy_ray.sources.feeds", fromlist=["x"]
        ).sql_feed_extract(),
        "sitemap_extract": __import__(
            "jimmy_ray.sources.feeds", fromlist=["x"]
        ).sql_sitemap_extract(),
        "wet_extract": __import__(
            "jimmy_ray.sources.warc", fromlist=["x"]
        ).sql_wet_extract(),
        "cdx_index": __import__(
            "jimmy_ray.sources.warc", fromlist=["x"]
        ).sql_cdx_index(),
        "wat_extract": __import__(
            "jimmy_ray.sources.warc", fromlist=["x"]
        ).sql_wat_extract(),
        "charset_decode": __import__(
            "jimmy_ray.scalars.charset", fromlist=["x"]
        ).sql_charset_decode(),
        "main_content_extract": __import__(
            "jimmy_ray.html.maincontent", fromlist=["x"]
        ).sql_main_content_extract(),
        "c4_filters": __import__(
            "jimmy_ray.functions.c4", fromlist=["x"]
        ).sql_c4_filters(),
        "span_dedup": __import__(
            "jimmy_ray.functions.c4", fromlist=["x"]
        ).sql_span_dedup(),
        "anchor_text_agg": __import__(
            "jimmy_ray.functions.webgraph", fromlist=["x"]
        ).sql_anchor_text_agg(),
        "redirect_resolve": __import__(
            "jimmy_ray.functions.webgraph", fromlist=["x"]
        ).sql_redirect_resolve(),
        "snapshot_drift": __import__(
            "jimmy_ray.functions.webtext", fromlist=["x"]
        ).sql_snapshot_drift(),
        "tile_language_mix": __import__(
            "jimmy_ray.stages.geoagg", fromlist=["x"]
        ).sql_tile_language_mix(_POINTS_LANG_CTE),
        "crawl_schedule": __import__(
            "jimmy_ray.pipelines.crawl", fromlist=["x"]
        ).sql_crawl_schedule(),
        "crawl_text_pipeline": __import__(
            "jimmy_ray.pipelines.crawl", fromlist=["x"]
        ).sql_crawl_text_pipeline(),
        "fetch_waves": __import__(
            "jimmy_ray.pipelines.crawl", fromlist=["x"]
        ).sql_fetch_waves(),
        "normalize_corpus": __import__(
            "jimmy_ray.scalars.charset", fromlist=["x"]
        ).sql_normalize_corpus(),
        "inverted_index": __import__(
            "jimmy_ray.functions.textindex", fromlist=["x"]
        ).sql_inverted_index(),
        "top_terms_per_doc": __import__(
            "jimmy_ray.functions.textindex", fromlist=["x"]
        ).sql_top_terms_per_doc(),
        "term_search_topk": __import__(
            "jimmy_ray.functions.textindex", fromlist=["x"]
        ).sql_term_search_topk(),
        "source_geo_footprint": __import__(
            "jimmy_ray.stages.geoagg", fromlist=["x"]
        ).sql_source_geo_footprint(_POINTS_SOURCE_CTE),
        "collocations": __import__(
            "jimmy_ray.functions.textindex", fromlist=["x"]
        ).sql_collocations(),
        "frontier_gap": __import__(
            "jimmy_ray.functions.webtext", fromlist=["x"]
        ).sql_frontier_gap(),
        "triangle_count": __import__(
            "jimmy_ray.functions.webgraph", fromlist=["x"]
        ).sql_triangle_count(),
        "hits_scores": __import__(
            "jimmy_ray.functions.webgraph", fromlist=["x"]
        ).sql_hits(),
        "two_hop_reach": __import__(
            "jimmy_ray.functions.webgraph", fromlist=["x"]
        ).sql_two_hop_reach(),
        "url_template_mining": __import__(
            "jimmy_ray.functions.webtext", fromlist=["x"]
        ).sql_url_template_mining(),
        "onestore_extract": __import__(
            "jimmy_ray.sources.onestore", fromlist=["x"]
        ).sql_onestore_extract(),
        "latest_snapshot": __import__(
            "jimmy_ray.functions.webtext", fromlist=["x"]
        ).sql_latest_snapshot(),
        "robots_filter": __import__(
            "jimmy_ray.functions.robots", fromlist=["x"]
        ).sql_robots_filter(),
        "link_graph_degrees": __import__(
            "jimmy_ray.functions.webgraph", fromlist=["x"]
        ).sql_link_graph_degrees(),
        "pagerank": __import__(
            "jimmy_ray.functions.webgraph", fromlist=["x"]
        ).sql_pagerank(),
        "joplin_extract": __import__(
            "jimmy_ray.sources.joplin", fromlist=["x"]
        ).sql_joplin_extract(),
        "colornote_extract": __import__(
            "jimmy_ray.sources.colornote", fromlist=["x"]
        ).sql_colornote_extract(),
        "anki_extract": __import__(
            "jimmy_ray.sources.anki", fromlist=["x"]
        ).sql_anki_extract(),
        "wordpress_extract": __import__(
            "jimmy_ray.sources.wordpress", fromlist=["x"]
        ).sql_wordpress_extract(),
        "decrypt_notes": "SELECT doc_id, text FROM documents",
        "sqlite_notes": (
            "SELECT doc_id, 'Doc ' || CAST(doc_id AS VARCHAR) AS title, "
            "text AS body FROM documents"
        ),
        "resource_sink_names": __import__(
            "jimmy_ray.stages.resources", fromlist=["x"]
        ).sql_resource_sink_names(),
        "filename_recovery": __import__(
            "jimmy_ray.stages.filerecovery", fromlist=["x"]
        ).sql_filename_recovery(),
        "import_stats": (
            f"SELECT CAST({synth.N_VARIANTS} * c AS BIGINT) AS n_pages, "
            "CAST(c AS BIGINT) AS n_titled_notes, "
            "CAST(4 * c AS BIGINT) AS n_links, "
            "CAST(2 * c AS BIGINT) AS n_tags, "
            "CAST(0 AS BIGINT) AS n_errors "
            "FROM (SELECT COUNT(*) AS c FROM documents)"
        ),
        "wikitext_extract": __import__(
            "jimmy_ray.pipelines.wikitext_pipeline", fromlist=["x"]
        ).sql_wikitext_extract(),
        "lexical_extract": __import__(
            "jimmy_ray.pipelines.wikitext_pipeline", fromlist=["x"]
        ).sql_lexical_extract(),
        "tumbling_window": windows.sql_tumbling_window(),
        "session_window": windows.sql_session_window(),
        "sliding_window": windows.sql_sliding_window(),
        "text_stats": textstats.sql_text_stats(),
        "curate_corpus": textstats.sql_curate_corpus(),
        "repetition_stats": textstats.sql_repetition_stats(),
        "bpe_token_count": textstats.sql_bpe_token_count(),
        "paragraph_dedup": __import__(
            "jimmy_ray.functions.paradedup", fromlist=["x"]
        ).sql_paragraph_dedup(),
        "stratified_sample": __import__(
            "jimmy_ray.functions.mixtures", fromlist=["x"]
        ).sql_stratified_sample(),
        "pii_scrub": __import__(
            "jimmy_ray.functions.mixtures", fromlist=["x"]
        ).sql_pii_scrub(),
        "decontaminate": __import__(
            "jimmy_ray.functions.mixtures", fromlist=["x"]
        ).sql_decontaminate(),
        "chunk_documents": __import__(
            "jimmy_ray.functions.mixtures", fromlist=["x"]
        ).sql_chunk_documents(),
        "lang_id": textstats.sql_lang_id(),
        "doc_dedup_exact": (
            "SELECT md5(text) AS md5, MIN(doc_id) AS keep_doc_id, "
            "CAST(COUNT(*) AS BIGINT) AS n_dups FROM documents GROUP BY 1"
        ),
        "ngram_jaccard_pairs": dedup.sql_ngram_jaccard_pairs(),
        "dedup_clusters": dedup.sql_dedup_clusters(),
        "near_dedup_corpus": dedup.sql_near_dedup_corpus(),
        "ann_topk": simsearch.sql_ann_topk(),
        # embedding_dup_pairs is deliberately NOT mirrored: the replica
        # pairs are noisy (vec + N(0, 0.01)), so LSH recall is ~1-1.3e-4
        # per pair, not 1.0 — an exact pair-set mirror would be a seeded
        # coin flip at larger corpora.  Float-cosine ops stay rows-only
        # (CLAUDE.md rule); recall is pinned by accuracy tests instead
        # (tests/test_dedup_simsearch.py:113,161).
        "multimodal_features": multimodal.sql_media_features(),
        "image_features": multimodal.sql_image_features(),
        "audio_features": multimodal.sql_audio_features(),
        "video_frame_sample": multimodal.sql_video_frame_sample(),
    }
