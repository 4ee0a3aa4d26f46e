"""Deterministic synthesis of the Common-Crawl-style ``pages`` table.

BASELINE.json ``input_hint`` fixes the input schema:
``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)``.  This module derives that table deterministically from the
driver's ``documents.parquet`` (TESTDATA.md): each document row expands to
``N_VARIANTS`` page rows, one per HTML feature variant (FIXTURES.md §1
feature matrix), so the extraction stage is exercised feature-by-feature.

Everything is a pure function of ``(doc_id, variant, text, lang, source)``
— no uuid4 / now() (the reference's determinism invariant,
/root/reference/docs/contributing/development_considerations.md:11; its
seeded-uuid fallback /root/reference/src/jimmy/common.py:364-370 is
replaced by hashes of the key, cf. SURVEY.md §4).  Every derivation has a
DuckDB SQL mirror (the ``sql_*`` helpers) so the driver's oracle can
recompute the golden values independently from ``documents``.

``text`` carries the *golden extracted Markdown* — the byte-identity
oracle per url: ``extract(render(doc)) == golden(doc)`` where renderer
(here) and extractor (jimmy_ray.html.extract) are written independently.

Geo: ~30% of pages carry a ``<meta name="geo.position">`` tag whose
coordinates are integer-microdegree-exact (3 dense urban clusters + a
uniform sprinkle — forces hot-cell salting, FIXTURES.md §4).
"""

from __future__ import annotations

import html as html_mod

import numpy as np
import pyarrow as pa

N_VARIANTS = 9
EPOCH_2024 = 1_704_067_200  # 2024-01-01T00:00:00Z
YEAR_S = 31_536_000

# cluster centers (lat_e6, lon_e6) — shared with geo.polygon.CLUSTERS_E6
CLUSTERS_E6 = (
    (37_774_900, -122_419_400),
    (40_712_800, -74_006_000),
    (51_507_400, -127_800),
)

# Golden Markdown templates, one per variant.  {id} = doc_id, {text} = the
# document text verbatim.  The SQL mirror is generated from the same
# strings, so Python and DuckDB cannot drift.
VARIANT_TEMPLATES = (
    "{text}",
    "# Doc {id}\n\n{text}",
    "## Doc {id}\n\n*intro {id}* {text}",
    "- alpha {id}\n- beta {id}\n\n{text}",
    "| k | v |\n| --- | --- |\n| id | {id} |\n\n{text}",
    "- [x] done {id}\n- [ ] todo {id}\n\n{text}",
    "[site {id}](https://example.com/{id}) and ![pic {id}](img_{id}.png)"
    "\n\n[https://frame.example/{id}](https://frame.example/{id})\n\n{text}",
    "==hl {id}== ~~strike {id}~~ ++under {id}++ {text}",
    "[[Doc {prev}|wiki {id}]] #tag{id} #common {text}",
)

HOSTILE_TITLES = ("CON", "a/b:c*x", "g" * 200, "")


# --- scalar derivations (mirrored in SQL below) ----------------------------

def page_key(doc_id: int, variant: int) -> int:
    return doc_id * N_VARIANTS + variant


def page_url(doc_id: int, variant: int, source: str) -> str:
    return f"https://fixture.test/{source}/{doc_id:08d}/v{variant}"


def page_ts_us(key: int) -> int:
    return (EPOCH_2024 + (key * 997) % YEAR_S) * 1_000_000


def page_title(doc_id: int, key: int) -> str:
    if key % 101 == 0:
        return HOSTILE_TITLES[(key // 101) % len(HOSTILE_TITLES)]
    return f"Doc {doc_id}"


def page_geo(key: int) -> tuple[int, int] | None:
    """(lat_e6, lon_e6) for ~30% of pages, else None. Pure int arithmetic."""
    if key % 10 >= 3:
        return None
    h = (key * 2654435761) % 2_147_483_648
    c = h % 4
    if c < 3:
        clat, clon = CLUSTERS_E6[c]
        lat = clat + ((h // 7) % 20_001 - 10_000) * 10
        lon = clon + ((h // 11) % 20_001 - 10_000) * 10
    else:
        lat = (h % 170_000_001) - 85_000_000
        lon = ((h // 3) % 360_000_001) - 180_000_000
    return lat, lon


def golden_markdown(doc_id: int, variant: int, text: str) -> str:
    out = (
        VARIANT_TEMPLATES[variant]
        .replace("{prev}", str(doc_id - 1))
        .replace("{id}", str(doc_id))
        .replace("{text}", text)
    )
    return out.strip(" \n")


# --- HTML renderer (independent of the extractor) --------------------------

def _body_html(doc_id: int, variant: int, text: str) -> str:
    t = html_mod.escape(text)
    i = doc_id
    if variant == 0:
        return f"<p>{t}</p>"
    if variant == 1:
        return f"<h1>Doc {i}</h1><p>{t}</p>"
    if variant == 2:
        return f"<h2><strong>Doc {i}</strong></h2><p><em>intro {i}</em> {t}</p>"
    if variant == 3:
        return f"<ul><li>alpha {i}</li><li>beta {i}</li></ul><p>{t}</p>"
    if variant == 4:
        return (
            "<table><tr><th>k</th><th>v</th></tr>"
            f"<tr><td>id</td><td>{i}</td></tr></table><p>{t}</p>"
        )
    if variant == 5:
        return (
            '<div class="checklist">'
            f'<div><input type="checkbox" checked/>done {i}</div>'
            f'<div><input type="checkbox"/>todo {i}</div>'
            f"</div><p>{t}</p>"
        )
    if variant == 6:
        return (
            f'<p><a href="https://example.com/{i}">site {i}</a> and '
            f'<img src="img_{i}.png" alt="pic {i}"/></p>'
            f'<iframe src="https://frame.example/{i}"></iframe>'
            f"<p>{t}</p>"
        )
    if variant == 7:
        return f"<p><mark>hl {i}</mark> <s>strike {i}</s> <u>under {i}</u> {t}</p>"
    if variant == 8:
        return f"<p>[[Doc {i - 1}|wiki {i}]] #tag{i} #common {t}</p>"
    raise ValueError(f"unknown variant {variant}")


def render_html(doc_id: int, variant: int, text: str, title: str) -> bytes:
    key = page_key(doc_id, variant)
    geo = page_geo(key)
    geo_meta = ""
    if geo is not None:
        lat, lon = geo
        geo_meta = f'<meta name="geo.position" content="{lat / 1e6:.6f};{lon / 1e6:.6f}">'
    doc = (
        '<!DOCTYPE html><html><head><meta charset="utf-8">'
        f"{geo_meta}<title>{html_mod.escape(title)}</title></head>"
        f"<body>{_body_html(doc_id, variant, text)}</body></html>"
    )
    return doc.encode("utf-8")


# --- batch renderer (documents batch -> pages batch, 1:N_VARIANTS) ---------

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def render_pages_batch(batch: pa.Table, repeat: int = 1) -> pa.Table:
    """map_batches fn: documents rows -> N_VARIANTS * repeat page rows each.

    Fixture generation is inherently per-row string templating (like the
    reference's per-note converters, SURVEY.md §2.2); the engine's hot
    paths stay vectorized — this runs once to build test input.

    ``repeat > 1`` expands the corpus for bench runs (distinct urls and
    distinct geo per replica via ``key = (doc_id*repeat + rep)*N_VARIANTS + v``);
    the oracle-checked paths always use repeat=1, whose keys match the
    SQL mirrors exactly.
    """
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    sources = batch["source"].to_pylist()
    urls: list[str] = []
    tss: list[int] = []
    htmls: list[bytes] = []
    goldens: list[str] = []
    out_langs: list[str] = []
    for doc_id, text, lang, source in zip(doc_ids, texts, langs, sources):
        for rep in range(repeat):
            eff_id = doc_id * repeat + rep
            for v in range(N_VARIANTS):
                key = page_key(eff_id, v)
                url = page_url(doc_id, v, source)
                if repeat > 1:
                    url = f"{url}/r{rep}"
                urls.append(url)
                tss.append(page_ts_us(key))
                htmls.append(render_html(doc_id, v, text, page_title(doc_id, key)))
                goldens.append(golden_markdown(doc_id, v, text))
                out_langs.append(lang)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(goldens, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
        }
    )


def pages_dataset(sf_dir: str, repeat: int = 1):
    """documents.parquet -> streaming pages Dataset (never materialized)."""
    import functools

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet")
    if repeat > 1:
        # split the small documents table into many blocks so the 1:8*repeat
        # expansion parallelizes instead of running in one task
        ds = ds.repartition(64)
    fn = functools.partial(render_pages_batch, repeat=repeat)
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=64 if repeat > 1 else 512)


# --- kNN query point fixtures (scale-independent, FIXTURES.md §4) ----------

def query_points(n: int = 50) -> list[dict]:
    """Deterministic kNN query points: mix of cluster-local and uniform.
    Scale-independent, so the oracle embeds them as literal VALUES."""
    pts = []
    for i in range(n):
        h = (i * 2654435761 + 987_654_321) % 2_147_483_648
        c = h % 4
        if c < 3:
            clat, clon = CLUSTERS_E6[c]
            lat = clat + ((h // 7) % 20_001 - 10_000) * 10
            lon = clon + ((h // 11) % 20_001 - 10_000) * 10
        else:
            lat = (h % 170_000_001) - 85_000_000
            lon = ((h // 3) % 360_000_001) - 180_000_000
        pts.append({"qid": f"q{i:03d}", "lat_e6": lat, "lon_e6": lon,
                    "k": 5 + (i % 3) * 5})
    return pts


def sql_query_points_values(n: int = 50) -> str:
    """VALUES body (qid, qlat, qlon, k) mirroring query_points()."""
    return ", ".join(
        f"('{p['qid']}', {p['lat_e6']}, {p['lon_e6']}, {p['k']})"
        for p in query_points(n)
    )


# --- SQL mirrors (driver oracle; operate on the `documents` view) ----------

# expansion of documents to (doc_id, variant) pairs:
SQL_VARIANTS_CTE = (
    "variants AS (SELECT * FROM (VALUES "
    + ", ".join(f"({v})" for v in range(N_VARIANTS))
    + ") AS t(v))"
)

SQL_KEY = f"(doc_id * {N_VARIANTS} + v)"


def sql_page_url() -> str:
    return (
        "('https://fixture.test/' || source || '/' || "
        "lpad(CAST(doc_id AS VARCHAR), 8, '0') || '/v' || CAST(v AS VARCHAR))"
    )


def sql_page_ts() -> str:
    return (
        f"(TIMESTAMP '2024-01-01 00:00:00' + "
        f"to_seconds(({SQL_KEY} * 997) % {YEAR_S}))"
    )


def sql_golden_markdown() -> str:
    """CASE over variants rebuilding the golden markdown in DuckDB."""
    cases = []
    for v, tpl in enumerate(VARIANT_TEMPLATES):
        expr = "'" + tpl.replace("'", "''").replace(
            "{prev}", "' || CAST(doc_id - 1 AS VARCHAR) || '"
        ).replace(
            "{id}", "' || CAST(doc_id AS VARCHAR) || '"
        ).replace("{text}", "' || text || '") + "'"
        # embedded \n inside python template -> real newline in SQL literal;
        # trim mirrors golden_markdown's strip(" \n") for edge-empty text
        cases.append(f"WHEN {v} THEN trim({expr}, ' ' || chr(10))")
    return "CASE v " + " ".join(cases) + " END"


def sql_has_geo() -> str:
    return f"({SQL_KEY} % 10 < 3)"


def sql_geo_exprs() -> tuple[str, str]:
    """(lat_e6, lon_e6) SQL mirrors of page_geo (valid when sql_has_geo)."""
    h = f"(({SQL_KEY} * 2654435761) % 2147483648)"
    c = f"({h} % 4)"
    clat = (
        f"(CASE {c} WHEN 0 THEN {CLUSTERS_E6[0][0]} WHEN 1 THEN {CLUSTERS_E6[1][0]} "
        f"ELSE {CLUSTERS_E6[2][0]} END)"
    )
    clon = (
        f"(CASE {c} WHEN 0 THEN {CLUSTERS_E6[0][1]} WHEN 1 THEN {CLUSTERS_E6[1][1]} "
        f"ELSE {CLUSTERS_E6[2][1]} END)"
    )
    lat = (
        f"(CASE WHEN {c} < 3 THEN {clat} + (({h} // 7) % 20001 - 10000) * 10 "
        f"ELSE ({h} % 170000001) - 85000000 END)"
    )
    lon = (
        f"(CASE WHEN {c} < 3 THEN {clon} + (({h} // 11) % 20001 - 10000) * 10 "
        f"ELSE (({h} // 3) % 360000001) - 180000000 END)"
    )
    return lat, lon


# --- complex-table fixture (streamline_tables oracle) ----------------------

# One page per document exercising every table normalization at once:
# caption, colspan header, hidden cell, rowspan, block content in cells,
# list in cell (behavior port of streamline_tables,
# /root/reference/src/jimmy/md_lib/html_filter.py:568-673).  The golden
# markdown template below and sql_table_markdown() are generated from the
# same string, so Python and DuckDB cannot drift.

TABLE_GOLDEN_TEMPLATE = (
    "Stats {id}\n\n"
    "| k | pair |  |\n"
    "| --- | --- | --- |\n"
    "| id {id} | x | y |\n"
    "|  | a<br>b {id} | <br>- l1<br>- l2 {id} |"
)


def render_table_html(doc_id: int) -> str:
    i = doc_id
    return (
        "<html><body>"
        f"<table><caption>Stats {i}</caption>"
        '<tr><th>k</th><th colspan="2">pair</th></tr>'
        f'<tr><td rowspan="2">id {i}</td><td>x</td>'
        f"<td hidden>secret</td><td>y</td></tr>"
        f"<tr><td><p>a</p><p>b {i}</p></td>"
        f"<td><ul><li>l1</li><li>l2 {i}</li></ul></td></tr>"
        "</table></body></html>"
    )


def table_golden_markdown(doc_id: int) -> str:
    return TABLE_GOLDEN_TEMPLATE.replace("{id}", str(doc_id))


def sql_table_markdown() -> str:
    return (
        "'"
        + TABLE_GOLDEN_TEMPLATE.replace("'", "''").replace(
            "{id}", "' || CAST(doc_id AS VARCHAR) || '"
        )
        + "'"
    )
