"""Crawl scheduling: the capstone composition of the curation tiers.

A recrawl scheduler ranks the frontier by (page importance ×
freshness churn), gated by robots policy — exactly the three signals
the repo already computes as separate operators.  This pipeline
COMPOSES the shipped operators (it does not re-derive their logic):

    priority = rank × (1 + n_changes)   if robots allows the url
             = 0                         otherwise

- ``robots_filter``      → (doc_id, variant, url, allowed)
- ``pagerank``           → (node, rank)        [integer micro-ranks]
- ``snapshot_drift``     → (url, n_changes)

joined with two partitioned hash joins (partitions clamped to the row
count — the connected-components lesson) and finished with one integer
map.  The DuckDB mirror nests the SAME three oracle queries as
subqueries, so the composition is verified end-to-end, not re-modeled.

Scale shape: two exchanges over O(urls) rows; the rank side is
O(nodes) ≤ O(urls).  All integer arithmetic — bit-identical by
construction.
"""

from __future__ import annotations

import pyarrow as pa


def crawl_schedule(sf_dir: str, num_partitions: int = 8):
    from jimmy_ray.functions import robots, webgraph, webtext

    urls = robots.robots_filter(sf_dir)
    rank = webgraph.pagerank(sf_dir)
    drift = webtext.snapshot_drift(sf_dir)

    n_rows = webgraph._n_docs(sf_dir) * webtext.N_URL_VARIANTS
    num_partitions = max(1, min(num_partitions, n_rows // 4096 + 1))

    with_rank = urls.join(rank, join_type="inner",
                          num_partitions=num_partitions,
                          on=("doc_id",), right_on=("node",))
    with_drift = with_rank.join(
        drift.select_columns(["url", "n_changes"]),
        join_type="inner", num_partitions=num_partitions, on=("url",))

    def score(batch: pa.Table) -> pa.Table:
        import numpy as np

        allowed = batch["allowed"].to_numpy(zero_copy_only=False)
        rank_arr = batch["rank"].to_numpy(zero_copy_only=False)
        churn = batch["n_changes"].to_numpy(zero_copy_only=False)
        prio = np.where(allowed, rank_arr * (1 + churn), 0).astype("int64")
        return pa.table({
            "url": batch["url"],
            "doc_id": batch["doc_id"],
            "allowed": batch["allowed"],
            "priority": pa.array(prio, pa.int64()),
        })

    return with_drift.map_batches(score, batch_format="pyarrow",
                                  batch_size=8192)


def sql_crawl_schedule() -> str:
    from jimmy_ray.functions import robots, webgraph, webtext

    return f"""
SELECT u.url, u.doc_id, u.allowed,
       CAST(CASE WHEN u.allowed
                 THEN pr.rank * (1 + d.n_changes) ELSE 0 END
            AS BIGINT) AS priority
FROM ({robots.sql_robots_filter()}) u
JOIN ({webgraph.sql_pagerank()}) pr ON pr.node = u.doc_id
JOIN ({webtext.sql_snapshot_drift()}) d ON d.url = u.url
"""


# --- crawl-to-corpus e2e (WARC -> charset -> main content -> C4) -------------

def synth_crawl_html(doc_id: int, text: str, head: str = "") -> str:
    """Chrome-wrapped article with one junk paragraph: exercises the
    main-content kill/density rules AND the C4 line rules at once.

    ``head`` is spliced directly (no str.format pass) so braces in the
    corpus ``text`` can never break synthesis."""
    i = doc_id
    return (
        f"<html><head>{head}</head><body>"
        '<nav><a href="/">Home</a> <a href="/about">About</a></nav>'
        f"<header><h1>SiteName {i}</h1></header>"
        f'<div class="menu"><a href="/a">alpha {i}</a> '
        f'<a href="/b">beta {i}</a></div>'
        f'<div class="content"><h1>Doc {i}</h1>'
        f"<p>Doc {i}: {text} end of line one.</p>"
        f"<p>Café quality sentence for doc {i} with plenty of"
        " words.</p>"
        f"<p>Third sentence for doc {i} also long enough to keep.</p>"
        f"<p>no terminal punctuation in this paragraph {i}</p></div>"
        f"<aside>related {i}</aside><footer>&copy; example {i}</footer>"
        "</body></html>"
    )


def synth_crawl_warc(doc_id: int, text: str) -> bytes:
    """One response record per doc, charset variant = doc_id % 4 (the
    scalars/charset.py detection matrix), gzip-member layout on even
    doc_ids."""
    from jimmy_ray.sources import warc

    v = doc_id % 4
    head = '<meta charset="utf-8">' if v == 0 else ""
    html = synth_crawl_html(doc_id, text, head)
    if v == 0:
        ct, body = "text/html", html.encode("utf-8")
    elif v == 1:
        ct = "text/html"
        body = b"\xff\xfe" + html.encode("utf-16-le")
    elif v == 2:
        ct = "text/html; charset=ISO-8859-1"
        body = html.encode("windows-1252")
    else:
        ct, body = "text/html", html.encode("windows-1252")
    http = (f"HTTP/1.1 200 OK\r\nContent-Type: {ct}\r\n\r\n").encode() + body
    records = [
        warc._record("warcinfo", "", b"software: fixture-crawl\r\n"),
        warc._record("response", f"https://crawl.test/doc/{doc_id}", http),
    ]
    if doc_id % 2 == 0:
        return b"".join(warc._gzip_member(r) for r in records)
    return b"".join(records)


CRAWL_EXPECT = {0: ("utf-8", "meta"), 1: ("utf-16-le", "bom"),
                2: ("windows-1252", "http"), 3: ("windows-1252", "default")}


def crawl_text_pipeline(sf_dir: str):
    """The round-4 webtext tiers composed end-to-end as ONE streaming
    map chain: WARC record parse → HTTP split → charset sniff+decode →
    main-content extraction → C4 line/page rules.  Stateless per-doc;
    no exchange — the dedup/scheduling tiers hang off this output."""
    import ray.data as rd

    from jimmy_ray.functions.c4 import c4_clean_page
    from jimmy_ray.html.maincontent import main_content_markdown
    from jimmy_ray.scalars.charset import decode_html
    from jimmy_ray.sources import warc

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, charsets, srcs, texts = [], [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            for rec in warc.parse_warc(synth_crawl_warc(d, t)):
                if rec["headers"].get("warc-type") != "response":
                    continue
                _, http_headers, body = warc.parse_http_response(
                    rec["block"])
                decoded, codec, src = decode_html(
                    http_headers.get("content-type", ""), body)
                cleaned = c4_clean_page(main_content_markdown(decoded))
                if cleaned is None:
                    continue
                ids.append(d)
                charsets.append(codec)
                srcs.append(src)
                texts.append(cleaned)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "charset": pa.array(charsets, pa.string()),
            "src": pa.array(srcs, pa.string()),
            "text": pa.array(texts, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=256)


def sql_crawl_text_pipeline() -> str:
    i = "CAST(doc_id AS VARCHAR)"
    charset = ("CASE doc_id % 4 WHEN 1 THEN 'utf-16-le' WHEN 0 THEN"
               " 'utf-8' ELSE 'windows-1252' END")
    src = ("CASE doc_id % 4 WHEN 0 THEN 'meta' WHEN 1 THEN 'bom'"
           " WHEN 2 THEN 'http' ELSE 'default' END")
    return f"""
SELECT doc_id, {charset} AS charset, {src} AS src,
  'Doc ' || {i} || ': ' || text || ' end of line one.' || chr(10) ||
  'Café quality sentence for doc ' || {i}
    || ' with plenty of words.' || chr(10) ||
  'Third sentence for doc ' || {i} || ' also long enough to keep.'
    AS text
FROM documents
"""


# --- host-politeness fetch waves ----------------------------------------------

PER_WAVE = 4


def fetch_waves(sf_dir: str, per_wave: int = PER_WAVE):
    """Politeness partitioning: a crawler fetches at most ``per_wave``
    urls per registrable domain per wave, highest priority first (ties
    break by url).  Composes crawl_schedule; disallowed urls never
    enter the frontier.

    Shape: ONE coarse domain-bucket exchange with a local
    sort+rank+floor-divide fold per bucket — the per-host queue is the
    in-group top-k pattern, never a global sort.
    """
    import pandas as pd

    from jimmy_ray.functions.webtext import registrable_domain

    sched = crawl_schedule(sf_dir)

    def add_domain(batch: pa.Table) -> "pd.DataFrame":
        import pandas as pd

        df = batch.to_pandas()
        df = df[df["allowed"]].copy()
        df["domain"] = [registrable_domain(u) for u in df["url"]]
        df["__b"] = (pd.util.hash_array(df["domain"].to_numpy(dtype=object))
                     % 64).astype("int64")
        return df[["url", "domain", "priority", "__b"]]

    def rank_waves(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["domain", "priority", "url"],
                          ascending=[True, False, True], kind="mergesort")
        rn = g.groupby("domain").cumcount()
        g = g.assign(wave=(rn // per_wave).astype("int64"))
        return g[["url", "domain", "priority", "wave"]]

    return (sched.map_batches(add_domain, batch_format="pyarrow",
                              batch_size=8192)
            .groupby("__b")
            .map_groups(rank_waves, batch_format="pandas"))


def sql_fetch_waves(per_wave: int = PER_WAVE) -> str:
    domain = "'example' || CAST(doc_id % 50 AS VARCHAR) || '.com'"
    return f"""
WITH s AS ({sql_crawl_schedule()})
SELECT url, domain, priority,
       CAST((rn - 1) // {per_wave} AS BIGINT) AS wave
FROM (
  SELECT url, {domain} AS domain, priority,
         row_number() OVER (PARTITION BY {domain}
                            ORDER BY priority DESC, url) AS rn
  FROM s WHERE allowed
)
"""
