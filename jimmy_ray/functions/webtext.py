"""Web-corpus URL curation: canonicalization, URL-dedup, domain stats.

Classic webtext-pipeline operators over the crawl's `url` column (the
normalization rules are the public conventions crawlers apply — RFC
3986 §6 syntax-based normalization plus the usual tracking-param
scrub):

- scheme and host lowercase; default ports stripped (``:80`` http,
  ``:443`` https); fragment dropped,
- ``utm_*`` / ``fbclid`` / ``gclid`` tracking params dropped, the
  remaining query params sorted by key (stable for equal keys),
  empty query dropped,
- path preserved byte-for-byte (case-significant per RFC 3986),
- registrable domain = last two host labels (naive eTLD heuristic;
  a real deployment ships the public-suffix list as a broadcast
  side table — same lookup shape, bigger dict).

Fixtures synthesize three messy variants per document (two of which
canonicalize identically) so the dedup is non-trivial; every step has
a DuckDB SQL mirror built from the same templates.

Scale shape: canonicalize is a stateless map (cheap string ops per
row); URL-dedup is map-side canonicalize + one groupby(canonical) —
the same single-exchange shape as exact dedup; domain stats
pre-aggregates per batch before a small groupby.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import pyarrow as pa
import pyarrow.compute as pc

_TRACKING_RE = re.compile(r"^(utm_|fbclid$|gclid$)")


def canonicalize_url(url: str) -> str:
    """RFC 3986 syntax normalization + tracking-param scrub."""
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    if port and not ((scheme == "http" and port == 80)
                     or (scheme == "https" and port == 443)):
        host = f"{host}:{port}"
    params = [p for p in parts.query.split("&") if p]
    kept = sorted((p for p in params
                   if not _TRACKING_RE.match(p.split("=", 1)[0])),
                  key=lambda p: p.split("=", 1)[0])
    query = "&".join(kept)
    return (f"{scheme}://{host}{parts.path}"
            + (f"?{query}" if query else ""))


def registrable_domain(url: str) -> str:
    host = (urlsplit(url).hostname or "").lower()
    labels = host.split(".")
    return ".".join(labels[-2:]) if len(labels) >= 2 else host


# --- fixtures (3 messy variants/doc; v0 and v1 canonicalize equal) ----------

N_URL_VARIANTS = 3


def synth_url(doc_id: int, variant: int) -> str:
    k = doc_id % 50
    if variant == 0:
        return (f"https://WWW.Example{k}.COM:443/Path{doc_id}/"
                f"?utm_source=feed&b=2&a=1#frag")
    if variant == 1:
        return f"https://www.example{k}.com/Path{doc_id}/?a=1&b=2"
    return f"http://example{k}.com:80/other{doc_id}"


def _sql_canonical(variant_expr: str = "v") -> str:
    """Canonical url per (doc_id, variant) — mirror of
    canonicalize_url(synth_url(...)) built from the same templates."""
    k = "CAST(doc_id % 50 AS VARCHAR)"
    i = "CAST(doc_id AS VARCHAR)"
    return (
        f"CASE WHEN {variant_expr} IN (0, 1) THEN "
        f"'https://www.example' || {k} || '.com/Path' || {i} || '/?a=1&b=2' "
        f"ELSE 'http://example' || {k} || '.com/other' || {i} END"
    )


_VARIANTS_CTE = ("WITH variants AS (SELECT * FROM (VALUES (0), (1), (2))"
                 " AS t(v))")


# --- queries ----------------------------------------------------------------

def url_canonicalize(sf_dir: str):
    """One row per (doc, variant): the messy url and its canonical."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, variants, urls, canon = [], [], [], []
        for d in batch["doc_id"].to_pylist():
            for v in range(N_URL_VARIANTS):
                u = synth_url(d, v)
                ids.append(d)
                variants.append(v)
                urls.append(u)
                canon.append(canonicalize_url(u))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "variant": pa.array(variants, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "canonical": pa.array(canon, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def sql_url_canonicalize() -> str:
    k = "CAST(doc_id % 50 AS VARCHAR)"
    i = "CAST(doc_id AS VARCHAR)"
    url = (
        "CASE v WHEN 0 THEN 'https://WWW.Example' || {k} || '.COM:443/Path'"
        " || {i} || '/?utm_source=feed&b=2&a=1#frag' "
        "WHEN 1 THEN 'https://www.example' || {k} || '.com/Path' || {i}"
        " || '/?a=1&b=2' "
        "ELSE 'http://example' || {k} || '.com:80/other' || {i} END"
    ).format(k=k, i=i)
    return f"""
{_VARIANTS_CTE}
SELECT doc_id, CAST(v AS BIGINT) AS variant, {url} AS url,
       {_sql_canonical()} AS canonical
FROM documents CROSS JOIN variants
"""


def url_dedup(sf_dir: str):
    """Canonical-URL dedup: canonicalize map-side, keep the first
    (lowest-variant) url per canonical, count the collapsed copies —
    the exact-dedup shape with URL normalization as the key."""
    import ray.data as rd

    ds = url_canonicalize(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        # map-side combine: one row per canonical per batch
        import pandas as pd

        df = batch.select(["canonical", "url", "variant"]).to_pandas()
        df = df.sort_values(["canonical", "variant"], kind="mergesort")
        g = df.groupby("canonical", sort=False)
        out = g.agg(url=("url", "first"), n_urls=("url", "size"),
                    min_variant=("variant", "min")).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=8192)

    def merge(batch):
        import pandas as pd

        g = batch.sort_values(["canonical", "min_variant"],
                              kind="mergesort").groupby("canonical",
                                                        sort=False)
        return g.agg(url=("url", "first"), n_urls=("n_urls", "sum"),
                     min_variant=("min_variant", "min")).reset_index()

    return (partials.repartition(8)
            .groupby("canonical")
            .map_groups(merge, batch_format="pandas")
            .select_columns(["canonical", "url", "n_urls"]))


def sql_url_dedup() -> str:
    return f"""
{_VARIANTS_CTE}, canon AS (
  SELECT doc_id, v, {_sql_canonical()} AS canonical
  FROM documents CROSS JOIN variants
)
SELECT canonical,
  CASE WHEN min(v) <= 1 THEN
    'https://WWW.Example' || CAST(doc_id % 50 AS VARCHAR)
      || '.COM:443/Path' || CAST(doc_id AS VARCHAR)
      || '/?utm_source=feed&b=2&a=1#frag'
  ELSE
    'http://example' || CAST(doc_id % 50 AS VARCHAR) || '.com:80/other'
      || CAST(doc_id AS VARCHAR)
  END AS url,
  CAST(count(*) AS BIGINT) AS n_urls
FROM canon
GROUP BY canonical, doc_id
"""


N_SNAPSHOTS = 3
_SNAP_EPOCH = 1_704_067_200  # 2024-01-01, same epoch as synth pages
_SNAP_YEAR = 31_536_000
_SNAP_STEP = 8117            # coprime-ish stride so the argmax varies


def snapshot_ts_s(doc_id: int, variant: int, snap: int) -> int:
    key = doc_id * N_URL_VARIANTS + variant
    return _SNAP_EPOCH + (key * 997 + snap * _SNAP_STEP) % _SNAP_YEAR


def latest_snapshot(sf_dir: str):
    """Recrawl collapse: keep the newest capture per url.

    Crawls re-fetch every url; the corpus wants exactly one row per url
    — the latest snapshot.  Fixtures synthesize N_SNAPSHOTS captures
    per url with template-derived timestamps (the argmax snapshot
    varies per url), then the operator runs the exact-dedup exchange
    shape with keep-max-ts instead of keep-first: map-side partial
    keep-max per batch, one groupby(url), merge keep-max.  At 100 TB
    this is the same single all-to-all as url_dedup; no driver state.
    """
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def snaps(batch: pa.Table) -> pa.Table:
        ids, variants, snaps_, ts = [], [], [], []
        for d in batch["doc_id"].to_pylist():
            for v in range(N_URL_VARIANTS):
                for s in range(N_SNAPSHOTS):
                    ids.append(d)
                    variants.append(v)
                    snaps_.append(s)
                    ts.append(snapshot_ts_s(d, v, s))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "variant": pa.array(variants, pa.int64()),
            "snap": pa.array(snaps_, pa.int64()),
            "ts_s": pa.array(ts, pa.int64()),
            "url": pa.array(
                [synth_url(d, v) for d, v in zip(ids, variants)],
                pa.string()),
        })

    def keep_max(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        idx = df.groupby("url", sort=False)["ts_s"].idxmax()
        out = df.loc[idx, ["url", "ts_s", "snap"]].copy()
        out["n_snaps"] = df.groupby("url", sort=False)["ts_s"] \
            .size().reindex(out["url"]).to_numpy()
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = docs.map_batches(snaps, batch_format="pyarrow",
                                batch_size=4096) \
        .map_batches(keep_max, batch_format="pyarrow", batch_size=8192)

    def merge(df):
        import pandas as pd

        i = df["ts_s"].idxmax()
        return pd.DataFrame({
            "url": [df["url"].iloc[0]],
            "rev": [int(df.loc[i, "snap"])],
            "n_snaps": [int(df["n_snaps"].sum())],
            "warc_ts_s": [int(df.loc[i, "ts_s"])],
        })

    return (partials.repartition(8)
            .groupby("url")
            .map_groups(merge, batch_format="pandas"))


def sql_latest_snapshot() -> str:
    key = f"(doc_id * {N_URL_VARIANTS} + v)"
    url = (
        "CASE v WHEN 0 THEN 'https://WWW.Example' || CAST(doc_id % 50 AS"
        " VARCHAR) || '.COM:443/Path' || CAST(doc_id AS VARCHAR)"
        " || '/?utm_source=feed&b=2&a=1#frag' "
        "WHEN 1 THEN 'https://www.example' || CAST(doc_id % 50 AS VARCHAR)"
        " || '.com/Path' || CAST(doc_id AS VARCHAR) || '/?a=1&b=2' "
        "ELSE 'http://example' || CAST(doc_id % 50 AS VARCHAR)"
        " || '.com:80/other' || CAST(doc_id AS VARCHAR) END"
    )
    return f"""
{_VARIANTS_CTE}, snaps AS (SELECT * FROM (VALUES (0), (1), (2)) AS t(s)),
caps AS (
  SELECT {url} AS url, s,
         {_SNAP_EPOCH} + ({key} * 997 + s * {_SNAP_STEP}) % {_SNAP_YEAR}
           AS ts_s
  FROM documents CROSS JOIN variants CROSS JOIN snaps
)
SELECT url, CAST(arg_max(s, ts_s) AS BIGINT) AS rev,
       CAST(count(*) AS BIGINT) AS n_snaps,
       CAST(max(ts_s) AS BIGINT) AS warc_ts_s
FROM caps GROUP BY url
"""


def domain_stats(sf_dir: str):
    """Registrable-domain rollup: urls + distinct docs per domain,
    pre-aggregated inside map_batches before one small groupby.  The
    exact-distinct doc count ships per-batch doc-id sets (fine while
    docs/domain is modest); at 100 TB swap the set for the mergeable
    HLL sketch in functions/sketches.py — same partial/merge shape,
    constant state per domain."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        rows = []
        for d in batch["doc_id"].to_pylist():
            for v in range(N_URL_VARIANTS):
                rows.append((registrable_domain(synth_url(d, v)), d))
        df = pd.DataFrame(rows, columns=["domain", "doc_id"])
        g = df.groupby("domain", sort=False)
        out = g.agg(n_urls=("doc_id", "size"),
                    n_docs=("doc_id", "nunique")).reset_index()
        # n_docs partials can't just sum across batches; ship doc sets
        # compactly as per-batch uniques and re-count after the shuffle
        out2 = df.drop_duplicates().groupby("domain", sort=False).agg(
            docs=("doc_id", lambda s: list(s))).reset_index()
        out = out.merge(out2, on="domain")
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = docs.map_batches(partial, batch_format="pyarrow",
                                batch_size=4096)

    def merge(batch):
        import pandas as pd

        domain = batch["domain"].iloc[0]
        docs_all = set()
        for lst in batch["docs"]:
            docs_all.update(lst)
        return pd.DataFrame({
            "domain": [domain],
            "n_urls": [int(batch["n_urls"].sum())],
            "n_docs": [len(docs_all)],
        })

    return (partials.repartition(8)
            .groupby("domain")
            .map_groups(merge, batch_format="pandas"))


def sql_domain_stats() -> str:
    k = "CAST(doc_id % 50 AS VARCHAR)"
    return f"""
{_VARIANTS_CTE}
SELECT 'example' || {k} || '.com' AS domain,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM documents CROSS JOIN variants
GROUP BY domain
"""


# --- snapshot content drift ---------------------------------------------------

CONTENT_MOD = 3


def snapshot_rev(doc_id: int, variant: int, snap: int) -> int:
    """Content revision id of one capture — the key%3 factor makes a
    third of the urls never change and the quadratic term makes the
    rest repeat one consecutive capture, so n_changes varies."""
    key = doc_id * N_URL_VARIANTS + variant
    return (key * 13 + (key % 3) * snap * snap) % CONTENT_MOD


def snapshot_drift(sf_dir: str):
    """Per-url recrawl churn: captures ordered by timestamp, count the
    content CHANGES between consecutive snapshots (the lag-window shape:
    crawl scheduling uses it to set refetch intervals).

    Scale shape: capture rows explode map-side, then ONE coarse
    url-hash-bucket exchange with a local sort+shift fold per bucket —
    a url's captures are tiny, so the per-key window never needs a
    distributed sort, only co-location (the same pattern as url_dedup).
    """
    import pandas as pd
    import ray.data as rd

    from jimmy_ray.functions.folds import n_fold_buckets, parquet_rows

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    nb = n_fold_buckets(parquet_rows(f"{sf_dir}/documents.parquet")
                        * N_URL_VARIANTS * N_SNAPSHOTS)

    def caps(batch: pa.Table) -> "pd.DataFrame":
        rows = []
        for d in batch["doc_id"].to_pylist():
            for v in range(N_URL_VARIANTS):
                u = synth_url(d, v)
                for s in range(N_SNAPSHOTS):
                    rows.append((u, snapshot_ts_s(d, v, s),
                                 snapshot_rev(d, v, s)))
        df = pd.DataFrame(rows, columns=["url", "ts_s", "rev"])
        df["__b"] = (pd.util.hash_array(df["url"].to_numpy(dtype=object))
                     % nb).astype("int64")
        return df

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        g = g.sort_values(["url", "ts_s"], kind="mergesort")
        changed = (g["rev"] != g.groupby("url")["rev"].shift()) \
            & g.groupby("url")["rev"].shift().notna()
        g = g.assign(chg=changed.astype("int64"))
        out = g.groupby("url").agg(
            n_caps=("rev", "size"), n_changes=("chg", "sum"),
            first_ts_s=("ts_s", "min"), last_ts_s=("ts_s", "max"),
        ).reset_index()
        return out

    return (docs.map_batches(caps, batch_format="pyarrow",
                             batch_size=4096)
            .groupby("__b")
            .map_groups(fold, batch_format="pandas"))


def sql_snapshot_drift() -> str:
    key = f"(doc_id * {N_URL_VARIANTS} + v)"
    url = (
        "CASE v WHEN 0 THEN 'https://WWW.Example' || CAST(doc_id % 50 AS"
        " VARCHAR) || '.COM:443/Path' || CAST(doc_id AS VARCHAR)"
        " || '/?utm_source=feed&b=2&a=1#frag' "
        "WHEN 1 THEN 'https://www.example' || CAST(doc_id % 50 AS VARCHAR)"
        " || '.com/Path' || CAST(doc_id AS VARCHAR) || '/?a=1&b=2' "
        "ELSE 'http://example' || CAST(doc_id % 50 AS VARCHAR)"
        " || '.com:80/other' || CAST(doc_id AS VARCHAR) END"
    )
    return f"""
{_VARIANTS_CTE}, snaps AS (SELECT * FROM (VALUES (0), (1), (2)) AS t(s)),
caps AS (
  SELECT {url} AS url,
         {_SNAP_EPOCH} + ({key} * 997 + s * {_SNAP_STEP}) % {_SNAP_YEAR}
           AS ts_s,
         ({key} * 13 + ({key} % 3) * s * s) % {CONTENT_MOD} AS rev
  FROM documents CROSS JOIN variants CROSS JOIN snaps
), d AS (
  SELECT url, ts_s, rev,
         LAG(rev) OVER (PARTITION BY url ORDER BY ts_s) AS prev
  FROM caps
)
SELECT url, CAST(count(*) AS BIGINT) AS n_caps,
       CAST(sum(CASE WHEN prev IS NOT NULL AND rev <> prev
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
       CAST(min(ts_s) AS BIGINT) AS first_ts_s,
       CAST(max(ts_s) AS BIGINT) AS last_ts_s
FROM d GROUP BY url
"""


# --- crawl-frontier coverage gap (distributed anti-joins) ---------------------

def frontier_gap(sf_dir: str, num_partitions: int = 8):
    """Sitemap-vs-crawl set difference, both directions: urls the
    sitemap lists but the crawl never fetched (``uncrawled``) and urls
    the crawl holds that the sitemap no longer lists
    (``uncatalogued``) — the crawl-ops coverage report.

    Fixture: the sitemap side lists url variants {0, 1} per doc, the
    crawl side holds {1, 2}, so v0 is uncrawled and v2 uncatalogued.

    Shape: the distributed ANTI-JOIN — left_outer hash join then a
    null-probe filter, once per direction (Ray Data has no native
    anti join; this is the composition a cluster would run).  Join
    partitions clamp to the row count."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    n_docs = pq.ParquetFile(
        f"{sf_dir}/documents.parquet").metadata.num_rows
    num_partitions = max(1, min(num_partitions,
                                n_docs * 2 // 4096 + 1))

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def side(variants, colname):
        def fn(batch: pa.Table) -> pa.Table:
            urls = [synth_url(d, v)
                    for d in batch["doc_id"].to_pylist()
                    for v in variants]
            return pa.table({colname: pa.array(urls, pa.string())})
        return docs.map_batches(fn, batch_format="pyarrow",
                                batch_size=4096)

    sitemap = side((0, 1), "url")
    crawled = side((1, 2), "curl")

    def anti(left, right, right_col, marker, status):
        # the join drops the right KEY column from the output, so the
        # right side carries a constant marker column to null-probe
        joined = left.join(right, join_type="left_outer",
                           num_partitions=num_partitions,
                           on=("url",), right_on=(right_col,))

        def only_missing(batch: pd.DataFrame) -> pa.Table:
            miss = batch[batch[marker].isna()]
            return pa.table({
                "url": pa.array(miss["url"], pa.string()),
                "status": pa.array([status] * len(miss), pa.string()),
            })

        return joined.map_batches(only_missing, batch_format="pandas")

    def with_marker(ds, key_in, key_out, marker):
        return ds.map_batches(
            lambda t, ki=key_in, ko=key_out, m=marker: pa.table(
                {ko: t[ki], m: pa.array([1] * t.num_rows, pa.int64())}),
            batch_format="pyarrow")

    uncrawled = anti(sitemap, with_marker(crawled, "curl", "curl", "cmark"),
                     "curl", "cmark", "uncrawled")
    uncatalogued = anti(
        crawled.map_batches(lambda t: pa.table({"url": t["curl"]}),
                            batch_format="pyarrow"),
        with_marker(sitemap, "url", "surl", "smark"),
        "surl", "smark", "uncatalogued")
    return uncrawled.union(uncatalogued)


def sql_frontier_gap() -> str:
    u = (
        "CASE v WHEN 0 THEN 'https://WWW.Example' || CAST(doc_id % 50 AS"
        " VARCHAR) || '.COM:443/Path' || CAST(doc_id AS VARCHAR)"
        " || '/?utm_source=feed&b=2&a=1#frag' "
        "WHEN 1 THEN 'https://www.example' || CAST(doc_id % 50 AS VARCHAR)"
        " || '.com/Path' || CAST(doc_id AS VARCHAR) || '/?a=1&b=2' "
        "ELSE 'http://example' || CAST(doc_id % 50 AS VARCHAR)"
        " || '.com:80/other' || CAST(doc_id AS VARCHAR) END"
    )
    return f"""
WITH sm AS (
  SELECT {u} AS url FROM documents
  CROSS JOIN (SELECT * FROM (VALUES (0), (1)) AS t(v))
), cr AS (
  SELECT {u} AS url FROM documents
  CROSS JOIN (SELECT * FROM (VALUES (1), (2)) AS t(v))
)
SELECT url, 'uncrawled' AS status FROM sm
WHERE url NOT IN (SELECT url FROM cr)
UNION ALL
SELECT url, 'uncatalogued' FROM cr
WHERE url NOT IN (SELECT url FROM sm)
"""


# --- URL template mining --------------------------------------------------------

_DIGITS_RE = re.compile(r"[0-9]+")


def url_template(url: str) -> str:
    """Generalize a url into its path template: digit runs become
    ``<d>`` — the classic crawler heuristic for spotting calendar
    traps, pagination spaces and parameter explosions."""
    parts = urlsplit(url)
    path = _DIGITS_RE.sub("<d>", parts.path)
    query = _DIGITS_RE.sub("<d>", parts.query)
    host = (parts.hostname or "").lower()
    return f"{host}{path}" + (f"?{query}" if query else "")


def url_template_mining(sf_dir: str):
    """Group the frontier by (registrable domain, url template):
    url count and the lexicographically smallest example per template.
    Map-side pre-aggregation per batch, one coarse template-hash
    exchange, local fold — templates with huge counts are the trap
    candidates a crawler throttles."""
    import pandas as pd
    import ray.data as rd

    from jimmy_ray.functions.folds import n_fold_buckets, parquet_rows

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    nb = n_fold_buckets(parquet_rows(f"{sf_dir}/documents.parquet")
                        * N_URL_VARIANTS)

    def partial(batch: pa.Table) -> pd.DataFrame:
        rows = []
        for d in batch["doc_id"].to_pylist():
            for v in range(N_URL_VARIANTS):
                u = synth_url(d, v)
                rows.append((registrable_domain(u), url_template(u), u))
        df = pd.DataFrame(rows, columns=["domain", "template", "url"])
        out = df.groupby(["domain", "template"], as_index=False).agg(
            p_n=("url", "size"), p_min=("url", "min"))
        out["__b"] = (pd.util.hash_array(
            out["template"].to_numpy(dtype=object)) % nb).astype("int64")
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["domain", "template"], as_index=False).agg(
            n_urls=("p_n", "sum"), example=("p_min", "min"))
        return out

    return (docs.map_batches(partial, batch_format="pyarrow",
                             batch_size=4096)
            .groupby("__b")
            .map_groups(fold, batch_format="pandas")
            .select_columns(["domain", "template", "n_urls", "example"]))


def sql_url_template_mining() -> str:
    k = "CAST(doc_id % 50 AS VARCHAR)"
    i = "CAST(doc_id AS VARCHAR)"
    url = (
        "CASE v WHEN 0 THEN 'https://WWW.Example' || {k} || '.COM:443/Path'"
        " || {i} || '/?utm_source=feed&b=2&a=1#frag' "
        "WHEN 1 THEN 'https://www.example' || {k} || '.com/Path' || {i}"
        " || '/?a=1&b=2' "
        "ELSE 'http://example' || {k} || '.com:80/other' || {i} END"
    ).format(k=k, i=i)
    # template derived in SQL with the same digit-run generalization:
    # host lowercased, path+query from the variant shapes
    # the host keeps its digits (only path+query generalize)
    template = (
        "CASE v WHEN 0 THEN 'www.example' || {k} || '.com/Path<d>/"
        "?utm_source=feed&b=<d>&a=<d>' "
        "WHEN 1 THEN 'www.example' || {k} || '.com/Path<d>/?a=<d>&b=<d>' "
        "ELSE 'example' || {k} || '.com/other<d>' END"
    ).format(k=k)
    return f"""
WITH variants AS (SELECT * FROM (VALUES (0), (1), (2)) AS t(v)),
u AS (
  SELECT 'example' || {k} || '.com' AS domain, {template} AS template,
         {url} AS url
  FROM documents CROSS JOIN variants
)
SELECT domain, template, CAST(count(*) AS BIGINT) AS n_urls,
       min(url) AS example
FROM u GROUP BY domain, template
"""
