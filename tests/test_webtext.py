"""URL canonicalization / dedup / domain rollup (functions/webtext.py)."""

from jimmy_ray.functions import webtext as wt


def test_canonicalize_rules():
    f = wt.canonicalize_url
    assert f("HTTPS://WWW.Ex.COM:443/P/?b=2&a=1#x") == \
        "https://www.ex.com/P/?a=1&b=2"
    assert f("http://ex.com:80/p") == "http://ex.com/p"
    assert f("http://ex.com:8080/p") == "http://ex.com:8080/p"  # non-default
    assert f("https://ex.com/p?utm_source=x&utm_medium=y&gclid=1&fbclid=2") \
        == "https://ex.com/p"
    assert f("https://ex.com/CaseKept/Path") == "https://ex.com/CaseKept/Path"
    # stable sort keeps equal-key param order
    assert f("https://ex.com/?a=2&a=1") == "https://ex.com/?a=2&a=1"
    assert f("https://ex.com/?") == "https://ex.com/"


def test_registrable_domain():
    f = wt.registrable_domain
    assert f("https://www.blog.example.com/x") == "example.com"
    assert f("http://example.com") == "example.com"
    assert f("http://localhost/x") == "localhost"


def test_fixture_variants_collapse_as_designed():
    c0 = wt.canonicalize_url(wt.synth_url(7, 0))
    c1 = wt.canonicalize_url(wt.synth_url(7, 1))
    c2 = wt.canonicalize_url(wt.synth_url(7, 2))
    assert c0 == c1 != c2
    assert wt.registrable_domain(wt.synth_url(7, 0)) == \
        wt.registrable_domain(wt.synth_url(7, 2)) == "example7.com"


# --- WARC -------------------------------------------------------------------

from jimmy_ray.sources import warc


def test_warc_record_grammar_and_layouts():
    for d in (4, 5):  # gzip-member chain vs plain
        recs = warc.parse_warc(warc.synth_warc(d, "t"))
        assert [r["headers"]["warc-type"] for r in recs] == \
            ["warcinfo", "request", "response", "response"]
        assert all(r["version"] == "WARC/1.0" for r in recs)
    # byte-deterministic fixtures
    assert warc.synth_warc(4, "t") == warc.synth_warc(4, "t")


def test_warc_content_length_slices_exactly():
    # a body containing the record delimiter must not split the record
    tricky = b"<p>a</p>\r\n\r\nWARC/1.0 fake"
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + tricky)
    payload = warc._record("response", "u", http)
    recs = warc.parse_warc(payload)
    assert len(recs) == 1
    status, _, body = warc.parse_http_response(recs[0]["block"])
    assert status == 200 and body == tricky


def test_warc_gzip_member_chain_roundtrip():
    members = [b"alpha " * 50, b"beta", b""]
    chain = b"".join(warc._gzip_member(m) for m in members if m)
    assert warc.split_gzip_members(chain) == b"".join(members)


def test_warc_non_response_records_skipped():
    rows = warc.warc_responses_to_rows(warc.synth_warc(7, "x"))
    assert [r["uri"] for r in rows] == [
        "https://crawl.test/doc/7", "https://crawl.test/doc/7/data"]


# --- feeds / sitemap --------------------------------------------------------

from jimmy_ray.sources import feeds


def test_rss_and_atom_share_the_html_path():
    for d in (4, 5):
        rows = (feeds.parse_rss if d % 2 else feeds.parse_atom)(
            feeds.synth_feed(d, "t"))
        assert rows[0]["text"].startswith(f"# Doc {d}")
        assert rows[1]["text"] == f"update **{d}**"
        assert feeds.synth_feed(d, "t") == feeds.synth_feed(d, "t")


def test_atom_html_content_is_unescaped_before_parse():
    payload = (b'<feed xmlns="http://www.w3.org/2005/Atom"><entry>'
               b"<title>T</title>"
               b'<content type="html">&lt;p&gt;a &amp;amp; b&lt;/p&gt;'
               b"</content></entry></feed>")
    assert feeds.parse_atom(payload)[0]["text"] == "a & b"


def test_sitemap_priority_integer_milli():
    rows = feeds.parse_sitemap(feeds.synth_sitemap(3, "x"))
    assert [r["priority_milli"] for r in rows] == [300, 400]
    no_prio = (b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
               b"<url><loc>https://a/</loc></url></urlset>")
    assert feeds.parse_sitemap(no_prio)[0]["priority_milli"] is None


# --- robots.txt (functions/robots.py): writer-unreachable branches ----------

from jimmy_ray.functions import robots as rb


def test_robots_group_selection_most_specific_agent():
    payload = (b"User-agent: *\nDisallow: /all\n\n"
               b"User-agent: jimmy\nDisallow: /j\n\n"
               b"User-agent: jimmybot\nDisallow: /jb\n")
    groups = rb.parse_robots(payload)
    assert rb.select_group(groups, "JimmyBot/1.0"[:8].lower()) == [(False, "/jb")]
    assert rb.select_group(groups, "jimmy") == [(False, "/j")]
    assert rb.select_group(groups, "otherbot") == [(False, "/all")]
    assert rb.select_group(groups, "x") == [(False, "/all")]


def test_robots_stacked_agent_lines_share_one_group():
    payload = (b"User-agent: a\nUser-agent: b\nDisallow: /x\n")
    groups = rb.parse_robots(payload)
    assert groups == [(["a", "b"], [(False, "/x")])]
    assert rb.is_allowed(payload, "https://h/x/y", agent="a") is False
    assert rb.is_allowed(payload, "https://h/x/y", agent="b") is False


def test_robots_longest_match_and_allow_tie():
    # longest pattern wins regardless of order
    payload = b"User-agent: *\nAllow: /p/public\nDisallow: /p\n"
    assert rb.is_allowed(payload, "https://h/p/public/1") is True
    assert rb.is_allowed(payload, "https://h/p/private") is False
    # exact length tie: Allow wins (RFC 9309 2.2.2)
    tie = b"User-agent: *\nDisallow: /abc\nAllow: /ab*\n"
    assert rb.is_allowed(tie, "https://h/abc") is True


def test_robots_wildcard_and_dollar_anchor():
    payload = b"User-agent: *\nDisallow: /*.pdf$\n"
    assert rb.is_allowed(payload, "https://h/doc.pdf") is False
    assert rb.is_allowed(payload, "https://h/doc.pdf?x=1") is True  # not at end
    assert rb.is_allowed(payload, "https://h/doc.pdfx") is True
    mid = b"User-agent: *\nDisallow: /a/*/secret\n"
    assert rb.is_allowed(mid, "https://h/a/b/secret") is False
    assert rb.is_allowed(mid, "https://h/a/secret") is True


def test_robots_comments_empty_disallow_and_unknown_fields():
    payload = (b"# header comment\n"
               b"User-agent: *  # trailing\n"
               b"Disallow:\n"           # empty = allow all (no-op)
               b"Crawl-delay: 10\n"
               b"Sitemap: https://h/s.xml\n")
    assert rb.is_allowed(payload, "https://h/anything") is True


def test_robots_query_included_in_match_target():
    payload = b"User-agent: *\nDisallow: /s?*sessionid=\n"
    assert rb.is_allowed(payload, "https://h/s?a=1&sessionid=9") is False
    assert rb.is_allowed(payload, "https://h/s?a=1") is True


def test_robots_fixture_verdicts_match_closed_form():
    for d in (0, 7, 17, 42, 99, 123):
        k = d % 50
        pb = rb.synth_robots(k)
        for v in range(3):
            u = wt.synth_url(d, v)
            want = (str(d)[0] == str(k % 10)) if v < 2 else (k % 2 != 0)
            assert rb.is_allowed(pb, u) is want, (d, v)


# --- link graph (functions/webgraph.py) --------------------------------------

def test_webgraph_edges_deterministic_and_bounded():
    import numpy as np

    from jimmy_ray.functions import webgraph as wg

    d = np.arange(100, dtype=np.int64)
    n = 100
    for j in range(wg.MAX_OUT - 1):
        dst = wg.edge_dsts(d, j, n)
        assert ((dst >= 0) & (dst < n)).all()
    # out_degree 0 nodes exist (dangling path exercised)
    assert (wg.out_degree(d) == 0).sum() == 25


def test_pagerank_mass_is_conserved_up_to_floor_loss(ray_session):
    """Total rank stays within N * (iterations * max floor loss) of the
    initial mass — catches double-count / dropped-contribution bugs."""
    from jimmy_ray.functions import webgraph as wg

    sf = "/root/testdata/sf0.001"
    df = wg.pagerank(sf).to_pandas()
    n = len(df)
    total0 = n * wg.RANK_SCALE
    total = int(df["rank"].sum())
    # every floor can lose at most (divisor-1); bound generously
    assert abs(total - total0) < total0 * 0.02
    assert (df["rank"] > 0).all()
    # in-degree-0 nodes hold exactly base + damped dangling share
    deg = wg.link_graph_degrees(sf).to_pandas()
    zero_in = set(deg.loc[deg["in_deg"] == 0, "node"])
    if zero_in:
        ranks = dict(zip(df["node"], df["rank"]))
        vals = {ranks[z] for z in zero_in}
        assert len(vals) == 1  # all zero-in-degree nodes identical


# --- WET / CDX-J / main-content (round-4 crawl tier) -------------------------

def test_wet_conversion_records_only_and_layouts():
    for d in (6, 7):  # gzip-member chain vs plain
        rows = warc.wet_conversions_to_rows(warc.synth_wet(d, "body"))
        assert [r["uri"] for r in rows] == [
            f"https://crawl.test/doc/{d}", f"https://crawl.test/doc/{d}/p2"]
        assert rows[0]["text"] == f"Doc {d}\nbody"
        assert rows[0]["refers_to"] == f"<urn:uuid:{d:032d}>"
        assert rows[1]["refers_to"] == ""
    assert warc.synth_wet(6, "b") == warc.synth_wet(6, "b")


def test_surt_key_normalization():
    k = warc.surt_key
    assert k("https://WWW.Example.COM:443/Path/?b=2&a=1") == \
        "com,example)/Path/?a=1&b=2"
    assert k("http://example.com:80/x") == "com,example)/x"
    assert k("http://example.com:8080/x") == "com,example:8080)/x"
    assert k("https://a.b.c.example.org/") == "org,example,c,b,a)/"
    assert k("https://example.com/p?") == "com,example)/p"  # empty query


def test_cdxj_roundtrip_sorted_by_surt():
    rows = warc.parse_cdxj(warc.synth_cdxj(9))
    keys = [r["urlkey"] for r in rows]
    assert keys == sorted(keys)
    assert all(r["status"] == "200" for r in rows)
    assert {r["ts"] for r in rows} <= {20240101000000 + v for v in range(3)}


def test_main_content_strips_chrome_keeps_article():
    from jimmy_ray.html.maincontent import (
        main_content_markdown, synth_chrome_page)

    md = main_content_markdown(synth_chrome_page(3, "hello world"))
    assert md.startswith("# Doc 3")
    assert "hello world" in md and "ref 3" in md
    for chrome in ("Home", "About", "SiteName", "alpha", "related links",
                   "example 3"):
        assert chrome not in md


def test_main_content_link_density_threshold():
    from jimmy_ray.html.maincontent import main_content_markdown

    nav_like = ("<html><body><div><a href='/a'>aaaa</a> <a href='/b'>bbbb"
                "</a></div><p>kept paragraph of plain prose</p></body></html>")
    md = main_content_markdown(nav_like)
    assert "kept paragraph" in md and "aaaa" not in md
    # below-threshold link density survives
    mixed = ("<html><body><div>lots of ordinary text around "
             "<a href='/x'>tiny</a> link</div></body></html>")
    assert "tiny" in main_content_markdown(mixed)


def test_wat_envelope_parse_and_layouts():
    for d in (6, 7):  # gzip vs plain
        rows = warc.wat_links_to_rows(warc.synth_wat(d))
        assert [r["path"] for r in rows] == ["A@/href", "IMG@/src"]
        assert rows[0]["title"] == f"Doc {d}"
        assert rows[0]["uri"] == f"https://crawl.test/doc/{d}"
    assert warc.synth_wat(6) == warc.synth_wat(6)


# --- charset sniffing (scalars/charset.py) -----------------------------------

from jimmy_ray.scalars import charset as cs


def test_charset_precedence_bom_beats_lying_meta():
    body = b"\xff\xfe" + '<meta charset="utf-8">x'.encode("utf-16-le")
    assert cs.sniff_charset("text/html", body) == ("utf-16-le", "bom")
    assert cs.sniff_charset(
        "text/html; charset=utf-8",
        b"\xef\xbb\xbfhi") == ("utf-8", "bom")


def test_charset_http_beats_meta_and_label_mapping():
    body = b'<meta charset="utf-8"><p>x</p>'
    assert cs.sniff_charset("text/html; charset=ISO-8859-1", body) == \
        ("windows-1252", "http")
    # unknown http label falls through to the meta declaration
    assert cs.sniff_charset("text/html; charset=klingon", body) == \
        ("utf-8", "meta")
    assert cs.normalize_label("Latin1") == "windows-1252"
    assert cs.normalize_label("UTF8") == "utf-8"
    assert cs.normalize_label("nope") is None


def test_charset_meta_prescan_window_cutoff():
    pad = b"<!-- " + b"x" * cs.PRESCAN_WINDOW + b" -->"
    body = pad + b'<meta charset="utf-8">'
    assert cs.sniff_charset("text/html", body) == ("windows-1252", "default")
    assert cs.sniff_charset("text/html", body[len(pad):]) == ("utf-8", "meta")


def test_charset_decode_strips_bom_and_maps_euro():
    text, codec, src = cs.decode_html("text/html", b"\xef\xbb\xbfabc")
    assert (text, codec, src) == ("abc", "utf-8", "bom")
    # 0x80 is the euro sign in cp1252 (undefined in true latin-1)
    text, codec, _ = cs.decode_html(
        "text/html; charset=iso-8859-1", b"\x80")
    assert text == "€" and codec == "windows-1252"


def test_charset_variants_match_goldens():
    from jimmy_ray.html.extract import html_to_markdown

    for v in range(cs.N_CHARSET_VARIANTS):
        ct, body = cs.synth_charset_page(5, "hello", v)
        text, codec, src = cs.decode_html(ct, body)
        assert html_to_markdown(text) == \
            cs.CHARSET_GOLDEN_TEMPLATES[v].format(id=5, text="hello")


# --- C4 cleaning (functions/c4.py) -------------------------------------------

from jimmy_ray.functions import c4


def test_c4_line_rules():
    assert c4.c4_line_keep("Five words ending in period.")
    assert c4.c4_line_keep('He said "quote words here now."')
    assert not c4.c4_line_keep("no terminal punctuation here at all")
    assert not c4.c4_line_keep("Too short.")
    assert not c4.c4_line_keep("Please enable JavaScript to continue now.")


def test_c4_page_rules():
    good = ["A b c d e.", "F g h i j.", "K l m n o."]
    assert c4.c4_page_keep("x", good)
    assert not c4.c4_page_keep("x", good[:2])          # < 3 sentences
    assert not c4.c4_page_keep("has Lorem Ipsum", good)
    assert not c4.c4_page_keep("code { brace }", good)
    # clean_page returns None on drop, joined survivors otherwise
    assert c4.c4_clean_page("short\n" + "\n".join(good)) == "\n".join(good)
    assert c4.c4_clean_page("\n".join(good[:2])) is None


def test_span_dedup_kernel_overlapping_and_indoc_repeats(ray_session):
    """Overlapping duplicate windows union their removals; a window
    repeated INSIDE one doc keeps only the first occurrence — branches
    the fixture never synthesizes."""
    import pandas as pd

    # emulate the removals fold on a hand-crafted span group
    g = pd.DataFrame({
        "span": ["s", "s", "s", "t"],
        "doc_id": [2, 1, 1, 9],
        "pos": [0, 4, 1, 0],
    })
    g = g.sort_values(["span", "doc_id", "pos"], kind="mergesort")
    dup = g.duplicated("span", keep="first")
    out = g.loc[dup, ["doc_id", "pos"]]
    # first occurrence of "s" is (1,1); (1,4) and (2,0) are removed
    assert sorted(map(tuple, out.to_numpy())) == [(1, 4), (2, 0)]


def test_span_dedup_group_owner_keeps_shared_triple(ray_session):
    df = c4.span_dedup("/root/testdata/sf0.001").to_pandas()
    owners = {}
    for d in sorted(df["doc_id"]):
        owners.setdefault(d % c4.N_SENT_GROUPS, d)
    for _, row in df.iterrows():
        is_owner = owners[row["doc_id"] % c4.N_SENT_GROUPS] == row["doc_id"]
        assert ("Shared intro" in row["text"]) == is_owner
        assert f"Alpha body sentence {row['doc_id']}" in row["text"]


# --- anchor aggregation / redirect resolution (functions/webgraph.py) --------

def test_anchor_agg_top_anchor_is_brand(ray_session):
    from jimmy_ray.functions import webgraph as wg

    df = wg.anchor_text_agg("/root/testdata/sf0.001").to_pandas()
    assert len(df) == wg.ANCHOR_MOD
    for _, r in df.iterrows():
        assert r["top_anchor"] == f"brand {r['target']}"
        assert r["n_anchors"] == 3          # brand + click here + read more
        assert r["n_inlinks"] % 3 == 0      # 3 inlink rows per source doc


def test_redirect_pointer_doubling_covers_max_chain(ray_session):
    """log2 rounds of composition must reach 2**rounds >= MAX_CHAIN."""
    import numpy as np

    from jimmy_ray.functions import webgraph as wg

    rounds = max(1, int(np.ceil(np.log2(max(wg.MAX_CHAIN, 2)))))
    assert 2 ** rounds >= wg.MAX_CHAIN
    df = wg.redirect_resolve("/root/testdata/sf0.001").to_pandas()
    assert len(df) == sum((d % (wg.MAX_CHAIN + 1)) + 1 for d in range(500))
    # terminal urls resolve to themselves with 0 hops
    terminals = df[df["hops"] == 0]
    assert (terminals["url"] == terminals["final_url"]).all()
    # the longest chains resolve across all MAX_CHAIN hops
    longest = df[df["hops"] == wg.MAX_CHAIN]
    assert len(longest) > 0
    for _, r in longest.iterrows():
        assert r["url"].endswith("hop0")
        assert r["final_url"].endswith(f"hop{wg.MAX_CHAIN}")


def test_snapshot_drift_window_semantics(ray_session):
    """n_changes counts consecutive-capture rev changes in ts order —
    recompute one url's expected value from the synth functions."""
    from jimmy_ray.functions import webtext as wt

    df = wt.snapshot_drift("/root/testdata/sf0.001").to_pandas()
    assert (df["n_caps"] == wt.N_SNAPSHOTS).all()
    assert df["n_changes"].between(0, wt.N_SNAPSHOTS - 1).all()
    assert df["n_changes"].nunique() > 1  # both change and no-change pairs
    u = wt.canonicalize_url  # silence unused-import linters
    d, v = 7, 1
    url = wt.synth_url(d, v)
    caps = sorted((wt.snapshot_ts_s(d, v, s), wt.snapshot_rev(d, v, s))
                  for s in range(wt.N_SNAPSHOTS))
    expected = sum(1 for (_, a), (_, b) in zip(caps, caps[1:]) if a != b)
    row = df[df["url"] == url].iloc[0]
    assert row["n_changes"] == expected
    assert row["first_ts_s"] == caps[0][0] and row["last_ts_s"] == caps[-1][0]


def test_tile_language_mix_totals_match_tile_counts(ray_session):
    from jimmy_ray.pipelines import flagship
    from jimmy_ray.stages import geoagg

    sf = "/root/testdata/sf0.001"
    mix = geoagg.tile_language_mix(sf).to_pandas()
    counts = flagship.tile_counts(sf).to_pandas()
    m = mix.set_index("tile_z10")["n_pages"].sort_index()
    c = counts.set_index("tile_z10")["n_pages"].sort_index()
    assert m.equals(c)  # language split partitions the tile counts
    assert (mix["n_langs"] >= 1).all()


def test_crawl_schedule_composes_the_three_tiers(ray_session):
    """Disallowed urls get priority 0; allowed priorities equal
    rank x (1 + churn) recomputed from the component operators."""
    from jimmy_ray.functions import webgraph, webtext
    from jimmy_ray.pipelines import crawl

    sf = "/root/testdata/sf0.001"
    df = crawl.crawl_schedule(sf).to_pandas()
    assert len(df) == 500 * webtext.N_URL_VARIANTS
    assert (df.loc[~df["allowed"], "priority"] == 0).all()
    assert (df.loc[df["allowed"], "priority"] > 0).all()
    ranks = dict(zip(*webgraph.pagerank(sf).to_pandas()
                     [["node", "rank"]].T.values))
    sample = df[df["allowed"]].head(20)
    for _, r in sample.iterrows():
        d = int(r["doc_id"])
        v = next(v for v in range(webtext.N_URL_VARIANTS)
                 if webtext.synth_url(d, v) == r["url"])
        revs = [webtext.snapshot_rev(d, v, s)
                for s in range(webtext.N_SNAPSHOTS)]
        order = sorted(range(webtext.N_SNAPSHOTS),
                       key=lambda s: webtext.snapshot_ts_s(d, v, s))
        churn = sum(1 for a, b in zip(order, order[1:])
                    if revs[a] != revs[b])
        assert r["priority"] == ranks[d] * (1 + churn)


def test_crawl_text_pipeline_stage_boundaries():
    """Every intermediate of the e2e chain is checked per charset
    variant: WARC slice, detection source, chrome removal, C4 drops."""
    from jimmy_ray.functions.c4 import c4_clean_page
    from jimmy_ray.html.maincontent import main_content_markdown
    from jimmy_ray.pipelines import crawl
    from jimmy_ray.scalars.charset import decode_html

    for d in range(8):
        payload = crawl.synth_crawl_warc(d, "hello world")
        recs = [r for r in warc.parse_warc(payload)
                if r["headers"]["warc-type"] == "response"]
        assert len(recs) == 1
        _, hh, body = warc.parse_http_response(recs[0]["block"])
        decoded, codec, src = decode_html(hh.get("content-type", ""), body)
        assert (codec, src) == crawl.CRAWL_EXPECT[d % 4]
        md = main_content_markdown(decoded)
        assert "SiteName" not in md and "alpha" not in md  # chrome gone
        assert "no terminal punctuation" in md             # C4's job, not MC's
        cleaned = c4_clean_page(md)
        assert cleaned is not None
        assert "no terminal punctuation" not in cleaned
        assert "Café quality" in cleaned and cleaned.count("\n") == 2


def test_fetch_waves_politeness_invariants(ray_session):
    from jimmy_ray.pipelines import crawl

    df = crawl.fetch_waves("/root/testdata/sf0.001").to_pandas()
    per_dom = df.groupby("domain")
    # at most PER_WAVE urls per (domain, wave); waves fill in order
    sizes = df.groupby(["domain", "wave"]).size()
    assert (sizes <= crawl.PER_WAVE).all()
    for dom, g in per_dom:
        waves = sorted(g["wave"].unique())
        assert waves == list(range(len(waves)))
        full = g["wave"].value_counts()
        for w in waves[:-1]:
            assert full[w] == crawl.PER_WAVE  # earlier waves are full
        # priority never increases across waves
        assert (g.sort_values(["wave", "priority", "url"],
                              ascending=[True, False, True])
                 .groupby("wave")["priority"].max().is_monotonic_decreasing)


def test_normalize_text_pipeline_order_and_scope():
    """NFC composes decomposed accents; C0/C1 controls die but tab and
    newline survive their steps; collapse runs after tab mapping."""
    n = cs.normalize_text
    assert n("Café") == "Café"            # NFC composition
    assert n("a\x00b\x07c\x9fd") == "abcd"      # C0 + C1 deleted
    assert n("a\tb") == "a b"                   # tab -> space
    assert n("a \t b") == "a b"                 # collapse AFTER tab map
    assert n("line one   \nline two  ") == "line one\nline two"
    assert n("keep\nnewlines\n\nintact") == "keep\nnewlines\n\nintact"


def test_normalize_matches_duckdb_nfc_independently():
    """The oracle really recomputes NFC: run the SQL pipeline on a raw
    string DuckDB builds itself and diff against unicodedata."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS "
                "SELECT CAST(9 AS BIGINT) AS doc_id, 'x  y' AS text")
    sql_text = con.execute(cs.sql_normalize_corpus()).fetchone()[1]
    py_text = cs.normalize_text(cs.synth_messy_text(9, "x  y"))
    assert sql_text == py_text
    con.close()


# --- search-index ops over REAL text (functions/textindex.py) ----------------

def test_tokenization_matches_duckdb_re2():
    import duckdb

    from jimmy_ray.functions.textindex import tokenize

    con = duckdb.connect()
    rows = con.execute(
        "SELECT text FROM read_parquet("
        "'/root/testdata/sf0.001/documents.parquet') LIMIT 100").fetchall()
    for (t,) in rows:
        db = [r[0] for r in con.execute(
            "SELECT unnest(regexp_extract_all(lower(?), '[a-z]+'))",
            [t]).fetchall()]
        assert tokenize(t) == db
    con.close()


def test_inverted_index_postings_sorted_and_consistent(ray_session):
    from jimmy_ray.functions.textindex import inverted_index

    df = inverted_index("/root/testdata/sf0.001").to_pandas()
    assert df["term"].is_unique
    for _, r in df.head(50).iterrows():
        docs = [int(x) for x in r["postings"].split(",")]
        assert docs == sorted(docs)          # ordered postings
        assert len(docs) == r["n_docs"]      # df == posting length
        assert r["total_tf"] >= r["n_docs"]  # tf bounds df


def test_top_terms_rank_is_deterministic(ray_session):
    from jimmy_ray.functions.textindex import TOP_K, tokenize, top_terms_per_doc

    df = top_terms_per_doc("/root/testdata/sf0.001").to_pandas()
    g = df[df["doc_id"] == 7].sort_values("rank")
    assert list(g["rank"]) == list(range(1, len(g) + 1))
    assert len(g) <= TOP_K
    # recompute doc 7's tf from the raw text and check rank-1 term
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet") \
        .to_pandas().set_index("doc_id").loc[7, "text"]
    from collections import Counter

    tf = Counter(tokenize(t))
    top = g.iloc[0]
    assert tf[top["term"]] == top["tf"]
    assert top["tf"] == max(tf.values())


def test_term_search_scoring_brute_force_equivalence(ray_session):
    """Recompute one query's full ranking from raw text + Counter."""
    from collections import Counter

    import pyarrow.parquet as pq

    from jimmy_ray.functions import textindex as ti

    sf = "/root/testdata/sf0.001"
    df = ti.term_search_topk(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    n = len(docs)
    tfs = {int(r.doc_id): Counter(ti.tokenize(r.text))
           for r in docs.itertuples()}
    dfreq = Counter()
    for c in tfs.values():
        dfreq.update(c.keys())
    for qid, terms in ti.SEARCH_QUERIES.items():
        scores = {}
        for d, c in tfs.items():
            s = sum(c[t] * ti.search_weight(n, dfreq[t])
                    for t in terms if dfreq[t])
            if s > 0:
                scores[d] = s
        expect = sorted(scores.items(),
                        key=lambda kv: (-kv[1], kv[0]))[:ti.SEARCH_K]
        got = df[df["qid"] == qid].sort_values("rank")
        assert list(zip(got["doc_id"], got["score"])) == expect, qid
    # the all-unseen-terms query returns nothing
    unseen_all = [q for q, ts in ti.SEARCH_QUERIES.items()
                  if all(dfreq[t] == 0 for t in ts)]
    for q in unseen_all:
        assert (df["qid"] == q).sum() == 0


def test_source_geo_footprint_bbox_contains_all_points(ray_session):
    from jimmy_ray.stages import geoagg

    sf = "/root/testdata/sf0.001"
    fp = geoagg.source_geo_footprint(sf).to_pandas()
    pts = geoagg.geo_points_source(sf).to_pandas()
    assert fp["n_points"].sum() == len(pts)
    for _, r in fp.iterrows():
        g = pts[pts["source"] == r["source"]]
        assert len(g) == r["n_points"]
        assert g["lat_e6"].min() == r["min_lat"]
        assert g["lat_e6"].max() == r["max_lat"]
        assert g["lon_e6"].min() == r["min_lon"]
        assert g["lon_e6"].max() == r["max_lon"]
        assert 1 <= r["n_tiles"] <= r["n_points"]


def test_collocations_lift_brute_force(ray_session):
    """Recompute every returned bigram's lift from raw text counts and
    assert the cut is the true global top-k under the total order."""
    from collections import Counter

    import pyarrow.parquet as pq

    from jimmy_ray.functions import textindex as ti

    sf = "/root/testdata/sf0.001"
    got = ti.collocations(sf).to_pandas()
    texts = pq.read_table(f"{sf}/documents.parquet") \
        .to_pandas()["text"].tolist()
    uni, bi = Counter(), Counter()
    for t in texts:
        toks = ti.tokenize(t)
        uni.update(toks)
        bi.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    n_tokens = sum(uni.values())
    expect = []
    for bg, n_ab in bi.items():
        if n_ab < ti.COLLOC_MIN_COUNT:
            continue
        a, b = bg.split(" ", 1)
        expect.append((bg, n_ab, uni[a], uni[b],
                       n_ab * n_tokens * 1000 // (uni[a] * uni[b])))
    expect.sort(key=lambda r: (-r[4], r[0]))
    expect = expect[:ti.COLLOC_K]
    rows = list(got[["bigram", "n_ab", "n_a", "n_b", "lift_milli"]]
                .itertuples(index=False, name=None))
    assert rows == expect


def test_frontier_gap_anti_join_directions(ray_session):
    from jimmy_ray.functions import webtext as wt

    df = wt.frontier_gap("/root/testdata/sf0.001").to_pandas()
    unc = df[df["status"] == "uncrawled"]["url"]
    cat = df[df["status"] == "uncatalogued"]["url"]
    assert len(unc) == 500 and len(cat) == 500
    assert set(unc) == {wt.synth_url(d, 0) for d in range(500)}
    assert set(cat) == {wt.synth_url(d, 2) for d in range(500)}
    # the shared variant (v1) appears on neither side
    shared = {wt.synth_url(d, 1) for d in range(500)}
    assert shared.isdisjoint(set(df["url"]))


def test_triangle_count_brute_force(ray_session):
    """Recompute the exact triangle count from the edge formula with a
    driver-side set intersection."""
    import numpy as np

    from jimmy_ray.functions import webgraph as wg

    sf = "/root/testdata/sf0.001"
    n = 500
    edges = set()
    d = np.arange(n, dtype=np.int64)
    for j in range(wg.MAX_OUT - 1):
        src = d[d % wg.MAX_OUT > j]
        dst = wg.edge_dsts(src, j, n)
        for s, t in zip(src, dst):
            if s != t:
                edges.add((min(int(s), int(t)), max(int(s), int(t))))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    expect = sum(1 for a, b in edges
                 for c in adj.get(b, ()) if c in adj.get(a, ()))
    got = wg.triangle_count(sf).to_pandas()["n_triangles"].iloc[0]
    assert got == expect and expect > 0


def test_warc_tolerant_mode_resyncs_past_corruption():
    """strict=False dead-letters a corrupt record and recovers the
    records after it — bytes no fixture writer ever emits."""
    import pytest

    good = warc._record("response", "https://ok/1",
                        b"HTTP/1.1 200 OK\r\n\r\nhi")
    bad_version = b"GARBAGE no version line here\r\n\r\n"
    bad_length = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                  b"Content-Length: notanumber\r\n\r\nbody\r\n\r\n")
    missing_length = (b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")
    for poison in (bad_version, bad_length, missing_length):
        payload = good + poison + good
        with pytest.raises((ValueError, KeyError)):
            warc.parse_warc(payload)          # strict default unchanged
        recs = warc.parse_warc(payload, strict=False)
        errors = [r for r in recs if "error" in r]
        oks = [r for r in recs if "error" not in r]
        assert len(errors) >= 1
        assert len(oks) == 2                  # both good records survive
        assert all(r["headers"]["warc-type"] == "response" for r in oks)
        assert all(isinstance(r["offset"], int) for r in errors)


def test_hits_brute_force(ray_session):
    """Recompute both score vectors with a dense driver-side loop."""
    import numpy as np

    from jimmy_ray.functions import webgraph as wg

    sf = "/root/testdata/sf0.001"
    n = 500
    edges = []
    d = np.arange(n, dtype=np.int64)
    for j in range(wg.MAX_OUT - 1):
        src = d[d % wg.MAX_OUT > j]
        edges.extend(zip(src.tolist(),
                         wg.edge_dsts(src, j, n).tolist()))
    h = np.full(n, wg.HITS_SCALE, np.int64)
    for _ in range(wg.N_HITS_ITER):
        a = np.zeros(n, np.int64)
        for s, t in edges:
            a[t] += h[s]
        h = np.zeros(n, np.int64)
        for s, t in edges:
            h[s] += a[t]
    df = wg.hits(sf).to_pandas().set_index("node").sort_index()
    assert (df["hub"].to_numpy() == h).all()
    assert (df["auth"].to_numpy() == a).all()
    assert len(df) == n            # isolated nodes survive with 0s
    assert (df.loc[df.index % wg.MAX_OUT == 0, "hub"] == 0).all()


def test_two_hop_reach_brute_force(ray_session):
    import numpy as np

    from jimmy_ray.functions import webgraph as wg

    sf = "/root/testdata/sf0.001"
    n = 500
    adj = {}
    d = np.arange(n, dtype=np.int64)
    for j in range(wg.MAX_OUT - 1):
        src = d[d % wg.MAX_OUT > j]
        for s, t in zip(src.tolist(), wg.edge_dsts(src, j, n).tolist()):
            adj.setdefault(s, set()).add(t)
    expect = {}
    for s, outs in adj.items():
        reach = {c for b in outs for c in adj.get(b, ()) if c != s}
        if reach:
            expect[s] = len(reach)
    df = wg.two_hop_reach(sf).to_pandas()
    assert dict(zip(df["node"], df["n_two_hop"])) == expect


def test_url_template_generalizes_path_and_query_only():
    from jimmy_ray.functions.webtext import url_template

    assert url_template("https://WWW.Ex7.COM:443/p/2024/01/x?page=3") == \
        "www.ex7.com/p/<d>/<d>/x?page=<d>"
    # host digits survive; scheme/port/fragment dropped
    assert url_template("http://a1.b/c") == "a1.b/c"
    assert url_template("https://a.b/c#frag9") == "a.b/c"
