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
