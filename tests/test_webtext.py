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
