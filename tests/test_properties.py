"""Property-based tests (hypothesis) for the scalar/geo kernels, plus
row-level fault-isolation checks."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from jimmy_ray.geo import core, polygon as poly_mod
from jimmy_ray.md import links as md_links
from jimmy_ray.md import text as md_text
from jimmy_ray.scalars import paths as paths_mod
from jimmy_ray.scalars import tagnorm


@given(st.text(max_size=120))
@settings(max_examples=200, deadline=None)
def test_safe_path_always_safe(name):
    out = paths_mod.safe_path(name, key="k")
    assert out  # never empty
    assert len(out) <= 50 or out.startswith("unnamed_")
    assert "/" not in out and "\x00" not in out
    assert out not in paths_mod._FORBIDDEN_NAMES
    assert out[-1] not in (" ", ".")


@given(st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_tag_normalizers_total(tag):
    futo = tagnorm.normalize_tag_for_futo(tag)
    assert len(futo) <= 50
    if futo:
        assert futo[0].isascii() and futo[0].isalpha()
    obs = tagnorm.normalize_tag_for_obsidian(tag)
    assert not obs.isdigit()


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_link_extraction_never_crashes(text):
    links = md_links.get_markdown_links(text)
    for link in links:
        str(link)  # re-rendering is total
    md_links.remove_void_links(text)


@given(st.text(max_size=100))
@settings(max_examples=200, deadline=None)
def test_header_slug_charset(text):
    slug = md_text.to_markdown_header_id(text)
    assert all(c.isalnum() or c in "_-." for c in slug)


@given(st.integers(-90_000_000, 90_000_000),
       st.integers(-180_000_000, 179_999_999))
@settings(max_examples=300, deadline=None)
def test_geocell_nesting_property(lat, lon):
    lat_a, lon_a = np.int64(lat), np.int64(lon)
    c7 = core.geocell_id(lat_a, lon_a, 7)
    c8 = core.geocell_id(lat_a, lon_a, 8)
    c9 = core.geocell_id(lat_a, lon_a, 9)
    assert int(core.geocell_parent(c9)) == int(c8)
    assert int(core.geocell_parent(c8)) == int(c7)


@given(st.integers(-90_000_000, 90_000_000),
       st.integers(-180_000_000, 179_999_999))
@settings(max_examples=200, deadline=None)
def test_pip_scalar_vector_agree(lat, lon):
    for p in poly_mod.fixture_polygons()[:3]:
        vec = bool(poly_mod.point_in_polygon(
            np.array([lon], dtype=np.int64), np.array([lat], dtype=np.int64),
            p["verts"])[0])
        assert vec == poly_mod.point_in_polygon_scalar(lon, lat, p["verts"])


@given(st.binary(max_size=300))
@settings(max_examples=100, deadline=None)
def test_html_extractor_total_on_garbage(data):
    from jimmy_ray.html.extract import html_to_markdown

    html_to_markdown(data)  # must not raise on arbitrary bytes


def test_extraction_dead_letter_rows():
    """Batches with pathological html yield error rows, not crashes
    (SURVEY §2.9 row-level fault isolation)."""
    from jimmy_ray.stages.extract import extract_markdown_batch

    batch = pa.table({
        "url": ["u1", "u2"],
        "warc_ts": pa.array([0, 0], pa.timestamp("us")),
        "lang": ["en", "en"],
        "html": [b"<html><body><p>ok</p></body></html>", b"\xff\xfe\x00garbage<<>>"],
        "text": ["", ""],
    })
    out = extract_markdown_batch(batch)
    assert out["text"].to_pylist()[0] == "ok"
    # garbage decodes with replacement chars; either clean or dead-lettered
    errs = out["error"].to_pylist()
    assert errs[0] is None


# --- round-2 pure-function properties --------------------------------------

@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=200), st.binary(min_size=16, max_size=16))
def test_aes_cbc_roundtrip_property(data, key):
    from jimmy_ray.scalars import aes

    iv = bytes(range(16))
    ct = aes.cbc_encrypt_many([data], key, [iv])[0]
    assert aes.cbc_decrypt_many([ct], key, [iv]) == [data]
    assert len(ct) % 16 == 0 and len(ct) >= len(data)


@settings(max_examples=25, deadline=None)
@given(st.text(min_size=0, max_size=120))
def test_pdf_escape_roundtrip_property(text):
    from jimmy_ray.sources.pdf import extract_pdf_text, synth_pdf

    # synth embeds the text escaped; extraction must invert exactly unless
    # the text itself contains the line separator
    if "\n" in text:
        return
    got = extract_pdf_text(synth_pdf(3, text))
    if text == "":
        assert got == "Doc 3\ntail 3"  # empty show-text emits no line
    else:
        assert got == f"Doc 3\n{text}\ntail 3"


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_ppm_wav_decode_total(doc_id):
    import numpy as np

    from jimmy_ray.stages import multimodal as mm

    img = mm.decode_ppm(mm.synth_ppm(doc_id))
    assert img.shape == (24 + doc_id % 13, 32 + doc_id % 17, 3)
    samples, rate = mm.decode_wav(mm.synth_wav(doc_id))
    assert rate == mm.WAV_RATE
    assert np.abs(samples.astype(np.int64)).max() <= 10005


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
               min_size=0, max_size=300))
def test_fast_parse_never_diverges_from_htmlparser(text):
    """Whatever data lands in a <p>, fast parse either matches html.parser
    or falls back to it — extraction output is identical either way."""
    import html as html_mod

    from jimmy_ray.html import extract as hx

    doc = f"<html><body><p>{html_mod.escape(text)}</p></body></html>"
    via_parse_dom = hx.html_to_markdown(doc)
    b = hx._TreeBuilder()
    b.feed(doc)
    b.root.attrs["#tags"] = b.tags_seen
    hx.apply_default_filters(b.root)
    body = hx._find(b.root, "body")
    out: list[str] = []
    hx._render_blocks(body.children, out)
    assert via_parse_dom == "\n\n".join(out).strip()


def _brute_asof(ev, od):
    """O(n·m) reference for the as-of kernel."""
    import numpy as np
    import pandas as pd

    rows = []
    for _, e in ev.iterrows():
        cand = od[(od["key"] == e["key"]) & (od["t_us"] <= e["t_us"])]
        if cand.empty:
            rows.append((e["row_id"], e["key"], e["t_us"], None, None))
        else:
            best_t = cand["t_us"].max()
            at_t = cand[cand["t_us"] == best_t]
            ok = at_t["row_id"].max()  # tie -> larger orderkey
            rows.append((e["row_id"], e["key"], e["t_us"], ok, best_t))
    return pd.DataFrame(rows, columns=[
        "event_id", "user_id", "ts_us", "o_orderkey", "order_ts_us"
    ]).astype({"event_id": np.int64, "user_id": np.int64,
               "ts_us": np.int64, "o_orderkey": "Int64",
               "order_ts_us": "Int64"})


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_local_asof_matches_brute_force(data):
    import numpy as np
    import pandas as pd

    from jimmy_ray.pipelines.relational import _local_asof

    n_ev = data.draw(st.integers(0, 12))
    n_od = data.draw(st.integers(0, 12))
    keys = st.integers(0, 3)
    ts = st.integers(0, 20)
    ev = pd.DataFrame({
        "key": [data.draw(keys) for _ in range(n_ev)],
        "side": np.int8(0),
        "t_us": [data.draw(ts) for _ in range(n_ev)],
        "row_id": np.arange(n_ev, dtype=np.int64),
    })
    od = pd.DataFrame({
        "key": [data.draw(keys) for _ in range(n_od)],
        "side": np.int8(1),
        "t_us": [data.draw(ts) for _ in range(n_od)],
        "row_id": np.arange(100, 100 + n_od, dtype=np.int64),
    })
    g = pd.concat([ev, od], ignore_index=True)
    got = _local_asof(g).sort_values("event_id").reset_index(drop=True)
    want = _brute_asof(ev, od).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_local_range_matches_brute_force(data):
    import numpy as np
    import pandas as pd

    from jimmy_ray.pipelines.relational import RANGE_WINDOW_US, _local_range

    n_ev = data.draw(st.integers(0, 12))
    n_od = data.draw(st.integers(0, 12))
    keys = st.integers(0, 3)
    W = RANGE_WINDOW_US
    ts = st.integers(0, 3 * W).map(lambda v: v - W)  # spans the window edge
    ev = pd.DataFrame({
        "key": [data.draw(keys) for _ in range(n_ev)],
        "side": np.int8(0),
        "t_us": [data.draw(ts) for _ in range(n_ev)],
        "row_id": np.arange(n_ev, dtype=np.int64),
    })
    od = pd.DataFrame({
        "key": [data.draw(keys) for _ in range(n_od)],
        "side": np.int8(1),
        "t_us": [data.draw(ts) for _ in range(n_od)],
        "row_id": np.arange(100, 100 + n_od, dtype=np.int64),
    })
    g = pd.concat([ev, od], ignore_index=True)
    got = _local_range(g).sort_values("event_id").reset_index(drop=True)
    rows = []
    for _, e in ev.iterrows():
        cand = od[(od["key"] == e["key"])
                  & (od["t_us"] > e["t_us"] - W)
                  & (od["t_us"] <= e["t_us"])]
        rows.append((e["row_id"], e["key"], e["t_us"], len(cand),
                     cand["row_id"].min() if len(cand) else -1))
    want = pd.DataFrame(rows, columns=[
        "event_id", "user_id", "ts_us", "n_orders", "min_orderkey"
    ]).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# --- webtext scalar kernels (round 4) ----------------------------------------

from jimmy_ray.functions import c4 as c4_mod
from jimmy_ray.functions import webtext as wt_mod
from jimmy_ray.scalars import charset as cs_mod


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_normalize_text_idempotent_and_clean(text):
    once = cs_mod.normalize_text(text)
    assert cs_mod.normalize_text(once) == once       # fixed point
    assert "\t" not in once and "  " not in once
    assert not any("\x00" <= c <= "\x08" or "\x0b" <= c <= "\x1f"
                   or "\x7f" <= c <= "\x9f" for c in once)
    for line in once.split("\n"):
        assert not line.endswith(" ")


_URLS = st.builds(
    lambda scheme, host, port, path, q, frag:
        f"{scheme}://{host}{port}/{path}" + (f"?{q}" if q else "")
        + (f"#{frag}" if frag else ""),
    st.sampled_from(["http", "https", "HTTP", "Https"]),
    st.from_regex(r"[A-Za-z0-9][A-Za-z0-9.-]{0,20}[A-Za-z0-9]",
                  fullmatch=True),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.from_regex(r"[A-Za-z0-9/_.~-]{0,24}", fullmatch=True),
    st.from_regex(r"([a-z0-9_]{1,8}=[a-z0-9]{0,6}&?){0,3}", fullmatch=True),
    st.from_regex(r"[a-z0-9]{0,8}", fullmatch=True),
)


@given(_URLS)
@settings(max_examples=300, deadline=None)
def test_canonicalize_url_idempotent(url):
    once = wt_mod.canonicalize_url(url)
    assert wt_mod.canonicalize_url(once) == once
    assert "#" not in once                      # fragment gone
    scheme, _, rest = once.partition("://")
    assert scheme == scheme.lower()
    host = rest.split("/", 1)[0]
    # default port for the SCHEME is stripped; cross-scheme ports stay
    if scheme == "http":
        assert not host.endswith(":80")
    if scheme == "https":
        assert not host.endswith(":443")


@given(_URLS)
@settings(max_examples=300, deadline=None)
def test_surt_key_shape(url):
    from jimmy_ray.sources.warc import surt_key

    key = surt_key(url)
    assert ")" in key                            # host/path separator
    hostpart = key.split(")", 1)[0]
    assert hostpart == hostpart.lower()
    # only the LEADING www. label is stripped; reversed, it would sit at the
    # END of the key, so interior/top-level www labels (host b.www.a ->
    # a,www,b) are legitimate
    assert not hostpart.endswith(",www") and hostpart != "www"
    # sorted query params: re-keying the key's own url-ish tail is stable
    if "?" in key:
        q = key.rsplit("?", 1)[1]
        parts = [p for p in q.split("&") if p]
        assert parts == sorted(parts)


@given(st.lists(st.text(
    alphabet=st.characters(blacklist_characters="\n",
                           blacklist_categories=("Cs",)),
    max_size=40), max_size=8))
@settings(max_examples=200, deadline=None)
def test_c4_clean_page_total_and_sound(lines):
    page = "\n".join(lines)
    out = c4_mod.c4_clean_page(page)
    if out is not None:
        kept = out.split("\n")
        assert len(kept) >= c4_mod.MIN_SENTENCES
        for line in kept:
            assert c4_mod.c4_line_keep(line)
            assert line in lines
