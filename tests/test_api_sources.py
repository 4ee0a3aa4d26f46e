"""Engine API: registry, pipeline-spec compiler, source dispatch."""

import pyarrow as pa
import pytest

from jimmy_ray import api
from jimmy_ray.sources import readers


def test_registry_contains_builtins():
    for name in ("extract_markdown", "geocode_points", "tile_assign",
                 "spatial_join", "extract_links", "text_stats"):
        assert name in api.STAGE_REGISTRY


def test_compile_pipeline_end_to_end(ray_session):
    from jimmy_ray.data import synth

    pages = synth.pages_dataset("/root/testdata/sf0.001")
    spec = [{"stage": "geocode_points"}, {"stage": "tile_assign"}]
    out = api.compile_pipeline(pages, spec).to_pandas()
    assert len(out) > 0
    assert {"url", "cell_r7", "tile_z10"} <= set(out.columns)


def test_unknown_stage_raises():
    with pytest.raises(KeyError, match="unknown stage"):
        api.compile_pipeline(None, [{"stage": "nope"}])


def test_custom_stage_registration(ray_session):
    @api.stage("double_lat_test")
    def _double(factor: int = 2) -> api.StageDef:
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.set_column(
                batch.schema.get_field_index("lat_e6"), "lat_e6",
                pc.multiply(batch["lat_e6"], factor),
            )

        return api.StageDef(fn)

    try:
        from jimmy_ray.data import synth

        pages = synth.pages_dataset("/root/testdata/sf0.001")
        base = api.compile_pipeline(pages, [{"stage": "geocode_points"}]).to_pandas()
        doubled = api.compile_pipeline(
            pages, [{"stage": "geocode_points"},
                    {"stage": "double_lat_test", "factor": 3}]
        ).to_pandas()
        merged = base.merge(doubled, on="url", suffixes=("_a", "_b"))
        assert (merged["lat_e6_b"] == merged["lat_e6_a"] * 3).all()
    finally:
        del api.STAGE_REGISTRY["double_lat_test"]


def test_duplicate_registration_rejected():
    with pytest.raises(ValueError, match="already registered"):
        api.stage("extract_markdown")(lambda: api.StageDef(None))


def test_source_registry(tmp_path, ray_session):
    import json

    p = tmp_path / "rows.json"
    p.write_text("\n".join(json.dumps({"a": i}) for i in range(5)))
    ds = readers.open_source("json", str(p))
    assert ds.count() == 5
    with pytest.raises(KeyError):
        readers.open_source("mongodb", "x")


def test_detect_format():
    assert readers.detect_format("a/b/c.md") == "markdown"
    assert readers.detect_format("x.HTML") == "html"
    assert readers.detect_format("noext") == "binary"


def test_format_dispatch_stage():
    stage = readers.FormatDispatchStage()
    batch = pa.table({
        "path": ["a.html", "b.md", "c.weird"],
        "format": ["html", "markdown", "weird"],
        "payload": [b"<html><body><p>hi</p></body></html>", b"# t", b"\x00"],
    })
    out = stage(batch)
    assert out["text"].to_pylist() == ["hi", "# t", ""]
    errs = out["error"].to_pylist()
    assert errs[0] is None and errs[1] is None
    assert "no parser" in errs[2]


def test_format_dispatch_row_fault_isolation():
    def bad_parser(_):
        raise RuntimeError("boom")

    stage = readers.FormatDispatchStage({"markdown": bad_parser})
    batch = pa.table({
        "path": ["a.md", "b.html"],
        "format": ["markdown", "html"],
        "payload": [b"x", b"<p>ok</p>"],
    })
    out = stage(batch)
    assert out["text"].to_pylist() == ["", "ok"]
    assert "RuntimeError" in out["error"].to_pylist()[0]
    assert out["error"].to_pylist()[1] is None


def test_fuzzy_prune_matches_bruteforce():
    """The length-bucket candidate prune is bit-identical to the full
    difflib scan (common.py:373-400 semantics), ties included."""
    import difflib
    import random
    import string

    from jimmy_ray.stages.fuzzy import FuzzyTitleMatchStage

    rng = random.Random(7)
    alphabet = string.ascii_lowercase + " "
    titles = ["".join(rng.choices(alphabet, k=rng.randint(3, 20)))
              for _ in range(80)] + ["Doc 5", "Doc 55", ""]
    stage = FuzzyTitleMatchStage(titles)
    sorted_titles = sorted(set(titles))

    def brute(query):
        if query in set(sorted_titles):
            return query, 1.0
        best_ratio, best_title = -1.0, None
        for title in sorted_titles:
            r = difflib.SequenceMatcher(None, query, title).ratio()
            if r > best_ratio:
                best_ratio, best_title = r, title
        return (None, best_ratio) if best_ratio < 0.6 else (best_title, best_ratio)

    queries = ["".join(rng.choices(alphabet, k=rng.randint(0, 25)))
               for _ in range(80)] + ["doc 5", "Doc 5", "", "*Doc 55*"]
    for q in queries:
        assert stage.best_match(q) == brute(q), q


def test_subprocess_stage_dead_letters_and_restarts():
    """ST1 protocol: conversion errors dead-letter; a killed worker is
    respawned and the stage keeps converting."""
    import pyarrow as pa

    from jimmy_ray.stages.subproc import SubprocessConverterStage

    stage = SubprocessConverterStage()
    batch = pa.table({
        "url": pa.array(["a", "b"], pa.string()),
        "html": pa.array([b"<p>one</p>", b"<p>two</p>"], pa.binary()),
    })
    out = stage(batch)
    assert out["text"].to_pylist() == ["one", "two"]
    assert out["error"].to_pylist() == [None, None]
    # kill the worker: next batch must transparently respawn
    stage.proc.kill()
    stage.proc.wait()
    out2 = stage(batch)
    assert out2["text"].to_pylist() == ["one", "two"]


def test_pdf_extract_subset():
    """S4 real-subset: escapes, TJ arrays, Td newlines, Flate/LZW/xref
    variants identical; unsupported /Filter raises."""
    import pytest

    from jimmy_ray.sources.pdf import extract_pdf_text, synth_pdf

    got = extract_pdf_text(synth_pdf(7, "with (parens) and \\slash"))
    assert got == "Doc 7\nwith (parens) and \\slash\ntail 7"
    # octal escape per the PDF spec
    pdf = synth_pdf(1, "x").replace(b"(x)", b"(\\101\\102)")
    assert "AB" in extract_pdf_text(pdf)
    # every decode path extracts identically to the raw stream
    for v in ("flate", "lzw", "xref", "a85", "rle", "rc4", "aes"):
        assert extract_pdf_text(synth_pdf(7, "zip me", variant=v)) == \
            extract_pdf_text(synth_pdf(7, "zip me")), v
    other = synth_pdf(1, "x").replace(
        b"<< /Length", b"<< /Filter /DCTDecode /Length")
    with pytest.raises(NotImplementedError):
        extract_pdf_text(other)


def test_pdf_lzw_roundtrip_and_width_bumps():
    """LZW encoder/decoder stay in sync across the 9→10→11→12-bit width
    bumps and a forced table clear (>4096 entries)."""
    import numpy as np

    from jimmy_ray.sources.pdf import lzw_decode, lzw_encode

    rng = np.random.default_rng(11)
    cases = [
        b"",
        b"A",
        b"AAAAAAAAAAAA",              # KwKwK self-reference case
        bytes(rng.integers(0, 256, 3_000)),   # 9->10 bit bump
        bytes(rng.integers(0, 4, 60_000)),    # low entropy: 12-bit + clear
        bytes(rng.integers(0, 256, 10_000)),
    ]
    for data in cases:
        assert lzw_decode(lzw_encode(data)) == data
    # compresses repetitive input (i.e. it's real LZW, not a passthrough)
    rep = b"tok " * 5_000
    assert len(lzw_encode(rep)) < len(rep) // 2
    assert lzw_decode(lzw_encode(rep)) == rep


def test_pdf_filter_codecs_roundtrip():
    """ASCIIHex / ASCII85 / RunLength decode per §7.4.2/3/5."""
    import base64

    import numpy as np

    from jimmy_ray.sources.pdf import (
        ascii85_decode, asciihex_decode, runlength_decode, runlength_encode)

    rng = np.random.default_rng(3)
    for data in (b"", b"A", b"hello world", bytes(rng.integers(0, 256, 999)),
                 b"\x00" * 500, b"ab" * 300):
        assert asciihex_decode(data.hex().encode() + b" \n>") == data
        assert ascii85_decode(base64.a85encode(data) + b"~>") == data
        assert runlength_decode(runlength_encode(data)) == data
    assert asciihex_decode(b"48656C6C6F>") == b"Hello"
    assert asciihex_decode(b"48656C6C6F7>") == b"Hello\x70"  # odd: pad 0
    rep = b"x" * 1000
    assert len(runlength_encode(rep)) < 30


def test_pdf_rc4_known_vector_and_std_handler():
    """RC4 classic test vector; standard-security-handler key derivation
    round-trips through its own /O + /U entries (Algorithms 2-5)."""
    from jimmy_ray.sources import pdf

    assert pdf.rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert pdf.rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    # handler: derive key from the fixture's own O/U, both revisions
    for rev, cfm in ((3, b""), (4, b"/CF << /StdCF << /CFM /AESV2 "
                                   b"/Length 16 >> >> ")):
        o = pdf._std_o_entry("owner", "", rev, 16)
        key = pdf._std_file_key("", o, -44, b"\x01" * 16, rev, 16)
        u = pdf._std_u_entry(key, b"\x01" * 16, rev)
        d = (b"/Filter /Standard /V %d /R %d /Length 128 /P -44 "
             b"/O <%s> /U <%s> %s"
             % (2 if rev == 3 else 4, rev, o.hex().encode(),
                u.hex().encode(), cfm))
        h = pdf.StdSecurityHandler(d, b"\x01" * 16, "")
        assert h.key == key and h.aes == (rev == 4)
        blob = b"secret stream content, longer than one block" * 3
        assert h.decrypt(4, 0, h.encrypt(4, 0, blob, b"\x02" * 16)) == blob


def test_pdf_encrypted_fixture_fails_wrong_password():
    import pytest

    from jimmy_ray.sources.pdf import extract_pdf_text, synth_pdf

    for v in ("rc4", "aes"):
        p = synth_pdf(5, "top secret", variant=v)
        assert b"top secret" not in p          # content actually encrypted
        with pytest.raises(ValueError, match="authentication failed"):
            extract_pdf_text(p, password="wrong")


def test_pdf_xref_stream_parsing_and_predictor():
    from jimmy_ray.sources.pdf import (
        parse_xref_stream, png_predictor_decode, synth_pdf)

    pdf = synth_pdf(3, "hello xref", variant="xref")
    entries = parse_xref_stream(pdf)
    assert entries is not None and set(entries) == {0, 1, 2, 3, 4, 5}
    assert entries[0][0] == 0                 # free head
    assert all(entries[i][0] == 1 for i in range(1, 6))
    # offsets really point at "N 0 obj"
    for i in range(1, 6):
        off = entries[i][1]
        assert pdf[off:off + len(f"{i} 0 obj")] == f"{i} 0 obj".encode()
    # classic-xref PDFs return None (fallback scan path)
    assert parse_xref_stream(synth_pdf(3, "x")) is None
    # PNG predictors: Sub and Paeth round-trip a known row pair
    raw = bytes([10, 20, 30, 40, 50, 60, 70, 80])
    up = bytearray([2]) + bytes(raw[:4])
    up += bytes([2]) + bytes((raw[4 + j] - raw[j]) & 0xFF for j in range(4))
    assert png_predictor_decode(bytes(up), columns=4) == raw


def test_dispatch_round2_formats():
    import pyarrow as pa

    from jimmy_ray.sources.pdf import synth_pdf
    from jimmy_ray.sources.readers import FormatDispatchStage, detect_format

    assert detect_format("a/b.enex") == "enex"
    assert detect_format("x.PDF") == "pdf"
    assert detect_format("n.tid") == "tiddlywiki"
    stage = FormatDispatchStage()
    batch = pa.table({
        "format": pa.array(["enex", "pdf", "t2t"], pa.string()),
        "payload": pa.array([
            b"<en-note><p>hello <b>b</b></p></en-note>",
            synth_pdf(1, "pdf body"),
            b"//it// and ``co``",
        ], pa.binary()),
    })
    out = stage(batch)
    assert out["text"].to_pylist() == [
        "hello **b**", "Doc 1\npdf body\ntail 1", "*it* and `co`",
    ]
    assert out["error"].to_pylist() == [None, None, None]


def test_link_resolution_join_equals_broadcast(ray_session):
    """J1 scale path: the partitioned hash-join resolution must produce
    byte-identical output to the reference-shaped broadcast closure."""
    import pandas as pd

    from jimmy_ray.stages import notes

    sf = "/root/testdata/sf0.001"
    a = (notes.link_resolution(sf, strategy="join")
         .to_pandas().sort_values("url").reset_index(drop=True))
    b = (notes.link_resolution(sf, strategy="broadcast")
         .to_pandas().sort_values("url").reset_index(drop=True))
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_compile_webtext_cleaning_chain(ray_session):
    """The round-4 curation stages compose through the plugin spec:
    pages -> main-content -> C4 rules -> unicode normalize.  (The
    synthetic corpus text carries no terminal punctuation, so real
    synth pages are legitimately all-dropped by C4 — feed
    C4-survivable pages and one poison page instead.)"""
    import ray.data as rd

    def page(i, poison=False):
        body = (f"<nav><a href='/'>Home</a></nav>"
                f"<div><h1>T {i}</h1>"
                f"<p>First sentence for page {i} has\tplenty  of words.</p>"
                f"<p>Second sentence for page {i} is also long enough.</p>"
                f"<p>Third sentence for page {i} rounds out the page.</p>"
                + ("<p>lorem ipsum dolor sit amet consectetur elit.</p>"
                   if poison else "")
                + "</div>")
        return {"url": f"https://t/{i}",
                "html": f"<html><body>{body}</body></html>".encode()}

    pages = rd.from_items([page(0), page(1), page(2, poison=True)])
    spec = [{"stage": "main_content"}, {"stage": "c4_clean"},
            {"stage": "normalize_unicode"}]
    out = api.compile_pipeline(pages, spec).to_pandas()
    assert set(out["url"]) == {"https://t/0", "https://t/1"}  # poison dropped
    assert set(out.columns) == {"url", "text"}
    from jimmy_ray.functions.c4 import c4_line_keep
    from jimmy_ray.scalars.charset import normalize_text

    for t in out["text"]:
        assert t == normalize_text(t)       # tab/space runs normalized
        assert "\t" not in t and "  " not in t
        assert len(t.split("\n")) == 3
        for line in t.split("\n"):
            assert c4_line_keep(line)
