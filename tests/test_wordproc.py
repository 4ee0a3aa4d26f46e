"""DOCX/ODT/RTF → Markdown readers (the pandoc-gap formats,
convert.py:117-163 served natively from the public specs)."""

import pytest

from jimmy_ray.sources import wordproc as wp

TEXT = "sample body words"


@pytest.mark.parametrize("synth,parse", [
    (wp.synth_docx, wp.docx_to_markdown),
    (wp.synth_odt, wp.odt_to_markdown),
])
def test_zip_formats_render_golden(synth, parse):
    assert parse(synth(5, TEXT)) == wp.golden_markdown(5, TEXT)
    # deterministic fixtures
    assert synth(5, TEXT) == synth(5, TEXT)


def test_rtf_renders_golden():
    got = wp.rtf_to_markdown(wp.synth_rtf(5, TEXT))
    want = wp.RTF_GOLDEN_TEMPLATE.replace("{id}", "5").replace(
        "{text}", TEXT)
    assert got == want


def test_docx_structure_details():
    md = wp.docx_to_markdown(wp.synth_docx(3, "x & <y>"))
    assert md.startswith("# Doc 3")               # heading style
    assert "intro x & <y> with" in md             # XML escapes round-trip
    assert "  - nested" in md                     # ilvl nesting
    assert "[site 3](https://example.com/d/3)" in md   # rels resolution
    assert "| id | 3 |" in md                     # table


def test_odt_whitespace_elements():
    # text:s (run of spaces) and text:line-break inside a paragraph
    import io
    import zipfile

    payload = wp.synth_odt(1, "t")
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        content = zf.read("content.xml").decode()
    content = content.replace(
        "<text:p>item A</text:p>",
        '<text:p>a<text:s text:c="3"/>b<text:line-break/>c</text:p>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        zf.writestr("content.xml", content)
    assert "- a   b\nc" in wp.odt_to_markdown(buf.getvalue())


def test_rtf_escapes_and_destinations():
    raw = (rb"{\rtf1\ansi{\fonttbl{\f0 Arial;}}{\info{\title skip me}}"
           rb"caf\'e9 \u8212? dash \{lit\} \\back\par second}"
           )
    md = wp.rtf_to_markdown(raw)
    assert "skip me" not in md and "Arial" not in md
    assert "caf\u00e9" in md and "\u2014 dash" in md
    assert "{lit}" in md and "\\back" in md
    assert md.endswith("second")


def test_rtf_toggles():
    raw = rb"{\rtf1 plain \b on\b0 off \i it\i0{\b\i bi}\par}"
    md = wp.rtf_to_markdown(raw)
    assert "**on**" in md and "*it*" in md and "***bi***" in md
    assert "off" in md and "**off**" not in md


def test_dispatch_routes_wordproc_formats():
    import pyarrow as pa

    from jimmy_ray.sources.readers import FormatDispatchStage, detect_format

    assert detect_format("report.docx") == "docx"
    assert detect_format("notes.ODT".lower()) == "odt"
    assert detect_format("x.rtf") == "rtf"
    stage = FormatDispatchStage()
    batch = pa.table({
        "format": pa.array(["docx", "odt", "rtf"]),
        "payload": pa.array([wp.synth_docx(1, "a"), wp.synth_odt(2, "b"),
                             wp.synth_rtf(3, "c")], pa.binary()),
    })
    out = stage(batch).to_pydict()
    assert out["error"] == [None, None, None]
    assert out["text"][0] == wp.golden_markdown(1, "a")
    assert out["text"][1] == wp.golden_markdown(2, "b")
    assert "site 3" in out["text"][2]


# --- light markup (asciidoc / mediawiki / fountain) -------------------------

from jimmy_ray.sources import lightmarkup as lm


def test_asciidoc_golden_and_details():
    got = lm.asciidoc_to_md(lm.synth_asciidoc(5, TEXT))
    assert got == lm.ADOC_GOLDEN_TEMPLATE.replace("{id}", "5").replace(
        "{text}", TEXT)
    # constrained pairs don't fire inside words; link macro forms
    assert lm.asciidoc_to_md("a*b*c and 2_3_4") == "a*b*c and 2_3_4"
    assert lm.asciidoc_to_md("link:https://x.test/a[lbl]") == \
        "[lbl](https://x.test/a)"
    assert lm.asciidoc_to_md("https://x.test/a[]") == \
        "[https://x.test/a](https://x.test/a)"


def test_mediawiki_golden_and_details():
    title, md = lm.parse_mediawiki_dump(lm.synth_mediawiki_dump(5, TEXT))[0]
    assert title == "Doc 5"
    assert md == lm.MW_GOLDEN_TEMPLATE.replace("{id}", "5").replace(
        "{text}", TEXT)
    assert lm.mediawiki_to_md("[[Only Page]]") == "[Only Page](Only Page)"
    assert lm.mediawiki_to_md("== h ==") == "## h"
    assert lm.mediawiki_to_md("#### not a heading") == "      1. not a heading"


def test_fountain_wrap_matches_reference():
    # converter.py:270-274 byte shape
    assert lm.fountain_to_md("INT. DAY") == "```fountain\nINT. DAY\n```\n"


def test_dispatch_routes_light_markup():
    import pyarrow as pa

    from jimmy_ray.sources.readers import FormatDispatchStage, detect_format

    assert detect_format("a.adoc") == "asciidoc"
    assert detect_format("b.fountain") == "fountain"
    stage = FormatDispatchStage()
    batch = pa.table({
        "format": pa.array(["asciidoc", "mediawiki", "fountain"]),
        "payload": pa.array([b"= T\n* li", b"'''b''' ''i''",
                             b"INT. DAY"], pa.binary()),
    })
    out = stage(batch).to_pydict()
    assert out["error"] == [None] * 3
    assert out["text"][0] == "# T\n- li"
    assert out["text"][1] == "**b** *i*"
    assert out["text"][2].startswith("```fountain")


# --- epub / opml ------------------------------------------------------------

from jimmy_ray.sources import epub as ep


def test_epub_spine_order_and_golden():
    got = ep.epub_to_markdown(ep.synth_epub(5, TEXT))
    assert got == ep.EPUB_GOLDEN_TEMPLATE.replace("{id}", "5").replace(
        "{text}", TEXT)
    # spine order governs, not zip member order: swap itemrefs
    import io
    import zipfile
    with zipfile.ZipFile(io.BytesIO(ep.synth_epub(1, "t"))) as zf:
        members = {n: zf.read(n) for n in zf.namelist()}
    members["OEBPS/content.opf"] = members["OEBPS/content.opf"].replace(
        b'<itemref idref="c1"/><itemref idref="c2"/>',
        b'<itemref idref="c2"/><itemref idref="c1"/>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for n, d in members.items():
            zf.writestr(n, d)
    got = ep.epub_to_markdown(buf.getvalue())
    assert got.startswith("# Chapter Two")


def test_opml_nesting_and_golden():
    got = ep.opml_to_markdown(ep.synth_opml(5, TEXT))
    assert got == ep.OPML_GOLDEN_TEMPLATE.replace("{id}", "5").replace(
        "{text}", TEXT)
    deep = (b'<opml version="2.0"><body><outline text="a">'
            b'<outline text="b"><outline text="c"/></outline></outline>'
            b"</body></opml>")
    assert ep.opml_to_markdown(deep) == "- a\n  - b\n    - c"


def test_dispatch_routes_epub_opml():
    from jimmy_ray.sources.readers import FormatDispatchStage, detect_format

    assert detect_format("book.epub") == "epub"
    assert detect_format("feed.opml") == "opml"
    stage = FormatDispatchStage()
    assert stage.parsers["epub"](ep.synth_epub(2, "x")).startswith(
        "# Chapter One")
    assert stage.parsers["opml"](ep.synth_opml(2, "x")).startswith("# Doc 2")


# --- org / rst / latex ------------------------------------------------------

from jimmy_ray.sources import texmarkup as tm


def test_org_golden_and_details():
    got = tm.org_to_md(tm.synth_org(5, TEXT))
    assert got == tm.ORG_GOLDEN_TEMPLATE.replace("{id}", "5").replace(
        "{text}", TEXT)
    assert tm.org_to_md("[[https://x.test]]") == \
        "[https://x.test](https://x.test)"
    assert tm.org_to_md("a/b/c *x*y") == "a/b/c *x*y"  # constrained pairs
    assert tm.org_to_md("#+OPTIONS: toc:nil") == ""    # settings dropped


def test_rst_adornment_levels_and_details():
    got = tm.rst_to_md(tm.synth_rst(5, TEXT))
    assert got == tm.RST_GOLDEN_TEMPLATE.replace("{id}", "5").replace(
        "{text}", TEXT)
    # adornment order defines levels, not the character identity
    src = "T\n~\n\nS\n=\n"
    assert tm.rst_to_md(src) == "# T\n\n## S"
    # underline shorter than the title is not a section
    assert tm.rst_to_md("Long Title\n==\n") == "Long Title\n=="


def test_latex_golden_and_details():
    got = tm.latex_to_md(tm.synth_latex(5, TEXT))
    assert got == tm.TEX_GOLDEN_TEMPLATE.replace("{id}", "5").replace(
        "{text}", TEXT)
    assert tm.latex_to_md(r"50\% and \_x\_ and A \& B") == \
        "50% and _x_ and A & B"
    assert tm.latex_to_md("keep 100% \\% sign") == "keep 100"  # % comments


def test_dispatch_routes_texmarkup():
    from jimmy_ray.sources.readers import FormatDispatchStage, detect_format

    assert detect_format("notes.org") == "org"
    assert detect_format("doc.rest") == "rst"
    assert detect_format("paper.tex") == "latex"
    stage = FormatDispatchStage()
    assert stage.parsers["org"](b"* H\n- li") == "# H\n- li"
    assert stage.parsers["rst"](b"T\n=\n") == "# T"
    assert stage.parsers["latex"](rb"\section{S}") == "# S"


# --- dokuwiki / textile -----------------------------------------------------


def test_dokuwiki_golden_and_details():
    got = lm.dokuwiki_to_md(lm.synth_dokuwiki(5, TEXT))
    assert got == lm.DOKU_GOLDEN_TEMPLATE.replace("{id}", "5").replace(
        "{text}", TEXT)
    # heading depth counts DOWN: == x == is h5
    assert lm.dokuwiki_to_md("== deep ==") == "##### deep"
    assert lm.dokuwiki_to_md("[[wiki:page]]") == "[wiki:page](wiki:page)"
    assert lm.dokuwiki_to_md("a // not italic") == "a // not italic"


def test_textile_golden_and_details():
    got = lm.textile_to_md(lm.synth_textile(5, TEXT))
    assert got == lm.TEXTILE_GOLDEN_TEMPLATE.replace("{id}", "5").replace(
        "{text}", TEXT)
    assert lm.textile_to_md('end "lbl":https://x.test/p.') == \
        "end [lbl](https://x.test/p)."
    assert lm.textile_to_md("h3. Three") == "### Three"
    assert lm.textile_to_md("snake_case_word stays") == "snake_case_word stays"


def test_dispatch_routes_doku_textile():
    from jimmy_ray.sources.readers import FormatDispatchStage, detect_format

    assert detect_format("page.doku") == "dokuwiki"
    assert detect_format("note.textile") == "textile"
    stage = FormatDispatchStage()
    assert stage.parsers["dokuwiki"](b"====== T ======") == "# T"
    assert stage.parsers["textile"](b"h2. S") == "## S"
