"""Creole / Vimwiki / DocBook converters (sources/markup_tail.py):
golden-template identity plus the branches the fixture writer never
emits."""

from jimmy_ray.sources import markup_tail as mt


def test_golden_template_identity():
    for synth, conv, tpl in [
        (mt.synth_creole, mt.creole_to_md, mt.CREOLE_GOLDEN_TEMPLATE),
        (mt.synth_vimwiki, mt.vimwiki_to_md, mt.VIMWIKI_GOLDEN_TEMPLATE),
        (mt.synth_docbook, mt.docbook_to_md, mt.DOCBOOK_GOLDEN_TEMPLATE),
    ]:
        got = conv(synth(3, "t & <x>"))
        want = tpl.replace("{id}", "3").replace("{text}", "t & <x>")
        assert got == want


# --- creole ------------------------------------------------------------------

def test_creole_bare_link_and_image_without_alt():
    assert mt.creole_to_md("[[Target]]") == "[Target](Target)"
    assert mt.creole_to_md("{{pic.png}}") == "![](pic.png)"


def test_creole_url_slashes_not_italicized():
    out = mt.creole_to_md("see https://a.example/x and //em// done")
    assert out == "see https://a.example/x and *em* done"


def test_creole_list_start_wins_over_bold():
    assert mt.creole_to_md("** nested item") == "  - nested item"
    # real bold needs no following space... inline bold elsewhere survives
    assert mt.creole_to_md("a **b** c") == "a **b** c"


def test_creole_inline_nowiki_masks_markup():
    assert (mt.creole_to_md("x {{{//raw// [[a]]}}} y")
            == "x `//raw// [[a]]` y")


def test_creole_heading_without_trailing_equals():
    assert mt.creole_to_md("== Title") == "## Title"


# --- vimwiki -----------------------------------------------------------------

def test_vimwiki_ordered_variants_and_deep_indent():
    assert mt.vimwiki_to_md("3) third") == "1. third"
    assert mt.vimwiki_to_md("# hash item") == "1. hash item"
    assert mt.vimwiki_to_md("        * deep") == "    - deep"


def test_vimwiki_bare_link():
    assert mt.vimwiki_to_md("[[Page Name]]") == "[Page Name](Page Name)"


def test_vimwiki_pre_block_without_language():
    assert mt.vimwiki_to_md("{{{\nraw *x*\n}}}") == "```\nraw *x*\n```"


# --- docbook -----------------------------------------------------------------

def test_docbook4_ulink_and_linkend():
    xml = (b"<article><title>T</title>"
           b'<para>a <ulink url="https://e/x">lab</ulink> and '
           b'<link linkend="sec1">ref</link></para></article>')
    assert mt.docbook_to_md(xml) == (
        "# T\n\na [lab](https://e/x) and [ref](sec1)")


def test_docbook_sect1_and_nested_emphasis_tail():
    xml = (b"<article><title>T</title><sect1><title>S</title>"
           b"<para>x <emphasis>i</emphasis> tail</para></sect1></article>")
    assert mt.docbook_to_md(xml) == "# T\n\n## S\n\nx *i* tail"


def test_docbook_unknown_inline_passes_through_text():
    xml = (b"<article><title>T</title>"
           b"<para>a <phrase>kept</phrase> b</para></article>")
    assert mt.docbook_to_md(xml) == "# T\n\na kept b"
