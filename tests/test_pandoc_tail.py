"""Djot / Typst / EndNote XML converters (sources/pandoc_tail.py).

Template identity plus the writer-unreachable branches the fixtures
never emit (spec subsets must survive real files, not just our own
synthesizer — the markup_tail.py test convention).
"""

from jimmy_ray.sources import pandoc_tail as pt


def _golden(tpl, d, t):
    return (tpl.replace("{id}", str(d))
            .replace("{id2}", f"{d % 100:02d}")
            .replace("{text}", t))


def test_fixture_templates_roundtrip():
    for synth, conv, tpl in (
        (pt.synth_djot, pt.djot_to_md, pt.DJOT_GOLDEN_TEMPLATE),
        (pt.synth_typst, pt.typst_to_md, pt.TYPST_GOLDEN_TEMPLATE),
    ):
        for d, t in ((0, "hello world"), (97, "lorem ipsum dolor")):
            assert conv(synth(d, t)) == _golden(tpl, d, t)
    for d, t in ((3, "plain"), (142, "x & y < z")):
        got = pt.endnote_to_md(pt.synth_endnote(d, t))
        assert got == _golden(pt.ENDNOTE_GOLDEN_TEMPLATE, d, t)


# --- djot writer-unreachable branches ----------------------------------------

def test_djot_verbatim_protects_markup():
    assert pt.djot_to_md("a `_x_ *y*` b") == "a `_x_ *y*` b"
    # double-backtick verbatim containing a backtick
    assert pt.djot_to_md("``code ` tick``") == "``code ` tick``"


def test_djot_emphasis_swap():
    assert pt.djot_to_md("_em_ and *strong*") == "*em* and **strong**"
    # underscores inside words stay (no closing candidate on same line)
    assert pt.djot_to_md("snake_case_name x") == "snake*case*name x"


def test_djot_attributes_and_spans():
    assert pt.djot_to_md("word{.cls #id}") == "word"
    assert pt.djot_to_md("[span text]{.mark}") == "span text"
    # a markdown link is NOT a span: survives untouched
    assert pt.djot_to_md("[label](https://x.example/)") == \
        "[label](https://x.example/)"


def test_djot_thematic_break_and_fence():
    assert pt.djot_to_md("----") == "---"
    assert pt.djot_to_md("*****") == "---"
    assert pt.djot_to_md("```\n_raw_\n```") == "```\n_raw_\n```"


# --- typst writer-unreachable branches ----------------------------------------

def test_typst_label_less_link_and_comment():
    assert pt.typst_to_md('#link("https://a.example/")') == \
        "[https://a.example/](https://a.example/)"
    assert pt.typst_to_md("// gone\nkept") == "kept"
    # protocol-relative // inside text is not a comment line
    assert pt.typst_to_md("see https://a.b//c") == "see https://a.b//c"


def test_typst_headings_and_lists():
    assert pt.typst_to_md("=== Deep _h_") == "### Deep *h*"
    assert pt.typst_to_md("+ one\n+ two") == "1. one\n1. two"


def test_typst_raw_protected():
    assert pt.typst_to_md("x `*raw*` y") == "x `*raw*` y"
    assert pt.typst_to_md("```\n*raw*\n```") == "```\n*raw*\n```"


# --- endnote writer-unreachable branches ---------------------------------------

def test_endnote_missing_fields_and_no_style_wrappers():
    xml = (b"<xml><records><record>"
           b"<titles><title>Bare Title</title></titles>"
           b"</record></records></xml>")
    assert pt.endnote_to_md(xml) == "# Bare Title"


def test_endnote_multi_record_library():
    one = pt.synth_endnote(1, "alpha").decode()
    rec = one[one.index("<record>"):one.index("</records>")]
    lib = ("<xml><records>" + rec + rec.replace("Study 1", "Study 2")
           + "</records></xml>").encode()
    out = pt.endnote_to_md(lib)
    assert "# Study 1" in out and "# Study 2" in out
    assert "\n\n---\n\n" in out


def test_endnote_nested_style_runs():
    xml = (b"<xml><records><record><titles><title>"
           b"<style>Part </style><style>One</style>"
           b"</title></titles></record></records></xml>")
    assert pt.endnote_to_md(xml) == "# Part One"
