"""ENEX state-machine conformance (md_lib/evernote.py:52-491 semantics)."""

import base64

import pytest

from jimmy_ray.md.enex import enex_body_to_md
from jimmy_ray.scalars import crypto

CASES = [
    # formatting stack, auto-closed at element end
    ("<en-note><p>hello <b>bold</b> and <i>it</i></p></en-note>",
     "hello **bold** and *it*"),
    # nested duplicate formatting not doubled (evernote.py:102-104)
    ("<en-note><p><b>a <strong>b</strong> c</b></p></en-note>", "**a b c**"),
    # empty formatting pairs dropped (evernote.py:406-410)
    ("<en-note><p>x<b></b>y</p></en-note>", "xy"),
    # headings ensure blank lines (evernote.py:124-131)
    ("<en-note><h1>Title</h1><p>body</p></en-note>", "# Title\n\nbody"),
    ("<en-note><h3>deep</h3></en-note>", "### deep"),
    # hr (evernote.py:132-135)
    ("<en-note><p>a</p><hr/><p>b</p></en-note>", "a\n\n---\n\nb"),
    # lists with nesting indent (evernote.py:185-192)
    ("<en-note><ul><li>a</li><li>b</li></ul></en-note>", "- a\n- b"),
    ("<en-note><ol><li>a</li><li>b</li></ol></en-note>", "1. a\n1. b"),
    # en-todo checkboxes (evernote.py:170-178)
    ('<en-note><div><en-todo checked="true"/>done</div>'
     "<div><en-todo/>todo</div></en-note>",
     "- [x] done\n\n- [ ] todo"),
    # --en-checked list items (evernote.py:186-189)
    ('<en-note><ul><li style="--en-checked:true;">d</li>'
     '<li style="--en-checked:false;">t</li></ul></en-note>',
     "- [x] d\n- [ ] t"),
    # table -> pipe table, th rows become the header
    ("<en-note><table><tr><th>k</th><th>v</th></tr>"
     "<tr><td>a</td><td>1</td></tr></table></en-note>",
     "| k | v |\n| --- | --- |\n| a | 1 |"),
    # links: titled, self-titled (<url>), no-href (evernote.py:294-317)
    ('<en-note><p><a href="https://x.io">text</a></p></en-note>',
     "[text](https://x.io)"),
    ('<en-note><p><a href="https://y.io">https://y.io</a></p></en-note>',
     "<https://y.io>"),
    ('<en-note><p><a href="#">just text</a></p></en-note>', "just text"),
    # images (evernote.py:140-146)
    ('<en-note><p><img src="i.png" alt="pic"/></p></en-note>', "![pic](i.png)"),
    # style-driven formatting (evernote.py:205-246)
    ('<en-note><p><span style="font-weight:700">heavy</span></p></en-note>',
     "**heavy**"),
    ('<en-note><p><span style="font-style:italic">lean</span></p></en-note>',
     "*lean*"),
    ('<en-note><p><span style="font-family:monospace">mono</span></p></en-note>',
     "`mono`"),
    ('<en-note><p><span style="-evernote-highlight:true">hl</span></p></en-note>',
     "**hl**"),
    # font size > 3 -> bold (evernote.py:252-258)
    ('<en-note><p><font size="5">big</font> normal</p></en-note>',
     "**big** normal"),
    # en-codeblock div (evernote.py:205-211)
    ('<en-note><div style="-en-codeblock:true;">code line</div>'
     "<p>after</p></en-note>",
     "```\ncode line\n```\n\nafter"),
    # blockquote prefix on fresh lines (evernote.py:475-477)
    ("<en-note><p>x</p><blockquote><p>q</p></blockquote></en-note>",
     "x\n\n> q"),
    # tasklist id marker (evernote.py:218-220)
    ('<en-note><div style="--en-id:abc;"></div></en-note>', "tasklist://abc"),
    # placeholder text dropped (evernote.py:418-425)
    ("<en-note><p>Content not supported</p><p>real</p></en-note>", "real"),
    # rich content INSIDE table cells stays in the cell (ADVICE r2):
    # formatting markers
    ("<en-note><table><tr><th>k</th></tr>"
     "<tr><td><b>bold</b> x</td></tr></table></en-note>",
     "| k |\n| --- |\n| **bold** x |"),
    # links
    ('<en-note><table><tr><td><a href="https://x.io">t</a></td>'
     "<td>y</td></tr></table></en-note>",
     "| [t](https://x.io) | y |"),
    # style-driven formatting opened by the td itself
    ('<en-note><table><tr><td style="font-weight:bold">cellfmt</td>'
     "<td>n</td></tr></table></en-note>",
     "| **cellfmt** | n |"),
    # table sandwiched between paragraphs keeps its surroundings intact
    ("<en-note><p>before</p><table><tr><td><i>it</i></td></tr></table>"
     "<p>after</p></en-note>",
     "before\n\n| *it* |\n\nafter"),
    # en-todo checkboxes inside cells stay in the cell (review r3)
    ('<en-note><table><tr><td><en-todo checked="true"/>task</td>'
     "</tr></table></en-note>",
     "| - [x] task |"),
    # --en-id tasklist markers inside cells stay in the cell
    ('<en-note><table><tr><td style="--en-id:abc;">x</td></tr>'
     "</table></en-note>",
     "| tasklist://abcx |"),
]


def test_en_media_inside_table_cell():
    md, hashes = enex_body_to_md(
        '<en-note><table><tr><td><en-media hash="h9" type="image/png"/>'
        "</td></tr></table></en-note>"
    )
    assert md == "| ![](h9) |"
    assert hashes == ["h9"]


@pytest.mark.parametrize("xml,expected", CASES, ids=range(len(CASES)))
def test_enex_feature(xml, expected):
    assert enex_body_to_md(xml)[0] == expected


def test_en_media_collects_hashes():
    md, hashes = enex_body_to_md(
        '<en-note><p><en-media hash="h1" type="image/png"/></p>'
        '<p><en-media hash="h2" type="audio/wav"/></p></en-note>'
    )
    assert md == "![](h1)\n\n![](h2)"
    assert hashes == ["h1", "h2"]


def _crypt_doc(inner_xml: str, doc_id: int = 3) -> str:
    payload = base64.b64encode(
        crypto.evernote_encrypt("pw", inner_xml.encode(), doc_id)
    ).decode()
    return (
        f'<en-note><p>pre</p><en-crypt cipher="AES" length="128">{payload}'
        "</en-crypt><p>post</p></en-note>"
    )


def test_en_crypt_decrypts_and_parses_recursively():
    md, _ = enex_body_to_md(_crypt_doc("<div>secret <b>rich</b></div>"), "pw")
    assert md == "pre\n\nsecret **rich**\n\npost"


def test_en_crypt_without_password_passes_payload_through():
    md, _ = enex_body_to_md(_crypt_doc("<div>x</div>"), None)
    assert "pre" in md and "post" in md
    # the raw base64 payload stays in the output
    assert any(len(tok) > 40 for tok in md.split())


def test_en_crypt_wrong_password_passes_payload_through():
    md, _ = enex_body_to_md(_crypt_doc("<div>x</div>"), "nope")
    assert any(len(tok) > 40 for tok in md.split())
