"""App-specific filter hooks (html_filter.py per-app soup filters)."""

import pytest

from jimmy_ray.html.extract import html_to_markdown_filtered


def md(body: str, *filters: str) -> str:
    return html_to_markdown_filtered(
        f"<html><body>{body}</body></html>", list(filters)
    )


def test_nimbus_add_mark_class_and_attrs():
    assert md('<p><span class="nn-marker">hl</span></p>',
              "nimbus_add_mark") == "==hl=="
    assert md('<p><span data-highlight="yellow">hl</span></p>',
              "nimbus_add_mark") == "==hl=="
    # transparent/white backgrounds are not highlights (html_filter.py:243)
    assert md('<p><span data-highlight="transparent">x</span></p>',
              "nimbus_add_mark") == "x"


def test_nimbus_note_links():
    out = md('<p><span class="mention-link" data-mention-type="note" '
             'data-mention-name="My Note">My Note</span></p>',
             "nimbus_add_note_links")
    assert out == "[My Note](nimbusnote://My%20Note)"


def test_notion_streamline_lists():
    out = md('<ul class="to-do-list">'
             '<li><div class="checkbox checkbox-on"></div>done</li>'
             '<li><div class="checkbox checkbox-off"></div>todo</li></ul>',
             "notion_streamline_lists")
    assert out == "- [x] done\n- [ ] todo"


def test_synology_checklists_with_nesting():
    body = (
        '<div><input class="syno-notestation-editor-checkbox '
        'syno-notestation-editor-checkbox-checked"/>top</div>'
        '<div style="padding-left: 30px">'
        '<input class="syno-notestation-editor-checkbox"/>nested</div>'
    )
    out = md(body, "synology_fix_checklists")
    assert out == "- [x] top\n  - [ ] nested"


def test_synology_img_src_from_ref():
    body = ('<p><img class="syno-notestation-image-object" '
            'src="webman/3rdparty/NoteStation/images/transparent.gif" '
            'ref="real.png" alt="a"/></p>')
    assert md(body, "synology_fix_img_src") == "![a](real.png)"


def test_upnote_highlight_and_checklists():
    assert md('<p><span class="shine-highlight-yellow">hl</span></p>',
              "upnote_add_highlight") == "==hl=="
    out = md('<ul><li data-checked="true"><div>Budget?</div></li>'
             '<li data-checked="false"><div>Plan</div></li></ul>',
             "upnote_streamline_checklists")
    assert out == "- [x] Budget?\n- [ ] Plan"


def test_unknown_filter_raises():
    with pytest.raises(KeyError):
        md("<p>x</p>", "nope")


def test_nimbus_list_indent_skips_levels():
    """Indent VALUES can skip levels (0 -> 2 -> 1): the dedent must walk
    up (current - indent) parents like the reference (html_filter.py:
    329-333), not treat the value as a stack index (review r3)."""
    from jimmy_ray.html.extract import html_to_markdown_filtered as h

    got = h('<ul><li class="list-item-bullet indent-0">a</li>'
            '<li class="list-item-bullet indent-2">deep</li>'
            '<li class="list-item-bullet indent-1">mid</li></ul>',
            ["nimbus_streamline_lists"])
    # 'mid' lands one level above 'deep', not beside it
    assert got == "- a\n  - deep\n- mid"
